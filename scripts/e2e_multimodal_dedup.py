#!/usr/bin/env python
"""End-to-end multimodal dedup run: synthesize a mixed-media corpus
(PNG + GIF images with planted near-duplicate groups, WAV clips with
planted same-signal groups, plus undecodable junk), then run the real
pipeline — extract_metadata -> perceptual image/audio hashing ->
banded hamming candidate pairs -> connected components -> keep list —
and report per-phase wall times and survivor counts.

Run from the repo root: python scripts/e2e_multimodal_dedup.py
[N_ITEMS_PER_MODALITY] (default 2000). Writes only to a temp dir.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")


def _make_media(spark, n: int, path: str) -> None:
    """n images (20 near-dup groups; PNG and GIF alternating so both
    codecs are exercised) + n audio clips (20 signal groups) + junk."""
    import numpy as np

    from blq_cli_spark.multimodal import binary as mmb

    palette = bytes(v for i in range(256) for v in (i, i, i))
    rows = []
    for i in range(n):
        g = i % 20
        import hashlib as _hl

        base = np.frombuffer(
            b"".join(_hl.md5(b"imggroup-%d-%d" % (g, k)).digest() for k in range(16)),
            dtype=np.uint8,
        ).copy()
        base[(i * 13) % base.size] ^= 0x40  # per-member noise pixel
        px = base.tobytes()
        if i % 2 == 0:
            blob = mmb.png_encode(16, 16, px)
        else:  # same pixels through the other REAL codec
            blob = mmb.gif_encode(16, 16, px, palette)
        rows.append((f"img{i:06d}", bytearray(blob)))
    rate = 4000
    for i in range(n):
        g = i % 20
        rng = np.random.default_rng(g)
        k = 2 + g % 7  # per-group spectral envelope (kernel length)
        x = np.convolve(rng.normal(0, 1, rate), np.ones(k) / k, "same")
        env = 1 + 0.8 * np.sin(2 * np.pi * np.arange(rate) / rate * (3 + 2 * g))
        sig = x * env * 9000
        sig = sig + np.random.default_rng(10_000 + i).normal(0, 300, rate)
        pcm = np.clip(sig, -32768, 32767).astype("<i2").tobytes()
        import struct as _s

        hdr = (
            b"RIFF" + _s.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + _s.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + _s.pack("<I", len(pcm))
        )
        rows.append((f"aud{i:06d}", bytearray(hdr + pcm)))
    rows.append(("junk000001", bytearray(b"not media at all")))
    spark.createDataFrame(rows, "id string, content binary").repartition(
        32
    ).write.mode("overwrite").parquet(path)


def main() -> None:
    from pyspark.sql import functions as F

    from blq_cli_spark.multimodal import binary as mmb
    from blq_cli_spark.operators import dedup as dedup_ops
    from blq_cli_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark(app_name="blq-e2e-multimodal")
    spark.range(1).count()
    tmp = tempfile.mkdtemp(prefix="mmdedup_")
    src = f"{tmp}/media.parquet"
    _make_media(spark, n, src)
    media = spark.read.parquet(src)

    def phase(name, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"{name:28s} {time.perf_counter() - t0:7.2f}s  {out}")

    meta = mmb.extract_metadata(media)
    phase(
        "metadata",
        lambda: f"{meta.groupBy('modality').count().orderBy('modality').collect()}",
    )

    img_pairs = mmb.image_dedup_pairs(media, max_hamming=7).localCheckpoint(
        eager=False
    )
    phase("image pairs (dhash+banded)", lambda: f"{img_pairs.count()} pairs")
    img_clusters = dedup_ops.dedup_clusters(img_pairs)
    phase(
        "image clusters (CC)",
        lambda: f"{img_clusters.select('cluster_id').distinct().count()} clusters",
    )

    aud_pairs = mmb.audio_dedup_pairs(media, max_hamming=7).localCheckpoint(
        eager=False
    )
    phase("audio pairs (HK+banded)", lambda: f"{aud_pairs.count()} pairs")
    aud_clusters = dedup_ops.dedup_clusters(aud_pairs)
    phase(
        "audio clusters (CC)",
        lambda: f"{aud_clusters.select('cluster_id').distinct().count()} clusters",
    )

    # keep list: one representative (min id) per cluster + all singletons
    dupes = img_clusters.unionByName(aud_clusters)
    drop = dupes.filter(F.col("id") != F.col("cluster_id")).select("id")
    keep = media.join(drop, media["id"] == drop["id"], "left_anti")
    phase("keep list (anti join)", lambda: f"{keep.count()} of {media.count()} kept")
    spark.stop()


if __name__ == "__main__":
    main()
