"""Driver gates for perceptual image dedup (multimodal binary columns).

Fixture: deterministic 9x8 grayscale PNGs planted per documents-row so
that each image's dHash equals a closed-form function of doc_id —
bit b (b < 60; 60..63 forced 0 to stay inside signed-BIGINT range in
both engines) is

    base(g, b) = ((g*131 + b*17) % 7) % 2          with g = doc_id % 20
    bit(d, b)  = base XOR [b == (37*d) % 60]

i.e. 20 base patterns (near-dup groups) with exactly one per-doc noise
bit. The Spark side builds REAL PNG bytes (png_encode), then recovers
the hash through the full pipeline: pure-Python PNG decode ->
nearest-neighbor resize -> dHash bit walk (multimodal.binary). The
DuckDB oracle computes the same numbers analytically, so a hash match
proves the decode+hash path end to end; the pairs gate additionally
proves the banded hamming join (dedup.hamming_candidates) — with
max_hamming=7 < bands=8 the pigeonhole guarantee makes "all pairs with
hamming <= 7" the exact expected set.

Reference stores image content as opaque blobs (SURVEY §2 S12); this
closes the multimodal brief with a real pixel path, no image library.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from blq_cli_spark.gates.registry import gate
from blq_cli_spark.multimodal import binary as mmb
from blq_cli_spark.sources.tables import table

_N_DOCS = 200
_N_GROUPS = 20


def _planted_bits(d: int) -> list[int]:
    g = d % _N_GROUPS
    noise_b = (37 * d) % 60
    bits = [(((g * 131 + b * 17) % 7) % 2) ^ (1 if b == noise_b else 0) for b in range(60)]
    return bits + [0, 0, 0, 0]


def _planted_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id string, content binary) — one 9x8 PNG per documents row whose
    dHash equals the planted bit pattern (each row is a +/-3 brightness
    walk: descending step where the bit is set)."""
    import pandas as pd

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _N_DOCS).select(
        "doc_id"
    )

    def _batches(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                bits = _planted_bits(d)
                px = bytearray()
                for r in range(8):
                    row = [128]
                    for c in range(8):
                        row.append(row[-1] - 3 if bits[r * 8 + c] else row[-1] + 3)
                    px.extend(row)
                rows.append(
                    {"id": f"d{d:05d}", "content": mmb.png_encode(9, 8, bytes(px))}
                )
            yield pd.DataFrame(rows, columns=["id", "content"])

    return docs.mapInPandas(_batches, schema="id string, content binary")


_HASHES_CTE = """
    WITH ids AS (
      SELECT doc_id, 'd' || lpad(CAST(doc_id AS VARCHAR), 5, '0') AS id
      FROM documents WHERE doc_id < 200
    ),
    bits AS (
      SELECT i.id, t.b,
             CASE WHEN t.b = (37 * i.doc_id) % 60
                  THEN 1 - ((i.doc_id % 20) * 131 + t.b * 17) % 7 % 2
                  ELSE ((i.doc_id % 20) * 131 + t.b * 17) % 7 % 2
             END AS bit
      FROM ids i CROSS JOIN range(60) t(b)
    ),
    hashes AS (
      SELECT id,
             CAST(SUM(CASE WHEN bit = 1 THEN CAST(1 AS BIGINT) << CAST(b AS INT)
                           ELSE 0 END) AS BIGINT) AS phash
      FROM bits GROUP BY id
    )
"""


@gate(
    "x_image_phash",
    oracle=_HASHES_CTE + "\n    SELECT id, phash FROM hashes",
)
def x_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash over REAL planted PNG bytes: documents-derived
    gradient images are PNG-encoded deterministically, decoded by the
    pure-numpy codec in an Arrow-batched mapInPandas, and reduced to
    the 64-bit row-gradient hash; the DuckDB oracle recomputes the
    hash analytically from the same closed-form pixel grid, so a match
    proves decode -> grayscale -> resample -> gradient -> bit-pack
    end-to-end (driver row since the round-10 rotation)."""
    imgs = _planted_images(spark, sf_dir)
    return mmb.image_perceptual_hash(imgs, method="dhash").select("id", "phash")


@gate(
    "x_image_dedup_pairs",
    oracle=_HASHES_CTE
    + """
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.id < b.id
    WHERE bit_count(xor(a.phash, b.phash)) <= 7
    """,
)
def x_image_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs over the same planted PNGs: dHash
    then the banded-hamming candidate engine (pigeonhole: any pair
    within max_hamming=7 shares at least one of 8 bands) with the
    exact hamming filter on candidates; the oracle is the all-pairs
    bit_count(xor) join — identical pairs prove the banding loses
    nothing at this radius while at scale it replaces the quadratic
    join with bucket-bounded work."""
    imgs = _planted_images(spark, sf_dir)
    pairs = mmb.image_dedup_pairs(imgs, method="dhash", max_hamming=7, bands=8)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


# ---- audio (round 7, VERDICT r6 ask #7) --------------------------------------
#
# Planted WAVs whose Haitsma-Kalker fingerprint equals a closed form of
# doc_id, so the FFT path is exactly checkable without a DuckDB FFT:
# each of 20 groups gets an 8-bit codeword p(g) = (37*g + 11) % 256
# repeated across all 8 frames (64 bits total), synthesized by summing
# one sinusoid per FFT band with per-frame energies E[f,b] built so
# every band-energy differential has margin M = 4e9 — three orders
# above int16 quantization noise. The three members of a group differ
# only by volume (1.0 / 0.85 / 0.7): energies scale by v^2 > 0, every
# comparison's sign survives, so members share EXACTLY the same 64
# bits. Distinct codewords repeated 8x give cross-group hamming >= 16
# > max_hamming 7, hence the pair set is exactly the within-group
# pairs at hamming 0 — the closed form the oracle states. (Verified
# bit-for-bit in tests/test_multimodal.py::test_planted_audio_gate.)

_N_AUDIO_DOCS = 60
_N_AUDIO_GROUPS = 20


def _planted_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id string, content binary) — one 4096-sample mono WAV per
    documents row (doc_id < 60) with the planted fingerprint."""
    import struct

    import numpy as np
    import pandas as pd

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _N_AUDIO_DOCS)
        .select("doc_id")
    )

    def _wav_bytes(d: int) -> bytes:
        g = d % _N_AUDIO_GROUPS
        v = (1.0, 0.85, 0.7)[d // _N_AUDIO_GROUPS]
        p = (37 * g + 11) % 256
        bits_b = [(p >> b) & 1 for b in range(8)]
        M = 4e9
        base = 100 * M
        t = np.arange(512)
        samples = np.zeros(4096)
        for f in range(8):
            dd = [((f + 1) * M if bits_b[b] else -(f + 1) * M) for b in range(8)]
            E = [0.0] * 9
            E[8] = base
            for b in range(7, -1, -1):
                E[b] = E[b + 1] + dd[b]
            fr = np.zeros(512)
            for b in range(9):
                k = b * 28 + 15  # bin centered in band b (DC dropped)
                amp = np.sqrt(E[b]) / 256.0 * v
                fr += amp * np.sin(2 * np.pi * k * t / 512)
            samples[f * 512 : (f + 1) * 512] = fr
        pcm = np.clip(np.round(samples), -32767, 32767).astype("<i2").tobytes()
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 4096, 8192, 2, 16)
            + b"data" + struct.pack("<I", len(pcm))
        )
        return hdr + pcm

    def _batches(it):
        for pdf in it:
            rows = [
                {"id": f"a{int(d):05d}", "content": _wav_bytes(int(d))}
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["id", "content"])

    return docs.mapInPandas(_batches, schema="id string, content binary")


@gate(
    "x_audio_dedup_pairs",
    # closed form: members of a group share an identical fingerprint
    # (volume invariance is exact by construction), distinct groups are
    # >= 16 bits apart — the pair set is all within-group pairs, hamming 0
    oracle="""
    WITH m AS (
      SELECT doc_id, doc_id % 20 AS g,
             'a' || lpad(CAST(doc_id AS VARCHAR), 5, '0') AS id
      FROM documents WHERE doc_id < 60
    )
    SELECT a.id AS id_a, b.id AS id_b, CAST(0 AS BIGINT) AS hamming
    FROM m a JOIN m b ON a.g = b.g AND a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """,
)
def x_audio_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual audio near-dup pairs (Haitsma-Kalker fingerprint ->
    banded hamming join) over planted closed-form WAVs — the image-pairs
    trick applied to the FFT path, giving the audio modality a
    driver-hashed oracle (rows-only was the r6 convention; the planted
    construction upgrades it to a full value hash)."""
    wavs = _planted_audio(spark, sf_dir)
    pairs = mmb.audio_dedup_pairs(wavs, max_hamming=7, bands=8)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    ).orderBy("id_a", "id_b")


# ---- baseline JPEG (round 7, VERDICT r6 ask #3) ------------------------------


def _planted_jpegs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id string, content binary) — the x_image_phash construction
    re-encoded as REAL baseline JPEGs (jpeg_encode_gray): same planted
    bits, but a +/-6 brightness walk so the codec's round-trip error
    (|err| <= 1 with the encoder's all-ones quantization, measured in
    tests/test_multimodal.py) can never flip a dHash comparison whose
    margin is 6."""
    import pandas as pd

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _N_DOCS)
        .select("doc_id")
    )

    def _batches(it):
        for pdf in it:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                bits = _planted_bits(d)
                px = bytearray()
                for r in range(8):
                    row = [128]
                    for c in range(8):
                        row.append(row[-1] - 6 if bits[r * 8 + c] else row[-1] + 6)
                    px.extend(row)
                rows.append(
                    {"id": f"j{d:05d}", "content": mmb.jpeg_encode_gray(9, 8, bytes(px))}
                )
            yield pd.DataFrame(rows, columns=["id", "content"])

    return docs.mapInPandas(_batches, schema="id string, content binary")


@gate(
    "x_jpeg_phash",
    oracle=_HASHES_CTE.replace("'d' ||", "'j' ||")
    + "\n    SELECT id, phash FROM hashes",
)
def x_jpeg_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dHash through the full pure-Python BASELINE JPEG pipeline —
    jpeg_encode_gray fixture bytes -> sniff -> jpeg_decode (canonical
    Huffman + IDCT) -> resize -> bit walk — against the same closed-form
    oracle as x_image_phash. A hash match proves the whole codec path
    end to end (the r6 PNG/GIF discipline extended to the dominant
    crawl image format; VERDICT r6 ask #3)."""
    jpgs = _planted_jpegs(spark, sf_dir)
    return mmb.image_perceptual_hash(jpgs, method="dhash").select("id", "phash")
