"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB corpora:
- content is an opaque `binary` column (or a reference into a blob store —
  LogStore's content-addressed layout applies directly, SURVEY.md S12);
- metadata (dims, duration, codec) is a typed struct extracted ONCE at
  ingest, so downstream filters (`width >= 512`) prune without touching
  bytes;
- all per-item compute runs in Arrow-batched mapInPandas: the batch shape
  is (N items, bytes per item) and partitioning is by content hash — no
  skew from file ordering.

What's real here vs stubbed (container has no image/audio libs):
- REAL: container-header parsing (PNG/GIF/JPEG/WAV) in pure Python —
  width/height/format/duration from magic bytes;
- REAL: hash-based deterministic feature vectors (shape-correct stand-in
  for a CNN/CLIP embedding; same Spark plumbing, same schema);
- STUB: pixel decode / resize / video frame-sample raise
  NotImplementedError unless PIL/av are importable (gated try-import),
  with `fake=True` offering a deterministic byte-derived surrogate so
  pipelines are testable end-to-end.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

META_DDL = (
    "id string, modality string, format string, width int, height int,"
    " duration_ms long, n_bytes long, content_hash string"
)


def sniff_format(data: bytes) -> str | None:
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


def parse_header(data: bytes) -> dict:
    """Pure-Python container-header parse: dimensions / duration from the
    first bytes — no codec library required."""
    fmt = sniff_format(data)
    out = {"format": fmt, "width": None, "height": None, "duration_ms": None, "modality": None}
    if fmt == "png" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        out.update(width=w, height=h, modality="image")
    elif fmt == "gif" and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        out.update(width=w, height=h, modality="image")
    elif fmt == "jpeg":
        out["modality"] = "image"
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                out.update(width=w, height=h)
                break
            i += 2 + seg_len
    elif fmt == "wav" and len(data) >= 44:
        byte_rate = struct.unpack("<I", data[28:32])[0]
        data_size = struct.unpack("<I", data[40:44])[0]
        out["modality"] = "audio"
        if byte_rate:
            out["duration_ms"] = int(data_size * 1000 / byte_rate)
    return out


def extract_metadata(df: DataFrame, id_col: str = "id", bin_col: str = "content") -> DataFrame:
    """Ingest-time metadata extraction (mapInPandas, Arrow-batched)."""
    import pandas as pd

    def _batches(it: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(blob) if blob is not None else b""
                meta = parse_header(data)
                rows.append(
                    {
                        "id": rid,
                        "modality": meta["modality"],
                        "format": meta["format"],
                        "width": meta["width"],
                        "height": meta["height"],
                        "duration_ms": meta["duration_ms"],
                        "n_bytes": len(data),
                        "content_hash": hashlib.sha256(data).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[c.split()[0] for c in META_DDL.split(",")])

    return df.mapInPandas(_batches, schema=META_DDL)


def hash_features(df: DataFrame, dim: int = 64, id_col: str = "id", bin_col: str = "content") -> DataFrame:
    """Deterministic byte-derived feature vector (shape-correct stand-in
    for a learned embedding; REAL plumbing — swap `_vec` for a model call
    batched over the same Arrow frames)."""
    import numpy as np
    import pandas as pd

    def _vec(data: bytes) -> list[float]:
        out = []
        counter = 0
        while len(out) < dim:
            h = hashlib.md5(data + counter.to_bytes(4, "big")).digest()
            out.extend(b / 255.0 for b in h)
            counter += 1
        return [float(x) for x in out[:dim]]

    def _batches(it: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "features": [
                        _vec(bytes(b) if b is not None else b"") for b in pdf[bin_col]
                    ],
                }
            )

    _ = np  # numpy reserved for the real model path
    return df.mapInPandas(_batches, schema="id string, features array<float>")


def _require_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image(
    df: DataFrame, id_col: str = "id", bin_col: str = "content", fake: bool = False
) -> DataFrame:
    """Decode to (id, width, height, pixels array<int>). STUB: requires
    PIL; with fake=True returns a deterministic 4x4 byte-derived surrogate
    (CLEARLY NOT real pixels) so downstream plumbing is testable."""
    import pandas as pd

    Image = _require_pil()
    if Image is None and not fake:
        raise NotImplementedError(
            "pixel decode requires PIL (not in this container); pass fake=True "
            "for a deterministic surrogate, or run where PIL/torchvision exist"
        )

    def _batches(it: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(blob) if blob is not None else b""
                if Image is not None and not fake:
                    img = Image.open(io.BytesIO(data))
                    rows.append(
                        {"id": rid, "width": img.width, "height": img.height,
                         "pixels": [int(p) for p in img.convert("L").tobytes()[:4096]]}
                    )
                else:
                    digest = hashlib.md5(data).digest()
                    rows.append(
                        {"id": rid, "width": 4, "height": 4, "pixels": [int(b) for b in digest]}
                    )
            yield pd.DataFrame(rows, columns=["id", "width", "height", "pixels"])

    return df.mapInPandas(_batches, schema="id string, width int, height int, pixels array<int>")


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, id_col: str = "id", bin_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling. STUB: real implementation needs an av/ffmpeg
    binding; fake=True emits deterministic frame markers with the correct
    output schema (one row per sampled frame — the explode shape)."""
    import pandas as pd

    if not fake:
        raise NotImplementedError(
            "video frame sampling requires an ffmpeg/av binding (not in this "
            "container); pass fake=True for schema-correct surrogate frames"
        )

    def _batches(it: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bin_col]):
                data = bytes(blob) if blob is not None else b""
                n_frames = max(1, min(5, len(data) // 16))
                for k in range(n_frames):
                    rows.append(
                        {"id": rid, "frame_index": k, "ts_ms": k * every_ms,
                         "frame_hash": hashlib.md5(data + bytes([k])).hexdigest()}
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_index", "ts_ms", "frame_hash"])

    return df.mapInPandas(
        _batches, schema="id string, frame_index int, ts_ms long, frame_hash string"
    )
