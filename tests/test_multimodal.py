"""Multimodal binary columns: header parsing (real), feature extraction
(deterministic), decode/frame-sample stubs (schema-correct plumbing)."""

from __future__ import annotations

import struct

import pytest

from blq_cli_spark.multimodal import binary as mm


def png_bytes(w: int, h: int) -> bytes:
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", w, h) + b"\x08\x02" + b"\x00" * 40


def gif_bytes(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 20


def jpeg_bytes(w: int, h: int) -> bytes:
    sof = b"\xff\xc0" + struct.pack(">H", 8 + 9) + b"\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
    return b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9 + sof


def wav_bytes(seconds: int = 2, byte_rate: int = 16000) -> bytes:
    data_size = byte_rate * seconds
    hdr = b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE" + b"fmt " + struct.pack("<I", 16)
    hdr += struct.pack("<HHIIHH", 1, 1, 16000, byte_rate, 2, 16)
    hdr += b"data" + struct.pack("<I", data_size)
    return hdr + b"\x00" * 64


def test_parse_header_pure():
    assert mm.parse_header(png_bytes(640, 480)) == {
        "format": "png", "width": 640, "height": 480, "duration_ms": None, "modality": "image"
    }
    assert mm.parse_header(gif_bytes(12, 34))["width"] == 12
    j = mm.parse_header(jpeg_bytes(320, 200))
    assert (j["width"], j["height"]) == (320, 200)
    w = mm.parse_header(wav_bytes(2))
    assert w["modality"] == "audio" and w["duration_ms"] == 2000
    assert mm.parse_header(b"garbage")["format"] is None


@pytest.fixture(scope="module")
def bin_df(spark):
    rows = [
        ("img1", bytearray(png_bytes(640, 480))),
        ("img2", bytearray(jpeg_bytes(320, 200))),
        ("aud1", bytearray(wav_bytes(3))),
        ("junk", bytearray(b"not a media file")),
    ]
    return spark.createDataFrame(rows, "id string, content binary")


def test_extract_metadata_distributed(spark, bin_df):
    meta = {r["id"]: r for r in mm.extract_metadata(bin_df).collect()}
    assert (meta["img1"]["width"], meta["img1"]["height"], meta["img1"]["format"]) == (640, 480, "png")
    assert meta["img2"]["modality"] == "image"
    assert meta["aud1"]["duration_ms"] == 3000
    assert meta["junk"]["format"] is None and meta["junk"]["n_bytes"] == 16
    assert len({r["content_hash"] for r in meta.values()}) == 4


def test_hash_features_shape_and_determinism(spark, bin_df):
    f1 = {r["id"]: r["features"] for r in mm.hash_features(bin_df, dim=64).collect()}
    f2 = {r["id"]: r["features"] for r in mm.hash_features(bin_df, dim=64).collect()}
    assert all(len(v) == 64 for v in f1.values())
    assert f1 == f2  # deterministic
    assert f1["img1"] != f1["img2"]
    assert all(0.0 <= x <= 1.0 for x in f1["img1"])


def _png_encode(w, h, raw, color=2, filters=None, plte=b""):
    """Minimal PNG writer with per-scanline filter choice — exercises
    every unfilter branch of png_decode."""
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    stride = w * channels
    bpp = channels
    filters = filters or [0] * h
    enc = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        enc.append(f)
        for i in range(stride):
            x = line[i]
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - a
            elif f == 2:
                v = x - b
            elif f == 3:
                v = x - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = x - pr
            enc.append(v & 0xFF)
        prev = line

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(bytes(enc))) + chunk(b"IEND", b"")


def test_png_decode_real_pixels_all_filters():
    import random

    rng = random.Random(11)
    w, h = 7, 5
    raw = bytes(rng.randrange(256) for _ in range(w * h * 3))
    data = _png_encode(w, h, raw, color=2, filters=[0, 1, 2, 3, 4])
    dw, dh, gray = mm.png_decode(data)
    assert (dw, dh) == (w, h)
    expect = bytes(
        (raw[i] * 299 + raw[i + 1] * 587 + raw[i + 2] * 114) // 1000
        for i in range(0, len(raw), 3)
    )
    assert gray == expect  # real pixels, bit-exact


def test_png_decode_gray_and_palette():
    raw = bytes(range(24))
    data = _png_encode(6, 4, raw, color=0, filters=[4, 3, 2, 1])
    assert mm.png_decode(data)[2] == raw  # grayscale round-trips exactly
    # palette: 2 entries, checkerboard indexes
    idx = bytes([0, 1] * 8)
    plte = bytes([255, 0, 0, 0, 0, 255])  # red, blue
    _, _, gray = mm.png_decode(_png_encode(4, 4, idx, color=3, plte=plte))
    assert set(gray) == {(255 * 299) // 1000, (255 * 114) // 1000}
    with pytest.raises(ValueError):
        mm.png_decode(b"not a png at all")


def test_decode_image_real_png_without_pil(spark):
    """Multimodal decode is first-class for PNG: real pixel values out of
    the distributed path, no PIL, no fake flag."""
    import random

    rng = random.Random(3)
    w, h = 5, 3
    raw = bytes(rng.randrange(256) for _ in range(w * h * 3))
    data = _png_encode(w, h, raw, color=2, filters=[1, 4, 2])
    df = spark.createDataFrame([("p1", bytearray(data))], "id string, content binary")
    out = mm.decode_image(df).collect()[0]
    _, _, expect = mm.png_decode(data)
    assert (out["width"], out["height"]) == (w, h)
    assert bytes(out["pixels"]) == expect


def test_decode_image_stub_paths(spark, bin_df):
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        # baseline JPEG now decodes natively (round 7) — but img2 is a
        # header-only fixture with no scan data, so the decoder reports
        # the truncation; img1's truncated PNG raises zlib.error.
        with pytest.raises(Exception, match="truncated before SOS"):
            mm.decode_image(bin_df.filter("id = 'img2'")).collect()
        with pytest.raises(Exception, match="zlib"):
            mm.decode_image(bin_df.filter("id = 'img1'")).collect()
    out = {r["id"]: r for r in mm.decode_image(bin_df, fake=True).collect()}
    assert out["img1"]["width"] == 4 and len(out["img1"]["pixels"]) == 16


def test_sample_video_frames_stub(spark, bin_df):
    # non-GIF containers still require an av binding: the error now
    # surfaces at execution (per-row), wrapped in Spark's PythonException
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        mm.sample_video_frames(bin_df).collect()
    frames = mm.sample_video_frames(bin_df, every_ms=500, fake=True).collect()
    per_id = {}
    for r in frames:
        per_id.setdefault(r["id"], []).append(r)
    assert [f["ts_ms"] for f in sorted(per_id["img1"], key=lambda r: r["frame_index"])][:2] == [0, 500]


def animated_gif_bytes(n_frames: int, delay_cs: int = 50, w: int = 2, h: int = 2) -> bytes:
    """Hand-assembled animated GIF: no global color table, one graphic
    control extension (delay in centiseconds) per frame."""
    out = bytearray(b"GIF89a" + struct.pack("<HH", w, h) + bytes([0, 0, 0]))
    for k in range(n_frames):
        out += bytes([0x21, 0xF9, 0x04, 0x00]) + struct.pack("<H", delay_cs) + bytes([0x00, 0x00])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x00])
        out += bytes([0x02, 0x02, 0x44 + k, 0x01, 0x00])  # lzw min + 1 sub-block + term
    out += bytes([0x3B])
    return bytes(out)


def test_gif_frames_walker_real():
    data = animated_gif_bytes(4, delay_cs=50)  # 500 ms per frame
    frames = mm.gif_frames(data)
    assert [f["frame_index"] for f in frames] == [0, 1, 2, 3]
    assert [f["ts_ms"] for f in frames] == [0, 500, 1000, 1500]
    assert all(f["delay_ms"] == 500 for f in frames)
    # byte spans tile the image blocks: each starts with the 0x2C descriptor
    for f in frames:
        assert data[f["offset"]] == 0x2C
    assert mm.gif_frames(b"not a gif") == []


def test_sample_video_frames_real_gif(spark):
    data = animated_gif_bytes(6, delay_cs=50)  # frames at 0,500,...,2500 ms
    df = spark.createDataFrame([("vid1", bytearray(data))], "id string, content binary")
    got = mm.sample_video_frames(df, every_ms=1000).collect()
    assert [r["ts_ms"] for r in sorted(got, key=lambda r: r["frame_index"])] == [0, 1000, 2000]
    # hashes cover distinct frame byte spans
    assert len({r["frame_hash"] for r in got}) == 3


def full_wav_bytes(seconds: int, byte_rate: int = 16000) -> bytes:
    """WAV whose data chunk actually carries its declared bytes."""
    data_size = byte_rate * seconds
    hdr = b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE" + b"fmt " + struct.pack("<I", 16)
    hdr += struct.pack("<HHIIHH", 1, 1, 16000, byte_rate, 2, 16)
    hdr += b"data" + struct.pack("<I", data_size)
    body = bytes(k % 251 for k in range(data_size))
    return hdr + body


def test_audio_windows_real_wav(spark):
    df = spark.createDataFrame(
        [("aud1", bytearray(full_wav_bytes(3, byte_rate=16000))), ("img", bytearray(png_bytes(2, 2)))],
        "id string, content binary",
    )
    got = sorted(mm.audio_windows(df, window_ms=1000).collect(), key=lambda r: r["window_index"])
    assert [r["id"] for r in got] == ["aud1"] * 3  # non-WAV rows yield nothing
    assert [r["start_ms"] for r in got] == [0, 1000, 2000]
    assert all(r["n_bytes"] == 16000 for r in got[:-1])


def test_resize_image_nearest_neighbor_exact(spark):
    """8x8 gradient PNG -> 4x4 resize must equal the numpy index-grid
    reference on REAL decoded pixels (no PIL in this container)."""
    import numpy as np

    w = h = 8
    raw = bytes(range(w * h))  # grayscale gradient 0..63
    data = _png_encode(w, h, raw, color=0, filters=[0] * h)
    df = spark.createDataFrame([("g", bytearray(data))], "id string, content binary")
    out = mm.resize_image(df, 4, 4).collect()[0]
    assert (out["width"], out["height"]) == (4, 4)
    grid = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
    ys, xs = (np.arange(4) * h) // 4, (np.arange(4) * w) // 4
    assert out["pixels"] == grid[ys][:, xs].reshape(-1).tolist()
    # upscale repeats pixels, never interpolates (reproducibility contract)
    up = mm.resize_image(df, 16, 16).collect()[0]
    assert len(up["pixels"]) == 256
    assert set(up["pixels"]) <= set(range(64))


def test_resize_image_fake_and_unsupported(spark, bin_df):
    rows = {r["id"]: r for r in mm.resize_image(bin_df, 2, 2, fake=True).collect()}
    assert all(len(r["pixels"]) == 4 for r in rows.values())
    import pytest as _pytest

    # img2 is a header-only JPEG fixture: the native decoder (round 7)
    # reports the missing scan instead of a PIL-dependency error
    jpeg_only = bin_df.filter("id = 'img2'")
    with _pytest.raises(Exception, match="truncated before SOS|requires PIL"):
        mm.resize_image(jpeg_only, 2, 2).collect()


def test_audio_features_sine_wave(spark):
    """1s 440 Hz int16 sine: RMS ~= A/sqrt(2), zc-rate ~= 2f/rate,
    peak == A — real DSP numbers from real PCM, no audio lib."""
    import math
    import numpy as np

    rate, amp, f = 8000, 10000, 440
    t = np.arange(rate) / rate
    pcm = (amp * np.sin(2 * math.pi * f * t)).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE" + b"fmt " + struct.pack("<I", 16)
    hdr += struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    df = spark.createDataFrame(
        [("sine", bytearray(hdr + pcm))], "id string, content binary"
    )
    rows = mm.audio_features(df, window_ms=500).collect()
    assert [r["window_index"] for r in sorted(rows, key=lambda r: r["window_index"])] == [0, 1]
    for r in rows:
        assert abs(r["rms"] - amp / math.sqrt(2)) / amp < 0.01
        assert abs(r["zero_cross_rate"] - 2 * f / rate) < 0.01
        assert amp - 1 <= r["peak"] <= amp
    # non-wav rows yield nothing
    png = spark.createDataFrame([("p", bytearray(png_bytes(4, 4)))], "id string, content binary")
    assert mm.audio_features(png).count() == 0


# --- perceptual hash (round 6) -----------------------------------------------


def _dhash_image(bits: list[int]) -> bytes:
    """9x8 grayscale PNG whose dHash is exactly `bits` (bit r*8+c set
    iff px[r,c] > px[r,c+1] — build each row as a walk)."""
    px = bytearray()
    for r in range(8):
        row = [128]
        for c in range(8):
            row.append(row[-1] - 3 if bits[r * 8 + c] else row[-1] + 3)
        px.extend(row)
    return mm.png_encode(9, 8, bytes(px))


def test_png_encode_decode_roundtrip():
    gray = bytes((x * 7 + y * 13) % 256 for y in range(5) for x in range(4))
    w, h, out = mm.png_decode(mm.png_encode(4, 5, gray))
    assert (w, h) == (4, 5)
    assert out == gray


def test_dhash_recovers_planted_bits(spark):
    bits = [(i * 37) % 3 % 2 for i in range(64)]
    expected = sum(1 << b for b, on in enumerate(bits) if on)
    expected = expected - (1 << 64) if expected >= (1 << 63) else expected
    df = spark.createDataFrame(
        [("a", bytearray(_dhash_image(bits)))], "id string, content binary"
    )
    rows = mm.image_perceptual_hash(df, method="dhash").collect()
    assert rows[0]["phash"] == expected


def test_phash_properties(spark):
    # smooth synthetic photos (low-frequency sinusoid mixes) — pHash's
    # intended regime; white noise would put every low-freq DCT coeff
    # at the median knife-edge
    import numpy as np

    n = 32
    x, y = np.meshgrid(np.arange(n), np.arange(n))
    base = (96 + 35 * np.sin(x / 5.0) + 30 * np.cos(y / 7.0)
            + 15 * np.sin((x + y) / 9.0)).astype(np.uint8)
    near = base.copy()
    for f in range(3):
        near[(f * 7) % n, (f * 13) % n] += 12
    bright = (base.astype(int) + 40).astype(np.uint8)  # no clipping: base <= 176
    other = (96 + 35 * np.sin(y / 3.0) + 30 * np.cos(x / 11.0)
             - 15 * np.sin((2 * x - y) / 6.0)).astype(np.uint8)

    def png(a):
        return bytearray(mm.png_encode(n, n, a.reshape(-1).tobytes()))

    df = spark.createDataFrame(
        [("orig", png(base)), ("same", png(base.copy())), ("near", png(near)),
         ("brightness", png(bright)), ("other", png(other))],
        "id string, content binary",
    )
    h = {r["id"]: r["phash"] for r in mm.image_perceptual_hash(df, method="phash").collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert h["orig"] == h["same"]
    assert ham(h["orig"], h["near"]) <= 8
    # constant brightness shift only moves the DC coefficient (excluded)
    assert ham(h["orig"], h["brightness"]) == 0
    assert ham(h["orig"], h["other"]) > 10


def test_image_dedup_pairs_matches_bruteforce(spark):
    import hashlib as hl
    from itertools import combinations

    # 24 images in 6 groups of 4: same base pattern + tiny per-member
    # noise -> low intra-group hamming, high cross-group hamming
    rows = []
    for i in range(24):
        g = i % 6
        base = hl.md5(b"group-%d" % g).digest() * 4  # 64 bytes -> 8x8
        px = bytearray(base)
        px[(i * 13) % 64] ^= 0x80
        rows.append((f"img{i:02d}", bytearray(mm.png_encode(8, 8, bytes(px)))))
    df = spark.createDataFrame(rows, "id string, content binary")

    hashes = {r["id"]: r["phash"] for r in mm.image_perceptual_hash(df, method="dhash").collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    max_h = 7
    expected = {
        (a, b, ham(hashes[a], hashes[b]))
        for a, b in combinations(sorted(hashes), 2)
        if ham(hashes[a], hashes[b]) <= max_h
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in mm.image_dedup_pairs(df, method="dhash", max_hamming=max_h).collect()
    }
    # completeness: hamming <= max_h < bands guarantees a shared block,
    # so the banded join finds EVERY qualifying pair, and nothing else
    assert got == expected
    assert expected  # the planted groups actually produce pairs


# --- audio perceptual fingerprint (round 6) -----------------------------------


def _wav_pcm16(samples, rate=8000) -> bytes:
    import numpy as np

    pcm = np.asarray(samples)
    body = np.clip(pcm, -32768, 32767).astype("<i2").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(body))
    )
    return hdr + body


def _colored_noise(seed, n=8000, member=None):
    """Broadband deterministic signal (smoothed noise + seed-specific AM
    envelope): every spectral band carries real energy, so the
    fingerprint is exercised away from the empty-band knife edge that a
    pure-tone fixture would sit on. `member` adds small extra noise for
    near-duplicate variants."""
    import numpy as np

    rng = np.random.default_rng(seed)
    x = np.convolve(rng.normal(0, 1, n), np.ones(6) / 6, "same")
    env = 1 + 0.8 * np.sin(2 * np.pi * np.arange(n) / n * (3 + seed % 5))
    out = x * env * 9000
    if member is not None:
        out = out + np.random.default_rng(1000 + member).normal(0, 400, n)
    return out


def test_audio_fingerprint_invariances(spark):
    import numpy as np

    base = _colored_noise(1)
    df = spark.createDataFrame(
        [
            ("orig", bytearray(_wav_pcm16(base))),
            ("same", bytearray(_wav_pcm16(base.copy()))),
            ("quiet", bytearray(_wav_pcm16(base * 0.25))),  # volume change
            ("noisy", bytearray(_wav_pcm16(_colored_noise(1, member=7)))),
            ("other", bytearray(_wav_pcm16(_colored_noise(2)))),
            ("notaudio", bytearray(b"\x89PNG\r\n\x1a\njunk")),
        ],
        "id string, content binary",
    )
    h = {r["id"]: r["ahash"] for r in mm.audio_fingerprint(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert "notaudio" not in h  # non-WAV rows yield nothing
    assert h["orig"] == h["same"]
    assert h["orig"] == h["quiet"]  # energy-difference signs survive scaling
    assert ham(h["orig"], h["noisy"]) <= 8
    assert ham(h["orig"], h["other"]) > 10
    assert isinstance(h["orig"], int)
    _ = np  # silence unused-import style in case asserts change


def test_audio_dedup_pairs_matches_bruteforce(spark):
    from itertools import combinations

    rows = []
    for i in range(18):
        g = i % 3
        rows.append(
            (f"a{i:02d}", bytearray(_wav_pcm16(_colored_noise(g, member=i))))
        )
    df = spark.createDataFrame(rows, "id string, content binary")
    hashes = {r["id"]: r["ahash"] for r in mm.audio_fingerprint(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    max_h = 7
    expected = {
        (a, b, ham(hashes[a], hashes[b]))
        for a, b in combinations(sorted(hashes), 2)
        if ham(hashes[a], hashes[b]) <= max_h
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in mm.audio_dedup_pairs(df, max_hamming=max_h).collect()
    }
    assert got == expected
    assert expected  # planted same-spectrum groups do pair up


# --- GIF pixel decode (round 6) ------------------------------------------------


def _gif_encode(w, h, indices, palette, interlace=False, min_code_size=8):
    return mm.gif_encode(w, h, indices, palette, interlace, min_code_size)


def test_gif_decode_roundtrip_and_interlace():
    palette = bytes(v for i in range(256) for v in (i, i, i))  # grayscale
    idx = bytes((x * 7 + y * 31) % 256 for y in range(6) for x in range(5))
    w, h, gray = mm.gif_decode(_gif_encode(5, 6, idx, palette))
    assert (w, h) == (5, 6)
    assert gray == idx  # grayscale palette: luma == index

    # interlaced: same pixels, rows stored in 8/4/2/1 pass order
    order = (
        list(range(0, 6, 8)) + list(range(4, 6, 8))
        + list(range(2, 6, 4)) + list(range(1, 6, 2))
    )
    shuffled = b"".join(idx[r * 5 : (r + 1) * 5] for r in order)
    w, h, gray = mm.gif_decode(_gif_encode(5, 6, shuffled, palette, interlace=True))
    assert gray == idx

    # color palette maps through ITU luma
    pal = bytes([255, 0, 0, 0, 0, 255])  # red, blue
    w, h, gray = mm.gif_decode(
        _gif_encode(2, 1, bytes([0, 1]), pal, min_code_size=2)
    )
    assert gray == bytes([(255 * 299) // 1000, (255 * 114) // 1000])

    with pytest.raises(ValueError):
        mm.gif_decode(_gif_encode(2, 1, bytes([0, 1]), pal, min_code_size=2), frame_index=3)


def test_gif_real_lzw_stream_from_dictionary_growth():
    """Decode a hand-built LZW stream that actually grows the dictionary
    (the clear-per-pixel fixture never does): codes for 'abab' emit
    a, b, then the grown code for 'ab'."""
    # min_code_size=2: clear=4, end=5, first dict code=6
    # stream: CLEAR(4) 'a'(0) 'b'(1) code6('ab'... wait: after a,b the
    # table holds 6='ab'; emitting 6 yields 'ab') END(5) -> "abab"
    codes = [(4, 3), (0, 3), (1, 3), (6, 4), (5, 4)]  # (code, width)
    acc = nbits = 0
    bits = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        bits.append(acc & 0xFF)
    out = mm._lzw_decode(2, bytes(bits), 4)
    assert out == bytes([0, 1, 0, 1])


def test_image_perceptual_hash_gif_path(spark):
    """dHash through the REAL GIF decode recovers the planted bits —
    image near-dup covers both container formats without PIL."""
    bits = [(i * 37) % 3 % 2 for i in range(64)]
    expected = sum(1 << b for b, on in enumerate(bits) if on)
    expected = expected - (1 << 64) if expected >= (1 << 63) else expected
    px = bytearray()
    for r in range(8):
        row = [128]
        for c in range(8):
            row.append(row[-1] - 3 if bits[r * 8 + c] else row[-1] + 3)
        px.extend(row)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    gif = _gif_encode(9, 8, bytes(px), palette)
    df = spark.createDataFrame([("g", bytearray(gif))], "id string, content binary")
    rows = mm.image_perceptual_hash(df, method="dhash").collect()
    assert rows[0]["phash"] == expected


def test_cli_multimodal_actions(tmp_path, capsys, spark):
    from blq_cli_spark.cli import main

    palette = bytes(v for i in range(256) for v in (i, i, i))
    px = bytes((x * 7 + y * 13) % 200 for y in range(8) for x in range(9))
    rows = [
        ("p1", bytearray(mm.png_encode(9, 8, px))),
        ("p2", bytearray(mm.png_encode(9, 8, px))),  # exact dup -> hamming 0
        ("g1", bytearray(_gif_encode(9, 8, px, palette))),
        ("w1", bytearray(_wav_pcm16(_colored_noise(4)))),
    ]
    src = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, "id string, content binary").write.parquet(src)

    assert main(["multimodal", "metadata", "--input", src]) == 0
    out = capsys.readouterr().out
    assert "png" in out and "wav" in out

    assert main(["multimodal", "image-hash", "--input", src.rstrip("/"),
                 "--method", "dhash"]) == 0
    assert "phash" in capsys.readouterr().out

    dst = str(tmp_path / "pairs.parquet")
    assert main(["multimodal", "image-dedup", "--input", src,
                 "--output", dst]) == 0
    capsys.readouterr()
    pairs = {(r["id_a"], r["id_b"], r["hamming"])
             for r in spark.read.parquet(dst).collect()}
    # p1/p2 identical; g1 carries the same pixels through the GIF codec
    assert ("p1", "p2", 0) in pairs and ("g1", "p1", 0) in pairs

    assert main(["multimodal", "audio-fingerprint", "--input", src]) == 0
    assert "ahash" in capsys.readouterr().out

    assert main(["multimodal", "decode", "--input", src.rstrip("/"),
                 "--fake"]) == 0
    assert "pixels" in capsys.readouterr().out


def test_serve_multimodal_dispatch(tmp_path, spark):
    from blq_cli_spark import serve
    from blq_cli_spark.sources.store import LogStore

    st = LogStore(spark, str(tmp_path / "bird"))
    px = bytes((x * 3 + y * 11) % 256 for y in range(8) for x in range(9))
    src = str(tmp_path / "media.parquet")
    spark.createDataFrame(
        [("a", bytearray(mm.png_encode(9, 8, px))),
         ("b", bytearray(mm.png_encode(9, 8, px)))],
        "id string, content binary",
    ).write.parquet(src)
    res = serve.dispatch(st, "multimodal", {"action": "metadata", "input": src})
    assert res["ok"] and len(res["result"]["rows"]) == 2
    res = serve.dispatch(
        st, "multimodal",
        {"action": "image-dedup", "input": src, "method": "phash"},
    )
    assert res["ok"]
    assert {(r["id_a"], r["id_b"]) for r in res["result"]["rows"]} == {("a", "b")}
    res = serve.dispatch(st, "multimodal", {"action": "nope", "input": src})
    assert not res["ok"]


# --- video (animated GIF) near-dup (round 6) -----------------------------------


def _anim(seed_frames, palette):
    return bytearray(mm.gif_encode_animated(8, 8, seed_frames, palette))


def test_video_frame_hashes_and_dedup(spark):
    import hashlib as hl

    palette = bytes(v for i in range(256) for v in (i, i, i))

    def frame(tag):
        return hl.md5(tag).digest() * 4  # 64 bytes -> 8x8

    a_frames = [frame(b"f0"), frame(b"f1"), frame(b"f2")]
    # near-dup clip: same frames, one pixel perturbed in one frame
    b1 = bytearray(frame(b"f1"))
    b1[5] ^= 0x80
    b_frames = [frame(b"f0"), bytes(b1), frame(b"f2")]
    other = [frame(b"x0"), frame(b"x1")]

    df = spark.createDataFrame(
        [("clipA", _anim(a_frames, palette)),
         ("clipB", _anim(b_frames, palette)),
         ("clipC", _anim(other, palette)),
         ("still", bytearray(mm.png_encode(4, 4, bytes(16))))],
        "id string, content binary",
    )
    fh = mm.video_frame_hashes(df)
    rows = fh.collect()
    per_clip = {}
    for r in rows:
        per_clip.setdefault(r["id"], []).append(r)
    assert len(per_clip["clipA"]) == 3 and len(per_clip["clipC"]) == 2
    assert "still" not in per_clip  # non-GIF rows yield nothing
    # identical frames hash identically across clips
    ha = {r["frame_index"]: r["phash"] for r in per_clip["clipA"]}
    hb = {r["frame_index"]: r["phash"] for r in per_clip["clipB"]}
    assert ha[0] == hb[0] and ha[2] == hb[2]

    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in mm.video_dedup_pairs(df, max_hamming=7).collect()
    }
    assert ("clipA", "clipB") in pairs
    ab = pairs[("clipA", "clipB")]
    assert ab["hamming"] == 0 and ab["n_frame_matches"] >= 2
    assert not any("clipC" in k for k in pairs)  # different content stays apart
    # multi-frame agreement knob
    strict = mm.video_dedup_pairs(df, max_hamming=7, min_frame_matches=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in strict} <= {("clipA", "clipB")}


def test_planted_audio_gate_bits_are_closed_form(spark):
    """The x_audio_dedup_pairs construction's whole premise, checked
    bit-for-bit: every planted WAV's Haitsma-Kalker fingerprint equals
    the group codeword p(g) = (37*g + 11) % 256 repeated across all 8
    frames, IDENTICALLY for all three volume-scaled members — so the
    gate's closed-form pair oracle is exact, not statistical."""
    from blq_cli_spark.gates.multimodal_gates import _planted_audio
    from blq_cli_spark.multimodal import binary as mmb

    wavs = _planted_audio(spark, "/root/testdata/sf0.001")
    hashes = {
        r["id"]: r["ahash"] & (2**64 - 1)
        for r in mmb.audio_fingerprint(wavs).collect()
    }
    assert len(hashes) == 60
    for g in range(20):
        p = (37 * g + 11) % 256
        want = sum(((p >> (i % 8)) & 1) << i for i in range(64))
        members = [hashes[f"a{g + 20 * m:05d}"] for m in range(3)]
        assert members == [want] * 3, (g, [hex(x) for x in members], hex(want))
    # cross-group separation clears the banded-join threshold with room
    vals = [hashes[f"a{g:05d}"] for g in range(20)]
    dists = [
        bin(a ^ b).count("1")
        for i, a in enumerate(vals)
        for b in vals[i + 1 :]
    ]
    assert min(dists) >= 16


# ---- baseline JPEG codec (round 7) -------------------------------------------


def _jpeg_roundtrip(img):
    import numpy as np

    from blq_cli_spark.multimodal import binary as mmb

    h, w = img.shape
    data = mmb.jpeg_encode_gray(w, h, img.tobytes())
    assert mmb.sniff_format(data) == "jpeg"
    ww, hh, px = mmb.jpeg_decode(data)
    assert (ww, hh) == (w, h)
    return np.frombuffer(px, dtype=np.uint8).reshape(hh, ww)


def test_jpeg_roundtrip_patterns():
    """Synthetic JPEGs through the pure-Python encoder+decoder: with the
    encoder's all-ones quantization the round-trip error is DCT rounding
    only — max |err| <= 2 across gradients, sinusoids, random noise and
    non-multiple-of-8 shapes (edge-replicated padding)."""
    import numpy as np

    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:48, 0:64]
    cases = [
        (x * 4 % 256).astype(np.uint8),                           # ramp
        ((np.sin(x / 5) * np.cos(y / 7) + 1) * 127).astype(np.uint8),
        rng.integers(0, 256, (48, 64)).astype(np.uint8),          # noise
        np.full((48, 64), 128, dtype=np.uint8),                   # flat
    ]
    for img in cases:
        out = _jpeg_roundtrip(img)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    # non-multiple-of-8 dims
    for shape in ((9, 8), (23, 37), (1, 100), (100, 1)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        out = _jpeg_roundtrip(img)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_restart_markers_roundtrip():
    """DRI + RSTn resync: the decoder must realign to byte boundaries
    and reset DC predictors at every restart."""
    import numpy as np

    from blq_cli_spark.multimodal import binary as mmb

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    for ri in (1, 3, 7):
        data = mmb.jpeg_encode_gray(40, 24, img.tobytes(), restart_interval=ri)
        w, h, px = mmb.jpeg_decode(data)
        out = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_progressive_rejected_and_hash_path_skips(spark):
    """A progressive (SOF2) JPEG raises NotImplementedError from the
    explicit decode path, but image_perceptual_hash SKIPS the row (the
    advisor's mixed-corpus finding: one undecodable row must not fail
    the whole job)."""
    import numpy as np
    import pytest as _pytest

    from blq_cli_spark.multimodal import binary as mmb

    img = np.full((8, 8), 100, dtype=np.uint8)
    good = mmb.jpeg_encode_gray(8, 8, img.tobytes())
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert mmb.sniff_format(progressive) == "jpeg"
    with _pytest.raises(NotImplementedError, match="baseline"):
        mmb.jpeg_decode(progressive)
    corrupt = good[:40] + b"\x00\x01\x02"  # truncated before SOS

    rows = [("ok", bytearray(good)), ("prog", bytearray(progressive)),
            ("bad", bytearray(corrupt))]
    df = spark.createDataFrame(rows, "id string, content binary")
    got = {r["id"] for r in mmb.image_perceptual_hash(df).collect()}
    assert got == {"ok"}


def test_jpeg_phash_matches_png_phash(spark):
    """The planted JPEG fixture encodes the SAME planted bits as the PNG
    fixture at a wider margin — both pipelines must land on identical
    closed-form hashes (cross-codec consistency of the decode ladder)."""
    from blq_cli_spark.gates.multimodal_gates import _planted_images, _planted_jpegs
    from blq_cli_spark.multimodal import binary as mmb

    sf = "/root/testdata/sf0.001"
    png = {
        r["id"][1:]: r["phash"]
        for r in mmb.image_perceptual_hash(_planted_images(spark, sf)).collect()
    }
    jpg = {
        r["id"][1:]: r["phash"]
        for r in mmb.image_perceptual_hash(_planted_jpegs(spark, sf)).collect()
    }
    assert png == jpg and len(png) == 200


def _encode_multicomponent(img, y_sampling=(1, 1)):
    """Test-side 3-component JPEG encoder (Y from `img`, flat Cb=Cr=128
    chroma, all components on the Annex K luminance tables, all-ones
    quant): exercises jpeg_decode's multi-component MCU interleave —
    several Y blocks per MCU under 4:2:0-style sampling, chroma blocks
    entropy-decoded for stream position then skipped."""
    import struct

    import numpy as np

    from blq_cli_spark.multimodal import binary as mmb

    hy, vy = y_sampling
    h, w = img.shape
    # pad Y to MCU multiples (MCU = 8*hy x 8*vy for max-sampled Y)
    mw, mh = 8 * hy, 8 * vy
    bw, bh = -(-w // mw), -(-h // mh)
    padded = np.empty((bh * mh, bw * mw), dtype=np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[-1:, :]
    padded[:, w:] = padded[:, w - 1 : w]

    def build_codes(bits, vals):
        codes, code, vi = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[vals[vi]] = (code, length)
                vi += 1
                code += 1
            code <<= 1
        return codes

    dc = build_codes(mmb._K_DC_BITS, mmb._K_DC_VALS)
    ac = build_codes(mmb._K_AC_BITS, mmb._K_AC_VALS)
    A = mmb._dct8_basis()
    wtr = mmb._JpegBitWriter()
    preds = [0, 0, 0]

    def emit_block(block, ci):
        t = A @ (block - 128.0) @ A.T
        zz = np.round(t.reshape(-1)[mmb._ZIGZAG]).astype(np.int64)
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        cat = abs(diff).bit_length()
        c, ln = dc[cat]
        wtr.write(c, ln)
        if cat:
            wtr.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
        run = 0
        last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac[0xF0]
                wtr.write(c, ln)
                run -= 16
            cat = abs(v).bit_length()
            c, ln = ac[(run << 4) | cat]
            wtr.write(c, ln)
            wtr.write(v if v > 0 else v + (1 << cat) - 1, cat)
            run = 0
        if last_nz < 63:
            c, ln = ac[0x00]
            wtr.write(c, ln)

    flat = np.full((8, 8), 128.0)
    for my in range(bh):
        for mx in range(bw):
            for by in range(vy):          # Y blocks, raster order
                for bx in range(hy):
                    y0 = (my * vy + by) * 8
                    x0 = (mx * hy + bx) * 8
                    emit_block(padded[y0 : y0 + 8, x0 : x0 + 8], 0)
            emit_block(flat, 1)           # Cb
            emit_block(flat, 2)           # Cr
    wtr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    sof_comps = bytes([1, (hy << 4) | vy, 0, 2, 0x11, 0, 3, 0x11, 0])
    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes([1] * 64))
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + sof_comps)
        + seg(0xC4, bytes([0x00]) + mmb._K_DC_BITS + mmb._K_DC_VALS)
        + seg(0xC4, bytes([0x10]) + mmb._K_AC_BITS + mmb._K_AC_VALS)
        + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + bytes(wtr.out)
        + b"\xff\xd9"
    )


def test_jpeg_decode_three_component_444():
    """3-component 4:4:4 stream: luma must round-trip while the chroma
    blocks are entropy-skipped."""
    import numpy as np

    from blq_cli_spark.multimodal import binary as mmb

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    data = _encode_multicomponent(img, y_sampling=(1, 1))
    w, h, px = mmb.jpeg_decode(data)
    assert (w, h) == (24, 16)
    out = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_decode_subsampled_420_luma():
    """4:2:0-style stream (Y sampled 2x2, chroma 1x1): FOUR Y blocks
    per MCU in raster order — exercises the luma placement arithmetic
    and the non-trivial cw/ch crop on non-MCU-multiple dims."""
    import numpy as np

    from blq_cli_spark.multimodal import binary as mmb

    rng = np.random.default_rng(13)
    for shape in ((32, 32), (24, 40), (20, 28)):  # last: non-16-multiples
        img = rng.integers(0, 256, shape).astype(np.uint8)
        data = _encode_multicomponent(img, y_sampling=(2, 2))
        w, h, px = mmb.jpeg_decode(data)
        assert (h, w) == shape
        out = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_single_component_ignores_sampling_factors():
    """T.81 A.2.2: ns=1 scans are NON-interleaved — one data unit per
    MCU in raster order over the component's own block grid, whatever
    sampling factors the SOF declares. A grayscale JPEG re-tagged as
    2x2-sampled must decode identically to its 1x1 original (the
    interleaved geometry would desync the Huffman stream and garble
    pixels silently — reviewer finding)."""
    import numpy as np

    from blq_cli_spark.multimodal import binary as mmb

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    data = mmb.jpeg_encode_gray(40, 24, img.tobytes())
    # the SOF component descriptor is (id=1, HV=0x11, Tq=0); re-tag HV
    sof_comp = bytes([1, 0x11, 0])
    assert data.count(sof_comp) == 1
    retagged = data.replace(sof_comp, bytes([1, 0x22, 0]), 1)
    w, h, px = mmb.jpeg_decode(retagged)
    assert (w, h) == (40, 24)
    out = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_hash_path_skips_all_corrupt_image_rows(spark):
    """Mixed-corpus robustness sweep: rows raising zlib.error (truncated
    PNG IDAT), KeyError (JPEG SOS referencing undefined Huffman/quant
    tables), and ValueError (unknown SOS component) are SKIPPED per row
    by image_perceptual_hash — none may fail the job (reviewer
    finding: the first skip only caught three exception types)."""
    import struct as _s
    import zlib as _z

    import numpy as np

    from blq_cli_spark.multimodal import binary as mmb

    img = np.full((8, 8), 77, dtype=np.uint8)
    good_png = mmb.png_encode(8, 8, img.tobytes())
    good_jpg = mmb.jpeg_encode_gray(8, 8, img.tobytes())

    # valid PNG structure, IDAT holds garbage -> zlib.error
    def chunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(">I", _z.crc32(t + d) & 0xFFFFFFFF)

    bad_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", b"\x01\x02\x03")
        + chunk(b"IEND", b"")
    )
    # JPEG whose SOS points at Huffman table 3 (never defined) -> KeyError
    i = good_jpg.rindex(bytes([1, 0x00, 0, 63, 0]))
    bad_jpg_tbl = good_jpg[:i] + bytes([1, 0x33]) + good_jpg[i + 2 :]
    # JPEG whose SOS names component 9 (not in SOF) -> ValueError
    bad_jpg_comp = good_jpg[:i] + bytes([9, 0x00]) + good_jpg[i + 2 :]

    rows = [
        ("ok_png", bytearray(good_png)),
        ("ok_jpg", bytearray(good_jpg)),
        ("bad_png", bytearray(bad_png)),
        ("bad_tbl", bytearray(bad_jpg_tbl)),
        ("bad_comp", bytearray(bad_jpg_comp)),
    ]
    df = spark.createDataFrame(rows, "id string, content binary")
    got = {r["id"] for r in mmb.image_perceptual_hash(df).collect()}
    assert got == {"ok_png", "ok_jpg"}


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker; the header walk must skip them instead of reading a bogus
    0xFF 'marker' whose seglen comes from the real marker bytes
    (ADVICE r8). Planted fills before DQT, SOF0 and SOS all decode to
    the same pixels as the unpadded stream."""
    import numpy as np

    from blq_cli_spark.multimodal import binary as mmb

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    good = mmb.jpeg_encode_gray(24, 16, img.tobytes())
    base = np.frombuffer(mmb.jpeg_decode(good)[2], dtype=np.uint8)
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xda"):
        padded = good.replace(marker, b"\xff\xff\xff" + marker, 1)
        assert len(padded) > len(good)
        w, h, px = mmb.jpeg_decode(padded)
        assert (w, h) == (24, 16)
        assert np.array_equal(np.frombuffer(px, dtype=np.uint8), base)
