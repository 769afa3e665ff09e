"""Multimodal binary-column plumbing (functions/multimodal.py) vs exact
Python oracles: FIMG/FAUD/FVID codec roundtrips, mapInPandas schema and
one-to-many batch shape, nearest-neighbor resize math, and the explicit
real-format refusal (decode libs absent in this container)."""

from __future__ import annotations

import hashlib
import random
import struct

import numpy as np
import pytest
from pyspark.sql import Row

from tapdata_connectors_spark.functions import multimodal as mm


def _blob(i: int, n: int) -> bytes:
    rng = random.Random(i)
    return bytes(rng.randrange(256) for _ in range(n))


# ---------------------------------------------------------------------------
# codecs (pure python)
# ---------------------------------------------------------------------------

def test_fimg_roundtrip_and_padding():
    payload = _blob(1, 103)
    b = mm.encode_fimg(payload, width=10)
    px = mm.decode_fimg(b)
    assert px.shape == (11, 10)  # ceil(103/10) rows, zero-padded
    assert bytes(px.reshape(-1)[:103]) == payload
    assert int(px.reshape(-1)[103:].sum()) == 0


def test_faud_roundtrip():
    s = np.array([0, 1, -1, 32767, -32768, 123], dtype=np.int64)
    rate, out = mm.decode_faud(mm.encode_faud(s, 44100))
    assert rate == 44100
    assert list(out.astype(np.int64)) == list(s)


def test_fvid_roundtrip():
    frames = [_blob(i, 16) for i in range(7)]
    assert mm.decode_fvid(mm.encode_fvid(frames)) == frames
    assert mm.decode_fvid(mm.encode_fvid([])) == []


def test_cross_modality_blobs_fail_loudly():
    # round 4: JPEG decodes and MP4 demuxes (tests below) — what remains
    # refused is the WRONG modality reaching a decoder
    with pytest.raises(ValueError, match="not an image"):
        mm.decode_fimg(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not audio"):
        mm.decode_faud(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not a video"):
        mm.decode_fvid(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


# ---------------------------------------------------------------------------
# real-format stdlib decode: PNG (zlib) and WAV (wave)
# ---------------------------------------------------------------------------

def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def _encode_png(px: np.ndarray, filters: list[int]) -> bytes:
    """In-test PNG encoder (the independent forward direction of the
    engine's de-filter): applies the given per-scanline filter types and
    zlib-compresses. px is HxW (gray) or HxWxC uint8."""
    import zlib

    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    ct = {1: 0, 3: 2, 4: 6}[nch]
    flat = px.reshape(h, w * nch).astype(np.int64)
    stride = w * nch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y, f in zip(range(h), filters):
        line = flat[y]
        enc = np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            a = int(line[i - nch]) if i >= nch else 0
            b = int(prev[i])
            c = int(prev[i - nch]) if i >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:  # Paeth
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (int(line[i]) - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def test_png_gray_decode_all_filters():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 9), dtype=np.uint8)
    blob = _encode_png(px, filters=[0, 1, 2, 3, 4])
    got = mm.decode_fimg(blob)
    assert np.array_equal(got, px)


def test_png_rgb_and_rgba_decode_to_luma():
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    lum = ((rgb[:, :, 0].astype(np.int64) * 299
            + rgb[:, :, 1].astype(np.int64) * 587
            + rgb[:, :, 2].astype(np.int64) * 114) // 1000).astype(np.uint8)
    assert np.array_equal(mm.decode_fimg(_encode_png(rgb, [4, 1, 2, 3])), lum)
    rgba = np.dstack([rgb, np.full((4, 6), 200, np.uint8)])
    assert np.array_equal(mm.decode_fimg(_encode_png(rgba, [2, 4, 0, 1])), lum)


def test_png_unsupported_shapes_raise():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(2, 2), dtype=np.uint8)
    blob = bytearray(_encode_png(px, [0, 0]))
    # flip IHDR bit depth to 16 (offset: 8 magic + 8 len/type + 8 w/h)
    blob[8 + 8 + 8] = 16
    with pytest.raises(NotImplementedError, match="bit_depth=16"):
        mm.decode_fimg(bytes(blob))


def _encode_wav(samples: np.ndarray, rate: int, nch: int = 1) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_mono_decode():
    s = (np.arange(300) * 37 % 20000 - 10000).astype(np.int16)
    rate, got = mm.decode_faud(_encode_wav(s, 16000))
    assert rate == 16000
    assert np.array_equal(got, s)


def test_wav_stereo_takes_channel0():
    left = (np.arange(64) * 11 - 300).astype(np.int16)
    right = (np.arange(64) * -7 + 100).astype(np.int16)
    inter = np.empty(128, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    rate, got = mm.decode_faud(_encode_wav(inter, 8000, nch=2))
    assert rate == 8000
    assert np.array_equal(got, left)


def test_mixed_png_fimg_column_through_spark(spark):
    """Dispatch works inside the mapInPandas operator: one binary column
    carrying both PNG and FIMG blobs decodes row-by-row by magic."""
    rng = np.random.RandomState(5)
    rows, expect = [], {}
    for i in range(6):
        px = rng.randint(0, 256, size=(3 + i, 5), dtype=np.uint8)
        if i % 2 == 0:
            blob = _encode_png(px, filters=[(y % 5) for y in range(3 + i)])
        else:
            blob = mm.encode_fimg(px.tobytes(), width=5)
        rows.append(Row(id=i, img=blob))
        expect[i] = (5, 3 + i, px.size, int(px.sum(dtype=np.int64)))
    out = mm.image_meta(spark.createDataFrame(rows).repartition(3)).collect()
    got = {r["id"]: (r["width"], r["height"], r["n_pixels"], r["sum_px"])
           for r in out}
    assert got == expect


def test_wav_through_audio_meta_spark(spark):
    rows, expect = [], {}
    for i in range(4):
        s = (np.arange(50 + i) * (13 + i) % 9000 - 4500).astype(np.int16)
        blob = _encode_wav(s, 8000 + i) if i % 2 == 0 else mm.encode_faud(s, 8000 + i)
        rows.append(Row(id=i, audio=blob))
        s64 = s.astype(np.int64)
        expect[i] = (8000 + i, len(s), int((s64 * s64).sum()))
    out = mm.audio_meta(spark.createDataFrame(rows).repartition(2)).collect()
    got = {r["id"]: (r["sample_rate"], r["n_samples"], r["sumsq"]) for r in out}
    assert got == expect


# ---------------------------------------------------------------------------
# mapInPandas operators (Spark plumbing + oracles)
# ---------------------------------------------------------------------------

def _img_df(spark, n=23):
    rows = []
    for i in range(n):
        payload = _blob(i, 50 + 17 * i)
        rows.append(Row(id=i, img=mm.encode_fimg(payload, width=7 + i % 5)))
    # several partitions so mapInPandas sees multiple Arrow batches
    return spark.createDataFrame(rows).repartition(4), rows


def test_image_meta_matches_python_oracle(spark):
    df, rows = _img_df(spark)
    got = {r["id"]: r for r in mm.image_meta(df).collect()}
    assert len(got) == len(rows)
    for r in rows:
        px = mm.decode_fimg(r.img)
        g = got[r.id]
        assert (g["width"], g["height"]) == (px.shape[1], px.shape[0])
        assert g["n_pixels"] == px.size
        assert g["sum_px"] == int(px.sum(dtype=np.int64))


def test_resize_images_nearest_neighbor(spark):
    df, rows = _img_df(spark, n=9)
    out = {r["id"]: r["img"] for r in mm.resize_images(df, 5, 4).collect()}
    for r in rows:
        px = mm.decode_fimg(r.img)
        h, w = px.shape
        ys = (np.arange(4) * h) // 4
        xs = (np.arange(5) * w) // 5
        assert np.array_equal(mm.decode_fimg(out[r.id]), px[np.ix_(ys, xs)])


def test_audio_meta_sumsq(spark):
    rng = random.Random(42)
    rows = []
    for i in range(11):
        s = np.array([rng.randrange(-32768, 32768) for _ in range(30 + i)],
                     dtype=np.int64)
        rows.append((i, s, mm.encode_faud(s, 8000 + i)))
    df = spark.createDataFrame([Row(id=i, audio=b) for i, _, b in rows])
    got = {r["id"]: r for r in mm.audio_meta(df).collect()}
    for i, s, _ in rows:
        g = got[i]
        assert (g["sample_rate"], g["n_samples"]) == (8000 + i, len(s))
        assert g["sumsq"] == int((s * s).sum())


def test_sample_frames_one_to_many_shape(spark):
    vids = []
    for i in range(6):
        frames = [_blob(100 * i + j, 16) for j in range(3 * i)]  # 0..15 frames
        vids.append((i, frames))
    df = spark.createDataFrame(
        [Row(id=i, video=mm.encode_fvid(f)) for i, f in vids]
    ).repartition(3)
    out = mm.sample_frames(df, stride=4).collect()
    expect = {
        (i, idx): hashlib.md5(fr).hexdigest()
        for i, frames in vids
        for idx, fr in enumerate(frames) if idx % 4 == 0
    }
    assert {(r["id"], r["frame_idx"]): r["frame_md5"] for r in out} == expect
    # binary frame column survives the Arrow roundtrip byte-exact
    for r in out:
        assert hashlib.md5(bytes(r["frame"])).hexdigest() == r["frame_md5"]


def test_fvid_header_guards():
    with pytest.raises(ValueError, match="same size"):
        mm.encode_fvid([b"aa", b"bbb"])
    with pytest.raises(ValueError, match="FVID"):
        mm.decode_fvid(b"FIMG" + struct.pack(">HH", 1, 1) + b"x")


def test_documents_text_is_ascii():
    """Oracle-parity precondition for the multimodal registry queries: the
    DuckDB oracles (SQL_MULTIMODAL_IMAGE_META / _FRAME_SAMPLE) read
    documents.text with CHARACTER semantics while Spark packs utf-8
    BYTES; they agree iff text is pure ASCII. Assert that invariant so a
    fixture change fails HERE, not as a silent oracle divergence (see the
    note above SQL_MULTIMODAL_IMAGE_META in queries.py)."""
    import os

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' "
        "WHERE octet_length(encode(text)) <> length(text)"
    ).fetchone()[0]
    assert n == 0, f"{n} documents contain non-ASCII text; multimodal oracles diverge"


# ---------------------------------------------------------------------------
# real-format decode round 4: baseline JPEG (functions/jpeg.py) and MP4
# demux (functions/mp4.py) — pure numpy/stdlib, round-tripped against the
# module's own fixture encoder/muxer (this container has no other codec)
# ---------------------------------------------------------------------------

def _grad(h, w):
    return (np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256).astype(
        np.uint8
    )


def test_jpeg_gray_roundtrip_within_quantization_error():
    from tapdata_connectors_spark.functions.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )

    y = _grad(24, 17)  # non-multiple-of-8 dims exercise edge padding/crop
    b = encode_jpeg([y])
    assert b[:3] == b"\xff\xd8\xff" and b[-2:] == b"\xff\xd9"
    dec = decode_jpeg_luma(b)
    assert dec.shape == y.shape and dec.dtype == np.uint8
    # flat quant table 16 bounds the per-pixel error tightly
    assert int(np.abs(dec.astype(int) - y.astype(int)).max()) <= 8
    # determinism: identical bytes -> identical pixels
    assert np.array_equal(decode_jpeg_luma(b), dec)


def test_jpeg_color_444_returns_luma():
    from tapdata_connectors_spark.functions.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )

    y = _grad(16, 16)
    cb = np.full_like(y, 90)
    cr = y[::-1].copy()
    dec = decode_jpeg_luma(encode_jpeg([y, cb, cr]))
    # chroma blocks are entropy-decoded then discarded; output is Y
    assert int(np.abs(dec.astype(int) - y.astype(int)).max()) <= 8


def test_jpeg_restart_markers():
    from tapdata_connectors_spark.functions.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )

    y = _grad(24, 24)
    plain = decode_jpeg_luma(encode_jpeg([y]))
    with_rst = decode_jpeg_luma(encode_jpeg([y], restart_interval=2))
    # DRI/RSTn change the bitstream layout, never the pixels
    assert np.array_equal(plain, with_rst)


def test_jpeg_flat_block_exact_and_rare_sof_rejected():
    from tapdata_connectors_spark.functions.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
    )

    flat = np.full((16, 16), 200, np.uint8)
    b = encode_jpeg([flat])
    assert np.array_equal(decode_jpeg_luma(b), flat)  # DC-only: exact
    lossless = bytearray(b)
    lossless[lossless.find(b"\xff\xc0") + 1] = 0xC3  # SOF3 lossless
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg_luma(bytes(lossless))


def test_jpeg_progressive_roundtrip_equals_baseline():
    """Progressive (SOF2) decode: the libjpeg-style scan script —
    interleaved DC + spectral bands with two successive-approximation
    levels — reconstructs pixels IDENTICAL to the baseline encoding of
    the same image (the coefficient planes are equal by construction),
    for grayscale, non-8-aligned shapes, and 4:4:4 color."""
    from tapdata_connectors_spark.functions.jpeg import (
        decode_jpeg_luma,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(7)
    for shape in ((16, 16), (24, 17), (8, 8)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        base = decode_jpeg_luma(encode_jpeg([img]))
        prog = decode_jpeg_luma(encode_jpeg_progressive([img]))
        assert np.array_equal(prog, base), shape
    planes = [rng.randint(0, 256, (16, 24)).astype(np.uint8)
              for _ in range(3)]
    assert np.array_equal(
        decode_jpeg_luma(encode_jpeg_progressive(planes)),
        decode_jpeg_luma(encode_jpeg(planes)),
    )


def test_jpeg_progressive_zrl_refinement_with_correction_bits():
    """Adversarial refinement bitstream: a coefficient that becomes
    significant only at the last approximation level, preceded by a
    32-zero run AND an earlier already-significant coefficient in the
    same band — forces ZRL emission inside an AC refinement scan with
    pending correction bits, the exact interleaving a naive encoder
    desyncs on (correction bits must never span a ZRL's 16-zero span).
    Plus a randomized sweep across shapes and quant scales."""
    from tapdata_connectors_spark.functions import jpeg

    def img_from_zz(zzvals, qt_val=8):
        d = np.zeros((8, 8))
        for i, (r, c) in enumerate(jpeg._ZZ):
            d[r, c] = zzvals.get(i, 0) * qt_val
        px = jpeg._A @ d @ jpeg._A.T + 128.0
        return np.clip(np.round(px), 0, 255).astype(np.uint8)

    qt = np.full(64, 8, np.uint16)
    img = img_from_zz({0: 4, 5: 5, 7: 5, 40: 1})
    assert np.array_equal(
        jpeg.decode_jpeg_luma(jpeg.encode_jpeg_progressive([img], qt=qt)),
        jpeg.decode_jpeg_luma(jpeg.encode_jpeg([img], qt=qt)),
    )
    rng = np.random.RandomState(123)
    for _ in range(25):
        h, w = rng.randint(8, 40), rng.randint(8, 40)
        q = np.full(64, int(rng.choice([2, 8, 64])), np.uint16)
        im = rng.randint(0, 256, (h, w)).astype(np.uint8)
        assert np.array_equal(
            jpeg.decode_jpeg_luma(jpeg.encode_jpeg_progressive([im], qt=q)),
            jpeg.decode_jpeg_luma(jpeg.encode_jpeg([im], qt=q)),
        )


def test_jpeg_through_image_meta_and_resize_spark(spark):
    from tapdata_connectors_spark.functions.jpeg import encode_jpeg

    planes = {i: _grad(16 + 8 * i, 24) for i in range(3)}
    rows = [Row(id=i, img=bytearray(encode_jpeg([p])))
            for i, p in planes.items()]
    df = spark.createDataFrame(rows)
    got = {r["id"]: r for r in mm.image_meta(df).collect()}
    for i, p in planes.items():
        assert (got[i]["width"], got[i]["height"]) == (24, 16 + 8 * i)
        # sum over decoded luma equals the python-side decode exactly
        assert got[i]["sum_px"] == int(
            mm.decode_fimg(bytes(rows[i]["img"])).sum(dtype=np.int64)
        )
    res = {r["id"]: r for r in mm.resize_images(df, 8, 8).collect()}
    for i in planes:
        assert mm.decode_fimg(bytes(res[i]["img"])).shape == (8, 8)


def test_mp4_demux_meta_samples_timestamps():
    from tapdata_connectors_spark.functions.mp4 import (
        mp4_meta,
        mp4_samples,
        mux_mp4,
    )

    frames = [bytes([i]) * (10 + i) for i in range(7)]
    b = mux_mp4(frames, width=320, height=240, timescale=1000,
                sample_delta=40)
    assert b[:8] == b"\x00\x00\x00\x18ftyp"  # standard magic holds
    assert mp4_meta(b) == {"width": 320, "height": 240, "timescale": 1000,
                           "duration": 280, "n_samples": 7}
    s = mp4_samples(b)
    assert [f for _, f in s] == frames
    assert [t for t, _ in s] == [40 * i for i in range(7)]


def test_mp4_fragmented_roundtrip():
    """fMP4 (moof fragments — the DASH/HLS segment shape): samples
    resolve from tfhd/tfdt/trun with trex defaults; timestamps carry
    across fragments; meta counts fragment samples (the moov stbl is
    empty in fMP4 by construction)."""
    from tapdata_connectors_spark.functions.mp4 import (
        mp4_meta,
        mp4_samples,
        mux_fmp4,
    )

    frames = [bytes([i]) * (10 + 3 * i) for i in range(5)]
    b = mux_fmp4(frames, width=320, height=240, timescale=1000,
                 sample_delta=40, frag_size=2)
    meta = mp4_meta(b)
    assert (meta["width"], meta["height"], meta["n_samples"]) == (320, 240, 5)
    s = mp4_samples(b)
    assert [bs for _, bs in s] == frames
    assert [t for t, _ in s] == [0, 40, 80, 120, 160]


def test_mp4_fragmented_without_moov_rejected():
    from tapdata_connectors_spark.functions.mp4 import mp4_samples

    moof = struct.pack(">I", 8) + b"moof"
    frag = (struct.pack(">I", 0x18) + b"ftyp" + b"isom" + b"\x00" * 4
            + b"isomiso2" + moof)
    with pytest.raises(ValueError, match="moov"):
        mp4_samples(frag)


def test_mp4_through_sample_frames_spark(spark):
    from tapdata_connectors_spark.functions.mp4 import mux_mp4

    frames = [hashlib.md5(bytes([i])).digest() for i in range(9)]
    df = spark.createDataFrame(
        [Row(id=1, video=bytearray(mux_mp4(frames)))]
    )
    got = mm.sample_frames(df, stride=4).collect()
    # every 4th encoded access unit, one row per frame, inside the task
    assert [(r["id"], r["frame_idx"]) for r in got] == [(1, 0), (1, 4), (1, 8)]
    for r in got:
        assert bytes(r["frame"]) == frames[r["frame_idx"]]
        assert r["frame_md5"] == hashlib.md5(frames[r["frame_idx"]]).hexdigest()


def test_video_meta_mp4_and_fvid(spark):
    from pyspark.sql import Row

    from tapdata_connectors_spark.functions.mp4 import mux_mp4
    from tapdata_connectors_spark.functions.multimodal import encode_fvid, video_meta

    frames = [bytes([i]) * 16 for i in range(6)]
    df = spark.createDataFrame([
        Row(id=1, video=bytearray(mux_mp4(frames, width=320, height=240,
                                          timescale=90000, sample_delta=3000))),
        Row(id=2, video=bytearray(encode_fvid(frames))),
    ])
    rows = {r.id: r for r in video_meta(df).collect()}
    m = rows[1]
    assert (m.width, m.height, m.timescale) == (320, 240, 90000)
    assert m.duration == 6 * 3000 and m.n_samples == 6
    f = rows[2]
    assert f.width is None and f.timescale is None and f.n_samples == 6
