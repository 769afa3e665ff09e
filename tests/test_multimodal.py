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


def test_real_formats_refused():
    for magic in (b"\xff\xd8\xff\xe0", b"\x89PNG\r\n", b"RIFF1234WAVE"):
        with pytest.raises(NotImplementedError, match="library"):
            mm.decode_fimg(magic + b"\x00" * 16)


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
