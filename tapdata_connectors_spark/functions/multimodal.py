"""Multimodal binary-column operators (image / audio / video plumbing).

Media rides the engine the same way `html` does (schema.py: binary
payload column, first-class through fold/merge/DDL): an opaque `binary`
column plus typed metadata, with all per-row work in Arrow-batched pandas
functions via `mapInPandas` — never row-at-a-time Python.

Decode for REAL formats (JPEG/PNG/WAV/MP4) needs PIL/soundfile/av, none
of which exist in this container, so that step is STUBBED: real-format
magic bytes raise NotImplementedError with a clear message. The
deterministic FIMG/FAUD/FVID fake codecs below are fully specified,
header-parsed formats that exercise the entire Spark-side pipeline —
output schema, partitioning, UDF signature, one-to-many Arrow batch
shape — so the plumbing is real and tested even though the pixel decode
is a stand-in.

Fake codec specs (big-endian headers, raw payloads):
  FIMG: b"FIMG" | u16 width | u16 height | width*height grayscale bytes
  FAUD: b"FAUD" | u32 sample_rate | n signed-int16 PCM samples
  FVID: b"FVID" | u16 n_frames | u16 frame_bytes | frames concatenated

Scale notes (100 TB): every operator here is map-only — no shuffle, no
driver round-trip; media bytes stay inside Arrow record batches between
the JVM and the pandas worker. One-to-many ops (frame sampling) return
more rows than they consume, which mapInPandas supports natively — the
fan-out happens inside the task, not via an exploded shuffle.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# magic prefixes of real formats we recognize but cannot decode here
_REAL_MAGICS = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"RIFF": "wav/riff",
    b"\x00\x00\x00\x18ftyp": "mp4",
    b"\x00\x00\x00\x20ftyp": "mp4",
}


def _refuse_real_format(b: bytes) -> None:
    for magic, name in _REAL_MAGICS.items():
        if b.startswith(magic):
            raise NotImplementedError(
                f"decoding real {name} media requires an image/audio library "
                "not present in this environment; only the deterministic "
                "FIMG/FAUD/FVID test codecs decode here"
            )


# ---------------------------------------------------------------------------
# fake codecs (python side — used by tests and the encode stages)
# ---------------------------------------------------------------------------

def encode_fimg(payload: bytes, width: int) -> bytes:
    """Pack bytes as a FIMG grayscale image of the given width; the last
    row is zero-padded to a full width*height rectangle."""
    if not 1 <= width <= 0xFFFF:
        raise ValueError("width out of u16 range")
    height = max(1, -(-len(payload) // width))
    body = payload.ljust(width * height, b"\x00")
    return b"FIMG" + struct.pack(">HH", width, height) + body


def decode_fimg(b: bytes) -> np.ndarray:
    _refuse_real_format(bytes(b[:8]))
    if b[:4] != b"FIMG":
        raise ValueError("not a FIMG blob")
    w, h = struct.unpack(">HH", bytes(b[4:8]))
    px = np.frombuffer(b, dtype=np.uint8, count=w * h, offset=8)
    return px.reshape(h, w)


def encode_faud(samples: "np.ndarray", sample_rate: int) -> bytes:
    return b"FAUD" + struct.pack(">I", sample_rate) + \
        samples.astype(">i2").tobytes()


def decode_faud(b: bytes) -> tuple[int, np.ndarray]:
    _refuse_real_format(bytes(b[:8]))
    if b[:4] != b"FAUD":
        raise ValueError("not a FAUD blob")
    (rate,) = struct.unpack(">I", bytes(b[4:8]))
    return rate, np.frombuffer(b, dtype=">i2", offset=8)


def encode_fvid(frames: list[bytes]) -> bytes:
    if not frames:
        return b"FVID" + struct.pack(">HH", 0, 0)
    fb = len(frames[0])
    if any(len(f) != fb for f in frames):
        raise ValueError("all frames must be the same size")
    return b"FVID" + struct.pack(">HH", len(frames), fb) + b"".join(frames)


def decode_fvid(b: bytes) -> list[bytes]:
    _refuse_real_format(bytes(b[:8]))
    if b[:4] != b"FVID":
        raise ValueError("not a FVID blob")
    n, fb = struct.unpack(">HH", bytes(b[4:8]))
    raw = bytes(b[8:8 + n * fb])
    return [raw[i * fb:(i + 1) * fb] for i in range(n)]


# ---------------------------------------------------------------------------
# mapInPandas operators (the Spark-side plumbing)
# ---------------------------------------------------------------------------

IMAGE_META_SCHEMA = ("id long, width int, height int, n_pixels long, "
                     "sum_px long")


def image_meta(df: DataFrame, id_col: str = "id",
               bin_col: str = "img") -> DataFrame:
    """(id, width, height, n_pixels, sum_px) per FIMG blob — the typed
    metadata extraction stage. Map-only; bytes never leave the task."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                px = decode_fimg(b)
                rows.append((i, px.shape[1], px.shape[0], px.size,
                             int(px.sum(dtype=np.int64))))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "n_pixels", "sum_px"]
            )

    return df.mapInPandas(gen, IMAGE_META_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  id_col: str = "id", bin_col: str = "img") -> DataFrame:
    """Nearest-neighbor resize of FIMG blobs to (out_w, out_h) — the
    resize math is real numpy over the decoded pixel grid; a PIL-backed
    path for real formats would slot into decode_fimg's dispatch."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                px = decode_fimg(b)
                h, w = px.shape
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                res = px[np.ix_(ys, xs)]
                out.append((i, encode_fimg(res.tobytes(), out_w)))
            yield pd.DataFrame(out, columns=["id", "img"])

    return df.mapInPandas(gen, "id long, img binary")


def audio_meta(df: DataFrame, id_col: str = "id",
               bin_col: str = "audio") -> DataFrame:
    """(id, sample_rate, n_samples, sumsq) per FAUD blob. sumsq (exact
    int64 sum of squared samples) is the RMS precursor kept integral so
    any engine reproduces it bit-for-bit."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                rate, s = decode_faud(b)
                s64 = s.astype(np.int64)
                rows.append((i, rate, len(s), int((s64 * s64).sum())))
            yield pd.DataFrame(
                rows, columns=["id", "sample_rate", "n_samples", "sumsq"]
            )

    return df.mapInPandas(gen, "id long, sample_rate int, n_samples long, sumsq long")


def sample_frames(df: DataFrame, stride: int = 4, id_col: str = "id",
                  bin_col: str = "video") -> DataFrame:
    """Every stride-th frame of each FVID blob as its own row
    (id, frame_idx, frame, frame_md5) — the one-to-many batch shape:
    mapInPandas emits more rows than it consumes, inside the task."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                for idx, fr in enumerate(decode_fvid(b)):
                    if idx % stride == 0:
                        rows.append((i, idx, fr, hashlib.md5(fr).hexdigest()))
            yield pd.DataFrame(
                rows, columns=["id", "frame_idx", "frame", "frame_md5"]
            )

    return df.mapInPandas(
        gen, "id long, frame_idx int, frame binary, frame_md5 string"
    )
