"""Multimodal binary-column operators (image / audio / video plumbing).

Media rides the engine the same way `html` does (schema.py: binary
payload column, first-class through fold/merge/DDL): an opaque `binary`
column plus typed metadata, with all per-row work in Arrow-batched pandas
functions via `mapInPandas` — never row-at-a-time Python.

REAL-format decode, stdlib/numpy-only (no PIL/soundfile/av in this
container):

  - WAV (PCM-16) decodes via the stdlib `wave` module — decode_faud
    dispatches on the RIFF/WAVE magic and yields the same
    (sample_rate, int16 samples) contract as FAUD.
  - PNG (8-bit, non-interlaced, grayscale/RGB/RGBA) decodes via stdlib
    `zlib` + hand-rolled scanline de-filtering (all five PNG filter
    types) — decode_fimg dispatches on the PNG magic and yields the
    grayscale pixel grid (color converts by integer BT.601 luma, so the
    result is bit-deterministic on every platform).
  - JPEG (baseline SOF0 AND progressive SOF2 — spectral selection and
    successive approximation — gray or any chroma sampling, restart
    markers) decodes via functions/jpeg.py — marker parse, canonical
    Huffman, dequant, float64 IDCT; yields the luma plane. Remaining
    gates are rare SOF types (lossless/hierarchical), by name.
  - MP4 DEMUXES via functions/mp4.py — box tree + stsz/stsc/stco sample
    resolution; decode_fvid yields the encoded access units as frames
    (what a downstream codec/GPU tier consumes — H.264 slice-DATA
    entropy decode genuinely needs a codec library and stays gated,
    though the bitstream layer above it — SPS/PPS/avcC/slice headers —
    parses via functions/h264.py). Fragmented MP4 (moof/tfhd/tfdt/trun)
    resolves samples across fragments since round 5.

The deterministic FIMG/FAUD/FVID fake codecs below remain the
fully-specified fixtures that exercise the entire Spark-side pipeline —
output schema, partitioning, UDF signature, one-to-many Arrow batch
shape — independent of any real container format.

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

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_JPEG_MAGIC = b"\xff\xd8\xff"


def _is_mp4(b: bytes) -> bool:
    return len(b) >= 8 and bytes(b[4:8]) == b"ftyp"


def _decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """PCM-16 WAV via stdlib `wave`: (sample_rate, int16 samples). Multi-
    channel audio yields channel 0 (deterministic; a mixdown would be a
    policy choice, not a decode)."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(b))) as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only PCM-16 WAV decodes here (got {8 * w.getsampwidth()}-bit)"
            )
        rate = w.getframerate()
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    s = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        s = np.ascontiguousarray(s.reshape(-1, nch)[:, 0])
    return rate, s


def _decode_png(b: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG (grayscale / RGB / RGBA, color types
    0/2/6) via stdlib zlib + scanline de-filtering (all five PNG filter
    types: None/Sub/Up/Average/Paeth). Color converts to grayscale with
    integer BT.601 luma ((299r+587g+114b)//1000) so results are
    bit-deterministic. The per-pixel de-filter loop is the decode itself
    (filters are serial along a scanline), not serde overhead."""
    if bytes(b[:8]) != _PNG_MAGIC:
        raise ValueError("not a PNG blob")
    import zlib

    pos, idat = 8, b""
    w = h = bd = ct = interlace = None
    data = bytes(b)
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, bd, ct, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if bd != 8 or ct not in (0, 2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced gray/RGB/RGBA PNG decodes here "
            f"(bit_depth={bd}, color_type={ct}, interlace={interlace})"
        )
    nch = {0: 1, 2: 3, 6: 4}[ct]
    stride = w * nch
    raw = zlib.decompress(idat)
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        line = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
        p += 1 + stride
        if f == 1:  # Sub: serial along the line
            for i in range(nch, stride):
                line[i] = (int(line[i]) + int(line[i - nch])) & 0xFF
        elif f == 2:  # Up: vectorized (uint8 wraps mod 256)
            line += prev
        elif f == 3:  # Average
            for i in range(stride):
                a = int(line[i - nch]) if i >= nch else 0
                line[i] = (int(line[i]) + (a + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - nch]) if i >= nch else 0
                bb = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                pp = a + bb - c
                pa, pb, pc = abs(pp - a), abs(pp - bb), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                line[i] = (int(line[i]) + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = line
        prev = line
    px = out.reshape(h, w, nch)
    if ct == 0:
        return px[:, :, 0]
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    bl = px[:, :, 2].astype(np.int64)
    return ((r * 299 + g * 587 + bl * 114) // 1000).astype(np.uint8)


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
    if bytes(b[:8]) == _PNG_MAGIC:
        return _decode_png(b)
    if bytes(b[:3]) == _JPEG_MAGIC:
        from tapdata_connectors_spark.functions.jpeg import decode_jpeg_luma

        return decode_jpeg_luma(b)
    if _is_mp4(b):
        raise ValueError("blob is an MP4 video, not an image")
    if b[:4] != b"FIMG":
        raise ValueError("not a FIMG blob")
    w, h = struct.unpack(">HH", bytes(b[4:8]))
    px = np.frombuffer(b, dtype=np.uint8, count=w * h, offset=8)
    return px.reshape(h, w)


def encode_faud(samples: "np.ndarray", sample_rate: int) -> bytes:
    return b"FAUD" + struct.pack(">I", sample_rate) + \
        samples.astype(">i2").tobytes()


def decode_faud(b: bytes) -> tuple[int, np.ndarray]:
    if bytes(b[:4]) == b"RIFF" and bytes(b[8:12]) == b"WAVE":
        return _decode_wav(b)
    if bytes(b[:3]) == _JPEG_MAGIC or bytes(b[:8]) == _PNG_MAGIC or _is_mp4(b):
        raise ValueError("blob is image/video media, not audio")
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
    if _is_mp4(b):
        from tapdata_connectors_spark.functions.mp4 import mp4_samples

        # frames = the track's encoded access units in decode order (the
        # demux contract — see functions/mp4.py; timestamps via mp4_samples)
        return [s for _, s in mp4_samples(b)]
    if bytes(b[:3]) == _JPEG_MAGIC or bytes(b[:8]) == _PNG_MAGIC:
        raise ValueError("blob is an image, not a video")
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
    """(id, width, height, n_pixels, sum_px) per FIMG/PNG blob — the
    typed metadata extraction stage. Map-only; bytes never leave the
    task. The per-row loop inside each Arrow batch IS the decode
    (variable-length binary cannot vectorize across rows); serde stays
    batched through Arrow either way."""
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


def video_meta(df: DataFrame, id_col: str = "id",
               bin_col: str = "video") -> DataFrame:
    """(id, width, height, timescale, duration, n_samples) per video blob.
    MP4 containers are demuxed for real (functions/mp4.mp4_meta: tkhd
    16.16 dims, mdhd timescale/duration, stsz sample count); FVID fixture
    blobs report their frame count with container fields null. Map-only
    mapInPandas — the moov box is parsed per row inside the task, bytes
    never shuffle."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                if _is_mp4(bytes(b[:16])):
                    from tapdata_connectors_spark.functions.mp4 import mp4_meta
                    m = mp4_meta(b)
                    rows.append((i, m["width"], m["height"], m["timescale"],
                                 m["duration"], m["n_samples"]))
                else:
                    rows.append((i, None, None, None, None,
                                 len(decode_fvid(b))))
            yield pd.DataFrame(rows, columns=[
                "id", "width", "height", "timescale", "duration", "n_samples"
            ])

    return df.mapInPandas(
        gen,
        "id long, width int, height int, timescale int, duration long, "
        "n_samples long",
    )


def video_codec_meta(df: DataFrame, id_col: str = "id",
                     bin_col: str = "video") -> DataFrame:
    """(id, codec, profile_idc, level_idc, coded_width, coded_height,
    entropy_mode, n_samples, n_keyframes) per MP4 blob — BITSTREAM-level
    metadata, not container fields: for avc1 tracks the dimensions come
    from the SPS itself (functions/h264.parse_sps crop arithmetic), the
    entropy mode from the PPS, and keyframes from per-sample NAL walks
    (nal_unit_type 5 = IDR) using the avcC's NAL length size. Exactly
    what a training pipeline filters/samples on: resolution from the
    stream (container lies happen), GOP keyframe density, CABAC-vs-CAVLC
    as a transcode-cost proxy. Non-AVC tracks report their fourcc with
    codec fields null. Map-only mapInPandas; bytes never shuffle."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tapdata_connectors_spark.functions.h264 import (
            nal_type,
            split_avcc,
        )
        from tapdata_connectors_spark.functions.mp4 import (
            mp4_codec_info,
            mp4_samples,
        )

        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                info = mp4_codec_info(b)
                samples = mp4_samples(b)
                if info["avcc"] is None:
                    rows.append((i, info["codec"], None, None, None, None,
                                 None, len(samples), None))
                    continue
                rec = info["avcc"]
                sps = rec["sps"][0]
                nks = 0
                for _, sb in samples:
                    if any(nal_type(n) == 5
                           for n in split_avcc(sb, rec["nal_length_size"])):
                        nks += 1
                rows.append((
                    i, info["codec"], rec["profile_idc"], rec["level_idc"],
                    sps["width"], sps["height"],
                    rec["pps"][0]["entropy_mode"], len(samples), nks,
                ))
            yield pd.DataFrame(rows, columns=[
                "id", "codec", "profile_idc", "level_idc", "coded_width",
                "coded_height", "entropy_mode", "n_samples", "n_keyframes",
            ])

    return df.mapInPandas(
        gen,
        "id long, codec string, profile_idc int, level_idc int, "
        "coded_width int, coded_height int, entropy_mode string, "
        "n_samples long, n_keyframes long",
    )


def video_keyframe_sample(df: DataFrame, id_col: str = "id",
                          bin_col: str = "video") -> DataFrame:
    """One row per IDR access unit: (id, sample_idx, ts, frame_num,
    n_bytes) — keyframe-only frame sampling, the decode-cheap selection a
    video training pipeline extracts stills at (an IDR decodes without
    reference frames). Slice headers parse for real (frame_num from the
    SPS-specified field width); the residual decode stays gated
    (functions/h264.decode_slice_data). One-to-many map-only
    mapInPandas — the fan-out happens inside the task."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tapdata_connectors_spark.functions.h264 import (
            nal_type,
            parse_slice_header,
            split_avcc,
        )
        from tapdata_connectors_spark.functions.mp4 import (
            mp4_codec_info,
            mp4_samples,
        )

        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                rec = mp4_codec_info(b)["avcc"]
                if rec is None:
                    raise ValueError(
                        "video_keyframe_sample needs an avc1/avc3 track")
                sps = rec["sps"][0]
                for idx, (ts, sb) in enumerate(mp4_samples(b)):
                    for n in split_avcc(sb, rec["nal_length_size"]):
                        if nal_type(n) == 5:
                            h = parse_slice_header(n, sps)
                            rows.append((i, idx, ts, h["frame_num"],
                                         len(sb)))
                            break
            yield pd.DataFrame(rows, columns=[
                "id", "sample_idx", "ts", "frame_num", "n_bytes"])

    return df.mapInPandas(
        gen,
        "id long, sample_idx int, ts long, frame_num int, n_bytes long",
    )
