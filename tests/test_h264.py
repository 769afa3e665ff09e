"""H.264 bitstream layer (functions/h264.py): NAL framing, emulation
prevention, Exp-Golomb SPS/PPS/slice-header syntax, avcC records, and
the MP4 integration (avc1 sample entry round-trip + the two video
operators). Fixtures are REAL bitstream bytes from the module's own
writers — encode-to-test-decode, the functions/jpeg.py discipline."""

from __future__ import annotations

import pytest

from tapdata_connectors_spark.functions.h264 import (
    BitReader,
    BitWriter,
    build_avcc,
    build_pps,
    build_slice_nal,
    build_sps,
    decode_slice_data,
    ebsp_to_rbsp,
    join_avcc,
    nal_type,
    parse_avcc,
    parse_pps,
    parse_slice_header,
    parse_sps,
    rbsp_to_ebsp,
    split_annexb,
    split_avcc,
)
from tapdata_connectors_spark.functions.mp4 import (
    avc1_sample_entry,
    mp4_codec_info,
    mux_mp4,
)


def test_exp_golomb_roundtrip():
    w = BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 254, 255, 256, 65535]
    for v in vals:
        w.ue(v)
    svals = [0, 1, -1, 2, -2, 17, -40]
    for v in svals:
        w.se(v)
    r = BitReader(w.rbsp_trailing())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_emulation_prevention_roundtrip():
    # adversarial payloads: raw 00 00 0x sequences must gain 03 stuffing
    # and strip back byte-identically
    for raw in (b"\x00\x00\x00", b"\x00\x00\x01\x00\x00\x02",
                b"\x00\x00\x03\x00\x00", b"A\x00\x00\x00\x00\x01B",
                bytes(range(256)) + b"\x00\x00\x01"):
        eb = rbsp_to_ebsp(raw)
        assert b"\x00\x00\x00" not in eb and b"\x00\x00\x01" not in eb[:-0 or None]
        assert ebsp_to_rbsp(eb) == raw


def test_sps_roundtrip_with_cropping():
    # 100x62 is not macroblock-aligned: the SPS carries REAL cropping
    # fields and the parser's crop arithmetic must recover the true size
    sps = parse_sps(build_sps(100, 62, profile_idc=77, level_idc=31))
    assert (sps["profile_idc"], sps["level_idc"]) == (77, 31)
    assert (sps["width"], sps["height"]) == (100, 62)
    assert sps["log2_max_frame_num"] == 4
    # aligned size: no cropping branch
    sps2 = parse_sps(build_sps(64, 32))
    assert (sps2["width"], sps2["height"]) == (64, 32)
    assert sps2["frame_mbs_only"] == 1


def test_sps_high_profile_branch():
    # hand-write a High-profile SPS (chroma_format_idc path) — the
    # fixture builder stays baseline/main, so emit the bits directly
    w = BitWriter()
    w.u(8, 100).u(8, 0).u(8, 40)      # profile High, level 4.0
    w.ue(0)                           # sps_id
    w.ue(1)                           # chroma_format_idc 4:2:0
    w.ue(0).ue(0)                     # bit depths
    w.u(1, 0)                         # qpprime
    w.u(1, 0)                         # no scaling matrix
    w.ue(0)                           # log2_max_frame_num_minus4
    w.ue(2)                           # poc_type 2
    w.ue(1)                           # max_num_ref_frames
    w.u(1, 0)
    w.ue(7).ue(3)                     # 128x64
    w.u(1, 1).u(1, 1)                 # frame_mbs_only, direct_8x8
    w.u(1, 0)                         # no cropping
    w.u(1, 0)                         # no vui
    nal = b"\x67" + rbsp_to_ebsp(w.rbsp_trailing())
    sps = parse_sps(nal)
    assert sps["profile_idc"] == 100
    assert (sps["width"], sps["height"]) == (128, 64)

    # scaling matrices raise by name
    w2 = BitWriter()
    w2.u(8, 100).u(8, 0).u(8, 40)
    w2.ue(0).ue(1).ue(0).ue(0)
    w2.u(1, 0)
    w2.u(1, 1)                        # seq_scaling_matrix_present
    nal2 = b"\x67" + rbsp_to_ebsp(w2.rbsp_trailing())
    with pytest.raises(NotImplementedError, match="scaling"):
        parse_sps(nal2)


def test_pps_entropy_mode():
    assert parse_pps(build_pps())["entropy_mode"] == "cavlc"
    assert parse_pps(build_pps(entropy_cabac=True))["entropy_mode"] == "cabac"


def test_slice_header_parse():
    sps = parse_sps(build_sps(64, 48))
    idr = parse_slice_header(build_slice_nal(True, 0), sps)
    assert idr == {"idr": True, "first_mb_in_slice": 0, "slice_type": "I",
                   "pps_id": 0, "frame_num": 0}
    p = parse_slice_header(
        build_slice_nal(False, 5, slice_type=0), sps)
    assert (p["idr"], p["slice_type"], p["frame_num"]) == (False, "P", 5)
    with pytest.raises(NotImplementedError, match="CAVLC/CABAC"):
        decode_slice_data(build_slice_nal(True, 0), sps, parse_pps(build_pps()))


def test_nal_framing_annexb_and_avcc():
    nals = [build_sps(64, 48), build_pps(), build_slice_nal(True, 0)]
    annexb = (b"\x00\x00\x00\x01" + nals[0] + b"\x00\x00\x01" + nals[1]
              + b"\x00\x00\x00\x01" + nals[2])
    assert split_annexb(annexb) == nals
    assert [nal_type(n) for n in nals] == [7, 8, 5]
    avcc_stream = join_avcc(nals, 4)
    assert split_avcc(avcc_stream, 4) == nals
    with pytest.raises(ValueError, match="NAL length"):
        split_avcc(b"\x00\x00\x00\xFFxx", 4)


def test_avcc_record_roundtrip():
    sps, pps = build_sps(100, 62), build_pps(entropy_cabac=True)
    rec = parse_avcc(build_avcc(sps, pps, nal_length_size=2))
    assert rec["profile_idc"] == 66 and rec["nal_length_size"] == 2
    assert rec["sps"][0]["width"] == 100
    assert rec["pps"][0]["entropy_mode"] == "cabac"


def _clip(w=100, h=62, pattern=("I", "P", "P", "I", "P")):
    avcc = build_avcc(build_sps(w, h), build_pps())
    samples = [
        join_avcc([build_slice_nal(idr=(s == "I"), frame_num=k,
                                   slice_type=2 if s == "I" else 0)])
        for k, s in enumerate(pattern)
    ]
    return mux_mp4(samples, width=w, height=h,
                   codec_entry=avc1_sample_entry(w, h, avcc))


def test_mp4_codec_info():
    info = mp4_codec_info(_clip())
    assert info["codec"] == "avc1"
    assert info["avcc"]["sps"][0]["width"] == 100
    # non-AVC stsd entries report the fourcc alone
    legacy = mux_mp4([b"x" * 16])
    assert mp4_codec_info(legacy) == {"codec": "mp4v", "avcc": None}


def test_video_codec_meta_and_keyframe_sample(spark):
    from tapdata_connectors_spark.functions.multimodal import (
        video_codec_meta,
        video_keyframe_sample,
    )

    df = spark.createDataFrame(
        [(1, bytearray(_clip())),
         (2, bytearray(_clip(64, 32, ("I", "P"))))],
        "id long, video binary")
    meta = {r["id"]: r.asDict() for r in video_codec_meta(df).collect()}
    assert meta[1]["coded_width"] == 100 and meta[1]["coded_height"] == 62
    assert meta[1]["n_samples"] == 5 and meta[1]["n_keyframes"] == 2
    assert meta[2]["n_keyframes"] == 1
    assert meta[1]["entropy_mode"] == "cavlc"
    assert meta[1]["profile_idc"] == 66

    ks = video_keyframe_sample(df).collect()
    by_id = {}
    for r in ks:
        by_id.setdefault(r["id"], []).append((r["sample_idx"], r["frame_num"]))
    assert sorted(by_id[1]) == [(0, 0), (3, 3)]
    assert sorted(by_id[2]) == [(0, 0)]
