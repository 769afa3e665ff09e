"""H.264 / AVC bitstream-level parse, stdlib-only (Rec. ITU-T H.264).

The metadata half of the named codec gap: NAL unit framing (Annex B
start codes and AVCC length prefixes), emulation-prevention handling,
Exp-Golomb entropy for the PARAMETER-SET layer, SPS/PPS/slice-HEADER
syntax, and the avcC decoder-configuration record — everything a
training-data pipeline needs to answer "what resolution/profile is this
clip, where are its keyframes, what does its GOP look like" without a
codec library. Entropy decode of slice DATA (CAVLC/CABAC residuals) is
the genuinely-library-shaped half and stays gated: feeding slice payload
into anything here raises by name, never guesses.

Syntax followed: 7.3.1 (NAL), 7.3.2.1.1 (SPS), 7.3.2.2 (PPS), 7.3.3
(slice header), ISO/IEC 14496-15 §5.2.4.1 (avcC). High-profile SPS
extras (chroma_format_idc etc.) parse; seq_scaling_matrix raises by
name. The fixture writers at the bottom emit real conformant bitstream
bytes for the parser-visible layer (headers + RBSP trailing), with stub
slice-data payloads — the same encode-to-test-decode discipline as
functions/jpeg.encode_jpeg.
"""

from __future__ import annotations

import struct

_HIGH_PROFILES = frozenset(
    (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135))

SLICE_TYPE_NAMES = {0: "P", 1: "B", 2: "I", 3: "SP", 4: "SI"}


def ebsp_to_rbsp(data: bytes) -> bytes:
    """Strip emulation-prevention bytes: 00 00 03 -> 00 00 (7.4.1)."""
    return bytes(data).replace(b"\x00\x00\x03", b"\x00\x00")


def rbsp_to_ebsp(data: bytes) -> bytes:
    """Insert emulation prevention: any 00 00 0[0-3] gets 03 stuffed."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class BitReader:
    """MSB-first bit reader over an RBSP with Exp-Golomb (9.1)."""

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self._d[self._pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class BitWriter:
    """MSB-first bit writer with Exp-Golomb — the fixture encoder."""

    def __init__(self):
        self._bits: list[int] = []

    def u(self, n: int, v: int) -> "BitWriter":
        for i in range(n - 1, -1, -1):
            self._bits.append((v >> i) & 1)
        return self

    def ue(self, v: int) -> "BitWriter":
        k = v + 1
        n = k.bit_length()
        return self.u(2 * n - 1, k)

    def se(self, v: int) -> "BitWriter":
        return self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self) -> bytes:
        """Stop bit + zero-pad to a byte boundary (7.3.2.11)."""
        self._bits.append(1)
        while len(self._bits) % 8:
            self._bits.append(0)
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            b = 0
            for bit in self._bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


# ---------------------------------------------------------------------------
# NAL framing
# ---------------------------------------------------------------------------

def split_annexb(data: bytes) -> list[bytes]:
    """NAL units from an Annex-B byte stream (00 00 01 / 00 00 00 01
    start codes), start codes removed."""
    data = bytes(data)
    out = []
    i = data.find(b"\x00\x00\x01")
    while i != -1:
        start = i + 3
        j = data.find(b"\x00\x00\x01", start)
        end = len(data) if j == -1 else (j - 1 if j > 0 and data[j - 1] == 0 else j)
        nal = data[start:end].rstrip(b"\x00") if j == -1 else data[start:end]
        if nal:
            out.append(nal)
        i = j
    return out


def split_avcc(data: bytes, nal_length_size: int = 4) -> list[bytes]:
    """NAL units from an AVCC (length-prefixed) sample — the form MP4
    `mdat` samples carry (ISO/IEC 14496-15)."""
    data = bytes(data)
    out, pos = [], 0
    while pos + nal_length_size <= len(data):
        ln = int.from_bytes(data[pos:pos + nal_length_size], "big")
        pos += nal_length_size
        if ln == 0 or pos + ln > len(data):
            raise ValueError("malformed AVCC sample: bad NAL length")
        out.append(data[pos:pos + ln])
        pos += ln
    return out


def join_avcc(nals: list[bytes], nal_length_size: int = 4) -> bytes:
    return b"".join(
        len(n).to_bytes(nal_length_size, "big") + n for n in nals)


def nal_type(nal: bytes) -> int:
    """nal_unit_type (7.3.1): 1 non-IDR slice, 5 IDR slice, 7 SPS,
    8 PPS, 6 SEI, 9 AUD."""
    return nal[0] & 0x1F


# ---------------------------------------------------------------------------
# parameter sets + slice header
# ---------------------------------------------------------------------------

def parse_sps(nal: bytes) -> dict:
    """Sequence parameter set -> profile/level, frame_num field width,
    and the DERIVED luma width/height (7.4.2.1.1 crop arithmetic,
    CropUnit from chroma_format_idc and frame_mbs_only_flag)."""
    if nal_type(nal) != 7:
        raise ValueError(f"not an SPS NAL (type {nal_type(nal)})")
    r = BitReader(ebsp_to_rbsp(nal[1:]))
    profile_idc = r.u(8)
    constraint_flags = r.u(8)
    level_idc = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            raise NotImplementedError(
                "SPS seq_scaling_matrix parsing not implemented")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):
            r.se()
    max_num_ref_frames = r.ue()
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = r.ue() + 1
    h_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # CropUnitX/Y (7.4.2.1.1): 4:2:0 -> 2 / 2*(2-frame_mbs_only);
    # 4:0:0 or 4:4:4 -> 1 / (2-frame_mbs_only); 4:2:2 -> 2 / same
    cux = 1 if chroma_format_idc in (0, 3) else 2
    cuy = (1 if chroma_format_idc in (0, 3) else
           (2 if chroma_format_idc == 1 else 1)) * (2 - frame_mbs_only)
    return {
        "profile_idc": profile_idc,
        "constraint_flags": constraint_flags,
        "level_idc": level_idc,
        "sps_id": sps_id,
        "chroma_format_idc": chroma_format_idc,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "max_num_ref_frames": max_num_ref_frames,
        "frame_mbs_only": frame_mbs_only,
        "width": w_mbs * 16 - cux * (crop_l + crop_r),
        "height": (2 - frame_mbs_only) * h_units * 16 - cuy * (crop_t + crop_b),
    }


def parse_pps(nal: bytes) -> dict:
    """Picture parameter set: ids + entropy mode (7.3.2.2 prefix)."""
    if nal_type(nal) != 8:
        raise ValueError(f"not a PPS NAL (type {nal_type(nal)})")
    r = BitReader(ebsp_to_rbsp(nal[1:]))
    return {
        "pps_id": r.ue(),
        "sps_id": r.ue(),
        "entropy_mode": "cabac" if r.u(1) else "cavlc",
    }


def parse_slice_header(nal: bytes, sps: dict) -> dict:
    """Slice-header prefix (7.3.3): slice type, keyframe flag,
    frame_num. Reads only up to frame_num — everything after needs PPS
    state the metadata layer doesn't require."""
    t = nal_type(nal)
    if t not in (1, 5):
        raise ValueError(f"not a coded-slice NAL (type {t})")
    r = BitReader(ebsp_to_rbsp(nal[1:]))
    first_mb = r.ue()
    st = r.ue()
    pps_id = r.ue()
    frame_num = r.u(sps["log2_max_frame_num"])
    return {
        "idr": t == 5,
        "first_mb_in_slice": first_mb,
        "slice_type": SLICE_TYPE_NAMES[st % 5],
        "pps_id": pps_id,
        "frame_num": frame_num,
    }


def parse_avcc(conf: bytes) -> dict:
    """AVCDecoderConfigurationRecord (14496-15 §5.2.4.1): profile/level,
    NAL length size, embedded SPS/PPS (parsed)."""
    conf = bytes(conf)
    if conf[0] != 1:
        raise ValueError(f"avcC configurationVersion {conf[0]} != 1")
    nal_length_size = (conf[4] & 0x03) + 1
    pos = 5
    n_sps = conf[pos] & 0x1F
    pos += 1
    sps_list = []
    for _ in range(n_sps):
        (ln,) = struct.unpack(">H", conf[pos:pos + 2])
        sps_list.append(conf[pos + 2:pos + 2 + ln])
        pos += 2 + ln
    n_pps = conf[pos]
    pos += 1
    pps_list = []
    for _ in range(n_pps):
        (ln,) = struct.unpack(">H", conf[pos:pos + 2])
        pps_list.append(conf[pos + 2:pos + 2 + ln])
        pos += 2 + ln
    return {
        "profile_idc": conf[1],
        "level_idc": conf[3],
        "nal_length_size": nal_length_size,
        "sps": [parse_sps(s) for s in sps_list],
        "pps": [parse_pps(p) for p in pps_list],
    }


def decode_slice_data(nal: bytes, sps: dict, pps: dict):
    """Slice-data entropy decode (CAVLC/CABAC residuals) needs a real
    codec implementation; gated by name like progressive-JPEG was in
    round 3."""
    raise NotImplementedError(
        "H.264 slice-data entropy decode (CAVLC/CABAC) not implemented — "
        "parameter sets and slice headers parse; residuals need a codec "
        "library")


# ---------------------------------------------------------------------------
# fixture writers (the encode-to-test-decode half)
# ---------------------------------------------------------------------------

def build_sps(width: int, height: int, profile_idc: int = 66,
              level_idc: int = 30, log2_max_frame_num: int = 4,
              sps_id: int = 0) -> bytes:
    """A conformant baseline/main SPS NAL for the given EVEN luma
    dimensions — non-multiple-of-16 sizes emit real frame-cropping
    fields, so the parser's crop arithmetic is exercised, not assumed."""
    if width % 2 or height % 2:
        raise ValueError("fixture SPS needs even dimensions (4:2:0 crop)")
    if profile_idc in _HIGH_PROFILES:
        raise ValueError("fixture writer emits baseline/main SPS only")
    w_mbs = (width + 15) // 16
    h_units = (height + 15) // 16
    crop_r = (w_mbs * 16 - width) // 2   # CropUnitX = 2 (4:2:0)
    crop_b = (h_units * 16 - height) // 2  # CropUnitY = 2 (frame_mbs_only)
    w = BitWriter()
    w.u(8, profile_idc).u(8, 0).u(8, level_idc)
    w.ue(sps_id)
    w.ue(log2_max_frame_num - 4)
    w.ue(2)              # pic_order_cnt_type 2 (display order = decode order)
    w.ue(1)              # max_num_ref_frames
    w.u(1, 0)            # gaps_in_frame_num_value_allowed_flag
    w.ue(w_mbs - 1)
    w.ue(h_units - 1)
    w.u(1, 1)            # frame_mbs_only_flag
    w.u(1, 1)            # direct_8x8_inference_flag
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0).ue(crop_r).ue(0).ue(crop_b)
    else:
        w.u(1, 0)
    w.u(1, 0)            # vui_parameters_present_flag
    return b"\x67" + rbsp_to_ebsp(w.rbsp_trailing())  # ref_idc 3, type 7


def build_pps(pps_id: int = 0, sps_id: int = 0,
              entropy_cabac: bool = False) -> bytes:
    w = BitWriter()
    w.ue(pps_id).ue(sps_id)
    w.u(1, 1 if entropy_cabac else 0)  # entropy_coding_mode_flag
    w.u(1, 0)            # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)              # num_slice_groups_minus1
    w.ue(0).ue(0)        # num_ref_idx_l0/l1_default_active_minus1
    w.u(1, 0).u(2, 0).u(1, 0)  # weighted pred flags
    w.se(0).se(0).se(0)  # qp deltas
    w.u(1, 0).u(1, 0).u(1, 0)  # deblock/constrained-intra/redundant-pic
    return b"\x68" + rbsp_to_ebsp(w.rbsp_trailing())  # ref_idc 3, type 8


def build_slice_nal(idr: bool, frame_num: int, slice_type: int = 2,
                    log2_max_frame_num: int = 4,
                    payload: bytes = b"\xAA\x55\xAA") -> bytes:
    """A slice NAL whose HEADER is conformant (what the parser reads);
    `payload` stands in for the entropy-coded macroblock data the
    metadata layer never touches (decode_slice_data raises by name)."""
    w = BitWriter()
    w.ue(0)              # first_mb_in_slice
    w.ue(slice_type)
    w.ue(0)              # pps_id
    w.u(log2_max_frame_num, frame_num)
    if idr:
        w.ue(frame_num & 1)  # idr_pic_id
    hdr = w.rbsp_trailing()
    first = (0x65 if idr else 0x41)  # ref_idc 3/2, type 5/1
    return bytes([first]) + rbsp_to_ebsp(hdr + payload)


def build_avcc(sps: bytes, pps: bytes, nal_length_size: int = 4) -> bytes:
    return (bytes([1, sps[1], sps[2], sps[3],
                   0xFC | (nal_length_size - 1), 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + bytes([1]) + struct.pack(">H", len(pps)) + pps)
