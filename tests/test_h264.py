"""H.264 Annex-B SPS/NAL parser (functions/h264.py) and its header
tier in the video ladder: bit-exact synthetic SPS streams (flat,
cropped, high-profile, VUI timing), picture counting, and strict
failure to the fake tier."""

from __future__ import annotations

import pytest

from clinvar_pipeline_spark.functions.h264 import (
    _strip_emulation,
    h264_info,
    parse_sps,
)
from clinvar_pipeline_spark.operators.multimodal import extract_video_meta


class _W:
    """MSB-first bit writer with Exp-Golomb, the parser's inverse."""

    def __init__(self):
        self.bits = []

    def u(self, v, n):
        self.bits += [(v >> (n - 1 - i)) & 1 for i in range(n)]

    def ue(self, v):
        v1 = v + 1
        nb = v1.bit_length()
        self.bits += [0] * (nb - 1)
        self.u(v1, nb)

    def out(self):
        bits = self.bits + [1]  # rbsp stop bit
        bits += [0] * ((8 - len(bits) % 8) % 8)
        raw = bytes(
            sum(b << (7 - i) for i, b in enumerate(bits[k: k + 8]))
            for k in range(0, len(bits), 8)
        )
        # emulation prevention: 00 00 0x -> 00 00 03 0x
        out = bytearray()
        zeros = 0
        for byte in raw:
            if zeros >= 2 and byte <= 3:
                out.append(3)
                zeros = 0
            out.append(byte)
            zeros = zeros + 1 if byte == 0 else 0
        return bytes(out)


def _sps(width_mbs=80, height_units=45, crop=None, profile=66,
         fps=None, frame_mbs_only=1):
    w = _W()
    w.u(profile, 8)
    w.u(0, 8)
    w.u(31, 8)          # level 3.1
    w.ue(0)             # sps id
    if profile == 100:
        w.ue(1)         # chroma 4:2:0
        w.ue(0)
        w.ue(0)
        w.u(0, 1)
        w.u(0, 1)       # no scaling matrix
    w.ue(4)             # log2_max_frame_num_minus4
    w.ue(2)             # poc type 2 (no extra fields)
    w.ue(3)             # max_num_ref_frames
    w.u(0, 1)
    w.ue(width_mbs - 1)
    w.ue(height_units - 1)
    w.u(frame_mbs_only, 1)
    if not frame_mbs_only:
        w.u(0, 1)
    w.u(1, 1)           # direct_8x8
    if crop:
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    if fps:
        w.u(1, 1)       # vui present
        w.u(0, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1)  # no optional vui
        w.u(1, 1)       # timing_info_present
        w.u(1, 32)      # num_units_in_tick
        w.u(int(2 * fps), 32)  # time_scale (two ticks per frame)
        w.u(1, 1)
    else:
        w.u(0, 1)
    return b"\x00\x00\x00\x01\x67" + w.out()


_IDR = b"\x00\x00\x01\x65\x80\x00"     # first_mb_in_slice = 0
_SLICE0 = b"\x00\x00\x01\x41\x80\x00"  # non-IDR picture start
_SLICE1 = b"\x00\x00\x01\x41\x40\x00"  # continuation slice (mb 16)


def test_sps_720p_and_picture_count():
    info = h264_info(_sps() + _IDR + _SLICE0 + _SLICE0)
    assert (info["width"], info["height"]) == (1280, 720)
    assert (info["profile_idc"], info["level_idc"]) == (66, 31)
    assert info["n_frames"] == 3
    assert info["fps"] == 0.0 and info["duration_s"] == 0.0


def test_sps_1080p_cropping():
    # 1088 coded lines cropped to 1080: crop_bottom 4 in 2-px units
    info = h264_info(_sps(120, 68, crop=(0, 0, 0, 4)) + _IDR + _SLICE0)
    assert (info["width"], info["height"]) == (1920, 1080)


def test_high_profile_chroma_block_parsed():
    info = h264_info(_sps(profile=100) + _IDR + _SLICE0)
    assert info["profile_idc"] == 100
    assert (info["width"], info["height"]) == (1280, 720)


def test_vui_timing_gives_fps_and_duration():
    info = h264_info(_sps(fps=30) + _IDR + _SLICE0 + _SLICE0 + _SLICE0)
    assert info["fps"] == 30.0
    assert info["n_frames"] == 4
    assert info["duration_s"] == round(4 / 30.0, 3)


def test_continuation_slices_not_counted_as_frames():
    info = h264_info(_sps() + _IDR + _SLICE1 + _SLICE0 + _SLICE1)
    assert info["n_frames"] == 2


def test_interlaced_height_doubles():
    info = h264_info(
        _sps(80, 23, frame_mbs_only=0) + _IDR + _SLICE0
    )
    assert info["height"] == 2 * 23 * 16


def test_emulation_strip():
    assert _strip_emulation(b"\x00\x00\x03\x01") == b"\x00\x00\x01"


@pytest.mark.parametrize("bad", [
    b"",
    b"\x00\x00\x01\x65\x80\x00",      # VCL but no SPS
    _sps(),                            # SPS but no coded picture
    b"\x12\x34" * 8,                   # no start code
])
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        h264_info(bad)


def test_video_ladder_header_tier(spark):
    stream = _sps(fps=25) + _IDR + _SLICE0
    rows = [(1, stream), (2, stream[:10])]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r["id"]: r for r in extract_video_meta(
        df.selectExpr("id", "content")).collect()}
    r1 = out[1]
    assert r1["decode_tier"] == "header"
    assert (r1["container"], r1["codecs"]) == ("h264", "avc1")
    assert (r1["width"], r1["height"]) == (1280, 720)
    assert r1["fps"] == 25.0 and r1["n_frames"] == 2
    assert out[2]["decode_tier"] == "fake"


def test_multi_slice_picture_counts_once_with_large_first_mb():
    """Review regression: a continuation slice with a large
    first_mb_in_slice (4080 needs 23 bits of Exp-Golomb — more than
    the 2 payload bytes the counter used to read) must not exhaust
    the bit reader and demote the stream to the fake tier — it is
    simply not a picture start, so the picture counts ONCE."""
    w = _W()
    w.ue(4080)  # first_mb_in_slice of a 1080p continuation slice
    w.ue(7)     # slice_type
    w.ue(0)     # pps id
    big_cont = b"\x00\x00\x01\x41" + w.out()
    info = h264_info(_sps(120, 68) + _IDR + big_cont)
    assert info["n_frames"] == 1
