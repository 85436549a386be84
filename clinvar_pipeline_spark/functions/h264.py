"""Pure-Python H.264/AVC Annex-B stream parser — the video twin of
the mp3/aac header tier: walk the start-coded NAL units, Exp-Golomb-
decode the sequence parameter set (SPS) for the TRUE coded
dimensions (profile/level, macroblock grid, frame cropping, 4:2:0 /
4:2:2 / 4:4:4 chroma-aware crop units), read the VUI timing info for
fps when the encoder wrote it, and count coded pictures as VCL NAL
units whose slice header starts at macroblock 0 — all without
touching CABAC/CAVLC entropy data.

This covers the BARE elementary-stream form (.h264 / .264 Annex-B);
H.264 inside MP4 ('avc1') is containered and handled by
functions/mp4.py's box walk.

All reads are bounds-checked; malformed input raises ValueError (the
ladder's uniform failure boundary — callers fall to the fake tier).
"""

from __future__ import annotations

ANNEXB_PREFIXES = (b"\x00\x00\x01", b"\x00\x00\x00\x01")

# profiles whose SPS carries the chroma/bit-depth/scaling block
_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
                  134, 135}


class _Bits:
    """MSB-first bit reader with ue(v)/se(v) Exp-Golomb decode."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.d):
                raise ValueError("h264: bitstream exhausted")
            v = (v << 1) | ((self.d[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("h264: ue(v) prefix too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _strip_emulation(payload: bytes) -> bytes:
    """Remove emulation-prevention bytes (00 00 03 -> 00 00)."""
    return payload.replace(b"\x00\x00\x03", b"\x00\x00")


def _skip_scaling_list(b: _Bits, size: int) -> None:
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + b.se() + 256) % 256
        last = last if nxt == 0 else nxt


def parse_sps(rbsp: bytes) -> dict:
    """Decode an SPS RBSP (emulation bytes already stripped) into
    ``{profile_idc, level_idc, width, height, fps}`` (fps None when
    the VUI carries no timing info). Width/height apply the frame
    cropping rectangle in the chroma-format-correct crop units."""
    b = _Bits(rbsp)
    profile = b.u(8)
    b.u(8)  # constraint flags + reserved
    level = b.u(8)
    b.ue()  # seq_parameter_set_id
    chroma = 1  # 4:2:0 default
    if profile in _HIGH_PROFILES:
        chroma = b.ue()
        if chroma == 3:
            b.u(1)  # separate_colour_plane_flag
        b.ue()  # bit_depth_luma_minus8
        b.ue()  # bit_depth_chroma_minus8
        b.u(1)  # qpprime_y_zero_transform_bypass
        if b.u(1):  # seq_scaling_matrix_present
            for i in range(12 if chroma == 3 else 8):
                if b.u(1):
                    _skip_scaling_list(b, 16 if i < 6 else 64)
    b.ue()  # log2_max_frame_num_minus4
    poc_type = b.ue()
    if poc_type == 0:
        b.ue()
    elif poc_type == 1:
        b.u(1)
        b.se()
        b.se()
        for _ in range(b.ue()):
            b.se()
    b.ue()  # max_num_ref_frames
    b.u(1)  # gaps_in_frame_num_value_allowed
    pw_mbs = b.ue() + 1
    ph_units = b.ue() + 1
    frame_mbs_only = b.u(1)
    if not frame_mbs_only:
        b.u(1)  # mb_adaptive_frame_field
    b.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if b.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = b.ue(), b.ue(), b.ue(), b.ue()
    # crop units per H.264 Table 6-1 (monochrome/4:4:4 crop in pixels)
    cw = 2 if chroma in (1, 2) else 1
    ch = (2 if chroma == 1 else 1) * (2 - frame_mbs_only)
    width = pw_mbs * 16 - (crop_l + crop_r) * cw
    height = (2 - frame_mbs_only) * ph_units * 16 - (crop_t + crop_b) * ch
    fps = None
    if b.u(1):  # vui_parameters_present
        if b.u(1):  # aspect_ratio_info_present
            if b.u(8) == 255:  # Extended_SAR
                b.u(16)
                b.u(16)
        if b.u(1):  # overscan_info_present
            b.u(1)
        if b.u(1):  # video_signal_type_present
            b.u(3)
            b.u(1)
            if b.u(1):  # colour_description_present
                b.u(24)
        if b.u(1):  # chroma_loc_info_present
            b.ue()
            b.ue()
        if b.u(1):  # timing_info_present
            num_units = b.u(32)
            time_scale = b.u(32)
            b.u(1)  # fixed_frame_rate_flag
            if num_units:
                # field-rate convention: two ticks per frame
                fps = time_scale / (2.0 * num_units)
    return {
        "profile_idc": profile,
        "level_idc": level,
        "width": width,
        "height": height,
        "fps": fps,
    }


def _nal_units(raw: bytes):
    """Yield (nal_type, payload) for each start-coded NAL unit."""
    i, n = 0, len(raw)
    starts = []
    while i < n - 2:
        if raw[i] == 0 and raw[i + 1] == 0 and raw[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("h264: no Annex-B start codes")
    for k, s in enumerate(starts):
        e = (starts[k + 1] - 3) if k + 1 < len(starts) else n
        # a 4-byte start code leaves one 0x00 before the next prefix
        while e > s and raw[e - 1] == 0:
            e -= 1
        if e <= s:
            raise ValueError("h264: empty NAL unit")
        hdr = raw[s]
        if hdr & 0x80:
            raise ValueError("h264: forbidden_zero_bit set")
        yield hdr & 0x1F, raw[s:e]


def h264_info(raw: bytes) -> dict:
    """``{width, height, profile_idc, level_idc, n_frames, fps,
    duration_s}`` from the NAL walk: the first SPS supplies geometry
    and (optionally) VUI timing; coded pictures are counted as VCL
    NAL units (types 1/5) whose slice header starts at
    first_mb_in_slice == 0. Streams with no SPS or no VCL NAL
    raise — random bytes cannot claim the header tier."""
    if not raw.startswith(ANNEXB_PREFIXES):
        raise ValueError("h264: not an Annex-B stream")
    sps = None
    n_frames = 0
    for nal_type, nal in _nal_units(raw):
        if nal_type == 7 and sps is None:
            sps = parse_sps(_strip_emulation(nal[1:]))
        elif nal_type in (1, 5):
            # first_mb_in_slice: ue(v) right after the 1-byte header.
            # 8 payload bytes cover any legal value (ue(v) of a
            # 32-bit code is <= 65 bits; 2 bytes would exhaust the
            # reader on continuation slices with first_mb >= 255 and
            # wrongly demote a valid multi-slice stream)
            if _Bits(_strip_emulation(nal[1:9])).ue() == 0:
                n_frames += 1
    if sps is None:
        raise ValueError("h264: no SPS in stream")
    if n_frames == 0:
        raise ValueError("h264: no coded pictures")
    fps = sps["fps"]
    return {
        "width": sps["width"],
        "height": sps["height"],
        "profile_idc": sps["profile_idc"],
        "level_idc": sps["level_idc"],
        "n_frames": n_frames,
        "fps": round(fps, 3) if fps else 0.0,
        "duration_s": round(n_frames / fps, 3) if fps else 0.0,
    }
