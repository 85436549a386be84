"""Pure-Python MPEG-audio (MP3) frame-header parser — upgrades MP3
from the fake tier to the HEADER tier of the multimodal ladder
(mp4.py's class: container/frame metadata parsed for real, the
entropy-coded audio itself left undecoded — decoding needs a codec
library this container lacks).

An MPEG audio stream is a walkable sequence of self-describing
frames: each 4-byte header carries version / layer / bitrate index /
sample-rate index / padding, from which the frame's byte length and
its decoded sample count follow exactly. Walking headers therefore
yields the true sample rate, channel mode, total sample count, and
duration without touching the Huffman payload — the same trick every
tag/duration tool uses. Leading ID3v2 and trailing ID3v1 tags are
skipped structurally.

All reads are length-checked; malformed or non-MP3 input raises
ValueError (the ladder's uniform failure boundary — callers fall to
the deterministic fake). Free-format streams (bitrate index 0) are
rejected: their frame length is not derivable from the header.

The reference pipeline has no media path at all (SURVEY §2 — this
belongs to the 100 TB extension suite alongside wav.py/mp4.py/y4m.py).
"""

from __future__ import annotations

# bitrate tables in kbps, indexed 1..14 (0 = free format, 15 = bad);
# keyed by (mpeg1?, layer) with layer in {1: III, 2: II, 3: I}
_BR_V1_L1 = (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
_BR_V1_L2 = (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
_BR_V1_L3 = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_BR_V2_L1 = (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
_BR_V2_L23 = (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

# sample rates by version field (0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1)
_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}

MP3_SYNC_BYTE = 0xFF


def _id3v2_size(raw: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none). Size is the
    28-bit syncsafe integer at offset 6, excluding the 10-byte header
    (and a 10-byte footer when the footer flag is set)."""
    if len(raw) < 10 or raw[:3] != b"ID3":
        return 0
    if any(b & 0x80 for b in raw[6:10]):
        raise ValueError("mp3: non-syncsafe ID3v2 size")
    size = (raw[6] << 21) | (raw[7] << 14) | (raw[8] << 7) | raw[9]
    return 10 + size + (10 if raw[5] & 0x10 else 0)


def parse_frame_header(raw: bytes, pos: int):
    """``(frame_len, sample_rate, channels, samples_per_frame)`` for
    the frame headered at ``pos``, or None when the 4 bytes there are
    not a valid MPEG audio frame header."""
    if pos + 4 > len(raw):
        return None
    b1, b2, b3 = raw[pos + 1], raw[pos + 2], raw[pos + 3]
    if raw[pos] != MP3_SYNC_BYTE or (b1 & 0xE0) != 0xE0:
        return None
    ver = (b1 >> 3) & 3  # 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer = (b1 >> 1) & 3  # 1=Layer III, 2=Layer II, 3=Layer I
    if ver == 1 or layer == 0:
        return None
    bridx = (b2 >> 4) & 0xF
    sridx = (b2 >> 2) & 3
    if bridx in (0, 15) or sridx == 3:
        return None  # free-format / invalid
    pad = (b2 >> 1) & 1
    mode = (b3 >> 6) & 3
    channels = 1 if mode == 3 else 2
    sr = _RATES[ver][sridx]
    if ver == 3:
        table = {3: _BR_V1_L1, 2: _BR_V1_L2, 1: _BR_V1_L3}[layer]
    else:
        table = _BR_V2_L1 if layer == 3 else _BR_V2_L23
    br = table[bridx - 1] * 1000
    if layer == 3:  # Layer I: 384 samples, 4-byte slots
        spf = 384
        flen = (12 * br // sr + pad) * 4
    elif layer == 2:  # Layer II: 1152 samples at every version
        spf = 1152
        flen = 144 * br // sr + pad
    else:  # Layer III: 1152 (MPEG1) / 576 (MPEG2/2.5)
        spf = 1152 if ver == 3 else 576
        flen = spf // 8 * br // sr + pad
    return flen, sr, channels, spf


def mp3_frames(raw: bytes) -> list:
    """[(offset, length)] of every MPEG audio frame — the seek table
    frame-accurate temporal sampling uses (each entry is one complete
    compressed frame, self-describing via its own header). Same
    strictness as mp3_info: ValueError on malformed streams."""
    pos = _id3v2_size(raw)
    end = len(raw)
    out = []
    while pos < end:
        if end - pos == 128 and raw[pos: pos + 3] == b"TAG":
            break
        hdr = parse_frame_header(raw, pos)
        if hdr is None:
            raise ValueError(f"mp3: invalid frame header at {pos}")
        flen = hdr[0]
        if pos + flen > end:
            raise ValueError("mp3: frame overruns file")
        out.append((pos, flen))
        pos += flen
    if len(out) < 2:
        raise ValueError("mp3: fewer than two frames")
    return out


def mp3_info(raw: bytes) -> dict:
    """``{sample_rate, channels, n_frames, n_samples, duration_s}``
    from a full frame walk. Strict: the stream must be frames
    end-to-end (after any ID3v2 prefix) and end at EOF or an ID3v1
    'TAG' block; at least TWO consecutive valid frames are required,
    so random bytes that happen to start 0xFFEx cannot claim the
    header tier. A mid-stream sample-rate change raises (layer/
    bitrate may vary per frame — normal for VBR)."""
    pos = _id3v2_size(raw)
    end = len(raw)
    sr0 = channels = None
    n_frames = n_samples = 0
    while pos < end:
        if end - pos == 128 and raw[pos: pos + 3] == b"TAG":
            break  # ID3v1 trailer
        hdr = parse_frame_header(raw, pos)
        if hdr is None:
            raise ValueError(f"mp3: invalid frame header at {pos}")
        flen, sr, ch, spf = hdr
        if pos + flen > end:
            raise ValueError("mp3: frame overruns file")
        if sr0 is None:
            sr0, channels = sr, ch
        elif sr != sr0:
            raise ValueError("mp3: sample-rate change mid-stream")
        n_frames += 1
        n_samples += spf
        pos += flen
    if n_frames < 2:
        raise ValueError("mp3: fewer than two frames")
    return {
        "sample_rate": sr0,
        "channels": channels,
        "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_s": n_samples / sr0,
    }
