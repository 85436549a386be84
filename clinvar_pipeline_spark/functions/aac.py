"""Pure-Python ADTS/AAC frame-header parser — the AAC twin of
functions/mp3.py, completing the audio header tier: ADTS frames carry
an EXPLICIT 13-bit frame length in their 7/9-byte header (simpler
than MP3, whose length is derived from bitrate tables), plus a
sample-rate index, a channel configuration, and the number of 1024-
sample AAC blocks in the frame — so a header walk yields the true
sample rate, channels, sample count, and duration without touching
the entropy-coded spectral payload.

Raw AAC inside MP4 (the 'mp4a' sample entry) is containered, not
ADTS — functions/mp4.py owns that path; this module handles the
self-framing .aac elementary-stream form.

All reads are length-checked; malformed or non-ADTS input raises
ValueError (the ladder's uniform failure boundary — callers fall to
the deterministic fake).
"""

from __future__ import annotations

# MPEG-4 sampling frequency index table (13 = escape, 14/15 reserved)
_ADTS_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)

ADTS_SYNC_BYTE = 0xFF


def parse_adts_header(raw: bytes, pos: int):
    """``(frame_len, sample_rate, channels, n_samples)`` for the ADTS
    frame headered at ``pos``, or None when the bytes there are not a
    valid header. n_samples = 1024 x (number_of_raw_data_blocks + 1).
    channel config 0 (declared in-band via PCE) is rejected — the
    header walk cannot recover it without entropy decode."""
    if pos + 7 > len(raw):
        return None
    b = raw[pos: pos + 7]
    if b[0] != ADTS_SYNC_BYTE or (b[1] & 0xF0) != 0xF0:
        return None
    if b[1] & 0x06:  # layer must be 00 for AAC
        return None
    sridx = (b[2] >> 2) & 0xF
    if sridx >= len(_ADTS_RATES):
        return None
    channel_cfg = ((b[2] & 0x01) << 2) | ((b[3] >> 6) & 0x03)
    if channel_cfg == 0:
        return None
    # 7.1 configs: cfg 7 means 8 channels; 1-6 are literal
    channels = 8 if channel_cfg == 7 else channel_cfg
    flen = ((b[3] & 0x03) << 11) | (b[4] << 3) | ((b[5] >> 5) & 0x07)
    crc_absent = b[1] & 0x01
    min_len = 7 if crc_absent else 9
    if flen < min_len:
        return None
    n_blocks = (b[6] & 0x03) + 1
    return flen, _ADTS_RATES[sridx], channels, 1024 * n_blocks


def aac_frames(raw: bytes) -> list:
    """[(offset, length)] of every ADTS frame — the seek table for
    frame-accurate temporal sampling (mp3.mp3_frames's twin)."""
    pos, end = 0, len(raw)
    out = []
    while pos < end:
        hdr = parse_adts_header(raw, pos)
        if hdr is None:
            raise ValueError(f"aac: invalid ADTS header at {pos}")
        flen = hdr[0]
        if pos + flen > end:
            raise ValueError("aac: frame overruns file")
        out.append((pos, flen))
        pos += flen
    if len(out) < 2:
        raise ValueError("aac: fewer than two frames")
    return out


def aac_info(raw: bytes) -> dict:
    """``{sample_rate, channels, n_frames, n_samples, duration_s}``
    from a full ADTS frame walk. Strict: frames end-to-end from byte
    0 to EOF, at least TWO consecutive valid frames (random 0xFFFx
    bytes cannot claim the header tier), and a consistent sample rate
    (frame lengths may vary — normal for VBR AAC)."""
    pos, end = 0, len(raw)
    sr0 = channels = None
    n_frames = n_samples = 0
    while pos < end:
        hdr = parse_adts_header(raw, pos)
        if hdr is None:
            raise ValueError(f"aac: invalid ADTS header at {pos}")
        flen, sr, ch, ns = hdr
        if pos + flen > end:
            raise ValueError("aac: frame overruns file")
        if sr0 is None:
            sr0, channels = sr, ch
        elif sr != sr0:
            raise ValueError("aac: sample-rate change mid-stream")
        n_frames += 1
        n_samples += ns
        pos += flen
    if n_frames < 2:
        raise ValueError("aac: fewer than two frames")
    return {
        "sample_rate": sr0,
        "channels": channels,
        "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_s": n_samples / sr0,
    }
