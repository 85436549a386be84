"""Pure-Python WAV (RIFF/PCM) parser — the real-audio tier of the
multimodal ladder.

PCM WAV needs no entropy codec, so — like Y4M for video — the real
thing is implementable in-container: parse the RIFF chunk list for
``fmt `` (sample rate / channels / bit depth) and ``data`` (sample
payload), and window the PCM stream by *time*, not bytes
(``operators/multimodal.sample_frames`` uses :func:`wav_window` to
emit evenly spaced fixed-duration windows — the seek+slice semantics
an audio feature extractor has). MP3 parses at the header tier
(functions/mp3.py frame walk); remaining compressed audio (AAC)
stays at the documented fake tier.

All reads are length-checked; malformed input raises ValueError (the
ladder's uniform failure boundary).
"""

from __future__ import annotations

import struct

WAV_MAGIC = b"RIFF"


def wav_info(raw: bytes) -> dict:
    """``{sample_rate, channels, bits, n_samples, duration_s,
    data_off, data_len}`` from the RIFF chunk walk. Only uncompressed
    integer PCM (format tag 1) is accepted — anything else raises
    (and lands on the fake tier upstream)."""
    if len(raw) < 12 or raw[:4] != WAV_MAGIC or raw[8:12] != b"WAVE":
        raise ValueError("wav: no RIFF/WAVE signature")
    pos, end = 12, len(raw)
    fmt = None
    data_off = data_len = None
    while pos + 8 <= end:
        cid = raw[pos: pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise ValueError("wav: chunk overruns file")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("wav: short fmt chunk")
            tag, ch, rate = struct.unpack_from("<HHI", raw, body)
            bits = struct.unpack_from("<H", raw, body + 14)[0]
            if tag != 1:
                raise ValueError(f"wav: non-PCM format tag {tag}")
            if ch == 0 or rate == 0 or bits not in (8, 16, 24, 32):
                raise ValueError("wav: invalid fmt fields")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            data_off, data_len = body, size
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_off is None:
        raise ValueError("wav: missing fmt/data chunk")
    ch, rate, bits = fmt
    frame = ch * bits // 8
    n = data_len // frame if frame else 0
    return {
        "sample_rate": rate,
        "channels": ch,
        "bits": bits,
        "n_samples": n,
        "duration_s": round(n / rate, 3),
        "data_off": data_off,
        "data_len": data_len,
    }


def wav_window(raw: bytes, at_sample: int, n_samples: int) -> bytes:
    """Seek+slice: the PCM bytes for ``n_samples`` sample-frames
    starting at ``at_sample`` (clamped to the stream end) — real audio
    windowing, no decode needed for integer PCM."""
    info = wav_info(raw)
    frame = info["channels"] * info["bits"] // 8
    lo = min(at_sample, info["n_samples"]) * frame
    hi = min(at_sample + n_samples, info["n_samples"]) * frame
    return raw[info["data_off"] + lo: info["data_off"] + hi]


def wav_encode(
    samples: list[int], sample_rate: int = 8000, channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Minimal PCM encoder (tests + fixtures). ``samples`` are
    interleaved integer sample values."""
    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    elif bits == 8:
        data = bytes((s + 128) & 0xFF for s in samples)
    else:
        raise ValueError("wav_encode: 8/16-bit only")
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * bits // 8, channels * bits // 8, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
