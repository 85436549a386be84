"""ISO-BMFF (MP4/MOV) box walker — real container *metadata* for the
multimodal ladder.

Parses the box tree (ftyp/moov/mvhd/trak/mdia/hdlr/minf/stbl/stsd) to
recover duration, timescale, track handlers, and sample-entry codec
fourccs — the typed metadata a 100 TB video corpus wants in its
manifest — WITHOUT decoding media: H.26x/AAC entropy decode needs a
codec library and stays honestly out of scope (the decode tier reports
``header``; frame sampling for MP4 payloads remains the documented
byte-slice stand-in, while .y4m payloads get real frames via
functions/y4m.py).

All traversal is length-checked and depth/box bounded; malformed input
raises ValueError, the ladder's uniform failure boundary.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
_MAX_BOXES = 4096  # runaway/bomb guard: a sane header tree is tiny


def _walk(raw: bytes, lo: int, hi: int, out: dict, budget: list[int]) -> None:
    pos = lo
    while pos + 8 <= hi:
        if budget[0] <= 0:
            raise ValueError("mp4: box-count bound exceeded")
        budget[0] -= 1
        size = struct.unpack_from(">I", raw, pos)[0]
        btype = raw[pos + 4: pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > hi:
                raise ValueError("mp4: truncated largesize")
            size = struct.unpack_from(">Q", raw, body)[0]
            body += 8
        elif size == 0:  # box extends to end of enclosing scope
            size = hi - pos
        if size < body - pos or pos + size > hi:
            raise ValueError("mp4: box overruns container")
        end = pos + size
        if btype in _CONTAINERS:
            _walk(raw, body, end, out, budget)
        elif btype == b"mvhd":
            _read_mvhd(raw, body, end, out)
        elif btype == b"tkhd":
            out["n_tracks"] = out.get("n_tracks", 0) + 1
            _read_tkhd_dims(raw, body, end, out)
        elif btype == b"hdlr":
            if end - body >= 12:
                out.setdefault("handlers", []).append(
                    raw[body + 8: body + 12].decode("latin1")
                )
        elif btype == b"stsd":
            _read_stsd(raw, body, end, out)
        pos = end


def _read_mvhd(raw: bytes, body: int, end: int, out: dict) -> None:
    if end - body < 4:
        raise ValueError("mp4: short mvhd")
    version = raw[body]
    if version == 1:
        if end - body < 28:
            raise ValueError("mp4: short mvhd v1")
        timescale = struct.unpack_from(">I", raw, body + 20)[0]
        duration = struct.unpack_from(">Q", raw, body + 24)[0]
    else:
        if end - body < 20:
            raise ValueError("mp4: short mvhd v0")
        timescale = struct.unpack_from(">I", raw, body + 12)[0]
        duration = struct.unpack_from(">I", raw, body + 16)[0]
    out["timescale"] = timescale
    out["duration"] = duration


def _read_tkhd_dims(raw: bytes, body: int, end: int, out: dict) -> None:
    """Presentation width/height from the track header — 16.16 fixed
    point at the end of the tkhd body (offset 76 in v0, 88 in v1
    where creation/modification/duration widen to 64-bit). The first
    track with nonzero dims wins (audio tracks carry zeros)."""
    if end - body < 4:
        return
    off = body + (88 if raw[body] == 1 else 76)
    if off + 8 > end:
        return
    w = struct.unpack_from(">I", raw, off)[0] >> 16
    h = struct.unpack_from(">I", raw, off + 4)[0] >> 16
    if w and h and "width" not in out:
        out["width"], out["height"] = w, h


def _read_stsd(raw: bytes, body: int, end: int, out: dict) -> None:
    # full box: version/flags (4) + entry_count (4), then sample entries
    if end - body < 8:
        return
    n = struct.unpack_from(">I", raw, body + 4)[0]
    pos = body + 8
    for _ in range(min(n, 32)):
        if pos + 8 > end:
            break
        esize = struct.unpack_from(">I", raw, pos)[0]
        if esize < 8 or pos + esize > end:
            break
        out.setdefault("codecs", []).append(
            raw[pos + 4: pos + 8].decode("latin1")
        )
        pos += esize


def mp4_info(raw: bytes) -> dict:
    """Parse container metadata: ``{container, duration_s, timescale,
    n_tracks, handlers, codecs}`` plus ``width``/``height`` when a
    track header carries nonzero presentation dims. Requires an ftyp
    box (the MP4 signature); raises ValueError otherwise."""
    if len(raw) < 12 or raw[4:8] != b"ftyp":
        raise ValueError("mp4: no ftyp signature")
    out: dict = {"container": raw[8:12].decode("latin1").strip()}
    _walk(raw, 0, len(raw), out, [_MAX_BOXES])
    if "timescale" in out and out["timescale"] > 0:
        out["duration_s"] = round(out["duration"] / out["timescale"], 3)
    out.setdefault("n_tracks", 0)
    out.setdefault("handlers", [])
    out.setdefault("codecs", [])
    return out
