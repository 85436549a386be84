"""MPEG-audio frame-header parser (functions/mp3.py) and its header
tier in the audio ladder: synthetic frame streams with exact expected
metadata, tag skipping, and strict failure to the fake tier."""

from __future__ import annotations

import pytest

from clinvar_pipeline_spark.functions.mp3 import (
    mp3_info,
    parse_frame_header,
)
from clinvar_pipeline_spark.operators.multimodal import (
    attach_binary,
    extract_audio_meta,
)


def _frame(ver=3, layer=1, bridx=9, sridx=0, pad=0, mode=0):
    """One synthetic frame: valid 4-byte header + zero payload of the
    exact length the header implies. Defaults: MPEG1 Layer III,
    128 kbps, 44100 Hz, stereo."""
    b0 = 0xFF
    b1 = 0xE0 | (ver << 3) | (layer << 1) | 1  # no CRC
    b2 = (bridx << 4) | (sridx << 2) | (pad << 1)
    b3 = mode << 6
    hdr = bytes([b0, b1, b2, b3])
    flen, sr, ch, spf = parse_frame_header(hdr, 0)
    return hdr + b"\x00" * (flen - 4), sr, ch, spf


def test_mpeg1_layer3_stream_exact_metadata():
    f, sr, ch, spf = _frame()  # 144*128000//44100 = 417 bytes
    assert len(f) == 417 and (sr, ch, spf) == (44100, 2, 1152)
    info = mp3_info(f * 3)
    assert info == {
        "sample_rate": 44100,
        "channels": 2,
        "n_frames": 3,
        "n_samples": 3456,
        "duration_s": 3456 / 44100,
    }


def test_mpeg2_layer3_and_mono_and_padding():
    # MPEG2 Layer III, 64 kbps idx 8, 22050 Hz -> spf 576,
    # flen = 72*64000//22050 + pad
    f0, sr, ch, spf = _frame(ver=2, layer=1, bridx=8, sridx=0,
                             pad=0, mode=3)
    f1, _, _, _ = _frame(ver=2, layer=1, bridx=8, sridx=0, pad=1, mode=3)
    assert (sr, ch, spf) == (22050, 1, 576)
    assert len(f1) == len(f0) + 1
    info = mp3_info(f0 + f1)
    assert info["n_samples"] == 1152 and info["channels"] == 1


def test_layer1_slot_size_four():
    # MPEG1 Layer I, 224 kbps idx 7, 32000 Hz: (12*224000//32000)*4
    f, sr, ch, spf = _frame(layer=3, bridx=7, sridx=2)
    assert spf == 384 and len(f) == (12 * 224000 // 32000) * 4
    assert mp3_info(f * 2)["n_samples"] == 768


def test_id3v2_prefix_and_id3v1_trailer_skipped():
    f, *_ = _frame()
    tag2 = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 20]) + b"\x00" * 20
    tag1 = b"TAG" + b"\x00" * 125
    info = mp3_info(tag2 + f * 2 + tag1)
    assert info["n_frames"] == 2


def test_vbr_bitrate_change_ok_rate_change_raises():
    a, *_ = _frame(bridx=9)
    b, *_ = _frame(bridx=11)  # different bitrate, same rate: VBR, fine
    assert mp3_info(a + b)["n_frames"] == 2
    c, *_ = _frame(sridx=1)  # 48000 Hz mid-stream
    with pytest.raises(ValueError):
        mp3_info(a + c)


@pytest.mark.parametrize("bad", [
    b"",                                  # empty
    b"\xff\xfb\x90\x00" + b"\x00" * 10,   # truncated single frame
    b"\xff\xe0garbage-not-a-frame",       # sync bytes then junk
])
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        mp3_info(bad)


def test_single_frame_rejected():
    f, *_ = _frame()
    with pytest.raises(ValueError):
        mp3_info(f)  # < 2 frames: random 0xFFEx bytes can't claim tier


def test_audio_ladder_header_tier(spark):
    """Through the DataFrame ladder: an MP3 payload lands on the
    header tier with exact frame-walk metadata, bits=0; a truncated
    MP3 falls to the fake tier, never crashing the task."""
    f, *_ = _frame()
    rows = [(1, f * 4), (2, f[:100])]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["id"]: r
        for r in extract_audio_meta(
            df.selectExpr("doc_id as id", "payload as content")
        ).collect()
    }
    r1 = out[1]
    assert r1["decode_tier"] == "header"
    assert (r1["sample_rate"], r1["channels"], r1["bits"]) == (44100, 2, 0)
    assert r1["n_samples"] == 4 * 1152
    assert r1["duration_s"] == 4 * 1152 / 44100
    assert out[2]["decode_tier"] == "fake"


def test_sample_frames_mp3_frame_accurate(spark):
    """Frame sampling over an MP3 payload emits complete compressed
    frames at evenly spaced frame indices — each sampled unit parses
    as a standalone frame header of the exact header-implied
    length."""
    from clinvar_pipeline_spark.functions.mp3 import mp3_frames
    from clinvar_pipeline_spark.operators.multimodal import sample_frames

    f, *_ = _frame()
    stream = f * 10
    assert len(mp3_frames(stream)) == 10
    df = spark.createDataFrame([(1, stream)], "id long, content binary")
    out = sample_frames(
        df.selectExpr("id", "content"), n_frames=4
    ).orderBy("frame_idx").collect()
    assert len(out) == 4
    for r in out:
        fb = bytes(r["frame_bytes"])
        hdr = parse_frame_header(fb, 0)
        assert hdr is not None and hdr[0] == len(fb) == len(f)


def test_sample_frames_adts_frame_accurate(spark):
    from clinvar_pipeline_spark.functions.aac import (
        aac_frames,
        parse_adts_header,
    )
    from clinvar_pipeline_spark.operators.multimodal import sample_frames
    from test_aac import _adts

    stream = b"".join(_adts(flen=64 + 8 * i) for i in range(6))
    assert [ln for _, ln in aac_frames(stream)] == [64, 72, 80, 88, 96, 104]
    df = spark.createDataFrame([(1, stream)], "id long, content binary")
    out = sample_frames(
        df.selectExpr("id", "content"), n_frames=3
    ).orderBy("frame_idx").collect()
    assert len(out) == 3
    lens = [len(bytes(r["frame_bytes"])) for r in out]
    assert lens == [64, 80, 96]  # frames 0, 2, 4 of 6
    for r in out:
        fb = bytes(r["frame_bytes"])
        assert parse_adts_header(fb, 0)[0] == len(fb)
