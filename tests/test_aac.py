"""ADTS/AAC frame-header parser (functions/aac.py) and its header
tier in the audio ladder: synthetic ADTS streams with exact expected
metadata, MP3/ADTS sync disambiguation, strict failure to fake."""

from __future__ import annotations

import pytest

from clinvar_pipeline_spark.functions.aac import (
    aac_info,
    parse_adts_header,
)
from clinvar_pipeline_spark.operators.multimodal import extract_audio_meta


def _adts(flen=64, sridx=4, channel_cfg=2, n_blocks=1, crc=False):
    """One synthetic ADTS frame: 7-byte header (no CRC) + zero
    payload. Defaults: AAC-LC shape, 44100 Hz, stereo, 1 block."""
    b = bytearray(7)
    b[0] = 0xFF
    b[1] = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc else 1)
    b[2] = (1 << 6) | (sridx << 2) | ((channel_cfg >> 2) & 1)
    b[3] = ((channel_cfg & 3) << 6) | ((flen >> 11) & 3)
    b[4] = (flen >> 3) & 0xFF
    b[5] = ((flen & 7) << 5) | 0x1F
    b[6] = 0xFC | (n_blocks - 1)
    return bytes(b) + b"\x00" * (flen - 7)


def test_adts_stream_exact_metadata():
    f = _adts()
    assert parse_adts_header(f, 0) == (64, 44100, 2, 1024)
    info = aac_info(f * 3)
    assert info == {
        "sample_rate": 44100,
        "channels": 2,
        "n_frames": 3,
        "n_samples": 3072,
        "duration_s": 3072 / 44100,
    }


def test_multi_block_and_eight_channel_config():
    f = _adts(flen=96, sridx=3, channel_cfg=7, n_blocks=4)
    info = aac_info(f * 2)
    assert info["sample_rate"] == 48000
    assert info["channels"] == 8
    assert info["n_samples"] == 2 * 4 * 1024


def test_vbr_frame_lengths_ok_rate_change_raises():
    assert aac_info(_adts(flen=64) + _adts(flen=200))["n_frames"] == 2
    with pytest.raises(ValueError):
        aac_info(_adts(sridx=4) + _adts(sridx=3))


@pytest.mark.parametrize("bad", [
    b"",
    _adts()[:20],                      # truncated frame
    _adts(),                           # single frame: rejected
    _adts() + b"\x00" * 16,            # garbage tail
])
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        aac_info(bad)


def test_pce_channel_config_zero_rejected():
    f = bytearray(_adts())
    f[2] &= ~1
    f[3] &= 0x3F  # channel_cfg -> 0 (declared in-band)
    with pytest.raises(ValueError):
        aac_info(bytes(f) * 2)


def test_ladder_disambiguates_adts_from_mp3(spark):
    """Both families share the 0xFF sync; the ladder must land each
    on the header tier with its own parser's metadata."""
    from clinvar_pipeline_spark.functions.mp3 import parse_frame_header

    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1, (9 << 4), 0])
    flen, *_ = parse_frame_header(hdr, 0)
    mp3 = (hdr + b"\x00" * (flen - 4)) * 2
    aac = _adts() * 2
    df = spark.createDataFrame(
        [(1, aac), (2, mp3)], "id long, content binary"
    )
    out = {r["id"]: r for r in extract_audio_meta(
        df.selectExpr("id", "content")).collect()}
    assert out[1]["decode_tier"] == "header"
    assert out[1]["n_samples"] == 2048          # 2 ADTS frames
    assert out[2]["decode_tier"] == "header"
    assert out[2]["n_samples"] == 2 * 1152      # 2 MP3 frames
