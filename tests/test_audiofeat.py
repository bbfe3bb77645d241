"""PCM audio feature extraction (kernels/audiofeat.py).

Fixtures are real WAV files written with the stdlib ``wave`` module
(and hand-packed RIFF for the depths wave can't write); expectations
are hand-computed from the documented integer formulas.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from docproc_spark.kernels.audiofeat import (
    AudioDecodeError,
    wav_features,
    wav_samples,
)


def make_wav16(samples: list[int], rate: int = 8000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def make_raw_wav(fmt_tag: int, channels: int, rate: int, bits: int,
                 data: bytes, fmt_extra: bytes = b"") -> bytes:
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    ) + fmt_extra
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) & 1:
        body += b"\x00"
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


class TestDecode:
    def test_16bit_known_features(self):
        s = [0, 1000, -1000, 32767, -32768, 0, 100, -100]
        feats = wav_features(make_wav16(s, rate=8000))
        assert feats["decode_error"] is None
        assert (feats["sample_rate"], feats["channels"]) == (8000, 1)
        assert feats["n_frames"] == 8
        assert feats["duration_ms"] == 8 * 1000 // 8000
        sq = sum(v * v for v in s) // 8
        assert feats["mean_square"] == sq
        assert feats["peak_abs"] == 32768
        assert feats["silence_permille"] == 4 * 1000 // 8  # |s|<327: 0,0,100,100
        assert feats["clip_permille"] == 2 * 1000 // 8  # 32767, -32768
        # sign flips: 0+,1000+,-1000-,32767+,-32768-,0+,100+,-100- → 5
        assert feats["zero_crossings"] == 5

    def test_stereo_mono_mix_floor(self):
        # frames (L,R): (100, 201) → 150; (-3, -4) → -4 (floor)
        data = b"".join(struct.pack("<h", v) for v in (100, 201, -3, -4))
        rate, ch, s = wav_samples(make_raw_wav(1, 2, 8000, 16, data))
        assert ch == 2
        assert list(s) == [150, -4]

    def test_8bit_scales_to_16bit_range(self):
        data = bytes([128, 255, 0, 129])
        _, _, s = wav_samples(make_raw_wav(1, 1, 8000, 8, data))
        assert list(s) == [0, 127 << 8, -128 << 8, 1 << 8]

    def test_24bit_and_32bit(self):
        v24 = (0x123456).to_bytes(3, "little") + (-0x123456 & 0xFFFFFF).to_bytes(3, "little")
        _, _, s = wav_samples(make_raw_wav(1, 1, 8000, 24, v24))
        assert list(s) == [0x1234, -0x1235]  # >> 8 floors negatives
        v32 = struct.pack("<ii", 0x12345678, -0x12345678)
        _, _, s = wav_samples(make_raw_wav(1, 1, 8000, 32, v32))
        assert list(s) == [0x1234, -0x1235]

    def test_extensible_pcm_accepted_float_rejected(self):
        data = struct.pack("<hh", 5, -5)
        # cbSize, validBits, channelMask, then the SubFormat GUID whose
        # leading 2 bytes are the real format tag (1 = PCM)
        ext = struct.pack("<HHI", 22, 16, 0x3) + struct.pack("<H", 1) + b"\x00" * 14
        ok = make_raw_wav(0xFFFE, 1, 8000, 16, data, fmt_extra=ext)
        rate, _, s = wav_samples(ok)
        assert list(s) == [5, -5]
        with pytest.raises(AudioDecodeError, match="codec"):
            wav_samples(make_raw_wav(3, 1, 8000, 32, b"\x00" * 8))

    def test_corrupt_and_empty(self):
        with pytest.raises(AudioDecodeError):
            wav_samples(b"RIFFxxxxWAVE")
        with pytest.raises(AudioDecodeError):
            wav_samples(b"not audio")
        with pytest.raises(AudioDecodeError):
            wav_samples(None)
        feats = wav_features(b"mp3-ish junk")
        assert feats["decode_error"] and feats["mean_square"] is None
        # empty data chunk: digital silence, not an error
        feats = wav_features(make_raw_wav(1, 1, 8000, 16, b""))
        assert feats["n_frames"] == 0 and feats["silence_permille"] == 1000

    def test_frame_cap_guards_runaway(self):
        big = make_raw_wav(1, 1, 8000, 16, b"\x00\x00" * 100)
        with pytest.raises(AudioDecodeError, match="max_frames"):
            wav_samples(big, max_frames=50)

    def test_truncated_data_chunk_clips_to_whole_frames(self):
        # declared size beyond payload, odd trailing byte dropped
        data = struct.pack("<hh", 7, -7) + b"\x01"
        _, _, s = wav_samples(make_raw_wav(1, 1, 8000, 16, data))
        assert list(s) == [7, -7]


@pytest.mark.usefixtures("spark")
class TestSparkAudio:
    def test_audio_features_operator(self, spark):
        import hashlib

        from docproc_spark.functions.media import audio_features

        good = make_wav16([0, 1000, -1000, 0], rate=16000)
        df = spark.createDataFrame(
            [(bytearray(good),), (bytearray(b"junk"),)], "blob binary"
        )
        rows = {r["media_ref"]: r for r in audio_features(df).collect()}
        ok = rows[hashlib.sha256(good).hexdigest()]
        want = wav_features(good)
        assert ok["decode_error"] is None
        assert ok["mean_square"] == want["mean_square"]
        assert ok["zero_crossings"] == want["zero_crossings"]
        assert ok["duration_ms"] == want["duration_ms"]
        bad = rows[hashlib.sha256(b"junk").hexdigest()]
        assert bad["decode_error"] and bad["n_frames"] is None
