"""Real PCM audio feature extraction from WAV bytes — stdlib + numpy.

kernels/mediainfo.py stops at container headers (rate, channels,
duration). This kernel goes one level deeper for the one audio format
whose samples need no codec: RIFF/WAVE PCM. That unlocks the actual
audio curation gates — silence detection, clipping, energy, speech-band
activity proxies — for embedded .wav clips (decks, WDS samples) without
ffmpeg. Compressed audio (MP3/OGG/FLAC/M4A) stays behind the loud codec
error; their headers still sniff via mediainfo.

Every feature is INTEGER-exact (floor divisions, counts, permille) so
the DuckDB formula oracle can recompute them bit-for-bit.

Sample normalization: all bit depths map to the 16-bit signed range
(8-bit unsigned → (b-128)<<8; 24-bit → >>8; 32-bit → >>16) so
thresholds mean the same thing at any source depth. Multi-channel
frames mono-mix by integer floor mean before feature math.

Scale shape: decode cost is bounded by the header-declared frame count
(``max_frames``) before touching the data chunk; per-blob work is
O(frames) in numpy, no cross-row state — ordinary Arrow batches.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["AudioDecodeError", "wav_samples", "wav_features"]

DEFAULT_MAX_FRAMES = 50_000_000  # ~10 min of 48 kHz stereo
SILENCE_ABS = 327  # ≈1% of full scale — the "digital silence" floor
CLIP_ABS = 32760  # within 8 LSB of full scale


class AudioDecodeError(ValueError):
    """Corrupt/truncated WAV, or audio that needs a real codec."""


def _chunks(b: bytes):
    """Yield (fourcc, payload) for top-level RIFF sub-chunks; chunks are
    word-aligned (odd sizes pad one byte)."""
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        yield cid, b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def wav_samples(
    blob: bytes | None, max_frames: int = DEFAULT_MAX_FRAMES
) -> tuple[int, int, np.ndarray]:
    """WAV PCM bytes → (sample_rate, channels, mono int32 array in the
    16-bit signed range). Raises AudioDecodeError for non-PCM formats
    (IEEE float, ADPCM, MP3-in-WAV…), unsupported depths, or truncated
    data."""
    b = blob or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE file")
    fmt = data = None
    for cid, payload in _chunks(b):
        if cid == b"fmt " and fmt is None:
            fmt = payload
        elif cid == b"data" and data is None:
            data = payload
    if fmt is None or len(fmt) < 16:
        raise AudioDecodeError("wav: missing fmt chunk")
    if data is None:
        raise AudioDecodeError("wav: missing data chunk")
    audio_format, channels, rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if audio_format == 0xFFFE and len(fmt) >= 40:
        # WAVE_FORMAT_EXTENSIBLE: the real format leads the SubFormat GUID
        audio_format = struct.unpack("<H", fmt[24:26])[0]
    if audio_format != 1:
        raise AudioDecodeError(
            f"wav: format {audio_format} needs a codec (only PCM decodes "
            "here; header facts via kernels/mediainfo)"
        )
    if channels == 0 or rate == 0:
        raise AudioDecodeError("wav: zero channels or rate")
    if bits not in (8, 16, 24, 32):
        raise AudioDecodeError(f"wav: {bits}-bit PCM not supported")
    frame_bytes = channels * bits // 8
    n_frames = len(data) // frame_bytes
    if n_frames > max_frames:
        raise AudioDecodeError(
            f"wav: {n_frames} frames exceeds max_frames={max_frames}"
        )
    data = data[: n_frames * frame_bytes]
    if bits == 8:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
        s = (s - 128) << 8
    elif bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 32:
        s = np.frombuffer(data, dtype="<i4").astype(np.int64) >> 16
        s = s.astype(np.int32)
    else:  # 24-bit: pad each little-endian triple to 4 bytes, sign via >>
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        quads = np.zeros((raw.shape[0], 4), dtype=np.uint8)
        quads[:, 1:] = raw
        s = (quads.view("<i4").ravel() >> 16).astype(np.int32)
    if channels > 1:
        frames = s.reshape(-1, channels)
        # floor mean matches python // on negatives (both floor)
        s = np.floor_divide(frames.sum(axis=1, dtype=np.int64), channels)
        s = s.astype(np.int32)
    return rate, channels, s


def wav_features(
    blob: bytes | None, max_frames: int = DEFAULT_MAX_FRAMES
) -> dict:
    """Integer-exact curation features for one WAV blob. Never raises:
    undecodable audio reports the reason in ``decode_error`` with NULL
    metrics (row property, not task failure).

    - ``mean_square``: sum(sample²) // n — energy without the sqrt
      (compare thresholds squared); 0 for digital silence
    - ``peak_abs``: max |sample| in the 16-bit range
    - ``silence_permille``: frames with |sample| < 327 (≈1% FS)
    - ``clip_permille``: frames with |sample| ≥ 32760
    - ``zero_crossings``: sign alternations ((s[i-1]<0) != (s[i]<0)) —
      the crude pitch/noisiness proxy speech gates use
    """
    try:
        rate, channels, s = wav_samples(blob, max_frames)
    except AudioDecodeError as exc:
        return {
            "sample_rate": None, "channels": None, "n_frames": None,
            "duration_ms": None, "mean_square": None, "peak_abs": None,
            "silence_permille": None, "clip_permille": None,
            "zero_crossings": None, "decode_error": str(exc),
        }
    n = int(s.size)
    if n == 0:
        return {
            "sample_rate": rate, "channels": channels, "n_frames": 0,
            "duration_ms": 0, "mean_square": 0, "peak_abs": 0,
            "silence_permille": 1000, "clip_permille": 0,
            "zero_crossings": 0, "decode_error": None,
        }
    a = np.abs(s.astype(np.int64))
    neg = s < 0
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n,
        "duration_ms": n * 1000 // rate,
        "mean_square": int((a * a).sum()) // n,
        "peak_abs": int(a.max()),
        "silence_permille": int((a < SILENCE_ABS).sum()) * 1000 // n,
        "clip_permille": int((a >= CLIP_ABS).sum()) * 1000 // n,
        "zero_crossings": int((neg[1:] != neg[:-1]).sum()),
        "decode_error": None,
    }
