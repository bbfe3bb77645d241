"""Container-header metadata for media blobs — pure stdlib, no codecs.

The sandbox has no PIL/ffmpeg, so PIXEL decode stays env-stubbed
(functions/media.decode_image) — but the container HEADERS of every
dominant web media format are plain public byte layouts, and parsing
them needs no codec at all.  This kernel reads format, dimensions,
duration, and audio parameters straight from the bytes:

  - PNG   (ISO 15948 §5.3: 8-byte signature, IHDR width/height BE32)
  - JPEG  (ISO 10918-1 §B: marker scan to the first SOFn frame header)
  - GIF   (GIF89a spec: logical screen descriptor, LE16)
  - WEBP  (RIFF container; VP8 frame tag §9.1 / VP8L §3 / VP8X canvas)
  - BMP   (BITMAPCOREHEADER / BITMAPINFOHEADER)
  - WAV   (RIFF/WAVE `fmt ` + `data` chunks; duration = data/byte-rate)
  - AVI   (RIFF/AVI `avih` main header: frame period, count, dims)
  - MP4   (ISO 14496-12 box walk: mvhd timescale/duration, tkhd 16.16
           track dims — any ISO-BMFF brand: mp4/m4a/mov/heic...)

This is what a 100-TB multimodal curation pass actually needs from
media bytes before any GPU sees them: beacon-pixel detection (1x1
trackers), aspect/resolution gates, audio sample-rate floors, duration
quotas — all from the first kilobyte of each blob.  Reference parity:
the reference ships blobs to a vision provider and never decodes
locally either (vision_llm.py:292-294 identifies media by sha256 of
raw bytes); header metadata is additive curation capability.

Every parser is defensive: truncated/corrupt input returns what was
readable (never raises), unknown magic returns an all-None row.
"""

from __future__ import annotations

import struct
from typing import Optional

__all__ = ["sniff_media_header", "EMPTY_META"]

# SOFn markers that carry frame dimensions (ISO 10918-1 table B.1) —
# C4/C8/CC are DHT/JPG/DAC, not frame headers.
_JPEG_SOF = frozenset(
    (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
)
# standalone markers with no length field
_JPEG_BARE = frozenset((0x01,)) | frozenset(range(0xD0, 0xD8))

EMPTY_META: dict[str, Optional[int | str]] = {
    "format": None,
    "media_kind": None,
    "width": None,
    "height": None,
    "duration_ms": None,
    "sample_rate": None,
    "channels": None,
}


def _be16(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 2], "big")


def _be32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 4], "big")


def _le16(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 2], "little")


def _le24(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 3], "little")


def _le32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 4], "little")


def _meta(format: str, kind: str, **kw) -> dict:
    out = dict(EMPTY_META)
    out["format"] = format
    out["media_kind"] = kind
    out.update(kw)
    return out


def _png(b: bytes) -> dict:
    if len(b) >= 24 and b[12:16] == b"IHDR":
        return _meta("png", "image", width=_be32(b, 16), height=_be32(b, 20))
    return _meta("png", "image")


def _jpeg(b: bytes) -> dict:
    i = 2
    n = len(b)
    while i + 1 < n:
        if b[i] != 0xFF:
            break  # desynced — stop rather than guess
        # fill bytes: any number of 0xFF may pad before a marker (§B.1.1.2)
        while i + 1 < n and b[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            break
        marker = b[i + 1]
        if marker in _JPEG_SOF:
            if i + 9 <= n:
                return _meta(
                    "jpeg", "image", width=_be16(b, i + 7), height=_be16(b, i + 5)
                )
            break
        if marker in (0xD9, 0xDA):
            break  # EOI / SOS: a frame header always precedes scan data
        if marker in _JPEG_BARE or marker == 0xD8:
            i += 2
            continue
        if i + 4 > n:
            break
        seg = _be16(b, i + 2)
        if seg < 2:
            break
        i += 2 + seg
    return _meta("jpeg", "image")


def _gif(b: bytes) -> dict:
    if len(b) >= 10:
        return _meta("gif", "image", width=_le16(b, 6), height=_le16(b, 8))
    return _meta("gif", "image")


def _bmp(b: bytes) -> dict:
    if len(b) < 22:
        return _meta("bmp", "image")
    hdr = _le32(b, 14)
    if hdr == 12:  # BITMAPCOREHEADER: 16-bit dims
        return _meta("bmp", "image", width=_le16(b, 18), height=_le16(b, 20))
    if hdr >= 40 and len(b) >= 26:  # BITMAPINFOHEADER+: signed 32-bit,
        w = struct.unpack_from("<i", b, 18)[0]  # negative height = top-down
        h = struct.unpack_from("<i", b, 22)[0]
        return _meta("bmp", "image", width=abs(w), height=abs(h))
    return _meta("bmp", "image")


def _riff_chunks(b: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size); chunks pad to even."""
    i = start
    while i + 8 <= end:
        cid = b[i : i + 4]
        size = _le32(b, i + 4)
        yield cid, i + 8, size
        i += 8 + size + (size & 1)


def _webp(b: bytes) -> dict:
    for cid, off, size in _riff_chunks(b, 12, min(len(b), 4096)):
        if cid == b"VP8X" and off + 10 <= len(b):
            # 4 bytes flags/reserved, then 24-bit canvas dims minus one
            return _meta(
                "webp", "image",
                width=1 + _le24(b, off + 4), height=1 + _le24(b, off + 7),
            )
        if cid == b"VP8 " and off + 10 <= len(b):
            if b[off + 3 : off + 6] == b"\x9d\x01\x2a":  # keyframe sync code
                return _meta(
                    "webp", "image",
                    width=_le16(b, off + 6) & 0x3FFF,
                    height=_le16(b, off + 8) & 0x3FFF,
                )
            return _meta("webp", "image")
        if cid == b"VP8L" and off + 5 <= len(b):
            if b[off] != 0x2F:
                return _meta("webp", "image")
            bits = _le32(b, off + 1)
            return _meta(
                "webp", "image",
                width=1 + (bits & 0x3FFF), height=1 + ((bits >> 14) & 0x3FFF),
            )
    return _meta("webp", "image")


def _wav(b: bytes) -> dict:
    out = _meta("wav", "audio")
    byte_rate = None
    data_size = None
    for cid, off, size in _riff_chunks(b, 12, len(b)):
        if cid == b"fmt " and size >= 16 and off + 16 <= len(b):
            out["channels"] = _le16(b, off + 2)
            out["sample_rate"] = _le32(b, off + 4)
            byte_rate = _le32(b, off + 8)
        elif cid == b"data":
            # size field is authoritative even when the payload is
            # truncated on disk — duration describes the encoded stream
            data_size = size
        if byte_rate is not None and data_size is not None:
            break
    if byte_rate and data_size is not None:
        out["duration_ms"] = data_size * 1000 // byte_rate
    return out


def _avi(b: bytes) -> dict:
    out = _meta("avi", "video")

    def walk(start: int, end: int, depth: int) -> bool:
        if depth > 4:
            return False
        for cid, off, size in _riff_chunks(b, start, min(end, len(b))):
            if cid == b"LIST" and off + 4 <= len(b):
                if walk(off + 4, off + size, depth + 1):
                    return True
            elif cid == b"avih" and size >= 40 and off + 40 <= len(b):
                us_per_frame = _le32(b, off)
                total_frames = _le32(b, off + 16)
                out["width"] = _le32(b, off + 32)
                out["height"] = _le32(b, off + 36)
                out["duration_ms"] = us_per_frame * total_frames // 1000
                return True
        return False

    walk(12, len(b), 0)
    return out


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for ISO-BMFF boxes."""
    i = start
    while i + 8 <= end:
        size = _be32(b, i)
        btype = b[i + 4 : i + 8]
        payload = i + 8
        if size == 1:  # 64-bit largesize follows the type
            if i + 16 > end:
                return
            size = int.from_bytes(b[i + 8 : i + 16], "big")
            payload = i + 16
        elif size == 0:  # box extends to end of file
            size = end - i
        if size < 8 or i + size > end:
            return  # corrupt length — stop the walk
        yield btype, payload, i + size
        i += size


def _mp4(b: bytes) -> dict:
    out = _meta("mp4", "video")

    def scan(start: int, end: int, depth: int) -> None:
        if depth > 6:
            return
        for btype, p, q in _mp4_boxes(b, start, end):
            if btype in (b"moov", b"trak"):
                scan(p, q, depth + 1)
            elif btype == b"mvhd" and p + 4 <= len(b):
                v = b[p]
                if v == 1 and p + 32 <= len(b):
                    ts = _be32(b, p + 20)
                    dur = int.from_bytes(b[p + 24 : p + 32], "big")
                elif v == 0 and p + 20 <= len(b):
                    ts = _be32(b, p + 12)
                    dur = _be32(b, p + 16)
                else:
                    continue
                if ts:
                    out["duration_ms"] = dur * 1000 // ts
            elif btype == b"tkhd":
                # width/height are 16.16 fixed-point at the end of the
                # box; non-video tracks carry zero — keep the max
                v = b[p] if p < len(b) else 0
                wh = p + (88 if v == 1 else 76)
                if wh + 8 <= q and wh + 8 <= len(b):
                    w = _be32(b, wh) >> 16
                    h = _be32(b, wh + 4) >> 16
                    if w and h:
                        out["width"] = max(out["width"] or 0, w)
                        out["height"] = max(out["height"] or 0, h)

    scan(0, len(b), 0)
    return out


def sniff_media_header(blob: Optional[bytes]) -> dict:
    """Return {format, media_kind, width, height, duration_ms,
    sample_rate, channels} parsed from ``blob``'s container header.
    Unknown/empty input returns all-None; corrupt known formats return
    the format with whatever fields were readable.  Never raises."""
    b = blob or b""
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _png(b)
    if b[:2] == b"\xff\xd8":
        return _jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return _gif(b)
    if b[:2] == b"BM" and len(b) >= 18:
        return _bmp(b)
    if b[:4] == b"RIFF" and len(b) >= 12:
        four = b[8:12]
        if four == b"WEBP":
            return _webp(b)
        if four == b"WAVE":
            return _wav(b)
        if four == b"AVI ":
            return _avi(b)
        return dict(EMPTY_META)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return _mp4(b)
    return dict(EMPTY_META)
