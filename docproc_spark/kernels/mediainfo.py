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
  - TIFF  (II/MM byte order, first-IFD walk: ImageWidth/ImageLength
           tags 256/257, SHORT-or-LONG inline values)
  - ICO   (icon directory: largest entry's dims, 0 meaning 256)
  - SVG   (text scan: width/height attributes in px units, else the
           viewBox extent — the one vector format web corpora carry)
  - FLAC  (STREAMINFO block: 20-bit rate, 3-bit channels, 36-bit
           total samples — duration exact by spec)
  - MP3   (ID3v2 skip, MPEG frame-sync header tables; Xing/Info frame
           count for VBR duration, file-size/bitrate estimate for CBR)
  - OGG   (page framing; Vorbis/Opus identification headers; duration
           from the LAST page's granule position — Opus granules run at
           48 kHz minus pre-skip per RFC 7845 §4/§5.1)

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

import re
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


# ISO-BMFF major brand → (format, media_kind); everything else is the
# generic video container. Audio-only and still-image brands matter:
# curation gates on media_kind, and .m4a / .heic ride the same ftyp box.
_BMFF_BRANDS = {
    b"M4A ": ("m4a", "audio"),
    b"M4B ": ("m4a", "audio"),
    b"heic": ("heic", "image"),
    b"heix": ("heic", "image"),
    b"mif1": ("heic", "image"),
    b"msf1": ("heic", "image"),
    b"avif": ("avif", "image"),
    b"avis": ("avif", "image"),
}


def _mp4(b: bytes) -> dict:
    fmt, kind = _BMFF_BRANDS.get(b[8:12], ("mp4", "video"))
    out = _meta(fmt, kind)

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


def _tiff(b: bytes) -> dict:
    out = _meta("tiff", "image")
    little = b[:2] == b"II"
    order = "little" if little else "big"

    def rd(i: int, n: int) -> int:
        return int.from_bytes(b[i : i + n], order)

    ifd = rd(4, 4)
    if ifd + 2 > len(b):
        return out
    n_entries = rd(ifd, 2)
    for k in range(min(n_entries, 256)):
        e = ifd + 2 + 12 * k
        if e + 12 > len(b):
            break
        tag, typ = rd(e, 2), rd(e + 2, 2)
        if tag in (256, 257) and rd(e + 4, 4) == 1:
            # SHORT(3) reads the first 2 bytes of the value field,
            # LONG(4) all 4 — inline either way at count 1
            val = rd(e + 8, 2) if typ == 3 else rd(e + 8, 4) if typ == 4 else None
            if val is not None:
                out["width" if tag == 256 else "height"] = val
    return out


def _ico(b: bytes) -> dict:
    out = _meta("ico", "image")
    count = _le16(b, 4)
    best = -1
    for k in range(min(count, 64)):
        e = 6 + 16 * k
        if e + 16 > len(b):
            break
        w = b[e] or 256  # 0 means 256 (the format's one quirk)
        h = b[e + 1] or 256
        if w * h > best:
            best = w * h
            out["width"], out["height"] = w, h
    return out


_SVG_TAG_RE = re.compile(rb"<svg[\s>]", re.I)
_SVG_NUM = rb"([0-9]+(?:\.[0-9]+)?)"
_SVG_END = rb"(?:px)?\s*[\"']"


def _svg(b: bytes) -> dict:
    out = _meta("svg", "image")
    head = b[: _SVG_TAG_RE.search(b).end()]  # caller guarantees a match
    tag_end = b.find(b">", len(head) - 1)
    tag = b[len(head) - 1 : tag_end if tag_end != -1 else len(b)]
    dims = {}
    for key in (b"width", b"height"):
        # (?<![-\w]): plain \b would let stroke-width match as width
        m = re.search(
            rb"(?<![-\w])" + key + rb"\s*=\s*[\"']\s*" + _SVG_NUM + _SVG_END,
            tag,
            re.I,
        )
        if m:
            dims[key] = int(float(m.group(1)))
    if len(dims) == 2:
        out["width"], out["height"] = dims[b"width"], dims[b"height"]
        return out
    m = re.search(
        rb"\bviewBox\s*=\s*[\"']\s*" + (rb"[-0-9.]+[\s,]+" * 2)
        + _SVG_NUM + rb"[\s,]+" + _SVG_NUM + rb"\s*[\"']",
        tag,
        re.I,
    )
    if m:
        out["width"] = int(float(m.group(1)))
        out["height"] = int(float(m.group(2)))
    return out


def _flac(b: bytes) -> dict:
    # STREAMINFO is mandatory-first (format §"STREAM"): 4-byte block
    # header at 4, then min/max blocksize (2+2) + min/max framesize
    # (3+3) at 8, then 8 bytes packing rate(20) chan-1(3) bps-1(5)
    # total-samples(36) at 18
    if len(b) < 26 or (b[4] & 0x7F) != 0:
        return _meta("flac", "audio")
    packed = int.from_bytes(b[18:26], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    total = packed & ((1 << 36) - 1)
    out = _meta("flac", "audio", channels=channels)
    if rate:
        out["sample_rate"] = rate
        if total:  # 0 = unknown length, per spec
            out["duration_ms"] = total * 1000 // rate
    return out


# MPEG audio frame-header tables (ISO 11172-3 / 13818-3). Bitrates in
# kbps, index 0 = "free" and 15 = invalid (both rejected); sample rates
# by version field (MPEG1 / MPEG2 / MPEG2.5).
_MP3_BITRATES = {
    # (version_group, layer): row — version_group 1 = MPEG1, 2 = MPEG2/2.5
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
}
_MP3_RATES = {0b11: (44100, 48000, 32000),  # MPEG1
              0b10: (22050, 24000, 16000),  # MPEG2
              0b00: (11025, 12000, 8000)}   # MPEG2.5


def _mp3(b: bytes) -> dict:
    out = _meta("mp3", "audio")
    start = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        # syncsafe 28-bit tag size (ID3v2 §3.1) + 10-byte header
        ss = b[6:10]
        start = 10 + (
            (ss[0] & 0x7F) << 21 | (ss[1] & 0x7F) << 14
            | (ss[2] & 0x7F) << 7 | (ss[3] & 0x7F)
        )
    # scan a bounded window for the first valid frame sync
    end = min(len(b) - 4, start + 65536)
    i = start
    while i <= end:
        if b[i] == 0xFF and (b[i + 1] & 0xE0) == 0xE0:
            ver = (b[i + 1] >> 3) & 0x3
            layer = (b[i + 1] >> 1) & 0x3
            br_idx = (b[i + 2] >> 4) & 0xF
            sr_idx = (b[i + 2] >> 2) & 0x3
            if ver != 0b01 and layer != 0 and 0 < br_idx < 15 and sr_idx < 3:
                layer_n = 4 - layer  # field 3/2/1 → layer 1/2/3
                vgroup = 1 if ver == 0b11 else 2
                bitrate = _MP3_BITRATES[(vgroup, layer_n)][br_idx] * 1000
                rate = _MP3_RATES[ver][sr_idx]
                mono = ((b[i + 3] >> 6) & 0x3) == 0b11
                out["sample_rate"] = rate
                out["channels"] = 1 if mono else 2
                spf = (  # samples per frame (layer/version table)
                    384 if layer_n == 1
                    else 1152 if layer_n == 2
                    else (1152 if vgroup == 1 else 576)
                )
                # VBR: Xing/Info frame count beats any bitrate estimate
                m = re.search(rb"Xing|Info", b[i : i + 200])
                if m:
                    at = i + m.start() + 4
                    if at + 8 <= len(b) and _be32(b, at) & 0x1:
                        frames = _be32(b, at + 4)
                        out["duration_ms"] = frames * spf * 1000 // rate
                        return out
                if bitrate:
                    out["duration_ms"] = (len(b) - start) * 8000 // bitrate
                return out
        i += 1
    return out


def _ogg(b: bytes) -> dict:
    out = _meta("ogg", "audio")
    # identification header is the first packet of the first page:
    # 27-byte page header + segment table (page_segments at 26)
    if len(b) < 28:
        return out
    body = 27 + b[26]
    rate = None
    pre_skip = 0
    opus = False
    if b[body : body + 7] == b"\x01vorbis" and body + 16 <= len(b):
        out["channels"] = b[body + 11]
        rate = _le32(b, body + 12)
        out["sample_rate"] = rate
    elif b[body : body + 8] == b"OpusHead" and body + 16 <= len(b):
        opus = True
        out["channels"] = b[body + 9]
        pre_skip = _le16(b, body + 10)
        out["sample_rate"] = _le32(b, body + 12)  # original input rate
        rate = 48000  # granule positions ALWAYS count at 48 kHz (RFC 7845)
    else:
        return out
    # duration = last page's granule position; pages can't exceed
    # 65307 bytes, so the final page header lives in the last 64 KiB
    tail_at = max(0, len(b) - 65536)
    last = b.rfind(b"OggS", tail_at)
    while last != -1 and last + 14 > len(b):
        last = b.rfind(b"OggS", tail_at, last)
    if last != -1 and rate:
        granule = int.from_bytes(b[last + 6 : last + 14], "little")
        if granule > 0 and granule != 0xFFFFFFFFFFFFFFFF:
            samples = granule - pre_skip if opus else granule
            if samples > 0:
                out["duration_ms"] = samples * 1000 // rate
    return out


def _looks_like_svg(b: bytes) -> bool:
    """SVG has no magic number: accept only markup-shaped input (leading
    '<' after optional BOM/whitespace) with an <svg> tag in the first
    KiB — generic XML without one stays unlabelled."""
    head = b[:1024]
    stripped = head.lstrip(b"\xef\xbb\xbf \t\r\n")
    return stripped[:1] == b"<" and _SVG_TAG_RE.search(head) is not None


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
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        return _tiff(b)
    if b[:4] == b"\x00\x00\x01\x00" and len(b) >= 6:
        return _ico(b)
    if _looks_like_svg(b):
        return _svg(b)
    if b[:4] == b"fLaC":
        return _flac(b)
    if b[:4] == b"OggS":
        return _ogg(b)
    if b[:3] == b"ID3":
        return _mp3(b)
    if len(b) >= 4 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0:
        # bare frame sync is only 11 bits of magic — accept the label
        # only when a full header validates (random \xff\xex must not
        # catalogue as mp3)
        out = _mp3(b)
        return out if out["sample_rate"] is not None else dict(EMPTY_META)
    return dict(EMPTY_META)
