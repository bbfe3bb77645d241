"""Pure-stdlib image PIXEL decoding (PNG / BMP / GIF / JPEG dispatch)
+ perceptual hashes.

The container ships no PIL/opencv — but PNG is DEFLATE (stdlib zlib),
BMP is uncompressed, and GIF's LZW fits in forty lines. That makes
real pixel access — and therefore real perceptual hashing and
corpus-wide near-dup image dedupe (the LAION-style curation step) —
possible for the raster formats that dominate document packages and
web corpora, with no native codec. Baseline AND progressive JPEG
decode too (kernels/jpegdec.py — Huffman + numpy IDCT, successive
approximation), as does baseline TIFF (uncompressed/LZW/PackBits
strips); WEBP, CCITT-fax TIFF, and arithmetic-coded JPEG stay behind
the loud CodecUnavailableError (kernels/mediainfo.py still sniffs
their headers for metadata).

Everything here is a plain-Python worker kernel called from
mapInPandas batches (functions/media.py) — deterministic integer
arithmetic ONLY, so Spark and the DuckDB oracle can agree bit-for-bit
on the planted-formula spares.

Scale shape: decode cost is bounded BEFORE any decompression by the
header-declared pixel count (``max_pixels`` — the zip-bomb guard: a
67-byte PNG can declare a 2-gigapixel canvas), and the per-blob work
is O(bytes) with no cross-row state, so the operator parallelizes
as ordinary Arrow batches.

Reference parity: the reference hands media bytes to vision models
and dedupes them by sha256 (docproc/extractors/vision_llm.py:292-294);
pixel-level near-dup identity is a beyond-reference training-data
operator (SURVEY §6).
"""

from __future__ import annotations

import struct
import zlib
from functools import lru_cache

import numpy as np

__all__ = [
    "ImageDecodeError",
    "CodecUnavailableError",
    "decode_image_pixels",
    "encode_png",
    "lzw_decode_msb",
    "unfilter_scanline",
    "image_signature",
    "signature_from_rgb",
    "rgb_from_raw_samples",
    "gray_from_rgb",
    "box_resample",
    "dhash64_from_gray",
    "ahash64_from_gray",
    "signed64",
]

# Pixel-count cap enforced from the HEADER, before inflating anything.
DEFAULT_MAX_PIXELS = 16_000_000


class ImageDecodeError(ValueError):
    """Raised for corrupt, truncated, or unsupported-format images."""


class CodecUnavailableError(ImageDecodeError):
    """The format is recognized but needs a codec this engine does not
    implement (WEBP, CCITT-fax/JPEG-in-TIFF, arithmetic-coded or
    lossless JPEG) — a capability gap, not bad data. Callers that
    distinguish quarantine from env-stub catch this separately."""


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# colortype → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}
# Adam7 pass grid: (x0, y0, dx, dy)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def unfilter_scanline(
    ftype: int, line: bytearray, prev: bytearray, bpp: int
) -> None:
    """Invert ONE PNG-filtered scanline in place (filter types 1-4;
    type 0 is a no-op the caller skips). Shared by the PNG decoder here
    and the PDF /Predictor 10-15 chain (sources/pdf._unpredict) — one
    implementation of the five-filter inversion, not two drifting
    copies. Sub and Up vectorize with numpy (uint8 arithmetic wraps
    mod 256 exactly like the scalar ``& 0xFF``); Average and Paeth are
    inherently sequential in x and stay as loops."""
    row_bytes = len(line)
    if ftype == 1:  # Sub: out[i] = raw[i] + out[i-bpp] — a running sum
        if row_bytes >= 64:
            a = np.frombuffer(line, dtype=np.uint8)
            for r in range(bpp):
                np.add.accumulate(a[r::bpp], out=a[r::bpp])
        else:
            for i in range(bpp, row_bytes):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
    elif ftype == 2:  # Up
        if row_bytes >= 64:
            a = np.frombuffer(line, dtype=np.uint8)
            a += np.frombuffer(prev, dtype=np.uint8)
        else:
            for i in range(row_bytes):
                line[i] = (line[i] + prev[i]) & 0xFF
    elif ftype == 3:  # Average
        for i in range(row_bytes):
            left = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(row_bytes):
            left = line[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF


def _unfilter(raw: bytes, off: int, width: int, height: int,
              channels: int, depth: int) -> tuple[list[bytearray], int]:
    """Invert PNG scanline filtering for one (sub-)image; returns the
    filtered-out scanline byte rows and the new stream offset."""
    row_bytes = (width * channels * depth + 7) // 8
    bpp = max(1, (channels * depth) // 8)
    rows: list[bytearray] = []
    prev = bytearray(row_bytes)
    for _ in range(height):
        if off + 1 + row_bytes > len(raw):
            raise ImageDecodeError("png: truncated pixel data")
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + row_bytes])
        off += 1 + row_bytes
        if ftype > 4:
            raise ImageDecodeError(f"png: unknown filter type {ftype}")
        if ftype:
            unfilter_scanline(ftype, line, prev, bpp)
        rows.append(line)
        prev = line
    return rows, off


def _samples(line: bytearray, width: int, channels: int, depth: int) -> list[int]:
    """One scanline of filtered-out bytes → flat 8-bit sample list.
    Sub-byte depths unpack MSB-first and SCALE to 8-bit (the PNG
    convention: max sample value maps to 255); 16-bit keeps the high
    byte — except palette indices, which never scale (handled by the
    caller passing depth with colortype; indices use _indices)."""
    n = width * channels
    if depth == 8:
        return list(line[:n])
    if depth == 16:
        return [line[2 * i] for i in range(n)]
    out = []
    scale = 255 // ((1 << depth) - 1)
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    for i in range(n):
        byte = line[i // per_byte]
        shift = 8 - depth * (i % per_byte + 1)
        out.append(((byte >> shift) & mask) * scale)
    return out


def _indices(line: bytearray, width: int, depth: int) -> list[int]:
    """Palette indices: like _samples but WITHOUT 8-bit scaling."""
    if depth == 8:
        return list(line[:width])
    out = []
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    for i in range(width):
        byte = line[i // per_byte]
        shift = 8 - depth * (i % per_byte + 1)
        out.append((byte >> shift) & mask)
    return out


def _decode_png(b: bytes, max_pixels: int) -> tuple[int, int, bytearray]:
    pos = len(_PNG_SIG)
    w = h = depth = ctype = interlace = None
    plte: bytes | None = None
    trns: bytes | None = None
    idat: list[bytes] = []
    while pos + 8 <= len(b):
        ln = struct.unpack(">I", b[pos : pos + 4])[0]
        kind = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ImageDecodeError("png: truncated chunk")
        if kind == b"IHDR":
            if ln < 13:
                raise ImageDecodeError("png: short IHDR")
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            if comp != 0 or filt != 0:
                raise ImageDecodeError("png: nonzero compression/filter method")
            if ctype not in _PNG_CHANNELS:
                raise ImageDecodeError(f"png: bad color type {ctype}")
            if depth not in _PNG_DEPTHS[ctype]:
                raise ImageDecodeError(
                    f"png: depth {depth} invalid for color type {ctype}"
                )
            if interlace not in (0, 1):
                raise ImageDecodeError(f"png: bad interlace {interlace}")
            if not w or not h:
                raise ImageDecodeError("png: zero dimension")
            if w * h > max_pixels:  # BEFORE any inflate — zip-bomb guard
                raise ImageDecodeError(
                    f"png: {w}x{h} exceeds max_pixels={max_pixels}"
                )
        elif kind == b"PLTE":
            plte = data
        elif kind == b"tRNS":
            trns = data
        elif kind == b"IDAT":
            idat.append(data)
        elif kind == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ImageDecodeError("png: no IHDR")
    if not idat:
        raise ImageDecodeError("png: no IDAT")
    if ctype == 3 and plte is None:
        raise ImageDecodeError("png: palette image without PLTE")
    channels = _PNG_CHANNELS[ctype]
    try:
        # cap the inflate output too: a lying IHDR cannot widen it
        bound = (w * channels * depth + 7) // 8 * h + h + 64
        raw = zlib.decompressobj().decompress(b"".join(idat), bound * 2)
    except zlib.error as exc:
        raise ImageDecodeError(f"png: bad zlib stream ({exc})") from None

    # palette → (r, g, b, a) lookup with tRNS alpha
    pal: list[tuple[int, int, int, int]] | None = None
    pal_arr = None
    if ctype == 3:
        pal = []
        for i in range(len(plte) // 3):
            a = trns[i] if trns is not None and i < len(trns) else 255
            pal.append((plte[3 * i], plte[3 * i + 1], plte[3 * i + 2], a))
        pal_arr = np.asarray(pal, dtype=np.int32)  # (n, 4) rgba

    rgb = bytearray(w * h * 3)

    # vectorized whole-row path (the non-interlaced 8-bit common case:
    # xs is the full contiguous width) — integer-identical to the
    # scalar loops below, just numpy. Returns False when the row shape
    # needs the scalar path (sub-byte depths, Adam7 strided writes).
    def emit_row_fast(line: bytearray, y: int) -> bool:
        if depth != 8:
            return False
        o = y * w * 3
        if ctype == 2:
            rgb[o : o + w * 3] = line[: w * 3]
            return True
        if ctype == 0:
            rgb[o : o + w * 3] = (
                np.repeat(np.frombuffer(line, np.uint8, w), 3).tobytes()
            )
            return True
        if ctype == 6:
            arr = np.frombuffer(line, np.uint8, 4 * w).reshape(-1, 4)
            px = arr[:, :3].astype(np.int32)
            al = arr[:, 3:4].astype(np.int32)
            out = (px * al + 255 * (255 - al)) // 255
            rgb[o : o + w * 3] = out.astype(np.uint8).tobytes()
            return True
        if ctype == 4:
            arr = np.frombuffer(line, np.uint8, 2 * w).astype(np.int32)
            v, al = arr[0::2], arr[1::2]
            g2 = ((v * al + 255 * (255 - al)) // 255).astype(np.uint8)
            rgb[o : o + w * 3] = np.repeat(g2, 3).tobytes()
            return True
        if ctype == 3:
            idxs = np.frombuffer(line, np.uint8, w).astype(np.intp)
            if idxs.max(initial=0) >= len(pal_arr):
                raise ImageDecodeError("png: palette index out of range")
            px, al = pal_arr[idxs, :3], pal_arr[idxs, 3:4]
            out = (px * al + 255 * (255 - al)) // 255
            rgb[o : o + w * 3] = out.astype(np.uint8).tobytes()
            return True
        return False

    # decode each (sub-)image's scanlines straight into canvas writes;
    # xs carries the pass's x positions (row-major within the pass)
    def emit(line: bytearray, width_px: int, xs, y: int) -> None:
        if ctype == 3:
            idxs = _indices(line, width_px, depth)
            for k, x in enumerate(xs):
                idx = idxs[k]
                if idx >= len(pal):
                    raise ImageDecodeError("png: palette index out of range")
                r, g, bl, a = pal[idx]
                o = (y * w + x) * 3
                if a == 255:
                    rgb[o], rgb[o + 1], rgb[o + 2] = r, g, bl
                else:  # composite over white — document convention
                    rgb[o] = (r * a + 255 * (255 - a)) // 255
                    rgb[o + 1] = (g * a + 255 * (255 - a)) // 255
                    rgb[o + 2] = (bl * a + 255 * (255 - a)) // 255
            return
        vals = _samples(line, width_px, channels, depth)
        for k, x in enumerate(xs):
            o = (y * w + x) * 3
            if ctype == 0:
                v = vals[k]
                rgb[o] = rgb[o + 1] = rgb[o + 2] = v
            elif ctype == 2:
                rgb[o : o + 3] = bytes(vals[3 * k : 3 * k + 3])
            elif ctype == 4:
                v, a = vals[2 * k], vals[2 * k + 1]
                g2 = (v * a + 255 * (255 - a)) // 255
                rgb[o] = rgb[o + 1] = rgb[o + 2] = g2
            else:  # 6: RGBA
                r, g, bl, a = vals[4 * k : 4 * k + 4]
                rgb[o] = (r * a + 255 * (255 - a)) // 255
                rgb[o + 1] = (g * a + 255 * (255 - a)) // 255
                rgb[o + 2] = (bl * a + 255 * (255 - a)) // 255

    # whole-image fast path: non-interlaced 8-bit with EVERY scanline
    # filter 0 (this module's own encoder and most small-image encoders)
    # — no unfilter, no per-row loop; integer-identical to the row path
    def emit_image_fast(body: "np.ndarray") -> bool:
        if ctype == 2:
            rgb[:] = body.tobytes()
            return True
        if ctype == 0:
            rgb[:] = np.repeat(body.ravel(), 3).tobytes()
            return True
        if ctype == 6:
            arr = body.reshape(-1, 4)
            px = arr[:, :3].astype(np.int32)
            al = arr[:, 3:4].astype(np.int32)
            rgb[:] = ((px * al + 255 * (255 - al)) // 255).astype(np.uint8).tobytes()
            return True
        if ctype == 4:
            arr = body.reshape(-1, 2).astype(np.int32)
            v, al = arr[:, 0], arr[:, 1]
            g2 = ((v * al + 255 * (255 - al)) // 255).astype(np.uint8)
            rgb[:] = np.repeat(g2, 3).tobytes()
            return True
        if ctype == 3:
            idxs = body.ravel().astype(np.intp)
            if idxs.max(initial=0) >= len(pal_arr):
                raise ImageDecodeError("png: palette index out of range")
            px, al = pal_arr[idxs, :3], pal_arr[idxs, 3:4]
            rgb[:] = ((px * al + 255 * (255 - al)) // 255).astype(np.uint8).tobytes()
            return True
        return False

    if interlace == 0 and depth == 8:
        rb = w * channels
        need = h * (rb + 1)
        if len(raw) >= need:
            fa = np.frombuffer(raw, np.uint8, need).reshape(h, rb + 1)
            if not fa[:, 0].any() and emit_image_fast(fa[:, 1:]):
                return w, h, rgb

    if interlace == 0:
        rows, _ = _unfilter(raw, 0, w, h, channels, depth)
        allx = list(range(w))
        for y, line in enumerate(rows):
            if not emit_row_fast(line, y):
                emit(line, w, allx, y)
    else:  # Adam7
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, off = _unfilter(raw, off, pw, ph, channels, depth)
            xs = list(range(x0, w, dx))
            for r_i, line in enumerate(rows):
                emit(line, pw, xs, y0 + r_i * dy)
    return w, h, rgb


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER+, BI_RGB, 8/24/32 bpp)
# ---------------------------------------------------------------------------
def _decode_bmp(b: bytes, max_pixels: int) -> tuple[int, int, bytearray]:
    if len(b) < 54:
        raise ImageDecodeError("bmp: truncated header")
    pix_off = struct.unpack("<I", b[10:14])[0]
    hdr_size = struct.unpack("<I", b[14:18])[0]
    if hdr_size < 40:
        raise ImageDecodeError("bmp: pre-BITMAPINFOHEADER not supported")
    w, h_raw = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    comp = struct.unpack("<I", b[30:34])[0]
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ImageDecodeError("bmp: bad dimensions")
    if w * h > max_pixels:
        raise ImageDecodeError(f"bmp: {w}x{h} exceeds max_pixels={max_pixels}")
    # BI_RGB only; BI_BITFIELDS with the standard BGRA masks is the one
    # other wild variant — accept it for 32bpp when the masks say BGRA.
    # The three masks sit at absolute offset 54 whether the DIB header
    # is 40 bytes (masks follow it) or 108/124 (masks inside it).
    if comp == 3 and bpp == 32:
        if len(b) < 66 or struct.unpack("<III", b[54:66]) != (
            0x00FF0000, 0x0000FF00, 0x000000FF,
        ):
            raise ImageDecodeError("bmp: nonstandard bitfields")
    elif comp != 0:
        raise ImageDecodeError(f"bmp: compression {comp} not supported")
    if bpp not in (8, 24, 32):
        raise ImageDecodeError(f"bmp: {bpp}bpp not supported")
    pal = None
    if bpp == 8:
        n_colors = struct.unpack("<I", b[46:50])[0] or 256
        pal_at = 14 + hdr_size
        if pal_at + 4 * n_colors > len(b):
            raise ImageDecodeError("bmp: truncated palette")
        pal = [
            (b[pal_at + 4 * i + 2], b[pal_at + 4 * i + 1], b[pal_at + 4 * i])
            for i in range(n_colors)
        ]
    stride = (w * bpp // 8 + 3) & ~3
    if pix_off + stride * h > len(b):
        raise ImageDecodeError("bmp: truncated pixel data")
    rgb = bytearray(w * h * 3)
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        row = pix_off + src_y * stride
        o = y * w * 3
        if bpp == 8:
            for x in range(w):
                idx = b[row + x]
                if idx >= len(pal):
                    raise ImageDecodeError("bmp: palette index out of range")
                rgb[o + 3 * x : o + 3 * x + 3] = bytes(pal[idx])
        else:
            step = bpp // 8
            for x in range(w):
                p = row + x * step
                rgb[o + 3 * x] = b[p + 2]      # BGR(A) order on disk
                rgb[o + 3 * x + 1] = b[p + 1]
                rgb[o + 3 * x + 2] = b[p]
    return w, h, rgb


# ---------------------------------------------------------------------------
# GIF (first frame; LZW; interlace; GCE transparency)
# ---------------------------------------------------------------------------
def _lzw_decode(min_code: int, data: bytes, max_out: int) -> bytearray:
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code + 1
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = table[: clear + 2]
                code_size = min_code + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                if code >= len(table):
                    raise ImageDecodeError("gif: bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ImageDecodeError("gif: LZW code out of range")
            out += entry
            if len(out) > max_out:
                raise ImageDecodeError("gif: LZW output exceeds canvas")
            prev = entry
            if len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def _decode_gif(b: bytes, max_pixels: int) -> tuple[int, int, bytearray]:
    if len(b) < 13:
        raise ImageDecodeError("gif: truncated header")
    flags = b[10]
    gct = None
    pos = 13
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = b[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ImageDecodeError("gif: truncated global color table")
        pos += 3 * n
    transparent = -1
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension
            if pos + 2 > len(b):
                raise ImageDecodeError("gif: truncated extension")
            label = b[pos + 1]
            pos += 2
            if pos >= len(b):  # file cut right after the label byte
                raise ImageDecodeError("gif: truncated extension")
            # Graphic Control Extension carries the transparent index
            if label == 0xF9 and pos + 1 + b[pos] <= len(b) and b[pos] >= 4:
                if b[pos + 1] & 0x01:
                    transparent = b[pos + 4]
            while pos < len(b) and b[pos] != 0:  # skip sub-blocks
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor — first frame only
            if pos + 10 > len(b):
                raise ImageDecodeError("gif: truncated image descriptor")
            w, h = struct.unpack("<HH", b[pos + 5 : pos + 9])
            iflags = b[pos + 9]
            pos += 10
            if not w or not h:
                raise ImageDecodeError("gif: zero dimension")
            if w * h > max_pixels:
                raise ImageDecodeError(
                    f"gif: {w}x{h} exceeds max_pixels={max_pixels}"
                )
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                table = b[pos : pos + 3 * n]
                if len(table) < 3 * n:
                    raise ImageDecodeError("gif: truncated local color table")
                pos += 3 * n
            if table is None:
                raise ImageDecodeError("gif: no color table")
            if pos >= len(b):
                raise ImageDecodeError("gif: missing LZW data")
            min_code = b[pos]
            pos += 1
            # literals are byte values, so the initial code size caps
            # at 8 (width grows to 12 from there)
            if not 2 <= min_code <= 8:
                raise ImageDecodeError(f"gif: bad LZW min code {min_code}")
            chunks = []
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                chunks.append(b[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idxs = _lzw_decode(min_code, b"".join(chunks), w * h)
            if len(idxs) < w * h:
                raise ImageDecodeError("gif: short pixel data")
            # interlaced GIF writes rows in 4 passes
            if iflags & 0x40:
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
            else:
                order = list(range(h))
            n_colors = len(table) // 3
            rgb = bytearray(w * h * 3)
            for src_row, y in enumerate(order):
                base = src_row * w
                o = y * w * 3
                for x in range(w):
                    idx = idxs[base + x]
                    if idx >= n_colors:
                        raise ImageDecodeError("gif: color index out of range")
                    if idx == transparent:
                        rgb[o + 3 * x : o + 3 * x + 3] = b"\xff\xff\xff"
                    else:
                        rgb[o + 3 * x : o + 3 * x + 3] = table[
                            3 * idx : 3 * idx + 3
                        ]
            return w, h, rgb
        elif block == 0x3B:  # trailer
            break
        else:
            raise ImageDecodeError(f"gif: unknown block 0x{block:02x}")
    raise ImageDecodeError("gif: no image frame")


# ---------------------------------------------------------------------------
# TIFF (baseline 6.0: uncompressed / LZW / PackBits strips)
# ---------------------------------------------------------------------------
_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4}


def lzw_decode_msb(
    data: bytes, early: int = 1, max_out: int | None = None
) -> bytes:
    """MSB-first LZW with 9→12-bit codes, 256=clear, 257=EOD, and the
    EarlyChange width convention — ONE implementation for the two specs
    that share it verbatim: PDF LZWDecode (ISO 32000 §7.4.4, via
    sources/pdf._lzw_decode) and TIFF compression 5 (TIFF 6.0 §13).
    Decoder widens at next_to_assign ≥ 2^width - early — 511 for
    EarlyChange=1 at 9 bits, the boundary pdfminer (hardcoded) and
    pdf.js (parameterized) both use; the decoder lags the encoder by
    one table entry (the entry a code defines is built while processing
    the FOLLOWING code), so the matching encoder switches as it ADDS
    entry 2^width - 1. ``max_out`` bounds the inflation (TIFF strips
    declare their decoded size; PDF streams pass None)."""
    out = bytearray()
    table: list[bytes] = []  # entries 258+
    width, prev = 9, None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:
                table, width, prev = [], 9, None
                continue
            if code == 257:
                return bytes(out)
            if code < 256:
                entry = bytes([code])
            elif 258 <= code < 258 + len(table):
                entry = table[code - 258]
            elif code == 258 + len(table) and prev is not None:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ImageDecodeError("lzw: code out of range")
            if prev is not None:
                table.append(prev + entry[:1])
            out += entry
            if max_out is not None and len(out) > max_out:
                raise ImageDecodeError("lzw: output exceeds bound")
            prev = entry
            if 258 + len(table) >= (1 << width) - early and width < 12:
                width += 1
    return bytes(out)  # EOD missing: tolerate, return what decoded


def _packbits(data: bytes, max_out: int) -> bytearray:
    """Apple PackBits RLE (TIFF compression 32773)."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            if i + n + 1 > len(data):
                raise ImageDecodeError("tiff: truncated packbits literal")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ImageDecodeError("tiff: truncated packbits run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
        if len(out) > max_out:
            raise ImageDecodeError("tiff: packbits output exceeds strip")
    return out


def _decode_tiff(b: bytes, max_pixels: int) -> tuple[int, int, bytearray]:
    order = "little" if b[:2] == b"II" else "big"

    def rd(off: int, n: int) -> int:
        if off + n > len(b):
            raise ImageDecodeError("tiff: truncated read")
        return int.from_bytes(b[off : off + n], order)

    ifd = rd(4, 4)
    n_ent = rd(ifd, 2)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n_ent):
        e = ifd + 2 + 12 * i
        tag, typ, cnt = rd(e, 2), rd(e + 2, 2), rd(e + 4, 4)
        size = _TIFF_TYPE_SIZE.get(typ, 1) * cnt
        tags[tag] = (typ, cnt, e + 8 if size <= 4 else rd(e + 8, 4))

    def vals(tag: int) -> list[int] | None:
        if tag not in tags:
            return None
        typ, cnt, voff = tags[tag]
        sz = _TIFF_TYPE_SIZE.get(typ, 1)
        if cnt > 1 << 20:
            raise ImageDecodeError("tiff: absurd tag count")
        return [rd(voff + i * sz, sz) for i in range(cnt)]

    def val(tag: int, default: int | None = None) -> int | None:
        v = vals(tag)
        return v[0] if v else default

    w, h = val(256), val(257)
    if not w or not h:
        raise ImageDecodeError("tiff: missing dimensions")
    if w * h > max_pixels:
        raise ImageDecodeError(
            f"tiff: {w}x{h} exceeds max_pixels={max_pixels}"
        )
    comp = val(259, 1)
    photo = val(262, 1)
    spp = val(277, 1)
    bps_list = vals(258) or [1]
    bps = bps_list[0]
    if any(x != bps for x in bps_list):
        raise ImageDecodeError("tiff: mixed bits per sample")
    if val(284, 1) != 1:
        raise ImageDecodeError("tiff: planar configuration not supported")
    if comp in (2, 3, 4):
        raise CodecUnavailableError("tiff: CCITT fax compression needs a codec")
    if comp in (6, 7):
        raise CodecUnavailableError("tiff: JPEG-in-TIFF needs its own scan")
    if comp not in (1, 5, 32773):
        raise CodecUnavailableError(f"tiff: compression {comp} not supported")
    ok = (bps == 8 and spp in (1, 3, 4)) or (bps == 1 and spp == 1)
    if not ok:
        # well-formed files our subset can't render (16-bit, extra
        # sample layouts) are a capability gap, not corrupt data
        raise CodecUnavailableError(
            f"tiff: {bps}-bit x{spp} samples not supported"
        )
    # multi-sample data must actually BE RGB(A): CMYK (photo 5) and
    # YCbCr (photo 6) would silently decode to garbage pixels
    if spp >= 3 and photo != 2:
        raise CodecUnavailableError(
            f"tiff: photometric {photo} with {spp} samples not supported"
        )
    if spp == 1 and photo not in (0, 1, 3):
        raise CodecUnavailableError(
            f"tiff: photometric {photo} not supported"
        )
    offs, cnts = vals(273), vals(279)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ImageDecodeError("tiff: missing strip layout")
    # clamp: RowsPerStrip=0xFFFFFFFF is the spec's "one strip" idiom,
    # and an unclamped value would unbound the decompression cap
    rows_per_strip = min(val(278, h) or h, h)
    row_bytes = (w * spp * bps + 7) // 8
    data = bytearray()
    for i, (off, cnt_) in enumerate(zip(offs, cnts)):
        if off + cnt_ > len(b):
            raise ImageDecodeError("tiff: truncated strip")
        raw = b[off : off + cnt_]
        # rows THIS strip must contribute — decoded output truncates to
        # exactly this, so an oversize strip cannot shift later rows
        strip_bytes = row_bytes * min(rows_per_strip, h - i * rows_per_strip)
        if strip_bytes <= 0:
            break  # more strips than rows: ignore the excess
        if comp == 5:
            strip = lzw_decode_msb(raw, 1, strip_bytes + 8)
        elif comp == 32773:
            strip = _packbits(raw, strip_bytes + 8)
        else:
            strip = raw
        data += strip[:strip_bytes]
    if len(data) < row_bytes * h:
        raise ImageDecodeError("tiff: short pixel data")
    if val(317, 1) == 2:  # horizontal differencing predictor
        if bps != 8:
            raise ImageDecodeError("tiff: sub-byte predictor not supported")
        for y in range(h):
            row = memoryview(data)[y * row_bytes : (y + 1) * row_bytes]
            line = bytearray(row)
            unfilter_scanline(1, line, line, spp)  # Sub == differencing
            row[:] = line
    rgb = bytearray(w * h * 3)
    if bps == 1:
        # bilevel, byte-aligned rows; photometric 0 = WhiteIsZero
        on, off_v = (0, 255) if photo == 0 else (255, 0)
        for y in range(h):
            row = data[y * row_bytes : (y + 1) * row_bytes]
            o = y * w * 3
            for x in range(w):
                v = on if (row[x >> 3] >> (7 - (x & 7))) & 1 else off_v
                rgb[o + 3 * x] = rgb[o + 3 * x + 1] = rgb[o + 3 * x + 2] = v
        return w, h, rgb
    px = np.frombuffer(bytes(data[: w * h * spp]), np.uint8).reshape(-1, spp)
    if spp == 1:
        if photo == 3:  # palette: ColorMap is 3*2^bps 16-bit channels
            cmap = vals(320)
            if not cmap or len(cmap) < 3 * 256:
                raise ImageDecodeError("tiff: missing color map")
            cm = (np.asarray(cmap[: 3 * 256], dtype=np.int32)
                  .reshape(3, 256).T >> 8).astype(np.uint8)
            out = cm[px[:, 0]]
        else:
            g = 255 - px[:, 0] if photo == 0 else px[:, 0]
            out = np.repeat(g[:, None], 3, axis=1)
    elif spp == 3:
        out = px
    else:  # RGBA: composite over white (ExtraSamples treated as alpha)
        al = px[:, 3:4].astype(np.int32)
        out = ((px[:, :3].astype(np.int32) * al + 255 * (255 - al)) // 255
               ).astype(np.uint8)
    return w, h, bytearray(out.tobytes())


# ---------------------------------------------------------------------------
# public decode + encode
# ---------------------------------------------------------------------------
def decode_image_pixels(
    blob: bytes | None, max_pixels: int = DEFAULT_MAX_PIXELS
) -> dict:
    """Decode PNG/BMP/GIF/JPEG/TIFF bytes to 8-bit RGB.

    Returns ``{"format", "width", "height", "rgb"}`` where ``rgb`` is
    ``bytes`` of row-major R,G,B triples. Alpha/transparency composites
    over white (the document-rendering convention, and what a beacon /
    blank-image gate should see). Raises :class:`ImageDecodeError` for
    corrupt or truncated input, and :class:`CodecUnavailableError` for
    the formats that still need a real codec (WEBP, CCITT fax,
    arithmetic JPEG), with a message saying so.
    """
    b = blob or b""
    if b[:8] == _PNG_SIG:
        w, h, rgb = _decode_png(b, max_pixels)
        fmt = "png"
    elif b[:2] == b"BM":
        w, h, rgb = _decode_bmp(b, max_pixels)
        fmt = "bmp"
    elif b[:6] in (b"GIF87a", b"GIF89a"):
        w, h, rgb = _decode_gif(b, max_pixels)
        fmt = "gif"
    elif b[:3] == b"\xff\xd8\xff":
        # baseline + progressive JPEG decode for real (jpegdec.py);
        # arithmetic/lossless/CMYK raise CodecUnavailableError there
        from docproc_spark.kernels.jpegdec import decode_jpeg

        w, h, rgb = decode_jpeg(b, max_pixels)
        fmt = "jpeg"
    elif b[:4] in (b"II*\x00", b"MM\x00*"):
        # baseline TIFF: uncompressed / LZW / PackBits strips decode
        # for real; CCITT fax and JPEG-in-TIFF raise CodecUnavailable
        w, h, rgb = _decode_tiff(b, max_pixels)
        fmt = "tiff"
    elif b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        raise CodecUnavailableError(
            "webp pixel decode needs a native codec not present "
            "in this environment (header metadata via kernels/mediainfo)"
        )
    else:
        raise ImageDecodeError("unrecognized image format")
    return {"format": fmt, "width": w, "height": h, "rgb": bytes(rgb)}


def encode_png(rgb: bytes, width: int, height: int) -> bytes:
    """Minimal PNG encoder: 8-bit RGB, filter 0, one zlib IDAT.

    Output is a fully valid PNG (real CRCs) that this module's own
    decoder — and any other PNG reader — round-trips exactly.
    """
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb length {len(rgb)} != {width}x{height}x3"
        )
    # filter-byte insertion vectorized (output bytes identical to the
    # per-row loop; this encoder sits in per-blob hot paths)
    arr = np.frombuffer(bytes(rgb), np.uint8).reshape(height, width * 3)
    out = np.empty((height, width * 3 + 1), np.uint8)
    out[:, 0] = 0
    out[:, 1:] = arr
    raw = out.tobytes()

    def chunk(kind: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + kind + payload
            + struct.pack(">I", zlib.crc32(kind + payload))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6)) + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# grayscale, resampling, perceptual hashes — integer-exact
# ---------------------------------------------------------------------------
def _gray_arr(rgb: bytes) -> "np.ndarray":
    """BT.601 integer luma as an int64 numpy array (internal hot path)."""
    a = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64).reshape(-1, 3)
    return (299 * a[:, 0] + 587 * a[:, 1] + 114 * a[:, 2]) // 1000


def gray_from_rgb(rgb: bytes) -> list[int]:
    """ITU-R BT.601 integer luma: (299R + 587G + 114B) // 1000.
    Vectorized; identical to the scalar formula (all-int arithmetic)."""
    return _gray_arr(rgb).tolist()


@lru_cache(maxsize=1024)
def _box_grid(n_in: int, n_out: int) -> tuple:
    """Cached box boundaries for one axis of the integer box resample
    (images in a corpus repeat a small set of dimensions)."""
    i = np.arange(n_out)
    lo = i * n_in // n_out
    hi = np.maximum(lo + 1, (i + 1) * n_in // n_out)
    return lo, hi


def _sat_table(a: "np.ndarray", w: int, h: int) -> "np.ndarray":
    """Inclusive int64 summed-area table with a zero border row/col."""
    a = np.asarray(a, dtype=np.int64).reshape(h, w)
    sat = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(a, axis=0), axis=1, out=sat[1:, 1:])
    return sat


def _box_from_sat(sat: "np.ndarray", w: int, h: int, ow: int, oh: int) -> "np.ndarray":
    """Box means from a prebuilt SAT (lets one gray image feed both the
    9x8 dHash and 8x8 aHash grids with a single cumsum pass)."""
    y0, y1 = _box_grid(h, oh)
    x0, x1 = _box_grid(w, ow)
    rows_hi, rows_lo = sat[y1], sat[y0]
    sums = (rows_hi[:, x1] - rows_hi[:, x0]) - (rows_lo[:, x1] - rows_lo[:, x0])
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return sums // area


def _box_resample_arr(a: "np.ndarray", w: int, h: int, ow: int, oh: int) -> "np.ndarray":
    """Integer box-mean resample on a flat int array → (oh, ow) int64
    array. Bit-identical to :func:`box_resample` (exact integer sums,
    floor division) — the array form skips the list round-trips."""
    return _box_from_sat(_sat_table(a, w, h), w, h, ow, oh)


def box_resample(
    gray: list[int], w: int, h: int, ow: int, oh: int
) -> list[int]:
    """Integer box-mean resample (floor). Output box (ox, oy) averages
    input range [ox*w//ow, max(that+1, (ox+1)*w//ow)) — the max() keeps
    every box non-empty even when upsampling, and (ow==w, oh==h) is the
    identity, which the DuckDB formula oracle relies on.

    Implemented as an int64 summed-area table: box sums are O(1) each
    and total work is one numpy cumsum pass — bit-identical to the
    naive double loop (exact integer sums, floor division)."""
    return _box_resample_arr(np.asarray(gray, dtype=np.int64), w, h, ow, oh).ravel().tolist()


def signed64(u: int) -> int:
    """Two's-complement fold into a signed 64-bit int (Spark/DuckDB
    BIGINT)."""
    return u - (1 << 64) if u >= (1 << 63) else u


def _pack_bits64(bits: "np.ndarray") -> int:
    """64 booleans (row-major MSB-first) → unsigned 64-bit int, exactly
    the ``u = (u << 1) | bit`` fold."""
    return int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])


def dhash64_from_gray(gray, w: int, h: int) -> int:
    """Difference hash: resample to 9x8, bit = left > right, row-major
    MSB-first. Robust to rescaling/re-encoding; brightness-shift
    sensitive only at gradient boundaries."""
    g = _box_resample_arr(np.asarray(gray, dtype=np.int64), w, h, 9, 8)
    return signed64(_pack_bits64((g[:, :8] > g[:, 1:]).ravel()))


def ahash64_from_gray(gray, w: int, h: int) -> int:
    """Average hash: resample to 8x8, bit = pixel > floor-mean,
    row-major MSB-first."""
    g = _box_resample_arr(np.asarray(gray, dtype=np.int64), w, h, 8, 8).ravel()
    mean = int(g.sum()) // 64
    return signed64(_pack_bits64(g > mean))


def signature_from_rgb(rgb: bytes, width: int, height: int,
                       fmt: str | None = None) -> dict:
    """Perceptual signature of already-decoded RGB pixels — the shared
    core of :func:`image_signature` and the PDF raw-sample path. One
    luma pass and ONE summed-area table feed both perceptual hashes
    (bit-identical to calling the public per-hash helpers)."""
    gray = _gray_arr(rgb)
    sat = _sat_table(gray, width, height)
    gd = _box_from_sat(sat, width, height, 9, 8)
    ga = _box_from_sat(sat, width, height, 8, 8).ravel()
    return {
        "format": fmt,
        "width": width,
        "height": height,
        "gray_mean": int(gray.sum()) // len(gray),
        "dhash64": signed64(_pack_bits64((gd[:, :8] > gd[:, 1:]).ravel())),
        "ahash64": signed64(_pack_bits64(ga > (int(ga.sum()) // 64))),
        "decode_error": None,
    }


def image_signature(
    blob: bytes | None, max_pixels: int = DEFAULT_MAX_PIXELS
) -> dict:
    """Decode + perceptual signature in one call (the mapInPandas
    kernel unit). Never raises: undecodable blobs return the error
    string in ``decode_error`` with NULL metrics — quarantine is a row
    property, not a task failure."""
    try:
        d = decode_image_pixels(blob, max_pixels)
    except ImageDecodeError as exc:
        return {
            "format": None, "width": None, "height": None,
            "gray_mean": None, "dhash64": None, "ahash64": None,
            "decode_error": str(exc),
        }
    return signature_from_rgb(d["rgb"], d["width"], d["height"], d["format"])


def rgb_from_raw_samples(
    samples: bytes,
    width: int,
    height: int,
    color: str,
    bpc: int,
    max_pixels: int = DEFAULT_MAX_PIXELS,
) -> bytes:
    """Containerless raster → RGB: the layout PDF image XObjects use
    after their filter chain is undone (ISO 32000 §8.9.5 — rows start
    byte-aligned, samples most-significant-bit first). ``color`` is
    'gray' or 'rgb'; ``bpc`` 1/2/4/8 for gray, 8 for rgb. Sub-byte
    gray scales to full range like PNG. Raises ImageDecodeError on
    unsupported combos or short data (CMYK / Indexed / 16-bit are the
    honest gaps — they need the color-space object resolved)."""
    if width <= 0 or height <= 0:
        raise ImageDecodeError("raw: bad dimensions")
    if width * height > max_pixels:
        raise ImageDecodeError(
            f"raw: {width}x{height} exceeds max_pixels={max_pixels}"
        )
    if color == "rgb":
        if bpc != 8:
            raise ImageDecodeError(f"raw: rgb bpc {bpc} not supported")
        need = width * height * 3
        if len(samples) < need:
            raise ImageDecodeError("raw: short sample data")
        return bytes(samples[:need])
    if color != "gray":
        raise ImageDecodeError(f"raw: color space {color!r} not supported")
    if bpc == 8:
        if len(samples) < width * height:
            raise ImageDecodeError("raw: short sample data")
        return bytes(v for v in samples[: width * height] for _ in range(3))
    if bpc not in (1, 2, 4):
        raise ImageDecodeError(f"raw: gray bpc {bpc} not supported")
    row_bytes = (width * bpc + 7) // 8
    if len(samples) < row_bytes * height:
        raise ImageDecodeError("raw: short sample data")
    scale = 255 // ((1 << bpc) - 1)
    per_byte = 8 // bpc
    mask = (1 << bpc) - 1
    out = bytearray()
    for y in range(height):
        row = samples[y * row_bytes : (y + 1) * row_bytes]
        for x in range(width):
            byte = row[x // per_byte]
            shift = 8 - bpc * (x % per_byte + 1)
            v = ((byte >> shift) & mask) * scale
            out += bytes((v, v, v))
    return bytes(out)
