"""Baseline + progressive JPEG decoding in pure Python + numpy.

Closes the biggest gap in the stdlib pixel path (kernels/imagepix.py):
DCT payloads are what document packages actually embed — PDF
/DCTDecode XObjects ARE JPEG files, and deck/web photos are JPEG —
so perceptual identity over real corpora needs this decoder far more
often than PNG/GIF.

Subset (honest, checked up front, each gap reported by name):
  - baseline sequential DCT (SOF0), extended sequential (SOF1), and
    PROGRESSIVE (SOF2: spectral selection + successive approximation,
    DC/AC first and refinement scans, EOB runs), 8-bit samples,
    1 or 3 components (grayscale / JFIF YCbCr), 4:4:4, 4:2:2, 4:2:0,
    4:1:1 sampling, restart markers
  - NOT: arithmetic coding (SOF9+), hierarchical/lossless, 12-bit,
    CMYK/Adobe 4-component — these raise CodecUnavailableError with
    the reason, and the catalogue records it per row

Determinism: the IDCT runs in float64 (a fixed numpy basis matrix,
same result on every platform) and quantizes with round-half-away
(np.rint is banker's — we use floor(x+0.5) explicitly), then clamps.
Color conversion is the integer-exact JFIF formula. Two decodes of
the same bytes are bit-identical everywhere, which is all perceptual
identity needs (there is no cross-engine oracle for JPEG).

Scale shape: decode cost is bounded by the SOF-declared pixel count
(``max_pixels``) BEFORE entropy decode; the Huffman loop is Python
(cache-friendly table walk) and everything after is vectorized numpy.

Reference parity: the reference feeds these bytes to vision models
and dedupes by sha256 (docproc/extractors/vision_llm.py:292-294);
pixel-level identity is a beyond-reference training-data operator.
"""

from __future__ import annotations

import struct

import numpy as np

from docproc_spark.kernels.imagepix import (
    DEFAULT_MAX_PIXELS,
    CodecUnavailableError,
    ImageDecodeError,
)

__all__ = ["decode_jpeg"]

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.intp)

# 8x8 IDCT basis: B[u, x] = C(u)/2 * cos((2x+1) u pi / 16)
_BASIS = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 ** 0.5) if _u == 0 else 1.0
    for _x in range(8):
        _BASIS[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _Huff:
    """Canonical JPEG Huffman table as a (code -> symbol) dict keyed by
    (length, code) — lookups walk lengths 1..16, matching the spec's
    DECODE procedure exactly."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lut[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing; stops at any non-RST marker."""

    def __init__(self, b: bytes, pos: int):
        self.b = b
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.b
        while self.nbits <= 24:
            if self.pos >= len(b):
                # past the end: pad with 1s (spec: fill bits) so a
                # final truncated code errors as bad-symbol, not IndexError
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            byte = b[self.pos]
            if byte == 0xFF:
                nxt = b[self.pos + 1] if self.pos + 1 < len(b) else 0xD9
                if nxt == 0x00:  # stuffed
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    return  # restart marker: caller resyncs
                else:
                    return  # EOI / next segment
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise ImageDecodeError("jpeg: entropy data exhausted")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lut.get((ln, code))
            if sym is not None:
                return sym
        raise ImageDecodeError("jpeg: invalid huffman code")

    def resync(self) -> None:
        """Skip to just past the next RSTn marker and reset bit state."""
        self.acc = 0
        self.nbits = 0
        b = self.b
        while self.pos + 1 < len(b):
            if b[self.pos] == 0xFF and 0xD0 <= b[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ImageDecodeError("jpeg: missing restart marker")

    def to_next_marker(self) -> int:
        """Byte position of the next non-RST marker at/after the
        current read position (entropy data consumed so far)."""
        b = self.b
        pos = self.pos
        while pos + 1 < len(b):
            if b[pos] == 0xFF and b[pos + 1] not in (0x00,) and not (
                0xD0 <= b[pos + 1] <= 0xD7
            ):
                return pos
            pos += 1
        return len(b)


def _extend(v: int, n: int) -> int:
    """JPEG EXTEND: map an n-bit magnitude to its signed value."""
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


_SOF_UNSUPPORTED = {
    0xC3: "lossless jpeg not supported",
    0xC5: "differential jpeg not supported",
    0xC6: "differential progressive jpeg not supported",
    0xC7: "lossless jpeg not supported",
    0xC9: "arithmetic-coded jpeg not supported",
    0xCA: "arithmetic-coded jpeg not supported",
    0xCB: "arithmetic-coded jpeg not supported",
    0xCD: "arithmetic-coded jpeg not supported",
    0xCE: "arithmetic-coded jpeg not supported",
    0xCF: "arithmetic-coded jpeg not supported",
}


def decode_jpeg(
    b: bytes, max_pixels: int = DEFAULT_MAX_PIXELS
) -> tuple[int, int, bytes]:
    """JPEG bytes (baseline or progressive) → (width, height,
    row-major RGB bytes). Raises ImageDecodeError for corrupt data or
    out-of-subset files — and ONLY that class: malformed streams that
    trip short-slice unpacks in segment parsing are folded into it
    (the decoders' never-escape contract, mutation-fuzz enforced)."""
    try:
        return _decode(b, max_pixels)
    except ImageDecodeError:
        raise
    except (IndexError, ValueError, struct.error) as exc:
        raise ImageDecodeError(
            f"jpeg: malformed stream ({type(exc).__name__})"
        ) from None


_PRED_CAP = 1 << 17  # legal 8-bit DCs stay under 2^11; the cap keeps a
# hostile stream of max-magnitude diffs (or a DHT mapping a code to a
# huge size symbol) inside int32 even after the << Al shift


def _dc_diff(r: _BitReader, c: dict) -> int:
    t = r.huff(c["dc"])
    if t > 15:
        raise ImageDecodeError("jpeg: bad DC size symbol")
    return _extend(r.bits(t), t) if t else 0


def _clamped_pred(c: dict, diff: int) -> int:
    c["pred"] = max(-_PRED_CAP, min(_PRED_CAP, c["pred"] + diff))
    return c["pred"]


def _block_sequential(r: _BitReader, c: dict, blk: np.ndarray) -> None:
    blk[0] = _clamped_pred(c, _dc_diff(r, c))
    k = 1
    while k < 64:
        rs = r.huff(c["ac"])
        rr, ss = rs >> 4, rs & 0xF
        if ss == 0:
            if rr == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ImageDecodeError("jpeg: AC index out of range")
        blk[k] = _extend(r.bits(ss), ss)
        k += 1


def _block_dc_first(r: _BitReader, c: dict, blk: np.ndarray, al: int) -> None:
    blk[0] = _clamped_pred(c, _dc_diff(r, c)) << al


def _block_dc_refine(r: _BitReader, blk: np.ndarray, al: int) -> None:
    # append the next magnitude bit (the de-facto libjpeg convention:
    # OR into the stored two's-complement coefficient)
    if r.bit():
        blk[0] |= 1 << al


def _block_ac_first(
    r: _BitReader, c: dict, blk: np.ndarray,
    ss_: int, se: int, al: int, eobrun: list[int],
) -> None:
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss_
    while k <= se:
        rs = r.huff(c["ac"])
        rr, ssz = rs >> 4, rs & 0xF
        if ssz == 0:
            if rr == 15:  # ZRL
                k += 16
                continue
            # EOBn: run of 2^rr + extra blocks, current one included
            eobrun[0] = (1 << rr) - 1
            if rr:
                eobrun[0] += r.bits(rr)
            return
        k += rr
        if k > se:
            raise ImageDecodeError("jpeg: AC index out of band")
        blk[k] = _extend(r.bits(ssz), ssz) << al
        k += 1


def _block_ac_refine(
    r: _BitReader, c: dict, blk: np.ndarray,
    ss_: int, se: int, al: int, eobrun: list[int],
) -> None:
    """T.81 G.1.2.3 AC successive-approximation refinement: new ±1
    coefficients arrive at the scan's bit position while every
    already-nonzero coefficient passed over absorbs one correction
    bit."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss_
    if eobrun[0] == 0:
        while k <= se:
            rs = r.huff(c["ac"])
            rr, ssz = rs >> 4, rs & 0xF
            val = 0
            if ssz == 0:
                if rr < 15:
                    eobrun[0] = 1 << rr
                    if rr:
                        eobrun[0] += r.bits(rr)
                    break  # rest of block handled by the EOB-run tail
                # ZRL: skip 16 zero-HISTORY positions
            else:
                if ssz != 1:
                    raise ImageDecodeError("jpeg: bad AC refine size")
                val = p1 if r.bit() else m1
            while k <= se:
                if blk[k]:
                    if r.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun[0] > 0:
        while k <= se:  # correction bits for the rest of the block
            if blk[k]:
                if r.bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun[0] -= 1


def _decode_scan(
    b: bytes,
    scan_at: int,
    scan_list: list[dict],
    params: tuple[int, int, int, int],
    geom: tuple[int, int],
    restart_interval: int,
    progressive: bool,
) -> int:
    """Entropy-decode one scan into the components' coefficient arrays;
    returns the byte position of the next marker."""
    ss_, se, ah, al = params
    mcux, mcuy = geom
    r = _BitReader(b, scan_at)
    eobrun = [0]
    for c in scan_list:
        c["pred"] = 0

    def maybe_restart(i: int) -> None:
        if restart_interval and i and i % restart_interval == 0:
            r.resync()
            eobrun[0] = 0
            for c in scan_list:
                c["pred"] = 0

    if len(scan_list) > 1:
        # interleaved MCU walk (sequential scans; progressive DC scans)
        i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(i)
                i += 1
                for c in scan_list:
                    for v in range(c["vs"]):
                        for u in range(c["hs"]):
                            blk = c["coef"][
                                (my * c["vs"] + v) * c["bw"]
                                + mx * c["hs"] + u
                            ]
                            if not progressive:
                                _block_sequential(r, c, blk)
                            elif ah == 0:
                                _block_dc_first(r, c, blk, al)
                            else:
                                _block_dc_refine(r, blk, al)
    else:
        # non-interleaved: iterate the component's REAL blocks only
        c = scan_list[0]
        for by in range(c["bh_real"]):
            for bx in range(c["bw_real"]):
                maybe_restart(by * c["bw_real"] + bx)
                blk = c["coef"][by * c["bw"] + bx]
                if not progressive:
                    _block_sequential(r, c, blk)
                elif ss_ == 0:
                    if ah == 0:
                        _block_dc_first(r, c, blk, al)
                    else:
                        _block_dc_refine(r, blk, al)
                elif ah == 0:
                    _block_ac_first(r, c, blk, ss_, se, al, eobrun)
                else:
                    _block_ac_refine(r, c, blk, ss_, se, al, eobrun)
    return r.to_next_marker()


def _decode(b: bytes, max_pixels: int) -> tuple[int, int, bytes]:
    if b[:2] != b"\xff\xd8":
        raise ImageDecodeError("jpeg: missing SOI")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    comps: list[dict] = []
    w = h = None
    hmax = vmax = mcux = mcuy = None
    progressive = False
    restart_interval = 0
    n_scans = 0
    pos = 2
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            pos += 1  # tolerate fill bytes between segments
            continue
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(b):
            break
        seg_len = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        seg = b[pos + 4 : pos + 2 + seg_len]
        if marker in _SOF_UNSUPPORTED:
            # a real, recognized JPEG our subset can't do — callers that
            # distinguish env/subset gaps from corrupt data catch this
            raise CodecUnavailableError(f"jpeg: {_SOF_UNSUPPORTED[marker]}")
        if marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            progressive = marker == 0xC2
            if len(seg) < 6:
                raise ImageDecodeError("jpeg: short SOF")
            prec = seg[0]
            if prec != 8:
                raise CodecUnavailableError(
                    f"jpeg: {prec}-bit not supported"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            n_comp = seg[5]
            if not w or not h:
                raise ImageDecodeError("jpeg: zero dimension")
            if w * h > max_pixels:
                raise ImageDecodeError(
                    f"jpeg: {w}x{h} exceeds max_pixels={max_pixels}"
                )
            if n_comp not in (1, 3):
                raise CodecUnavailableError(
                    f"jpeg: {n_comp}-component (CMYK/Adobe) not supported"
                )
            if len(seg) < 6 + 3 * n_comp:
                raise ImageDecodeError("jpeg: short SOF")
            comps = []
            for i in range(n_comp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({
                    "id": cid, "hs": hv >> 4, "vs": hv & 0xF, "tq": tq,
                })
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            if hmax == 0 or vmax == 0 or hmax > 4 or vmax > 4 or any(
                c["hs"] == 0 or c["vs"] == 0 for c in comps
            ):
                raise ImageDecodeError("jpeg: bad sampling factors")
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c["bw"] = mcux * c["hs"]  # padded (MCU) block grid
                c["bh"] = mcuy * c["vs"]
                # real block counts (non-interleaved scans code ONLY
                # these; the padding blocks exist only in MCU walks)
                cw = (w * c["hs"] + hmax - 1) // hmax
                ch = (h * c["vs"] + vmax - 1) // vmax
                c["bw_real"] = (cw + 7) // 8
                c["bh_real"] = (ch + 7) // 8
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc_th = seg[p]
                counts = seg[p + 1 : p + 17]
                n = sum(counts)
                symbols = seg[p + 17 : p + 17 + n]
                if len(symbols) < n:
                    raise ImageDecodeError("jpeg: truncated DHT")
                tab = _Huff(counts, symbols)
                if tc_th >> 4 == 0:
                    dc_tabs[tc_th & 0xF] = tab
                else:
                    ac_tabs[tc_th & 0xF] = tab
                p += 17 + n
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq_tq = seg[p]
                if pq_tq >> 4 == 0:
                    vals = np.frombuffer(
                        seg[p + 1 : p + 65], dtype=np.uint8
                    ).astype(np.int32)
                    p += 65
                else:  # 16-bit table
                    vals = np.frombuffer(
                        seg[p + 1 : p + 129], dtype=">u2"
                    ).astype(np.int32)
                    p += 129
                if vals.size < 64:
                    raise ImageDecodeError("jpeg: truncated DQT")
                qt[pq_tq & 0xF] = vals
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — decode the scan, keep going
            if w is None:
                raise ImageDecodeError("jpeg: SOS before SOF")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ImageDecodeError("jpeg: short SOS")
            by_id = {c["id"]: c for c in comps}
            scan_list = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i : 3 + 2 * i]
                c = by_id.get(cs)
                if c is None:
                    raise ImageDecodeError(
                        "jpeg: scan references unknown component"
                    )
                td, ta = td_ta >> 4, td_ta & 0xF
                c["td"], c["ta"] = td, ta
                scan_list.append(c)
            ss_, se, a = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            if not progressive:
                ss_, se, ah, al = 0, 63, 0, 0
            if ss_ > 63 or se > 63 or se < ss_:
                raise ImageDecodeError("jpeg: bad spectral selection")
            if progressive and ss_ == 0 and se != 0:
                raise ImageDecodeError(
                    "jpeg: progressive DC scan must have Se=0"
                )
            if progressive and ss_ > 0 and len(scan_list) != 1:
                raise ImageDecodeError(
                    "jpeg: interleaved progressive AC scan"
                )
            # bind only the tables this scan actually reads
            for c in scan_list:
                if (ss_ == 0 and ah == 0) or not progressive:
                    if c["td"] not in dc_tabs:
                        raise ImageDecodeError("jpeg: missing huffman table")
                    c["dc"] = dc_tabs[c["td"]]
                if (ss_ > 0 or not progressive) and se > 0:
                    if c["ta"] not in ac_tabs:
                        raise ImageDecodeError("jpeg: missing huffman table")
                    c["ac"] = ac_tabs[c["ta"]]
                if c["tq"] not in qt:
                    raise ImageDecodeError("jpeg: missing quantization table")
                # LATCH the quant table at the component's first scan —
                # a DQT redefinition after (or between) scans must not
                # change already-coded pixels (libjpeg semantics)
                c.setdefault("q", qt[c["tq"]])
                if ss_ == 0 or not progressive:
                    c["coded_dc"] = True
            n_scans += 1
            if n_scans > 256:
                raise ImageDecodeError("jpeg: too many scans")
            pos = _decode_scan(
                b, pos + 2 + seg_len, scan_list, (ss_, se, ah, al),
                (mcux, mcuy), restart_interval, progressive,
            )
            continue
        pos += 2 + seg_len
    if w is None:
        raise ImageDecodeError("jpeg: no SOF")
    if n_scans == 0:
        raise ImageDecodeError("jpeg: no SOS")
    for c in comps:
        # every component needs at least its DC coded — otherwise a
        # truncated multi-scan file would decode to plausible-looking
        # flat planes instead of quarantining
        if not c.get("coded_dc"):
            raise ImageDecodeError("jpeg: component never coded")

    # dequantize + IDCT + level shift, vectorized over all blocks/comp
    planes = []
    for c in comps:
        deq = (c["coef"] * c["q"][None, :]).astype(np.float64)
        m = np.zeros((deq.shape[0], 64))
        m[:, _ZIGZAG] = deq  # un-zigzag into natural order
        m = m.reshape(-1, 8, 8)
        # 2-D IDCT: Bᵀ · M · B  (basis rows are frequencies)
        sp = np.einsum("ux,nuv,vy->nxy", _BASIS, m, _BASIS, optimize=True)
        # round half away from zero, deterministic across platforms
        sp = np.floor(sp + 128.0 + 0.5)
        sp = np.clip(sp, 0, 255).astype(np.uint8)
        # stitch blocks → full sample plane
        bh, bw = c["bh"], c["bw"]
        plane = sp.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(
            bh * 8, bw * 8
        )
        # upsample to full resolution by sample repetition (nearest)
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if vmax % c["vs"] or hmax % c["hs"]:
            raise ImageDecodeError("jpeg: non-integer sampling ratio")
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w].astype(np.int32))

    if len(planes) == 1:
        g = planes[0].astype(np.uint8)
        return w, h, np.repeat(g[:, :, None], 3, axis=2).tobytes()
    y, cb, cr = planes
    cb = cb - 128
    cr = cr - 128
    # integer-exact JFIF conversion (scaled by 2^16, floor+round)
    r_ = y + ((91881 * cr + 32768) >> 16)
    g_ = y - ((22554 * cb + 46802 * cr + 32768) >> 16)
    b_ = y + ((116130 * cb + 32768) >> 16)
    rgb = np.stack(
        [np.clip(p, 0, 255).astype(np.uint8) for p in (r_, g_, b_)], axis=2
    )
    return w, h, rgb.tobytes()
