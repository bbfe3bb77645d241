"""Baseline JPEG decoding (kernels/jpegdec.py).

No JPEG codec exists in this container to generate fixtures, so the
tests carry their own spec-faithful encoder built from ITU-T T.81
directly: custom canonical Huffman tables, DC-difference + run-length
AC coding, byte stuffing, restart markers. Expected pixels are
hand-computed from the IDCT math (DC-only blocks are flat:
floor(DC*Q0/8 + 128.5); single-AC blocks compute through an
independently-written basis formula), so the decoder must invert real
entropy coding AND get the signal math right — not merely round-trip
its own assumptions.
"""

from __future__ import annotations

import math
import struct

import pytest

from docproc_spark.kernels.imagepix import (
    CodecUnavailableError,
    ImageDecodeError,
)
from docproc_spark.kernels.jpegdec import decode_jpeg

# ---------------------------------------------------------------------------
# fixture encoder (independent of the decoder)
# ---------------------------------------------------------------------------

# DC table: symbols 0..11, all 4-bit codes (canonical: code == symbol)
DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
DC_SYMBOLS = bytes(range(12))
# AC table: len-2 codes 00→EOB(0x00), 01→0x01 (run0,size1), 10→0x11
AC_COUNTS = bytes([0, 3] + [0] * 14)
AC_SYMBOLS = bytes([0x00, 0x01, 0x11])


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.put(1, 1)  # pad with 1s per spec


def _dc_code(wtr: _BitWriter, diff: int) -> None:
    mag = abs(diff)
    t = mag.bit_length()
    wtr.put(t, 4)  # our DC codes equal their symbol, 4 bits
    if t:
        wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def make_jpeg(
    w: int,
    h: int,
    comp_spec: list[tuple[int, int]],  # (hs, vs) per component
    block_codes,  # callable(wtr, comp_idx, block_no) encodes ONE block
    q: int = 16,
    restart: int = 0,
    sof: int = 0xC0,
) -> bytes:
    n = len(comp_spec)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([q] * 64))
    sofp = bytes([8]) + struct.pack(">HH", h, w) + bytes([n])
    for i, (hs, vs) in enumerate(comp_spec):
        sofp += bytes([i + 1, (hs << 4) | vs, 0])
    out += _seg(sof, sofp)
    out += _seg(0xC4, bytes([0x00]) + DC_COUNTS + DC_SYMBOLS)
    out += _seg(0xC4, bytes([0x10]) + AC_COUNTS + AC_SYMBOLS)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sosp = bytes([n])
    for i in range(n):
        sosp += bytes([i + 1, 0x00])
    sosp += bytes([0, 63, 0])
    out += _seg(0xDA, sosp)
    hmax = max(hs for hs, _ in comp_spec)
    vmax = max(vs for _, vs in comp_spec)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    wtr = _BitWriter()
    blockno = [0] * n
    mcu_i = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                wtr.flush()
                out += wtr.out
                wtr = _BitWriter()
                out += bytes([0xFF, 0xD0 + ((mcu_i // restart - 1) % 8)])
            mcu_i += 1
            for ci, (hs, vs) in enumerate(comp_spec):
                for _ in range(hs * vs):
                    block_codes(wtr, ci, blockno[ci])
                    blockno[ci] += 1
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


def dc_only_gray(w, h, dc_per_block, q=16, restart=0):
    """Grayscale image of flat 8x8 blocks with the given (absolute) DC
    values; the encoder tracks the running DC prediction itself."""
    pred = {"v": 0, "last_restart": 0}

    def enc(wtr, ci, bno):
        if restart and bno and bno % restart == 0:
            pred["v"] = 0  # encoder-side pred reset at restart
        diff = dc_per_block[bno] - pred["v"]
        pred["v"] = dc_per_block[bno]
        _dc_code(wtr, diff)
        wtr.put(0b00, 2)  # EOB

    return make_jpeg(w, h, [(1, 1)], enc, q=q, restart=restart)


def flat_expect(dc, q=16):
    return max(0, min(255, math.floor(dc * q / 8 + 128.5)))


class TestGray:
    def test_flat_block(self):
        jpg = dc_only_gray(8, 8, [10])
        w, h, rgb = decode_jpeg(jpg)
        assert (w, h) == (8, 8)
        v = flat_expect(10)
        assert rgb == bytes([v, v, v]) * 64

    def test_dc_prediction_chain_and_crop(self):
        # 20x10 → MCU grid 3x2 = 6 blocks, cropped to 20x10
        dcs = [0, 12, -9, 4, 4, -20]
        jpg = dc_only_gray(20, 10, dcs)
        w, h, rgb = decode_jpeg(jpg)
        assert (w, h) == (20, 10)
        for y, x in ((0, 0), (0, 8), (0, 16), (8, 0), (9, 19)):
            bno = (y // 8) * 3 + (x // 8)
            assert rgb[(y * 20 + x) * 3] == flat_expect(dcs[bno]), (y, x)

    def test_negative_and_large_dc_clamp(self):
        jpg = dc_only_gray(8, 8, [-100])  # -100*16/8+128.5 → clamps to 0
        _, _, rgb = decode_jpeg(jpg)
        assert rgb[0] == 0
        jpg = dc_only_gray(8, 8, [100])
        _, _, rgb = decode_jpeg(jpg)
        assert rgb[0] == 255

    def test_single_ac_coefficient_matches_basis_math(self):
        # DC=0, one AC at zigzag position 1 (natural u=0, v=1), value 3
        def enc(wtr, ci, bno):
            _dc_code(wtr, 0)
            wtr.put(0b01, 2)   # symbol 0x01: run 0, size 1
            wtr.put(1, 1)      # magnitude bits: value +1... size1 → ±1
            wtr.put(0b00, 2)   # EOB

        jpg = make_jpeg(8, 8, [(1, 1)], enc, q=16)
        w, h, rgb = decode_jpeg(jpg)
        # independent IDCT: f(x,y) = C(0)C(1)/4 * 1*q * cos((2y+1)pi/16)
        for y in (0, 3, 7):
            for x in (0, 5):
                f = 0.25 * (0.5 ** 0.5) * 16 * math.cos((2 * x + 1) * math.pi / 16)
                exp = max(0, min(255, math.floor(f + 128.5)))
                assert rgb[(y * 8 + x) * 3] == exp, (x, y)

    def test_restart_markers_reset_prediction(self):
        dcs = [7, 7, 7]  # 24x8; with DRI=1 each block codes diff=7 fresh
        jpg = dc_only_gray(24, 8, dcs, restart=1)
        assert b"\xff\xd0" in jpg and b"\xff\xd1" in jpg
        _, _, rgb = decode_jpeg(jpg)
        v = flat_expect(7)
        assert rgb[0] == rgb[8 * 3] == rgb[16 * 3] == v


class TestColor:
    def test_444_constant_color(self):
        # comp DCs chosen so Y/Cb/Cr are flat: Y=16 → 160.5→160,
        # Cb=-10 → 108, Cr=+5 → 138
        dcv = {0: 16, 1: -10, 2: 5}

        def enc(wtr, ci, bno):
            _dc_code(wtr, dcv[ci] if bno == 0 else 0)
            wtr.put(0b00, 2)

        jpg = make_jpeg(8, 8, [(1, 1), (1, 1), (1, 1)], enc, q=16)
        w, h, rgb = decode_jpeg(jpg)
        y, cb, cr = (flat_expect(dcv[i]) for i in range(3))
        cb -= 128
        cr -= 128
        r = min(255, max(0, y + ((91881 * cr + 32768) >> 16)))
        g = min(255, max(0, y - ((22554 * cb + 46802 * cr + 32768) >> 16)))
        b_ = min(255, max(0, y + ((116130 * cb + 32768) >> 16)))
        assert rgb[:3] == bytes([r, g, b_])
        assert rgb == rgb[:3] * 64

    def test_420_upsampling(self):
        # one 16x16 MCU: Y is 4 blocks with distinct DCs, chroma neutral
        ydc = [0, 8, -8, 16]

        def enc(wtr, ci, bno):
            if ci == 0:
                prev = ydc[bno - 1] if bno else 0
                _dc_code(wtr, ydc[bno] - prev)
            else:
                _dc_code(wtr, 0)
            wtr.put(0b00, 2)

        jpg = make_jpeg(16, 16, [(2, 2), (1, 1), (1, 1)], enc, q=16)
        w, h, rgb = decode_jpeg(jpg)
        assert (w, h) == (16, 16)
        # neutral chroma (cb=cr=128 after +128 shift): r=g=b=Y... up to
        # the conversion's rounding at exactly 0 → all three equal Y
        for (bx, by), dc in zip(((0, 0), (1, 0), (0, 1), (1, 1)), ydc):
            y_val = flat_expect(dc)
            px = rgb[((by * 8 + 4) * 16 + bx * 8 + 4) * 3 :][:3]
            assert px == bytes([y_val] * 3), (bx, by)

    def test_422_sampling(self):
        def enc(wtr, ci, bno):
            _dc_code(wtr, 5 if (ci == 0 and bno == 0) else 0)
            wtr.put(0b00, 2)

        jpg = make_jpeg(16, 8, [(2, 1), (1, 1), (1, 1)], enc, q=16)
        w, h, rgb = decode_jpeg(jpg)
        assert (w, h) == (16, 8)
        assert rgb[0] == flat_expect(5)


class TestSubsetGates:
    def test_progressive_and_cmyk_report_codec_gap(self):
        jpg = dc_only_gray(8, 8, [0])
        prog = jpg.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(CodecUnavailableError, match="progressive"):
            decode_jpeg(prog)
        # 4-component SOF
        with pytest.raises(CodecUnavailableError, match="component"):
            sofp = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([4]) + bytes(12)
            decode_jpeg(b"\xff\xd8" + _seg(0xC0, sofp))

    def test_corrupt_streams_raise_decode_error_only(self):
        jpg = dc_only_gray(16, 16, [3, -3, 5, 1])
        import random

        rnd = random.Random(99)
        for _ in range(600):
            m = bytearray(jpg)
            for _ in range(rnd.randrange(1, 4)):
                m[rnd.randrange(len(m))] = rnd.randrange(256)
            if rnd.random() < 0.5:
                m = m[: rnd.randrange(len(m))]
            try:
                decode_jpeg(bytes(m))
            except ImageDecodeError:
                pass  # includes CodecUnavailableError; nothing else escapes

    def test_zip_bomb_header_rejected(self):
        with pytest.raises(ImageDecodeError, match="max_pixels"):
            sofp = (
                bytes([8]) + struct.pack(">HH", 60000, 60000) + bytes([1])
                + bytes([1, 0x11, 0])
            )
            decode_jpeg(b"\xff\xd8" + _seg(0xC0, sofp))


class TestIntegration:
    def test_dispatch_from_decode_image_pixels(self):
        from docproc_spark.kernels.imagepix import (
            decode_image_pixels,
            image_signature,
        )

        jpg = dc_only_gray(8, 8, [10])
        d = decode_image_pixels(jpg)
        assert (d["format"], d["width"], d["height"]) == ("jpeg", 8, 8)
        v = flat_expect(10)
        assert d["rgb"] == bytes([v, v, v]) * 64
        sig = image_signature(jpg)
        assert sig["decode_error"] is None and sig["gray_mean"] == v

    def test_progressive_still_reports_via_signature(self):
        from docproc_spark.kernels.imagepix import image_signature

        jpg = dc_only_gray(8, 8, [0]).replace(b"\xff\xc0", b"\xff\xc2", 1)
        sig = image_signature(jpg)
        assert sig["dhash64"] is None and "progressive" in sig["decode_error"]
