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


def make_prog_jpeg(w, h, comp_spec, scans, q=16):
    """Progressive fixture: ``scans`` is a list of
    (comp_idxs, Ss, Se, Ah, Al, encode(wtr)) — the callback writes the
    scan's complete entropy-coded payload."""
    n = len(comp_spec)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([q] * 64))
    sofp = bytes([8]) + struct.pack(">HH", h, w) + bytes([n])
    for i, (hs, vs) in enumerate(comp_spec):
        sofp += bytes([i + 1, (hs << 4) | vs, 0])
    out += _seg(0xC2, sofp)
    out += _seg(0xC4, bytes([0x00]) + DC_COUNTS + DC_SYMBOLS)
    out += _seg(0xC4, bytes([0x10]) + AC_COUNTS + AC_SYMBOLS)
    for comp_idxs, ss, se, ah, al, encode in scans:
        sosp = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            sosp += bytes([ci + 1, 0x00])
        sosp += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sosp)
        wtr = _BitWriter()
        encode(wtr)
        wtr.flush()
        out += wtr.out
    return bytes(out) + b"\xff\xd9"


class TestProgressive:
    def test_dc_successive_approximation(self):
        # DCs 5, -6, 9, 2 (2x2 blocks, 16x16): first scan at Al=1
        # codes dc>>1 (floor), refine appends bit 0
        dcs = [5, -6, 9, 2]

        def scan1(wtr):
            pred = 0
            for dc in dcs:
                _dc_code(wtr, (dc >> 1) - pred)
                pred = dc >> 1

        def scan2(wtr):
            for dc in dcs:
                wtr.put(dc & 1, 1)

        jpg = make_prog_jpeg(
            16, 16, [(1, 1)],
            [([0], 0, 0, 0, 1, scan1), ([0], 0, 0, 1, 0, scan2)],
        )
        _, _, rgb = decode_jpeg(jpg)
        base = dc_only_gray(16, 16, [(dc >> 1 << 1) | (dc & 1) for dc in dcs])
        assert rgb == decode_jpeg(base)[2]
        # positive DCs reconstruct exactly; check one directly
        assert rgb[(0 * 16 + 8) * 3] == flat_expect(-6 >> 1 << 1 | 0)

    def test_ac_first_scan_with_eob_run(self):
        # 4 blocks (32x8): block0 has AC=+1 at k=1, blocks 1-3 covered
        # by one EOB2 run (rr=1 → eobrun = 2-1 + 1 extra bit = 2... use
        # extra bit 1 → covers blocks 1,2; block 3 gets its own EOB0)
        def dc_scan2(wtr):
            for d in (4, -4, 0, 0):  # absolute DCs 4, 0, 0, 0
                _dc_code(wtr, d)

        def ac_scan(wtr):
            wtr.put(0b01, 2)  # block0: symbol 0x01 run0 size1
            wtr.put(1, 1)     # +1
            wtr.put(0b00, 2)  # EOB0 ends block0
            # blocks 1+2: EOB2 = sym (rr=1,ss=0)... our AC table has no
            # EOB2 symbol — emit EOB0 per block instead (table economy)
            wtr.put(0b00, 2)
            wtr.put(0b00, 2)
            wtr.put(0b00, 2)

        jpg = make_prog_jpeg(
            32, 8, [(1, 1)],
            [([0], 0, 0, 0, 0, dc_scan2), ([0], 1, 63, 0, 0, ac_scan)],
        )
        _, _, rgb = decode_jpeg(jpg)

        # baseline equivalent: block0 coefs DC=4 AC1=+1, block1 DC=0...
        def enc(wtr, ci, bno):
            _dc_code(wtr, 4 if bno == 0 else (-4 if bno == 1 else 0))
            if bno == 0:
                wtr.put(0b01, 2)
                wtr.put(1, 1)
            wtr.put(0b00, 2)

        base = make_jpeg(32, 8, [(1, 1)], enc)
        assert rgb == decode_jpeg(base)[2]

    def test_ac_refinement_with_new_and_corrected_coefs(self):
        # one block: AC[1]=3 (first pass at Al=1 → +1; refine bit 1),
        # AC[3]=-1 arrives IN the refinement scan
        def dc_scan(wtr):
            _dc_code(wtr, 0)

        def ac_first(wtr):  # Al=1: code AC[1] = 3>>1 = +1
            wtr.put(0b01, 2)
            wtr.put(1, 1)
            wtr.put(0b00, 2)  # EOB

        def ac_refine(wtr):  # Al=0
            wtr.put(0b10, 2)  # symbol 0x11 (run 1, size 1): new coef
            #                   after ONE zero-HISTORY position — the
            #                   nonzero AC[1] does not count in the run
            wtr.put(0, 1)     # sign bit → -1
            wtr.put(1, 1)     # correction bit for AC[1] (3 has bit0=1)
            wtr.put(0b00, 2)  # EOB0 for the rest

        jpg = make_prog_jpeg(
            8, 8, [(1, 1)],
            [
                ([0], 0, 0, 0, 0, dc_scan),
                ([0], 1, 63, 0, 1, ac_first),
                ([0], 1, 63, 1, 0, ac_refine),
            ],
        )
        _, _, rgb = decode_jpeg(jpg)

        # compare against independent IDCT math (the test AC table has
        # no size-2 symbol, so no baseline twin exists for coef 3)
        q = 16
        import numpy as np

        m = np.zeros((8, 8))
        m[0, 1] = 3 * q   # zigzag 1 → natural (0,1)
        m[2, 0] = -1 * q  # zigzag 3 → natural index 16 = (2,0)
        basis = np.zeros((8, 8))
        for u in range(8):
            cu = (0.5 ** 0.5) if u == 0 else 1.0
            for x in range(8):
                basis[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
        f = basis.T @ m @ basis
        exp = np.clip(np.floor(f + 128.5), 0, 255).astype(int)
        got = [rgb[(y * 8 + x) * 3] for y in range(8) for x in range(8)]
        assert got == [int(exp[y, x]) for y in range(8) for x in range(8)]

    def test_color_dc_only_progressive(self):
        # interleaved DC scan for 3 components, neutral chroma
        def dc_scan(wtr):
            for dc in (10, 0, 0):  # one MCU: Y, Cb, Cr
                _dc_code(wtr, dc)

        jpg = make_prog_jpeg(
            8, 8, [(1, 1), (1, 1), (1, 1)],
            [([0, 1, 2], 0, 0, 0, 0, dc_scan)],
        )
        w, h, rgb = decode_jpeg(jpg)
        v = flat_expect(10)
        assert rgb[:3] == bytes([v, v, v])

    def test_progressive_dc_scan_with_bad_se_rejected(self):
        jpg = dc_only_gray(8, 8, [0]).replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(ImageDecodeError, match="Se=0"):
            decode_jpeg(jpg)


class TestHardening:
    def test_post_scan_dqt_redefinition_does_not_change_pixels(self):
        # quant tables latch at the component's first scan (libjpeg
        # semantics): a DQT appended after the entropy data must not
        # alter decoded pixels
        jpg = dc_only_gray(8, 8, [10])
        tampered = jpg[:-2] + _seg(0xDB, bytes([0]) + bytes([255] * 64)) + jpg[-2:]
        assert decode_jpeg(tampered)[2] == decode_jpeg(jpg)[2]

    def test_uncoded_component_rejected(self):
        # 3-component frame whose single scan codes only component 1:
        # must quarantine, not decode chroma as silent flat gray
        def enc(wtr):
            _dc_code(wtr, 5)
            wtr.put(0b00, 2)

        out = bytearray(b"\xff\xd8")
        out += _seg(0xDB, bytes([0]) + bytes([16] * 64))
        sofp = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([3])
        for i in range(3):
            sofp += bytes([i + 1, 0x11, 0])
        out += _seg(0xC0, sofp)
        out += _seg(0xC4, bytes([0x00]) + DC_COUNTS + DC_SYMBOLS)
        out += _seg(0xC4, bytes([0x10]) + AC_COUNTS + AC_SYMBOLS)
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        wtr = _BitWriter()
        enc(wtr)
        wtr.flush()
        out += wtr.out + b"\xff\xd9"
        with pytest.raises(ImageDecodeError, match="never coded"):
            decode_jpeg(bytes(out))

    def test_huge_dc_size_symbol_rejected(self):
        # a hostile DHT can map a code to a size symbol > 15; the
        # magnitude read must not blow past int32 coefficient storage
        counts = bytes([0, 0, 0, 12] + [0] * 12)
        symbols = bytes([40] + list(range(1, 12)))  # symbol 40 at code 0
        out = bytearray(b"\xff\xd8")
        out += _seg(0xDB, bytes([0]) + bytes([16] * 64))
        out += _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                    + bytes([1, 1, 0x11, 0]))
        out += _seg(0xC4, bytes([0x00]) + counts + symbols)
        out += _seg(0xC4, bytes([0x10]) + AC_COUNTS + AC_SYMBOLS)
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        out += b"\x00" * 8 + b"\xff\xd9"  # code 0000 → symbol 40
        with pytest.raises(ImageDecodeError, match="DC size"):
            decode_jpeg(bytes(out))


class TestSubsetGates:
    def test_arithmetic_and_cmyk_report_codec_gap(self):
        jpg = dc_only_gray(8, 8, [0])
        arith = jpg.replace(b"\xff\xc0", b"\xff\xc9", 1)
        with pytest.raises(CodecUnavailableError, match="arithmetic"):
            decode_jpeg(arith)
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

    def test_progressive_signs_for_real(self):
        from docproc_spark.kernels.imagepix import image_signature

        def scan1(wtr):
            for d in (6, -6):  # absolute DCs 6, 0
                _dc_code(wtr, d)

        jpg = make_prog_jpeg(
            16, 8, [(1, 1)], [([0], 0, 0, 0, 0, scan1)]
        )
        sig = image_signature(jpg)
        assert sig["decode_error"] is None
        assert sig["format"] == "jpeg" and sig["width"] == 16

    def test_arithmetic_reports_codec_gap_via_signature(self):
        from docproc_spark.kernels.imagepix import image_signature

        jpg = dc_only_gray(8, 8, [0]).replace(b"\xff\xc0", b"\xff\xc9", 1)
        sig = image_signature(jpg)
        assert sig["dhash64"] is None and "arithmetic" in sig["decode_error"]
