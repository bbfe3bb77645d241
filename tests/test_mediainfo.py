"""Container-header media metadata (kernels/mediainfo.py).

Fixtures are REAL files where stdlib can build them (PNG via zlib with
correct CRCs, WAV via the `wave` module) and spec-faithful handcrafted
headers elsewhere (JPEG marker stream, GIF LSD, WEBP VP8/VP8L/VP8X,
BMP, AVI, ISO-BMFF) — every offset matches the public format spec, so
the parser is pinned to the layout, not to its own assumptions.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from docproc_spark.kernels.mediainfo import EMPTY_META, sniff_media_header


def make_png(w: int, h: int) -> bytes:
    """A fully valid RGBA PNG (correct chunk CRCs, real IDAT)."""

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30\xff" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(channels: int, rate: int, n_frames: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"\x00\x00" * channels * n_frames)
    return buf.getvalue()


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x00, 0, 0]) + b"\x3b"


def jpeg_seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def make_jpeg(w: int, h: int, sof: int = 0xC0) -> bytes:
    sof_payload = struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return (
        b"\xff\xd8"
        + jpeg_seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
        # a COM segment whose PAYLOAD contains a decoy SOF marker — the
        # scanner must skip by segment length, not pattern-match
        + jpeg_seg(0xFE, b"fake \xff\xc0\x00\x11 marker inside comment")
        + jpeg_seg(sof, sof_payload)
        + jpeg_seg(0xDA, b"\x01\x01\x00")
        + b"scan data not markers"
        + b"\xff\xd9"
    )


class TestImages:
    def test_png_real_file(self):
        m = sniff_media_header(make_png(640, 480))
        assert (m["format"], m["media_kind"]) == ("png", "image")
        assert (m["width"], m["height"]) == (640, 480)
        assert m["duration_ms"] is None and m["sample_rate"] is None

    def test_png_truncated_before_ihdr(self):
        m = sniff_media_header(b"\x89PNG\r\n\x1a\n\x00\x00")
        assert m["format"] == "png" and m["width"] is None

    def test_jpeg_baseline_and_progressive(self):
        for sof in (0xC0, 0xC2):
            m = sniff_media_header(make_jpeg(1024, 768, sof=sof))
            assert (m["format"], m["width"], m["height"]) == ("jpeg", 1024, 768)

    def test_jpeg_fill_bytes_before_marker(self):
        # §B.1.1.2: any number of 0xFF fill bytes may pad before a marker
        b = make_jpeg(33, 44)
        padded = b[:2] + b"\xff\xff\xff" + b[2:]
        # inserting fills right after SOI means the next byte is 0xFF
        # (start of APP0) — scanner must treat the run as padding
        m = sniff_media_header(padded)
        assert (m["width"], m["height"]) == (33, 44)

    def test_jpeg_sos_before_sof_yields_no_dims(self):
        b = b"\xff\xd8" + jpeg_seg(0xDA, b"\x01") + b"\xff\xc0 payload"
        m = sniff_media_header(b)
        assert m["format"] == "jpeg" and m["width"] is None

    def test_jpeg_truncated_mid_segment(self):
        b = make_jpeg(10, 10)[:8]
        m = sniff_media_header(b)
        assert m["format"] == "jpeg" and m["width"] is None

    def test_gif(self):
        m = sniff_media_header(make_gif(320, 200))
        assert (m["format"], m["width"], m["height"]) == ("gif", 320, 200)
        m87 = sniff_media_header(b"GIF87a" + struct.pack("<HH", 5, 7) + b"\x00\x00\x00;")
        assert (m87["width"], m87["height"]) == (5, 7)

    def test_beacon_pixel_dims(self):
        m = sniff_media_header(make_gif(1, 1))
        assert (m["width"], m["height"]) == (1, 1)

    def test_bmp_info_header(self):
        hdr = b"BM" + struct.pack("<IHHI", 200, 0, 0, 54)
        dib = struct.pack("<Iii", 40, 800, -600)  # negative = top-down
        m = sniff_media_header(hdr + dib + b"\x00" * 40)
        assert (m["format"], m["width"], m["height"]) == ("bmp", 800, 600)

    def test_bmp_core_header(self):
        hdr = b"BM" + struct.pack("<IHHI", 100, 0, 0, 26)
        dib = struct.pack("<IHH", 12, 64, 48)
        m = sniff_media_header(hdr + dib + b"\x00" * 20)
        assert (m["width"], m["height"]) == (64, 48)

    def test_webp_vp8_lossy(self):
        payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 550, 368)
        b = b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" \
            + b"VP8 " + struct.pack("<I", len(payload)) + payload
        m = sniff_media_header(b)
        assert (m["format"], m["width"], m["height"]) == ("webp", 550, 368)

    def test_webp_vp8_bad_sync_code(self):
        payload = b"\x00\x00\x00" + b"\xde\xad\xbe" + struct.pack("<HH", 550, 368)
        b = b"RIFF" + struct.pack("<I", 20) + b"WEBP" \
            + b"VP8 " + struct.pack("<I", len(payload)) + payload
        m = sniff_media_header(b)
        assert m["format"] == "webp" and m["width"] is None

    def test_webp_vp8l_lossless(self):
        w, h = 400, 301
        bits = (w - 1) | ((h - 1) << 14)
        payload = b"\x2f" + struct.pack("<I", bits)
        b = b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" \
            + b"VP8L" + struct.pack("<I", len(payload)) + payload
        m = sniff_media_header(b)
        assert (m["width"], m["height"]) == (400, 301)

    def test_webp_vp8x_extended(self):
        w, h = 1920, 1080
        payload = b"\x00\x00\x00\x00" \
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
        b = b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP" \
            + b"VP8X" + struct.pack("<I", len(payload)) + payload
        m = sniff_media_header(b)
        assert (m["width"], m["height"]) == (1920, 1080)


class TestAudioVideo:
    def test_wav_real_file(self):
        # 8000 Hz stereo 16-bit, 1600 frames -> 6400 data bytes at
        # 32000 B/s = 200 ms
        m = sniff_media_header(make_wav(2, 8000, 1600))
        assert (m["format"], m["media_kind"]) == ("wav", "audio")
        assert (m["sample_rate"], m["channels"], m["duration_ms"]) == (8000, 2, 200)
        assert m["width"] is None

    def test_wav_odd_sized_chunk_padding(self):
        # an odd-length chunk pads to even (RIFF rule); fmt/data after
        # it must still be found
        fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
        body = (
            b"junk" + struct.pack("<I", 3) + b"abc\x00"  # odd chunk + pad
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 64000) + b""
        )
        b = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        m = sniff_media_header(b)
        assert (m["sample_rate"], m["channels"], m["duration_ms"]) == (16000, 1, 2000)

    def test_avi_header(self):
        avih = struct.pack("<10I", 40000, 0, 0, 0, 240, 0, 0, 0, 640, 360)
        hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
        body = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        b = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
        m = sniff_media_header(b)
        assert (m["format"], m["media_kind"]) == ("avi", "video")
        # 240 frames at 40000 us = 9600 ms
        assert (m["width"], m["height"], m["duration_ms"]) == (640, 360, 9600)

    @staticmethod
    def _box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    def test_mp4_mvhd_v0_and_tkhd(self):
        mvhd = bytes([0]) + b"\x00" * 3 + b"\x00" * 8 \
            + struct.pack(">II", 1000, 12500) + b"\x00" * 80
        tkhd = bytes([0]) + b"\x00" * 3 + b"\x00" * 72 \
            + struct.pack(">II", 1280 << 16, 720 << 16)
        moov = self._box(b"mvhd", mvhd) + self._box(b"trak", self._box(b"tkhd", tkhd))
        b = self._box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + self._box(b"moov", moov)
        m = sniff_media_header(b)
        assert (m["format"], m["media_kind"]) == ("mp4", "video")
        assert m["duration_ms"] == 12500
        assert (m["width"], m["height"]) == (1280, 720)

    def test_mp4_mvhd_v1(self):
        mvhd = bytes([1]) + b"\x00" * 3 + b"\x00" * 16 \
            + struct.pack(">I", 600) + struct.pack(">Q", 3000) + b"\x00" * 80
        b = self._box(b"ftyp", b"mp42") + self._box(b"moov", self._box(b"mvhd", mvhd))
        m = sniff_media_header(b)
        assert m["duration_ms"] == 3000 * 1000 // 600

    def test_mp4_corrupt_box_size_stops(self):
        b = self._box(b"ftyp", b"mp42") + struct.pack(">I", 3) + b"moov"
        m = sniff_media_header(b)
        assert m["format"] == "mp4" and m["duration_ms"] is None

    @pytest.mark.parametrize(
        "brand,fmt,kind",
        [
            (b"M4A ", "m4a", "audio"),
            (b"M4B ", "m4a", "audio"),
            (b"heic", "heic", "image"),
            (b"mif1", "heic", "image"),
            (b"avif", "avif", "image"),
            (b"avis", "avif", "image"),
            (b"qt  ", "mp4", "video"),  # unknown brand → generic video
        ],
    )
    def test_bmff_major_brand_dispatch(self, brand, fmt, kind):
        b = self._box(b"ftyp", brand + b"\x00\x00\x00\x00" + brand)
        m = sniff_media_header(b)
        assert (m["format"], m["media_kind"]) == (fmt, kind)

    def test_m4a_still_parses_mvhd_duration(self):
        mvhd = bytes([0]) + b"\x00" * 3 + b"\x00" * 8 \
            + struct.pack(">II", 44100, 441000) + b"\x00" * 80
        b = self._box(b"ftyp", b"M4A \x00\x00\x00\x00M4A mp42") \
            + self._box(b"moov", self._box(b"mvhd", mvhd))
        m = sniff_media_header(b)
        assert (m["format"], m["media_kind"]) == ("m4a", "audio")
        assert m["duration_ms"] == 10000


class TestUnknownAndCorrupt:
    @pytest.mark.parametrize(
        "blob",
        [None, b"", b"plain text", b"RIFF\x00\x00\x00\x00XXXX", b"\x00" * 64],
    )
    def test_unknown_is_all_none(self, blob):
        assert sniff_media_header(blob) == EMPTY_META

    def test_every_prefix_never_raises(self):
        # truncation fuzz: every prefix of every fixture parses or
        # degrades, never raises
        fixtures = [
            make_png(9, 9), make_gif(9, 9), make_jpeg(9, 9),
            make_wav(1, 8000, 10),
        ]
        for fx in fixtures:
            for i in range(len(fx)):
                sniff_media_header(fx[:i])


def test_sniff_media_meta_spark(spark):
    from docproc_spark.functions.media import sniff_media_meta
    import hashlib

    blobs = [
        make_png(300, 200),
        make_wav(1, 16000, 8000),
        make_gif(1, 1),
        b"not media at all",
        None,
    ]
    df = spark.createDataFrame([(b,) for b in blobs], "blob binary")
    rows = {r["media_ref"]: r for r in sniff_media_meta(df).collect()}
    png_ref = hashlib.sha256(blobs[0]).hexdigest()
    wav_ref = hashlib.sha256(blobs[1]).hexdigest()
    empty_ref = hashlib.sha256(b"").hexdigest()
    assert rows[png_ref]["format"] == "png"
    assert (rows[png_ref]["width"], rows[png_ref]["height"]) == (300, 200)
    assert rows[png_ref]["n_bytes"] == len(blobs[0])
    assert rows[wav_ref]["media_kind"] == "audio"
    assert rows[wav_ref]["sample_rate"] == 16000
    assert rows[wav_ref]["duration_ms"] == 500
    assert rows[empty_ref]["format"] is None  # None blob -> sha256 of b""
    unk = hashlib.sha256(b"not media at all").hexdigest()
    assert rows[unk]["format"] is None and rows[unk]["n_bytes"] == 16


# ---------------------------------------------------------------------------
# audio containers: FLAC / MP3 / OGG
# ---------------------------------------------------------------------------
def make_flac(rate: int, channels: int, total_samples: int) -> bytes:
    """Spec-faithful fLaC + mandatory-first STREAMINFO (last-block flag
    set, type 0, length 34): blocksizes, framesizes, then the 8-byte
    pack rate(20) | channels-1(3) | bps-1(5) | total(36), then md5."""
    packed = (rate << 44) | ((channels - 1) << 41) | ((16 - 1) << 36) | total_samples
    return (
        b"fLaC"
        + b"\x80" + (34).to_bytes(3, "big")
        + struct.pack(">HH", 4096, 4096)
        + (0).to_bytes(3, "big") * 2
        + packed.to_bytes(8, "big")
        + b"\x00" * 16
    )


def mp3_frame_header(
    *, mono: bool = False, bitrate_idx: int = 9, sr_idx: int = 0
) -> bytes:
    """MPEG1 Layer III header: sync, version 11, layer 01, no CRC."""
    return bytes(
        [0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2), 0xC0 if mono else 0x00]
    )


def make_ogg_page(
    payload: bytes, *, granule: int = 0, header_type: int = 2
) -> bytes:
    segs = []
    rest = len(payload)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)
    return (
        b"OggS\x00" + bytes([header_type])
        + granule.to_bytes(8, "little")
        + b"\x01\x00\x00\x00" + b"\x00\x00\x00\x00" + b"\x00\x00\x00\x00"
        + bytes([len(segs)]) + bytes(segs) + payload
    )


def vorbis_id(channels: int, rate: int) -> bytes:
    return (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
        + struct.pack("<I", rate) + b"\x00" * 12 + b"\xb8" + b"\x01"
    )


def opus_head(channels: int, pre_skip: int, input_rate: int) -> bytes:
    return (
        b"OpusHead\x01" + bytes([channels])
        + struct.pack("<H", pre_skip) + struct.pack("<I", input_rate)
        + b"\x00\x00" + b"\x00"
    )


class TestFlac:
    def test_streaminfo(self):
        m = sniff_media_header(make_flac(44100, 2, 88200))
        assert (m["format"], m["media_kind"]) == ("flac", "audio")
        assert (m["sample_rate"], m["channels"]) == (44100, 2)
        assert m["duration_ms"] == 2000

    def test_unknown_total_samples(self):
        m = sniff_media_header(make_flac(48000, 1, 0))  # 0 = unknown by spec
        assert m["sample_rate"] == 48000
        assert m["duration_ms"] is None

    def test_truncated(self):
        m = sniff_media_header(b"fLaC\x80")
        assert m["format"] == "flac"
        assert m["sample_rate"] is None


class TestMp3:
    def test_cbr_estimate(self):
        # 128 kbps → 1 s of audio is 16000 bytes
        blob = mp3_frame_header() + b"\x00" * (16000 - 4)
        m = sniff_media_header(blob)
        assert (m["format"], m["media_kind"]) == ("mp3", "audio")
        assert (m["sample_rate"], m["channels"]) == (44100, 2)
        assert m["duration_ms"] == 1000

    def test_id3v2_tag_skipped(self):
        # syncsafe size 200: tag bytes must count toward NEITHER the
        # sync scan start NOR the CBR size estimate
        tag = b"ID3\x04\x00\x00" + bytes([0, 0, 1, 72]) + b"\xff" * 200
        blob = tag + mp3_frame_header() + b"\x00" * (16000 - 4)
        m = sniff_media_header(blob)
        assert m["sample_rate"] == 44100
        assert m["duration_ms"] == 1000

    def test_xing_vbr_frame_count_wins(self):
        xing = b"Xing" + struct.pack(">II", 0x1, 100)  # flags: frames set
        blob = mp3_frame_header() + b"\x00" * 32 + xing + b"\x00" * 4000
        m = sniff_media_header(blob)
        assert m["duration_ms"] == 100 * 1152 * 1000 // 44100

    def test_mono_mode(self):
        m = sniff_media_header(mp3_frame_header(mono=True) + b"\x00" * 400)
        assert m["channels"] == 1

    def test_bare_sync_garbage_rejected(self):
        # valid sync bits but reserved bitrate index 15 → not mp3
        m = sniff_media_header(b"\xff\xfb\xf0\x00" + b"\x00" * 64)
        assert m == EMPTY_META


class TestOgg:
    def test_vorbis_duration_from_last_granule(self):
        blob = make_ogg_page(vorbis_id(2, 44100)) + make_ogg_page(
            b"\x00" * 10, granule=88200, header_type=4
        )
        m = sniff_media_header(blob)
        assert (m["format"], m["media_kind"]) == ("ogg", "audio")
        assert (m["sample_rate"], m["channels"]) == (44100, 2)
        assert m["duration_ms"] == 2000

    def test_opus_preskip_and_48k_granules(self):
        # RFC 7845: granules at 48 kHz regardless of input rate, minus
        # pre-skip
        blob = make_ogg_page(opus_head(1, 312, 16000)) + make_ogg_page(
            b"\x00" * 10, granule=48000 + 312, header_type=4
        )
        m = sniff_media_header(blob)
        assert (m["sample_rate"], m["channels"]) == (16000, 1)
        assert m["duration_ms"] == 1000

    def test_single_page_has_no_duration(self):
        m = sniff_media_header(make_ogg_page(vorbis_id(2, 44100)))
        assert m["sample_rate"] == 44100
        assert m["duration_ms"] is None

    def test_non_audio_ogg_unlabelled_fields(self):
        m = sniff_media_header(make_ogg_page(b"\x80theora-ish"))
        assert m["format"] == "ogg"
        assert m["sample_rate"] is None

    def test_truncated_opushead_reports_no_rate(self):
        # OpusHead needs 16 bytes (input rate is LE32 at +12); a header
        # cut at 14 bytes must not report a short-read garbage rate
        blob = make_ogg_page(opus_head(1, 312, 16000)[:14])
        m = sniff_media_header(blob)
        assert m["format"] == "ogg"
        assert m["sample_rate"] is None and m["channels"] is None


# ---------------------------------------------------------------------------
# TIFF / ICO / SVG
# ---------------------------------------------------------------------------
def make_tiff(w: int, h: int, little: bool = True) -> bytes:
    """Minimal spec-faithful TIFF: header + one IFD with ImageWidth
    (SHORT) and ImageLength (LONG) entries."""
    order = "little" if little else "big"

    def n(v, size):
        return v.to_bytes(size, order)

    # SHORT value sits in the FIRST 2 bytes of the 4-byte field in both
    # byte orders (left-justified per TIFF 6.0 §2)
    e_w = n(256, 2) + n(3, 2) + n(1, 4) + n(w, 2) + b"\x00\x00"
    e_h = n(257, 2) + n(4, 2) + n(1, 4) + n(h, 4)
    ifd = n(2, 2) + e_w + e_h + n(0, 4)
    head = (b"II*\x00" if little else b"MM\x00*") + n(8, 4)
    return head + ifd


class TestTiff:
    def test_little_endian(self):
        m = sniff_media_header(make_tiff(1920, 1080, little=True))
        assert (m["format"], m["width"], m["height"]) == ("tiff", 1920, 1080)

    def test_big_endian(self):
        m = sniff_media_header(make_tiff(640, 480, little=False))
        assert (m["width"], m["height"]) == (640, 480)

    def test_truncated(self):
        m = sniff_media_header(b"II*\x00\x08\x00\x00\x00")
        assert m["format"] == "tiff" and m["width"] is None


class TestIco:
    def test_largest_entry_and_256_quirk(self):
        # two entries: 16x16 and 0x0 (= 256x256, the winner)
        d1 = bytes([16, 16]) + b"\x00" * 14
        d2 = bytes([0, 0]) + b"\x00" * 14
        blob = b"\x00\x00\x01\x00\x02\x00" + d1 + d2
        m = sniff_media_header(blob)
        assert (m["format"], m["width"], m["height"]) == ("ico", 256, 256)


class TestSvg:
    def test_width_height_attrs(self):
        m = sniff_media_header(
            b'<?xml version="1.0"?>\n<svg xmlns="http://www.w3.org/2000/svg"'
            b' stroke-width="3" width="120px" height="48">'
        )
        assert (m["format"], m["media_kind"]) == ("svg", "image")
        assert (m["width"], m["height"]) == (120, 48)

    def test_viewbox_fallback(self):
        m = sniff_media_header(
            b'<svg viewBox="0 0 800.5 600" width="100%">'
        )
        # percentage width is not a pixel fact; viewBox extent is
        assert (m["width"], m["height"]) == (800, 600)

    def test_generic_xml_not_svg(self):
        assert sniff_media_header(b"<?xml version='1.0'?><doc/>") == EMPTY_META

    def test_binary_with_svg_text_not_svg(self):
        assert (
            sniff_media_header(b"\x01\x02<svg ")["format"] is None
        )
