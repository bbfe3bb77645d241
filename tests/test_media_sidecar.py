"""Embedded-media catalogue (sources/media_sidecar.py).

Fixtures are real files assembled at test time (stdlib zipfile for
OOXML, the same object-builder as test_pdf_source for PDFs, real PNG
bytes with correct CRCs via zlib, real WAV via the wave module);
expectations are written BY HAND from the documented contracts: sidecar
``media_ref`` must equal the span table's by construction, /Width and
/Height come from the PDF image dict (ISO 32000 §8.9.5), zip-package
blobs sniff through kernels/mediainfo.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zipfile
import zlib

import pytest

from docproc_spark.sources.media_sidecar import (
    load_media_sidecar,
    media_rows,
)
from docproc_spark.sources.ooxml import parse_pptx_bytes
from docproc_spark.sources.pdf import parse_pdf_bytes

A = "http://schemas.openxmlformats.org/drawingml/2006/main"
P = "http://schemas.openxmlformats.org/presentationml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
PKG_R = "http://schemas.openxmlformats.org/package/2006/relationships"


def _zip(parts: dict[str, str | bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, content in parts.items():
            z.writestr(name, content)
    return buf.getvalue()


def make_png(w: int, h: int) -> bytes:
    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x01\x02\x03\xff" * w for _ in range(h))
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


LOGO = make_png(40, 30)
LOGO_SHA = hashlib.sha256(LOGO).hexdigest()
CLIP = make_wav(2, 16000, 16000)  # 1 s stereo
CLIP_SHA = hashlib.sha256(CLIP).hexdigest()


def _pic(rid: str) -> str:
    return (
        f'<p:pic><p:blipFill><a:blip r:embed="{rid}"/></p:blipFill></p:pic>'
    )


def make_deck(extra_members: dict | None = None) -> bytes:
    """Two slides; the same logo blob shown on both (different part
    names on purpose — content identity must unify them), plus whatever
    extra package members the test plants."""
    pres = f"""<p:presentation xmlns:p="{P}" xmlns:r="{R}">
      <p:sldIdLst><p:sldId id="256" r:id="rId1"/><p:sldId id="257" r:id="rId2"/></p:sldIdLst>
    </p:presentation>"""
    pres_rels = f"""<Relationships xmlns="{PKG_R}">
      <Relationship Id="rId1" Target="slides/slide1.xml"/>
      <Relationship Id="rId2" Target="slides/slide2.xml"/>
    </Relationships>"""
    slide = f"""<p:sld xmlns:p="{P}" xmlns:a="{A}" xmlns:r="{R}"><p:cSld><p:spTree>
      {_pic("rId9")}
    </p:spTree></p:cSld></p:sld>"""
    rels1 = f"""<Relationships xmlns="{PKG_R}">
      <Relationship Id="rId9" Target="../media/image1.png"/>
    </Relationships>"""
    rels2 = f"""<Relationships xmlns="{PKG_R}">
      <Relationship Id="rId9" Target="../media/image2.png"/>
    </Relationships>"""
    parts = {
        "[Content_Types].xml": "<Types/>",
        "ppt/presentation.xml": pres,
        "ppt/_rels/presentation.xml.rels": pres_rels,
        "ppt/slides/slide1.xml": slide,
        "ppt/slides/slide2.xml": slide,
        "ppt/slides/_rels/slide1.xml.rels": rels1,
        "ppt/slides/_rels/slide2.xml.rels": rels2,
        "ppt/media/image1.png": LOGO,
        "ppt/media/image2.png": LOGO,
    }
    parts.update(extra_members or {})
    return _zip(parts)


class TestPptx:
    def test_shown_blob_unifies_across_parts_and_pages(self):
        rows = media_rows("pptx", make_deck())
        assert len(rows) == 1  # one DISTINCT blob, not two parts
        r = rows[0]
        assert r["media_ref"] == LOGO_SHA
        assert (r["first_page"], r["n_refs"]) == (0, 2)
        assert r["name"] == "ppt/media/image1.png"  # first sighting's part
        assert (r["format"], r["media_kind"]) == ("png", "image")
        assert (r["width"], r["height"]) == (40, 30)
        assert r["n_bytes"] == len(LOGO)
        assert r["parse_error"] is None

    def test_sidecar_refs_equal_span_refs(self):
        data = make_deck()
        span_refs = {
            m for k, _t, m, _p in parse_pptx_bytes(data) if k == "image"
        }
        assert {r["media_ref"] for r in media_rows("pptx", data)} == span_refs

    def test_unreferenced_member_catalogued_with_zero_refs(self):
        rows = media_rows(
            "pptx", make_deck({"ppt/media/media1.wav": CLIP})
        )
        by_ref = {r["media_ref"]: r for r in rows}
        clip = by_ref[CLIP_SHA]
        assert (clip["n_refs"], clip["first_page"]) == (0, None)
        assert (clip["format"], clip["media_kind"]) == ("wav", "audio")
        assert (clip["sample_rate"], clip["channels"]) == (16000, 2)
        assert clip["duration_ms"] == 1000
        # the referenced logo is NOT duplicated by the package scan even
        # though its parts sit under ppt/media/
        assert [r for r in rows if r["media_ref"] == LOGO_SHA][0]["n_refs"] == 2
        assert len(rows) == 2

    def test_dangling_part_yields_no_blobless_row(self):
        # rels point at a member that does not exist → span keeps the
        # part-name ref; sidecar row carries it with no blob facts
        deck = make_deck()
        with zipfile.ZipFile(io.BytesIO(deck)) as z:
            parts = {i.filename: z.read(i) for i in z.infolist()}
        del parts["ppt/media/image2.png"]
        rows = media_rows("pptx", _zip(parts))
        by_ref = {r["media_ref"]: r for r in rows}
        assert by_ref[LOGO_SHA]["n_refs"] == 1
        dangling = by_ref["ppt/media/image2.png"]
        assert dangling["n_bytes"] is None
        assert dangling["format"] is None


class TestPackages:
    def test_docx_media_members(self):
        doc = _zip(
            {
                "[Content_Types].xml": "<Types/>",
                "word/document.xml": "<d/>",
                "word/media/image1.png": LOGO,
            }
        )
        rows = media_rows("docx", doc)
        assert len(rows) == 1
        r = rows[0]
        assert r["media_ref"] == LOGO_SHA
        assert (r["n_refs"], r["first_page"]) == (0, None)
        assert (r["width"], r["height"]) == (40, 30)

    def test_xlsx_media_members_and_empty(self):
        wb = _zip(
            {
                "xl/workbook.xml": "<w/>",
                "xl/media/image1.png": LOGO,
            }
        )
        assert media_rows("xlsx", wb)[0]["media_ref"] == LOGO_SHA
        assert media_rows("xlsx", _zip({"xl/workbook.xml": "<w/>"})) == []

    def test_unknown_format_raises(self):
        with pytest.raises(ValueError):
            media_rows("html", b"<html/>")


# --- PDF ------------------------------------------------------------------
def _pdf(objects: list[bytes]) -> bytes:
    out = [b"%PDF-1.4\n"]
    for i, body in enumerate(objects, start=1):
        out.append(b"%d 0 obj" % i + body + b"endobj\n")
    out.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF")
    return b"".join(out)


JPEG_BYTES = (  # spec-faithful minimal JPEG: SOI, SOF0 8x6, EOI
    b"\xff\xd8"
    + b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3, 8, 6, 8, 1) + b"\x01\x11\x00"
    + b"\xff\xd9"
)
JPEG_SHA = hashlib.sha256(JPEG_BYTES).hexdigest()
RAW_SHA = hashlib.sha256(b"abc").hexdigest()


def make_pdf() -> bytes:
    """Two pages: a raw-sample XObject shown on BOTH pages, a DCT
    XObject on page 2 only, an inline image on page 1."""
    page1 = (
        b"BT 72 700 Td (hello) Tj ET\n"
        b"q 1 0 0 1 50 500 cm /Im1 Do Q\n"
        b"BI /W 2 /H 2 ID \x00\x01\x02\x03 EI\n"
    )
    page2 = b"/Im1 Do\n/Jp1 Do\n"
    return _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>\n",
            b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 "
            b"/MediaBox [0 0 612 792] >>\n",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /XObject << /Im1 7 0 R >> >> >>\n",
            b"<< /Length %d >>\nstream\n" % len(page1) + page1
            + b"\nendstream\n",
            b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R "
            b"/Resources << /XObject << /Im1 7 0 R /Jp1 8 0 R >> >> >>\n",
            b"<< /Length %d >>\nstream\n" % len(page2) + page2
            + b"\nendstream\n",
            b"<< /Subtype /Image /Width 4 /Height 3 /Length 3 >>\n"
            b"stream\nabc\nendstream\n",
            b"<< /Subtype /Image /Width 8 /Height 6 /Filter /DCTDecode "
            b"/Length %d >>\nstream\n" % len(JPEG_BYTES) + JPEG_BYTES
            + b"\nendstream\n",
        ]
    )


INLINE_SHA = hashlib.sha256(b"\x00\x01\x02\x03").hexdigest()


class TestPdf:
    def test_xobject_dims_from_dict_and_ref_counting(self):
        rows = {r["media_ref"]: r for r in media_rows("pdf", make_pdf())}
        raw = rows[RAW_SHA]
        assert (raw["width"], raw["height"]) == (4, 3)
        assert raw["format"] == "raw"  # no terminal codec → decoded samples
        assert (raw["first_page"], raw["n_refs"]) == (0, 2)
        assert raw["n_bytes"] == 3
        assert raw["name"] == "Im1"

    def test_dct_payload_is_jpeg_identity(self):
        rows = {r["media_ref"]: r for r in media_rows("pdf", make_pdf())}
        jp = rows[JPEG_SHA]  # identity bytes ARE the JPEG file
        assert jp["format"] == "jpeg"
        assert (jp["width"], jp["height"]) == (8, 6)  # dict, not sniff
        assert (jp["first_page"], jp["n_refs"]) == (1, 1)
        assert jp["n_bytes"] == len(JPEG_BYTES)

    def test_inline_image_facts(self):
        rows = {r["media_ref"]: r for r in media_rows("pdf", make_pdf())}
        inl = rows[INLINE_SHA]
        assert (inl["width"], inl["height"]) == (2, 2)
        assert inl["format"] == "raw"
        assert (inl["first_page"], inl["n_refs"]) == (0, 1)
        assert inl["n_bytes"] == 4

    def test_sidecar_refs_equal_span_refs(self):
        data = make_pdf()
        span_refs = {
            m for k, _t, m, _p in parse_pdf_bytes(data) if k == "image"
        }
        assert {r["media_ref"] for r in media_rows("pdf", data)} == span_refs

    def test_parse_without_facts_unchanged(self):
        # media_facts default must not perturb span output
        assert parse_pdf_bytes(make_pdf()) == parse_pdf_bytes(
            make_pdf(), media_facts={}
        )


@pytest.mark.usefixtures("spark")
class TestSpark:
    def test_load_media_sidecar_and_quarantine(self, spark):
        df = spark.createDataFrame(
            [
                ("deck.pptx", "pptx", bytearray(make_deck())),
                ("doc.pdf", "pdf", bytearray(make_pdf())),
                ("broken.docx", "docx", bytearray(b"not a zip")),
            ],
            "doc_id string, fmt string, content binary",
        )
        rows = load_media_sidecar(df).collect()
        ok = [r for r in rows if r["parse_error"] is None]
        bad = [r for r in rows if r["parse_error"] is not None]
        assert {r["doc_id"] for r in ok} == {"deck.pptx", "doc.pdf"}
        assert len([r for r in ok if r["doc_id"] == "doc.pdf"]) == 3
        assert [r["doc_id"] for r in bad] == ["broken.docx"]
        assert bad[0]["media_ref"] is None
        deck = [r for r in ok if r["doc_id"] == "deck.pptx"][0]
        assert deck["media_ref"] == LOGO_SHA and deck["n_refs"] == 2

    def test_facade_media_sidecar(self, spark, tmp_path):
        from docproc_spark.facade import DocprocSpark

        (tmp_path / "deck.pptx").write_bytes(make_deck())
        (tmp_path / "doc.pdf").write_bytes(make_pdf())
        out = DocprocSpark(spark).media_sidecar(str(tmp_path)).collect()
        by_doc: dict[str, list] = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert by_doc["deck.pptx"][0]["media_ref"] == LOGO_SHA
        assert {r["media_ref"] for r in by_doc["doc.pdf"]} == {
            RAW_SHA,
            JPEG_SHA,
            INLINE_SHA,
        }


@pytest.mark.usefixtures("spark")
class TestOnePassIngest:
    """load_files_with_media: spans + media catalogue from ONE parse."""

    def _frame(self, spark):
        return spark.createDataFrame(
            [
                ("deck.pptx", "pptx", bytearray(make_deck())),
                ("doc.pdf", "pdf", bytearray(make_pdf())),
                ("broken.docx", "docx", bytearray(b"not a zip")),
            ],
            "doc_id string, fmt string, content binary",
        )

    def test_spans_match_single_purpose_loaders(self, spark):
        from docproc_spark.sources.media_sidecar import load_files_with_media
        from docproc_spark.sources.ooxml import load_ooxml
        from docproc_spark.sources.pdf import load_pdf

        df = self._frame(spark)
        combined = {
            r["doc_id"]: r
            for r in load_files_with_media(df).drop("media").collect()
        }
        office = {
            r["doc_id"]: r
            for r in load_ooxml(df.where("fmt != 'pdf'")).collect()
        }
        pdfs = {
            r["doc_id"]: r
            for r in load_pdf(df.where("fmt = 'pdf'")).collect()
        }
        for k, v in {**office, **pdfs}.items():
            assert combined[k] == v

    def test_media_matches_sidecar_loader(self, spark):
        from docproc_spark.sources.media_sidecar import (
            load_files_with_media,
            load_media_sidecar,
            media_table,
        )

        df = self._frame(spark)
        combined = sorted(
            tuple(r) for r in media_table(load_files_with_media(df)).collect()
        )
        standalone = sorted(
            tuple(r)[:-1]  # drop parse_error
            for r in load_media_sidecar(df).collect()
            if r["parse_error"] is None
        )
        assert combined == standalone

    def test_facade_one_pass_checkpoint(self, spark, tmp_path):
        from docproc_spark.facade import DocprocSpark

        src = tmp_path / "in"
        src.mkdir()
        (src / "deck.pptx").write_bytes(make_deck())
        (src / "doc.pdf").write_bytes(make_pdf())
        (src / "page.html").write_bytes(b"<html><body><p>hi</p></body></html>")
        (src / "broken.docx").write_bytes(b"junk")
        eng = DocprocSpark(spark)
        docs, quar, media = eng.ingest_files_with_media(
            str(src), str(tmp_path / "tbl")
        )
        assert {r["doc_id"] for r in docs.select("doc_id").collect()} == {
            "deck.pptx",
            "doc.pdf",
            "page.html",
        }
        assert [r["doc_id"] for r in quar.select("doc_id").collect()] == [
            "broken.docx"
        ]
        got = {(r["doc_id"], r["media_ref"]) for r in media.collect()}
        assert got == {
            ("deck.pptx", LOGO_SHA),
            ("doc.pdf", RAW_SHA),
            ("doc.pdf", JPEG_SHA),
            ("doc.pdf", INLINE_SHA),
        }
        # documents keeps the span-table contract shape (media dropped)
        assert "media" not in docs.columns
        assert "spans" in docs.columns


# --- HTML -------------------------------------------------------------------
import base64 as _b64

from docproc_spark.sources.media_sidecar import html_media_rows

PNG_URI = "data:image/png;base64," + _b64.b64encode(LOGO).decode()
PNG_URI_SHA = LOGO_SHA  # identity is the DECODED payload


class TestHtmlCatalogue:
    def test_data_uri_sniffed_and_span_identity(self):
        html = (
            "<html><body>"
            f"<p>{'x' * 30}</p><img src='{PNG_URI}'>"
            f"<img src='{PNG_URI}' alt='again'>"
            "</body></html>"
        )
        rows = html_media_rows(html)
        assert len(rows) == 1
        r = rows[0]
        assert r["media_ref"] == PNG_URI_SHA
        assert (r["n_refs"], r["first_page"]) == (2, 0)
        assert (r["format"], r["width"], r["height"]) == ("png", 40, 30)
        assert r["n_bytes"] == len(LOGO)
        # the identity matches what the span path emits
        from docproc_spark.kernels.html import html_main_blocks

        span_refs = {m for _k, _t, m in html_main_blocks(html) if m}
        assert span_refs == {PNG_URI_SHA}

    def test_url_image_declared_dims(self):
        html = (
            "<html><body><p>" + "y" * 30 + "</p>"
            "<img src='/pic.jpg' width='640' height='480px'>"
            "</body></html>"
        )
        rows = html_media_rows(html, base_url="https://ex.org/a/page.html")
        assert len(rows) == 1
        r = rows[0]
        assert r["media_ref"] == "https://ex.org/pic.jpg"  # resolved
        assert r["name"] == "https://ex.org/pic.jpg"
        assert (r["width"], r["height"]) == (640, 480)
        assert r["n_bytes"] is None and r["format"] is None

    def test_chrome_and_beacons_not_catalogued(self):
        html = (
            "<html><body><nav><img src='/logo.png'></nav>"
            "<img src='/spacer.gif' width='1' height='1'>"
            "<p>" + "z" * 30 + "</p></body></html>"
        )
        assert html_media_rows(html, base_url="https://ex.org/") == []

    def test_malformed_and_empty(self):
        assert html_media_rows(None) == []
        assert html_media_rows("<<<not html") == []

    def test_spark_html_media_table(self, spark):
        from docproc_spark.sources.media_sidecar import html_media_table

        df = spark.createDataFrame(
            [
                ("a", f"<body><img src='{PNG_URI}'></body>", "https://a.ex/"),
                ("b", "<body><img src='i.png' width=9></body>", "https://b.ex/d/"),
                ("c", None, None),
            ],
            "doc_id string, raw_html string, url string",
        )
        rows = {r["doc_id"]: r for r in html_media_table(df, url_col="url").collect()}
        assert rows["a"]["media_ref"] == PNG_URI_SHA
        assert rows["a"]["width"] == 40
        assert rows["b"]["media_ref"] == "https://b.ex/d/i.png"
        assert rows["b"]["width"] == 9
        assert "c" not in rows


# --- WARC -------------------------------------------------------------------
class TestWarcCatalogue:
    def _archive(self) -> bytes:
        from tests.test_warc_source import http_response, warc_record

        page = (
            "<html><body><p>" + "w" * 30 + "</p>"
            "<img src='/logo.png' width='5' height='5'>"
            "<img src='https://cdn.ex.com/hero.jpg' width='999'>"
            "</body></html>"
        ).encode()
        old_logo = b"\x89PNG old bytes"
        recs = [
            warc_record(
                "response", http_response(page), url="https://ex.com/a",
                rid="urn:uuid:page",
            ),
            # an OLDER capture of the logo with different bytes — the
            # newest capture must win the join
            warc_record(
                "response",
                http_response(old_logo, ctype="image/png"),
                url="https://ex.com/logo.png", rid="urn:uuid:old",
                extra={"WARC-Date": "2020-01-01T00:00:00Z"},
            ),
            warc_record(
                "response",
                http_response(LOGO, ctype="image/png"),
                url="https://ex.com/logo.png", rid="urn:uuid:new",
                extra={"WARC-Date": "2026-01-01T00:00:00Z"},
            ),
        ]
        return b"".join(recs)

    def test_media_meta_sniffed_at_ingestion(self):
        from docproc_spark.sources.warc import warc_record_rows

        rows = warc_record_rows(self._archive(), "a.warc")
        metas = {
            r["doc_id"]: r["media_meta"]
            for r in rows
            if r["media_meta"] is not None
        }
        # the old capture's bytes are NOT a valid PNG header — unknown
        # payloads stay meta-less (only identity), the real PNG sniffs
        assert set(metas) == {"urn:uuid:new"}
        assert metas["urn:uuid:new"]["format"] == "png"
        assert metas["urn:uuid:new"]["width"] == 40
        # HTML capture rows carry no media_meta
        assert all(
            r["media_meta"] is None for r in rows if r["raw_html"] is not None
        )

    def test_catalogue_joins_fetched_assets(self, spark):
        from docproc_spark.sources.media_sidecar import warc_media_catalogue
        from docproc_spark.sources.warc import load_warc

        files = spark.createDataFrame(
            [("a.warc", bytearray(self._archive()))],
            "doc_id string, content binary",
        )
        cat = {
            r["media_ref"]: r
            for r in warc_media_catalogue(load_warc(files)).collect()
        }
        logo = cat["https://ex.com/logo.png"]
        assert logo["fetched"] is True
        assert logo["payload_sha256"] == LOGO_SHA  # newest capture won
        assert (logo["width"], logo["height"]) == (40, 30)  # sniffed > declared
        assert logo["n_bytes"] == len(LOGO)
        assert logo["format"] == "png"
        hero = cat["https://cdn.ex.com/hero.jpg"]
        assert hero["fetched"] is False
        assert hero["payload_sha256"] is None
        assert (hero["width"], hero["height"]) == (999, None)  # declared only
        assert hero["n_bytes"] is None


def test_facade_warc_media(spark, tmp_path):
    from docproc_spark.facade import DocprocSpark

    (tmp_path / "a.warc").write_bytes(TestWarcCatalogue()._archive())
    rows = DocprocSpark(spark).warc_media(str(tmp_path)).collect()
    by_ref = {r["media_ref"]: r for r in rows}
    assert by_ref["https://ex.com/logo.png"]["fetched"] is True
    assert by_ref["https://ex.com/logo.png"]["payload_sha256"] == LOGO_SHA


# --- perceptual-signature catalogue ---------------------------------------
def make_gray_pdf() -> bytes:
    """One page, one raw DeviceGray 4x2 XObject (planted gradient) and
    one DCT (JPEG) XObject."""
    gray = bytes([0, 64, 128, 255, 10, 20, 30, 40])
    page = b"/Gr1 Do\n/Jp1 Do\n"
    return _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>\n",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
            b"/MediaBox [0 0 612 792] >>\n",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /XObject << /Gr1 5 0 R /Jp1 6 0 R >> >> >>\n",
            b"<< /Length %d >>\nstream\n" % len(page) + page
            + b"\nendstream\n",
            b"<< /Subtype /Image /Width 4 /Height 2 /ColorSpace /DeviceGray"
            b" /BitsPerComponent 8 /Length %d >>\nstream\n" % len(gray)
            + gray + b"\nendstream\n",
            b"<< /Subtype /Image /Width 8 /Height 6 /Filter /DCTDecode "
            b"/Length %d >>\nstream\n" % len(JPEG_BYTES) + JPEG_BYTES
            + b"\nendstream\n",
        ]
    )


GRAY_BYTES = bytes([0, 64, 128, 255, 10, 20, 30, 40])
GRAY_SHA = hashlib.sha256(GRAY_BYTES).hexdigest()


class TestSignatureRows:
    def test_pptx_members_signed_with_span_identity(self):
        from docproc_spark.kernels.imagepix import image_signature
        from docproc_spark.sources.media_sidecar import signature_rows

        deck = make_deck({"ppt/media/clip.wav": CLIP})
        rows = {r["media_ref"]: r for r in signature_rows("pptx", deck)}
        # the PNG logo is signed; the WAV member is not an image
        assert set(rows) == {LOGO_SHA}
        row = rows[LOGO_SHA]
        want = image_signature(LOGO)
        assert (row["blob_format"], row["width"], row["height"]) == (
            "png", 40, 30,
        )
        assert row["dhash64"] == want["dhash64"]
        assert row["ahash64"] == want["ahash64"]
        assert row["decode_error"] is None
        # identity joins onto the sidecar catalogue / span table
        side_refs = {r["media_ref"] for r in media_rows("pptx", deck)}
        assert LOGO_SHA in side_refs

    def test_pdf_raw_gray_decodes_and_dct_is_codec_gated(self):
        from docproc_spark.kernels.imagepix import (
            rgb_from_raw_samples,
            signature_from_rgb,
        )
        from docproc_spark.sources.media_sidecar import signature_rows

        rows = {
            r["media_ref"]: r for r in signature_rows("pdf", make_gray_pdf())
        }
        assert set(rows) == {GRAY_SHA, JPEG_SHA}
        gr = rows[GRAY_SHA]
        want = signature_from_rgb(
            rgb_from_raw_samples(GRAY_BYTES, 4, 2, "gray", 8), 4, 2, "raw"
        )
        assert (gr["blob_format"], gr["width"], gr["height"]) == ("raw", 4, 2)
        assert gr["dhash64"] == want["dhash64"]
        assert gr["decode_error"] is None
        jp = rows[JPEG_SHA]
        assert jp["blob_format"] == "jpeg"
        # JPEG_BYTES is SOI+SOF0+EOI with no scan — a real-but-corrupt
        # jpeg now that baseline decodes; error is row-level either way
        assert jp["dhash64"] is None and jp["decode_error"]

    def test_unknown_colorspace_is_row_level_error(self):
        from docproc_spark.sources.media_sidecar import signature_rows

        # make_pdf's Im1 has no /ColorSpace — signed as error, not raise
        rows = {r["media_ref"]: r for r in signature_rows("pdf", make_pdf())}
        assert rows[RAW_SHA]["dhash64"] is None
        assert "color space" in rows[RAW_SHA]["decode_error"]

    def test_unsupported_format_raises(self):
        from docproc_spark.sources.media_sidecar import signature_rows

        with pytest.raises(ValueError, match="unsupported"):
            signature_rows("html", b"<p>hi</p>")


class TestSignatureSpark:
    def test_load_quarantines_and_signs(self, spark):
        from docproc_spark.sources.media_sidecar import load_media_signatures

        df = spark.createDataFrame(
            [
                ("deck.pptx", "pptx", bytearray(make_deck())),
                ("doc.pdf", "pdf", bytearray(make_gray_pdf())),
                ("broken.docx", "docx", bytearray(b"not a zip")),
            ],
            "doc_id string, fmt string, content binary",
        )
        rows = load_media_signatures(df).collect()
        ok = [r for r in rows if r["parse_error"] is None]
        bad = [r for r in rows if r["parse_error"] is not None]
        assert {r["doc_id"] for r in bad} == {"broken.docx"}
        assert {(r["doc_id"], r["media_ref"]) for r in ok} == {
            ("deck.pptx", LOGO_SHA),
            ("doc.pdf", GRAY_SHA),
            ("doc.pdf", JPEG_SHA),
        }

    def test_perceptual_clusters_collapse_reencodes(self, spark):
        import pyspark.sql.functions as F
        from docproc_spark.functions.media import (
            image_signatures,
            perceptual_dup_clusters,
        )
        from docproc_spark.kernels.imagepix import encode_png

        w, h = 16, 12
        px = bytes((x * 13 + y * 29) % 256
                   for y in range(h) for x in range(w) for _ in range(3))
        png = encode_png(px, w, h)
        tweaked = bytearray(px)
        tweaked[0] = (tweaked[0] + 40) % 256
        near = encode_png(bytes(tweaked), w, h)
        far = encode_png(bytes(255 - v for v in px), w, h)
        df = spark.createDataFrame(
            [(bytearray(b),) for b in (png, near, far)], "blob binary"
        )
        sigs = image_signatures(df)
        clusters = {
            r["media_ref"]: r["cluster"]
            for r in perceptual_dup_clusters(sigs).collect()
        }
        refs = {b: hashlib.sha256(b).hexdigest() for b in (png, near, far)}
        assert clusters[refs[png]] == clusters[refs[near]]
        assert clusters[refs[far]] != clusters[refs[png]]
        assert clusters[refs[far]] == refs[far]  # singleton keeps own ref


def test_facade_media_signatures(spark, tmp_path):
    from docproc_spark.facade import DocprocSpark

    (tmp_path / "deck.pptx").write_bytes(make_deck())
    (tmp_path / "doc.pdf").write_bytes(make_gray_pdf())
    rows = DocprocSpark(spark).media_signatures(str(tmp_path)).collect()
    got = {(r["doc_id"], r["media_ref"]) for r in rows}
    assert ("deck.pptx", LOGO_SHA) in got
    assert ("doc.pdf", GRAY_SHA) in got


def test_perceptual_template_refs_catch_reencoded_logos(spark):
    """Three docs each embed a re-encoded variant of one logo (one
    corner pixel nudged per doc → distinct sha256, hamming ≤ 3 apart);
    two docs carry unrelated images. The template detector must flag
    all three logo variants and neither singleton."""
    import pyspark.sql.functions as F
    from docproc_spark.functions.media import (
        image_signatures,
        perceptual_template_refs,
    )
    from docproc_spark.kernels.imagepix import encode_png

    w, h = 16, 12
    base = bytearray((x * 13 + y * 29) % 256
                     for y in range(h) for x in range(w) for _ in range(3))
    rows = []
    logo_refs = set()
    for i in range(3):
        px = bytearray(base)
        px[0] = (px[0] + i * 30) % 256  # re-encode variants
        blob = encode_png(bytes(px), w, h)
        logo_refs.add(hashlib.sha256(blob).hexdigest())
        rows.append((f"d{i}", bytearray(blob)))
    far1 = encode_png(bytes(255 - v for v in base), w, h)
    far2 = encode_png(bytes((v * 3 + 7) % 256 for v in base), w, h)
    rows += [("d0", bytearray(far1)), ("d4", bytearray(far2))]
    df = spark.createDataFrame(rows, "doc_id string, blob binary")
    sigs = image_signatures(df).join(
        df.select("doc_id", F.sha2("blob", 256).alias("media_ref")),
        "media_ref",
    )
    got = {r["media_ref"] for r in
           perceptual_template_refs(sigs, min_docs=3).collect()}
    assert got == logo_refs
