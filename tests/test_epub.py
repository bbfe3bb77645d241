"""EPUB bytes→spans ingestion (sources/epub.py).

A real .epub is assembled at test time with stdlib zipfile (OCF
container.xml → OPF manifest/spine → XHTML chapters); expectations
follow the html density kernel's documented rules with page = spine
index, and media identity = sha256 of the referenced package member's
bytes (content-addressed, like PPTX parts).
"""

from __future__ import annotations

import hashlib
import io
import struct
import zipfile
import zlib

import pytest

from docproc_spark.sources.epub import load_epub, parse_epub_bytes

OPF_NS = "http://www.idpf.org/2007/opf"
C_NS = "urn:oasis:names:tc:opendocument:xmlns:container"

PARA_A = "Chapter one body text, long enough for the density keeper."
PARA_B = "Chapter two body text, also comfortably long enough to keep."


def make_png(w: int, h: int) -> bytes:
    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    )


COVER = make_png(300, 450)
COVER_SHA = hashlib.sha256(COVER).hexdigest()


def make_epub(
    *,
    chapters: dict[str, str] | None = None,
    spine: list[str] | None = None,
    extra: dict[str, bytes] | None = None,
) -> bytes:
    chapters = chapters if chapters is not None else {
        "c1.xhtml": (
            "<html><body><h1>One</h1><p>" + PARA_A + "</p>"
            "<img src='images/cover.png' alt='the cover'/></body></html>"
        ),
        "c2.xhtml": "<html><body><p>" + PARA_B + "</p></body></html>",
    }
    spine = spine if spine is not None else list(chapters)
    container = f"""<container xmlns="{C_NS}" version="1.0">
      <rootfiles><rootfile full-path="OEBPS/content.opf"
        media-type="application/oebps-package+xml"/></rootfiles>
    </container>"""
    items = "".join(
        f'<item id="c{i}" href="{h}" media-type="application/xhtml+xml"/>'
        for i, h in enumerate(chapters)
    ) + '<item id="img" href="images/cover.png" media-type="image/png"/>'
    refs = "".join(
        f'<itemref idref="c{list(chapters).index(s)}"/>' for s in spine
    )
    opf = f"""<package xmlns="{OPF_NS}" version="3.0">
      <manifest>{items}</manifest><spine>{refs}</spine></package>"""
    parts: dict[str, bytes | str] = {
        "mimetype": "application/epub+zip",
        "META-INF/container.xml": container,
        "OEBPS/content.opf": opf,
        "OEBPS/images/cover.png": COVER,
    }
    for name, markup in chapters.items():
        parts[f"OEBPS/{name}"] = markup
    parts.update(extra or {})
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, content in parts.items():
            z.writestr(name, content)
    return buf.getvalue()


class TestParse:
    def test_spine_order_pages_and_kernel_rules(self):
        spans = parse_epub_bytes(make_epub())
        assert spans == [
            ("header", "One", None, 0),
            ("text", PARA_A, None, 0),
            ("image", "the cover", COVER_SHA, 0),
            ("text", PARA_B, None, 1),
        ]

    def test_spine_reorder_controls_pages(self):
        spans = parse_epub_bytes(
            make_epub(spine=["c2.xhtml", "c1.xhtml"])
        )
        assert [s[3] for s in spans] == [0, 1, 1, 1]
        assert spans[0][1] == PARA_B

    def test_media_identity_is_member_bytes(self):
        # two books embedding the same cover under different paths unify
        a = parse_epub_bytes(make_epub())
        b = parse_epub_bytes(
            make_epub(
                chapters={
                    "x.xhtml": (
                        "<html><body><p>" + PARA_A + "</p>"
                        "<img src='images/cover.png'/></body></html>"
                    )
                }
            )
        )
        ra = [m for _k, _t, m, _p in a if m]
        rb = [m for _k, _t, m, _p in b if m]
        assert ra == rb == [COVER_SHA]

    def test_dangling_image_keeps_src_ref(self):
        spans = parse_epub_bytes(
            make_epub(
                chapters={
                    "x.xhtml": (
                        "<html><body><p>" + PARA_A + "</p>"
                        "<img src='missing.png'/></body></html>"
                    )
                }
            )
        )
        assert ("image", None, "missing.png", 0) in spans

    def test_media_facts_sink(self):
        facts: dict = {}
        parse_epub_bytes(make_epub(), media_facts=facts)
        f = facts[COVER_SHA]
        assert f["name"] == "OEBPS/images/cover.png"
        assert (f["format"], f["width"], f["height"]) == ("png", 300, 450)
        assert f["n_bytes"] == len(COVER)

    def test_malformed_raises(self):
        with pytest.raises(Exception):
            parse_epub_bytes(b"not a zip")
        with pytest.raises(Exception):
            # a zip with no container.xml
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as z:
                z.writestr("mimetype", "application/epub+zip")
            parse_epub_bytes(buf.getvalue())


@pytest.mark.usefixtures("spark")
class TestSpark:
    def test_load_epub_and_quarantine(self, spark):
        df = spark.createDataFrame(
            [
                ("book.epub", bytearray(make_epub())),
                ("bad.epub", bytearray(b"junk")),
            ],
            "doc_id string, content binary",
        )
        rows = {r["doc_id"]: r for r in load_epub(df).collect()}
        ok = rows["book.epub"]
        assert ok["doc_type"] == "epub"
        assert ok["n_spans"] == 4
        assert ok["spans"][2]["media_ref"] == COVER_SHA
        assert rows["bad.epub"]["parse_error"] is not None

    def test_facade_and_one_pass_media(self, spark, tmp_path):
        from docproc_spark.facade import DocprocSpark

        (tmp_path / "book.epub").write_bytes(make_epub())
        eng = DocprocSpark(spark)
        docs = eng.load_files(str(tmp_path)).collect()
        assert [r["doc_type"] for r in docs] == ["epub"]
        _d, _q, media = eng.ingest_files_with_media(
            str(tmp_path), str(tmp_path / "tbl")
        )
        m = media.collect()
        assert len(m) == 1
        assert m[0]["media_ref"] == COVER_SHA
        assert (m[0]["width"], m[0]["height"]) == (300, 450)
        assert (m[0]["first_page"], m[0]["n_refs"]) == (0, 1)
