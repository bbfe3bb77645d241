"""PDF bytes→spans kernel vs hand-computed expectations.

A real 2-page PDF (page 1 Flate-compressed, page 2 plain) is assembled at
test time with stdlib zlib — the counterpart of the reference's generated
e2e fixtures — and parsed by sources/pdf. Expected spans are derived BY
HAND from the documented semantics: blocks in (page, y-top, x) order,
blank blocks dropped, table/header/footer classification from
kernels/pdf_layout, images as media spans, page texts "\n\n"-joined in
full_text_pdf with empty pages included.
"""

from __future__ import annotations

import hashlib
import zlib

import pandas as pd
import pytest

from docproc_spark.sources.pdf import load_pdf, parse_pdf_bytes


def _pdf(objects: list[bytes]) -> bytes:
    """Minimal classic PDF: header + numbered objects + trailer (no xref
    table needed — the parser scans objects)."""
    out = [b"%PDF-1.4\n"]
    for i, body in enumerate(objects, start=1):
        out.append(b"%d 0 obj" % i + body + b"endobj\n")
    out.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF")
    return b"".join(out)


def _stream_obj(content: bytes, compress: bool) -> bytes:
    data = zlib.compress(content) if compress else content
    filt = b"/Filter /FlateDecode " if compress else b""
    return (
        b"<< " + filt + b"/Length %d >>\nstream\n" % len(data)
        + data
        + b"\nendstream\n"
    )


PAGE1_CONTENT = (
    # header zone (y=780 of 792 → top 12, band 8% = 63.4): header span
    b"BT 72 780 Td (Quarterly Report) Tj ET\n"
    b"q 1 0 0 1 50 500 cm /Im1 Do Q\n"
    # body block: two lines via Td line-move, TJ array + hex string
    b"BT 72 700 Td [(Hello ) (world)] TJ 0 -14 Td <486921> Tj ET\n"
    # table block: two " | " lines via T* with TL leading
    b"BT 72 600 Td 14 TL (a | b) Tj T* (c | d) Tj ET\n"
    # blank block must be dropped
    b"BT 72 500 Td () Tj ET\n"
    # footer zone (y=20 → top 772 > 792*0.92)
    b"BT 72 20 Td (page 1 of 2) Tj ET\n"
)

PAGE2_CONTENT = (
    # escapes + octal; Tm positioning; ' operator (next line + show)
    b"BT 1 0 0 1 100 700 Tm (It\\(s\\) \\110ere) Tj 14 TL (second) ' ET\n"
)


def make_pdf() -> bytes:
    return _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>\n",
            b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 "
            b"/MediaBox [0 0 612 792] >>\n",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /XObject << /Im1 7 0 R >> >> >>\n",
            _stream_obj(PAGE1_CONTENT, compress=True),
            b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\n",
            _stream_obj(PAGE2_CONTENT, compress=False),
            b"<< /Subtype /Image /Width 4 /Height 4 /Length 3 >>\n"
            b"stream\nabc\nendstream\n",
        ]
    )


# media_ref is the sha256 of the image XObject's stream bytes (b"abc"
# above) — content-addressed identity, not the page-scoped resource name
IM1_SHA = hashlib.sha256(b"abc").hexdigest()

# reading order on page 1 (y-top asc): header 780→12, body 700→92,
# table 600→192, image at cm ty=500→292, footer 20→772; image spans come
# after the page's text spans (reference collects images separately)
PDF_EXPECT = [
    ("header", "Quarterly Report", None, 0),
    ("text", "Hello world\nHi!", None, 0),
    ("table", "a | b\nc | d", None, 0),
    ("footer", "page 1 of 2", None, 0),
    ("image", None, IM1_SHA, 0),
    ("text", "It(s) Here\nsecond", None, 1),
]


def test_parse_pdf_bytes():
    assert parse_pdf_bytes(make_pdf()) == PDF_EXPECT


def test_parse_pdf_rejects_garbage():
    with pytest.raises(ValueError, match="no PDF objects"):
        parse_pdf_bytes(b"not a pdf at all")


def test_load_pdf_spark_e2e(spark):
    from docproc_spark.operators.fulltext import full_text_pdf

    src = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": ["p1", "bad"], "content": [make_pdf(), b"garbage"]}
        )
    )
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in load_pdf(src).collect()}
    got = [
        (s["kind"], s["text"], s["media_ref"], s["page"], s["offset"])
        for s in rows["p1"]["spans"]
    ]
    assert got == [(k, t, m, p, i) for i, (k, t, m, p) in enumerate(PDF_EXPECT)]
    assert rows["p1"]["n_spans"] == len(PDF_EXPECT)
    assert rows["bad"]["spans"] is None and "ValueError" in rows["bad"]["parse_error"]

    # full-text parity: pdf_loader.get_full_text joins page texts "\n\n";
    # fitz page.get_text() renders EVERY textual region — tables and
    # footers included — so all TEXTUAL_KINDS must survive the raw path
    ft = {r["doc_id"]: r["full_text"]
          for r in full_text_pdf(load_pdf(src).filter("parse_error IS NULL")).collect()}
    assert "Hello world\nHi!" in ft["p1"] and "It(s) Here\nsecond" in ft["p1"]
    for kind, text, _m, _p in PDF_EXPECT:
        if kind in ("table", "footer"):
            assert text in ft["p1"], f"{kind} span missing from raw full text"


def test_extract_runs_on_pdf_output(spark):
    from docproc_spark.pipeline import extract

    src = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["p1"], "content": [make_pdf()]})
    )
    table = load_pdf(src).drop("sheet_names", "parse_error")
    rows = {r["doc_id"]: r for r in extract(table, probe_routing=False).collect()}
    assert rows["p1"]["n_pages"] == 2
    assert "Hello world" in rows["p1"]["markdown"]


def test_nested_parens_in_literal_string():
    """PDF literals may contain BALANCED unescaped parens — `(see (note))`
    is ONE string (spec 7.3.4.2); the paren-depth tokenizer must not
    split it (a regex alternation silently dropped 'see (' here)."""
    pdf = _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>\n",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>\n",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n",
            _stream_obj(b"BT 72 400 Td (see (note)) Tj ET", compress=False),
        ]
    )
    assert parse_pdf_bytes(pdf) == [("text", "see (note)", None, 0)]


def test_pageless_pdf_yields_empty_not_quarantine():
    pdf = _pdf([b"<< /Type /Catalog >>\n"])
    assert parse_pdf_bytes(pdf) == []


def test_mixed_page_heights_classify_per_page():
    """Header/footer bands use each page's OWN MediaBox height: y=820 is
    body on an A3-ish (1191pt) page 2 even though it is off-page for the
    letter-sized page 1."""
    pdf = _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>\n",
            b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>\n",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>\n",
            _stream_obj(b"BT 72 780 Td (top letter) Tj ET", compress=False),
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 842 1191] "
            b"/Contents 6 0 R >>\n",
            _stream_obj(b"BT 72 820 Td (body a3) Tj ET"
                        b" BT 72 1180 Td (top a3) Tj ET", compress=False),
        ]
    )
    got = parse_pdf_bytes(pdf)
    assert ("header", "top letter", None, 0) in got
    assert ("text", "body a3", None, 1) in got   # 1191-820=371 → body band
    assert ("header", "top a3", None, 1) in got  # 1191-1180=11 → header


def test_parser_never_hangs_or_crashes_on_mutations():
    """Robustness contract: arbitrary corruption of a valid PDF must
    either parse (possibly to fewer spans) or raise — never hang, never
    corrupt the process. Deterministic mutation fuzz (fixed seed)."""
    import random
    import time

    base = bytearray(make_pdf())
    rng = random.Random(1234)
    t0 = time.time()
    outcomes = {"ok": 0, "err": 0}
    for _ in range(120):
        data = bytearray(base)
        for _ in range(rng.randint(1, 12)):
            op = rng.randint(0, 2)
            pos = rng.randrange(len(data))
            if op == 0:
                data[pos] = rng.randrange(256)
            elif op == 1:
                del data[pos : pos + rng.randint(1, 40)]
            else:
                data[pos:pos] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 20)))
        try:
            parse_pdf_bytes(bytes(data))
            outcomes["ok"] += 1
        except Exception:
            outcomes["err"] += 1
    assert outcomes["ok"] + outcomes["err"] == 120
    assert time.time() - t0 < 30, "mutation fuzz too slow — parser may scale badly on garbage"
