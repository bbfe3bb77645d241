"""OOXML (DOCX/PPTX/XLSX) bytes → span-table ingestion kernels.

The reference parses real Office files through python-docx / python-pptx /
openpyxl (``/root/reference/docproc/doc/loaders/docx_loader.py:13-56``,
``pptx_loader.py:13-64``, ``xlsx_loader.py:13-42``). None of those
libraries exist in this environment — but OOXML is just zip + XML, so
these kernels parse the bytes with ``zipfile`` + ``xml.etree`` (stdlib
only) and reproduce the loaders' region semantics exactly:

  docx  body paragraphs in document order (text = runs concatenated,
        ``w:tab``→TAB, ``w:br``/``w:cr``→NL, matching python-docx
        ``Paragraph.text``), stripped, non-empty → one ``text`` span each
        (page 0); then each ``w:tbl`` → one ``table`` span whose text is
        rows joined "\\n", each row its cells' text (cell = paragraphs
        joined "\\n", python-docx ``_Cell.text``) stripped and joined
        " | " — paragraphs before tables, exactly the loader's two-pass
        order (docx_loader.py:21-50).
  pptx  slides in ``sldIdLst`` order (resolved through the package rels,
        as python-pptx does); per slide, ``spTree`` children in document
        order: a text shape (``p:sp`` with ``p:txBody``) → stripped
        non-empty → ``text`` span; a ``p:graphicFrame`` table → one
        ``table`` span (rows joined "\\n", each row " | "-joined stripped
        cells, empty rows dropped — pptx_loader.py:33-49); a ``p:pic`` →
        an ``image`` media span whose media_ref is the embedded image's
        part name from the slide rels (the loader collects the blob,
        pptx_loader.py:51-60; the span model carries the reference).
        page = slide index.
  xlsx  sheets in workbook order (rels-resolved); shared strings + inline
        strings + cached formula values (``data_only`` semantics); every
        row padded to the sheet's used-range width with "" for missing
        cells — matching openpyxl ``iter_rows(values_only=True)`` in
        read_only mode, including its quirk that an interior all-empty
        row still yields a ``"|"``-bearing row after " | ".join + strip
        (xlsx_loader.py:20-27). Numbers render like openpyxl: integral →
        int repr, otherwise float repr; booleans → "True"/"False". Each
        non-empty row-text becomes one ``table`` span (page = sheet idx).
        Sheet NAMES are parsed and returned in a ``sheet_names`` column —
        the span struct has no title field (schema.py), and the span-side
        full_text_xlsx defines the title as "Sheet{page+1}".

Spark-first shape: ``load_ooxml`` is a single ``mapInPandas`` pass —
Arrow-batched, one Python crossing, no per-row UDF, no shuffle. Each
output row carries the ingest-time ``n_spans`` routing column so
``pipeline.extract`` keeps its pushable mega-doc predicate. Reading a
directory of real files goes through Spark's distributed ``binaryFile``
source (``read_ooxml_dir``): partition-parallel IO, no driver-side file
loop; at 100 TB the same plan fans the zip parsing across executors with
``maxPartitionBytes`` controlling batch size.
"""

from __future__ import annotations

import hashlib
import io
import re
import zipfile
from typing import Iterable, Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docproc_spark.kernels.mediainfo import sniff_media_header

NS_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
NS_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
NS_P = "http://schemas.openxmlformats.org/presentationml/2006/main"
NS_S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
NS_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
NS_PKG_R = "http://schemas.openxmlformats.org/package/2006/relationships"


def _q(ns: str, tag: str) -> str:
    return f"{{{ns}}}{tag}"


# ---------------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------------
def _docx_para_text(p: ET.Element) -> str:
    """python-docx Paragraph.text: run texts concatenated, w:tab → \\t,
    w:br / w:cr → \\n (docx Run.text semantics)."""
    parts: list[str] = []
    for el in p.iter():
        tag = el.tag
        if tag == _q(NS_W, "t"):
            parts.append(el.text or "")
        elif tag == _q(NS_W, "tab"):
            parts.append("\t")
        elif tag in (_q(NS_W, "br"), _q(NS_W, "cr")):
            parts.append("\n")
    return "".join(parts)


def parse_docx_bytes(data: bytes) -> list[tuple[str, str, str | None, int]]:
    """bytes → [(kind, text, media_ref, page)] in loader emission order:
    stripped non-empty paragraphs first, then one table span per w:tbl
    (docx_loader.py:21-50: doc.paragraphs then doc.tables)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    body = root.find(_q(NS_W, "body"))
    spans: list[tuple[str, str, str | None, int]] = []
    tables: list[str] = []
    if body is None:
        return spans
    for child in body:
        if child.tag == _q(NS_W, "p"):
            t = _docx_para_text(child).strip()
            if t:
                spans.append(("text", t, None, 0))
        elif child.tag == _q(NS_W, "tbl"):
            rows = []
            for tr in child.findall(_q(NS_W, "tr")):
                cells = []
                for tc in tr.findall(_q(NS_W, "tc")):
                    # _Cell.text: cell paragraphs joined "\n"
                    cell = "\n".join(
                        _docx_para_text(p) for p in tc.findall(_q(NS_W, "p"))
                    )
                    cells.append(cell.strip())
                rows.append(" | ".join(cells))
            table_text = "\n".join(rows)
            if table_text.strip():
                tables.append(table_text)
    spans.extend(("table", t, None, 0) for t in tables)
    return spans


# ---------------------------------------------------------------------------
# PPTX
# ---------------------------------------------------------------------------
def _rels_map(z: zipfile.ZipFile, rels_path: str) -> dict[str, str]:
    try:
        root = ET.fromstring(z.read(rels_path))
    except KeyError:
        return {}
    return {
        rel.get("Id"): rel.get("Target")
        for rel in root.findall(_q(NS_PKG_R, "Relationship"))
    }


def _resolve_part(base_dir: str, target: str) -> str:
    if target.startswith("/"):
        return target[1:]
    # normalize ../ the way package parts do
    parts: list[str] = base_dir.split("/") if base_dir else []
    for seg in target.split("/"):
        if seg == "..":
            if parts:
                parts.pop()
        elif seg not in (".", ""):
            parts.append(seg)
    return "/".join(parts)


def _a_text(el: ET.Element) -> str:
    """Concatenated a:t text of one a:p (python-pptx paragraph text)."""
    return "".join(t.text or "" for t in el.iter(_q(NS_A, "t")))


def _txbody_text(tx: ET.Element) -> str:
    """python-pptx shape.text: paragraphs joined \\n."""
    return "\n".join(_a_text(p) for p in tx.findall(_q(NS_A, "p")))


def parse_pptx_bytes(
    data: bytes, media_facts: dict[str, dict] | None = None
) -> list[tuple[str, str, str | None, int]]:
    """bytes → spans; slides in sldIdLst order, shapes in spTree order
    (pptx_loader.py:18-60). Table rows with empty " | "-joined text are
    dropped (the loader's ``if row_text:``); a picture becomes an image
    span referencing its embedded part name. When ``media_facts`` is
    given, every first-seen image blob also records its sidecar facts
    (part name, blob size, container-header metadata via
    kernels/mediainfo) keyed by media_ref — the media-catalogue hook
    (sources/media_sidecar.py) sharing this one zip walk."""
    spans: list[tuple[str, str, str | None, int]] = []
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        pres = ET.fromstring(z.read("ppt/presentation.xml"))
        rels = _rels_map(z, "ppt/_rels/presentation.xml.rels")
        slide_parts = []
        sld_lst = pres.find(_q(NS_P, "sldIdLst"))
        if sld_lst is not None:
            for sld in sld_lst.findall(_q(NS_P, "sldId")):
                rid = sld.get(_q(NS_R, "id"))
                if rid in rels:
                    slide_parts.append(_resolve_part("ppt", rels[rid]))
        for page, part in enumerate(slide_parts):
            slide = ET.fromstring(z.read(part))
            sdir, sname = part.rsplit("/", 1)
            srels = _rels_map(z, f"{sdir}/_rels/{sname}.rels")
            tree = slide.find(f"{_q(NS_P, 'cSld')}/{_q(NS_P, 'spTree')}")
            if tree is None:
                continue
            for shape in tree:
                if shape.tag == _q(NS_P, "sp"):
                    tx = shape.find(f"{_q(NS_P, 'txBody')}")
                    if tx is not None:
                        t = _txbody_text(tx).strip()
                        if t:
                            spans.append(("text", t, None, page))
                elif shape.tag == _q(NS_P, "graphicFrame"):
                    tbl = next(iter(shape.iter(_q(NS_A, "tbl"))), None)
                    if tbl is None:
                        continue
                    rows = []
                    for tr in tbl.findall(_q(NS_A, "tr")):
                        cells = []
                        for tc in tr.findall(_q(NS_A, "tc")):
                            txb = tc.find(_q(NS_A, "txBody"))
                            cell = _txbody_text(txb) if txb is not None else ""
                            cells.append(cell.strip())
                        row_text = " | ".join(cells)
                        if row_text:
                            rows.append(row_text)
                    if rows:
                        spans.append(("table", "\n".join(rows), None, page))
                elif shape.tag == _q(NS_P, "pic"):
                    blip = next(iter(shape.iter(_q(NS_A, "blip"))), None)
                    rid = blip.get(_q(NS_R, "embed")) if blip is not None else None
                    target = srels.get(rid) if rid else None
                    part = _resolve_part(sdir, target) if target else None
                    # media_ref is the sha256 of the embedded image BYTES
                    # (the span contract / vision_llm.py:292-294 identity),
                    # never the package part name: every deck calls its
                    # first image `ppt/media/image1.png`, so part names
                    # collide across documents and would break corpus-wide
                    # media dedupe. Unreadable part → fall back to the
                    # part name (still document-locally identifying).
                    ref, blob = part, None
                    if part is not None:
                        try:
                            blob = z.read(part)
                            ref = hashlib.sha256(blob).hexdigest()
                        except Exception:
                            # missing member (KeyError) but also corrupt
                            # CRC (BadZipFile) / encrypted (RuntimeError):
                            # one bad image must NOT quarantine the whole
                            # document's text — keep the part-name ref
                            blob = None
                    if (
                        media_facts is not None
                        and ref is not None
                        and ref not in media_facts
                    ):
                        meta = sniff_media_header(blob)  # None → all-None
                        media_facts[ref] = {
                            "name": part,
                            "n_bytes": len(blob) if blob is not None else None,
                            **meta,
                        }
                    spans.append(("image", None, ref, page))
    return spans


# ---------------------------------------------------------------------------
# XLSX
# ---------------------------------------------------------------------------
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str | None) -> int | None:
    """'B3' → 2 (1-based column)."""
    if not ref:
        return None
    m = _CELL_REF.match(ref)
    if not m:
        return None
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - 64)
    return n


def _xlsx_cell_str(c: ET.Element, shared: list[str]) -> str:
    """Cached-value rendering, openpyxl data_only semantics: shared/inline
    strings verbatim, booleans 'True'/'False', numbers int-vs-float by
    lexical shape, formula cells their cached <v>."""
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(_q(NS_S, "is"))
        return "".join(
            el.text or "" for el in (is_el.iter(_q(NS_S, "t")) if is_el is not None else ())
        )
    v = c.find(_q(NS_S, "v"))
    if v is None or v.text is None:
        return ""
    raw = v.text
    if t == "s":
        i = int(raw)
        return shared[i] if 0 <= i < len(shared) else ""
    if t == "b":
        return "True" if raw.strip() == "1" else "False"
    if t in ("str", "e"):
        return raw
    # numeric: openpyxl parses '.'/'E' → float else int
    if "." in raw or "E" in raw or "e" in raw:
        return str(float(raw))
    try:
        return str(int(raw))
    except ValueError:
        return raw


def parse_xlsx_bytes(
    data: bytes,
) -> tuple[list[tuple[str, str, str | None, int]], list[str]]:
    """bytes → (spans, sheet_names); one table span per non-empty padded
    row (xlsx_loader.py:20-37), sheets in workbook order."""
    spans: list[tuple[str, str, str | None, int]] = []
    names: list[str] = []
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = _rels_map(z, "xl/_rels/workbook.xml.rels")
        shared: list[str] = []
        try:
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.findall(_q(NS_S, "si")):
                shared.append("".join(t.text or "" for t in si.iter(_q(NS_S, "t"))))
        except KeyError:
            pass
        sheets_el = wb.find(_q(NS_S, "sheets"))
        sheet_parts: list[tuple[str, str]] = []
        if sheets_el is not None:
            for sh in sheets_el.findall(_q(NS_S, "sheet")):
                rid = sh.get(_q(NS_R, "id"))
                if rid in rels:
                    sheet_parts.append(
                        (sh.get("name") or "", _resolve_part("xl", rels[rid]))
                    )
        for page, (name, part) in enumerate(sheet_parts):
            names.append(name)
            sheet = ET.fromstring(z.read(part))
            data_el = sheet.find(_q(NS_S, "sheetData"))
            if data_el is None:
                continue
            # first pass: used range (openpyxl pads values_only rows to it)
            cells_by_row: dict[int, dict[int, str]] = {}
            max_col = 0
            max_row = 0
            last_row = 0
            for row in data_el.findall(_q(NS_S, "row")):
                # r is OPTIONAL on <row>: an unnumbered row follows the
                # previous one (last+1) — len(cells_by_row)+1 would place
                # it before, or collide with, earlier numbered rows
                r_idx = int(row.get("r", last_row + 1))
                last_row = r_idx
                max_row = max(max_row, r_idx)
                by_col = cells_by_row.setdefault(r_idx, {})
                next_col = 1
                for c in row.findall(_q(NS_S, "c")):
                    col = _col_index(c.get("r")) or next_col
                    next_col = col + 1
                    by_col[col] = _xlsx_cell_str(c, shared)
                    max_col = max(max_col, col)
            for r_idx in range(1, max_row + 1):
                by_col = cells_by_row.get(r_idx, {})
                cells = [by_col.get(ci, "") for ci in range(1, max_col + 1)]
                row_text = " | ".join(cells).strip()
                if row_text:
                    spans.append(("table", row_text, None, page))
    return spans, names


# ---------------------------------------------------------------------------
# the Spark kernel
# ---------------------------------------------------------------------------
OOXML_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("doc_type", T.StringType(), True),
        T.StructField("raw_html", T.StringType(), True),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), True),
                        T.StructField("text", T.StringType(), True),
                        T.StructField("media_ref", T.StringType(), True),
                        T.StructField("page", T.IntegerType(), True),
                        T.StructField("offset", T.IntegerType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("n_spans", T.LongType(), True),
        T.StructField("sheet_names", T.ArrayType(T.StringType()), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)

_PARSERS = {
    "docx": parse_docx_bytes,
    "pptx": parse_pptx_bytes,
    "xlsx": parse_xlsx_bytes,
    "xlsm": parse_xlsx_bytes,  # macro-enabled: same zip+XML workbook
}


def parse_one(fmt: str, data: bytes):
    """(spans, sheet_names) for one document; raises on unknown format."""
    fmt = (fmt or "").lower().lstrip(".")
    if fmt not in _PARSERS:
        raise ValueError(f"unsupported OOXML format: {fmt!r}")
    out = _PARSERS[fmt](data)
    if fmt in ("xlsx", "xlsm"):
        return out
    return out, None


def load_ooxml(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    fmt_col: str = "fmt",
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, fmt, content:binary) → span table (OOXML_OUT_SCHEMA).

    One ``mapInPandas`` pass: Arrow-batched binary in, struct-array out;
    zip+XML parsing is per-document CPU work that scales linearly with
    executors. A malformed file lands in quarantine style — null spans +
    ``parse_error`` — rather than failing the job (the reference CLI
    quarantines per-file failures the same way)."""
    import pandas as pd

    id_c, f_c, b_c = doc_id_col, fmt_col, content_col

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for did, fmt, blob in zip(pdf[id_c], pdf[f_c], pdf[b_c]):
                row = {
                    "doc_id": did,
                    "doc_type": (fmt or "").lower().lstrip("."),
                    "raw_html": None,
                    "spans": None,
                    "n_spans": None,
                    "sheet_names": None,
                    "parse_error": None,
                }
                try:
                    raw, names = parse_one(fmt, bytes(blob))
                    row["spans"] = [
                        {
                            "kind": k,
                            "text": t,
                            "media_ref": m,
                            "page": p,
                            "offset": i,
                        }
                        for i, (k, t, m, p) in enumerate(raw)
                    ]
                    row["n_spans"] = len(raw)
                    row["sheet_names"] = names
                except Exception as e:  # noqa: BLE001 — per-doc quarantine
                    row["parse_error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in OOXML_OUT_SCHEMA])

    return docs.mapInPandas(gen, schema=OOXML_OUT_SCHEMA)


def read_ooxml_dir(
    spark,
    path: str,
    *,
    glob: str = "*.{[dD][oO][cC][xX],[pP][pP][tT][xX],[xX][lL][sS][xX]}",
) -> DataFrame:
    """Distributed directory ingestion via the binaryFile source: each
    executor reads + parses its own partition of files (no driver loop).
    doc_id = file name, fmt = extension. The default glob uses per-char
    case classes — Hadoop glob matching is case-sensitive and REPORT.DOCX
    would otherwise be silently skipped."""
    binf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("doc_id"),
            F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1)).alias(
                "fmt"
            ),
            F.col("content"),
        )
    )
    return load_ooxml(binf)
