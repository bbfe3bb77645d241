"""EPUB (zip + XHTML e-book) bytes → span-table ingestion kernel.

Books are a first-class training-data source, and EPUB is how they
arrive: a zip package (OCF, ISO 22424) whose META-INF/container.xml
names an OPF package document; the OPF's <manifest> maps ids to
package hrefs and its <spine> lists the reading order. Each spine
chapter is XHTML — so chapter content flows through the SAME
density-kernel extraction as web pages (kernels/html.html_main_blocks:
boilerplate strip, tables, code, figcaption floors, image spans), with
``page`` = spine index standing in for the chapter boundary exactly
like PPTX slides and XLSX sheets use it.

Media identity is content-addressed like every other raw-bytes source:
an <img> whose src resolves to a package member gets
``media_ref`` = sha256 of the member's bytes (two editions embedding
the same cover unify; `images/cover.jpg` in two books does not
collide); data: URIs hash their payload via the html kernel; an
unresolvable src keeps the URL/path string. Beacon and chrome rules
are the html kernel's own.

The reference has no EPUB loader — this is beyond-reference source
coverage in the same contract as ooxml.py/pdf.py: stdlib zip + XML,
one ``mapInPandas`` pass, per-document quarantine, OOXML_OUT_SCHEMA
(doc_type 'epub'), ingest-time n_spans routing column, and a
``media_facts`` sink for the one-pass media-catalogue flow.
"""

from __future__ import annotations

import hashlib
import io
import posixpath
import zipfile
from typing import Iterable, Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame

from docproc_spark.kernels.html import html_main_blocks
from docproc_spark.kernels.mediainfo import sniff_media_header
from docproc_spark.sources.html import sniff_charset
from docproc_spark.sources.ooxml import OOXML_OUT_SCHEMA

__all__ = ["parse_epub_bytes", "load_epub"]

_NS_CONTAINER = "urn:oasis:names:tc:opendocument:xmlns:container"
_NS_OPF = "http://www.idpf.org/2007/opf"

_XHTML_TYPES = ("application/xhtml+xml", "text/html")


def _opf_path(z: zipfile.ZipFile) -> str:
    """The package document's full path from META-INF/container.xml
    (first <rootfile>, per OCF)."""
    root = ET.fromstring(z.read("META-INF/container.xml"))
    rf = root.find(
        f"{{{_NS_CONTAINER}}}rootfiles/{{{_NS_CONTAINER}}}rootfile"
    )
    if rf is None or not rf.get("full-path"):
        raise ValueError("container.xml names no rootfile")
    return rf.get("full-path")


def _resolve(base_dir: str, href: str) -> str:
    """Package-internal path of `href` relative to `base_dir` (percent
    escapes undone — OPF hrefs are URLs, zip names are not)."""
    from urllib.parse import unquote

    href = unquote(href.split("#", 1)[0])
    if href.startswith("/"):
        return href[1:]
    return posixpath.normpath(posixpath.join(base_dir, href))


def parse_epub_bytes(
    data: bytes, media_facts: dict[str, dict] | None = None
) -> list[tuple[str, str | None, str | None, int]]:
    """bytes → [(kind, text, media_ref, page)] — spine chapters in OPF
    order, each through the html density kernel; page = spine index.
    Raises on a malformed package (caller quarantines per document)."""
    spans: list[tuple[str, str | None, str | None, int]] = []
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        opf_path = _opf_path(z)
        opf_dir = posixpath.dirname(opf_path)
        opf = ET.fromstring(z.read(opf_path))
        manifest: dict[str, tuple[str, str]] = {}
        man = opf.find(f"{{{_NS_OPF}}}manifest")
        if man is not None:
            for item in man.findall(f"{{{_NS_OPF}}}item"):
                iid, href = item.get("id"), item.get("href")
                if iid and href:
                    manifest[iid] = (
                        href,
                        (item.get("media-type") or "").lower(),
                    )
        spine = opf.find(f"{{{_NS_OPF}}}spine")
        itemrefs = (
            [
                ir.get("idref")
                for ir in spine.findall(f"{{{_NS_OPF}}}itemref")
            ]
            if spine is not None
            else []
        )
        page = 0
        for idref in itemrefs:
            href, mtype = manifest.get(idref, (None, ""))
            if href is None or mtype not in _XHTML_TYPES:
                continue  # non-content spine entries (e.g. SVG pages)
            member = _resolve(opf_dir, href)
            try:
                raw = z.read(member)
            except Exception:
                page += 1  # chapter listed but unreadable: keep numbering
                continue
            codec, errors = sniff_charset(raw)
            chapter_facts: dict[str, dict] = {}
            blocks = html_main_blocks(
                raw.decode(codec, errors).lstrip("﻿"),
                media_facts=chapter_facts,
            )
            chapter_dir = posixpath.dirname(member)
            remap: dict[str, str] = {}
            for k, t, ref in blocks:
                if k == "image" and ref in chapter_facts and ref not in remap:
                    facts = chapter_facts[ref]
                    src = facts.get("name") or ""
                    if facts.get("n_bytes") is not None:
                        # data: URI — payload-hashed already; facts stand
                        remap[ref] = ref
                    else:
                        # package-relative src → content-addressed member
                        target = _resolve(chapter_dir, src)
                        try:
                            blob = z.read(target)
                        except Exception:
                            blob = None
                        if blob is not None:
                            new_ref = hashlib.sha256(blob).hexdigest()
                            remap[ref] = new_ref
                            facts = {
                                "name": target,
                                "n_bytes": len(blob),
                                **sniff_media_header(blob),
                            }
                        else:  # external URL or dangling member: keep
                            remap[ref] = ref
                    if media_facts is not None:
                        media_facts.setdefault(remap[ref], facts)
                spans.append(
                    (k, t, remap.get(ref, ref) if k == "image" else None, page)
                )
            page += 1
    return spans


def load_epub(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, content:binary) → span table (OOXML_OUT_SCHEMA,
    doc_type 'epub'): one mapInPandas pass, per-document quarantine via
    parse_error — the same contract as load_ooxml/load_pdf."""
    import pandas as pd

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for did, blob in zip(pdf[doc_id_col], pdf[content_col]):
                row = {
                    "doc_id": did,
                    "doc_type": "epub",
                    "raw_html": None,
                    "spans": None,
                    "n_spans": None,
                    "sheet_names": None,
                    "parse_error": None,
                }
                try:
                    raw = parse_epub_bytes(bytes(blob))
                    row["spans"] = [
                        {"kind": k, "text": t, "media_ref": m, "page": p,
                         "offset": i}
                        for i, (k, t, m, p) in enumerate(raw)
                    ]
                    row["n_spans"] = len(raw)
                except Exception as e:  # noqa: BLE001 — per-doc quarantine
                    row["parse_error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in OOXML_OUT_SCHEMA])

    return docs.mapInPandas(gen, schema=OOXML_OUT_SCHEMA)
