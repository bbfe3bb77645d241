"""Single-process reference-semantics oracle.

The invariant source of truth: a straight Python implementation of the
deterministic extraction path (the reference's own tests run with vision and
LLM refine disabled — /root/reference/tests/conftest.py:22-23 — so this
covers exactly the semantics the reference asserts on). The Spark pipeline
must produce, per document, a span sequence equal to this oracle's on
(kind, text, media_ref, order).
"""

from __future__ import annotations

from typing import Iterable

from docproc_spark.kernels.assembly import assemble_document
from docproc_spark.kernels.html import html_main_blocks


def html_to_spans(raw_html: str) -> list[dict]:
    """HTML doc → input text spans on page 0 (shared kernel, same as Spark)."""
    return [
        {"kind": kind, "text": text, "media_ref": None, "page": 0, "offset": i}
        for i, (kind, text) in enumerate(html_main_blocks(raw_html))
    ]


def extract_doc(doc: dict) -> dict:
    """Oracle extraction for one document row (dict with doc_id/raw_html/spans)."""
    spans = doc.get("spans") or []
    if doc.get("raw_html"):
        spans = list(spans) + html_to_spans(doc["raw_html"])
    markdown, out_spans = assemble_document(spans)
    n_pages = (max((s["page"] for s in out_spans), default=-1) + 1) if out_spans else 0
    return {
        "doc_id": doc["doc_id"],
        "markdown": markdown,
        "n_pages": n_pages,
        "spans": out_spans,
    }


def extract_corpus(docs: Iterable[dict]) -> dict[str, dict]:
    """Oracle over a corpus → {doc_id: result}."""
    return {d["doc_id"]: extract_doc(d) for d in docs}
