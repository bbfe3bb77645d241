"""Span-table schema and the invariant string constants.

The input table shape comes from BASELINE.json's input_hint:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int32>>)

Internally the generator also folds a ``page`` field into each span struct
(FIXTURES.md §1 allows this) because page grouping drives assembly; the
driver-checked invariant remains (kind, text, media_ref, order).

All join/bracket constants below are behavioral invariants of the reference
extractor (cited file:line from /root/reference) — they must match exactly
for span-sequence equality.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Canonical region kinds (reference: docproc/doc/regions.py:7-29, lowercased)
# ---------------------------------------------------------------------------
KINDS = (
    "text",
    "equation",
    "image",
    "figure",
    "table",
    "handwriting",
    "header",
    "footer",
    "unclassified",
)

# ---------------------------------------------------------------------------
# Invariant string constants (reference file:line)
# ---------------------------------------------------------------------------
PAGE_JOIN = "\n\n"            # pdf_loader.py:49, vision_llm.py:539
CELL_JOIN = " | "             # docx_loader.py:34-50, xlsx_loader.py:22-24
ROW_JOIN = "\n"               # table rows within a region
SLIDE_SEP = "\n\n---\n\n"     # pptx_loader.py:81 (get_full_text path)
SHEET_HEADER = "=== {title} ===\n"  # xlsx_loader.py:58-59
PAGE_MARKER = "[Page {n}]\n"  # vision_llm.py:537
FIGURES_OPEN = "\n[Figures: "  # vision_llm.py:535
FIGURES_JOIN = " ; "
FIGURES_CLOSE = "]"
PAGES_PREFIX = "<!-- PAGES: {n} -->\n"  # facade.py:92-96
FIRST_SIGHT_CTX = "Page {page}, image {idx}."  # vision_llm.py:398 (1-based)

# ---------------------------------------------------------------------------
# Spark schemas
# ---------------------------------------------------------------------------
SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("page", T.IntegerType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("doc_type", T.StringType(), True),
        T.StructField("raw_html", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
    ]
)

# Output span struct: offset renumbered over surviving spans, page kept for
# debuggability (not part of the invariant tuple).
OUT_SPAN_STRUCT = SPAN_STRUCT

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("markdown", T.StringType(), True),
        T.StructField("n_pages", T.IntegerType(), True),
        T.StructField("spans", T.ArrayType(OUT_SPAN_STRUCT), True),
    ]
)
