"""The Spark extraction pipeline (flagship).

DataFrame-first reimplementation of the reference's deterministic extraction
path (see docproc_spark.oracle for the single-process truth). Everything
stays JVM-side in whole-stage codegen except two kernels that genuinely need
Python: unicode-NFC sanitize (vectorized pandas UDF over Arrow batches) and
the HTML main-content parser (pandas UDF, one call per HTML doc). No per-row
Python UDFs anywhere.

Scale design (the plan a 1000-executor cluster would run):
  - one explode + ONE shuffle family keyed by doc_id: the dedupe/media
    windows and both aggregations partition by (doc_id, ...) so AQE can
    reuse/coalesce; no join in the hot path (media captions use a window
    over (doc_id, media_ref) instead of a join-back).
  - the raw-text fallback (reference vision_llm.py:540-541) applies only to
    documents that assembled to empty markdown — handled in a second pass
    over just those docs (left-semi pushdown) so raw text never rides the
    main shuffle.
  - mega-document skew: per-page grouping bounds group size by
    spans-per-page; the doc-level aggregation only carries page parts.
    For pathological single-page mega-docs use operators.salting.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docproc_spark.kernels.assembly import MEDIA_KINDS, RASTER_KIND, TEXTUAL_KINDS
from docproc_spark.kernels.sanitize import DROP_KINDS_DEFAULT, sanitize_series
from docproc_spark.kernels.sanitize import BOILERPLATE_PATTERNS, TITLE_MAX_LEN
from docproc_spark.schema import SPAN_STRUCT


# ---------------------------------------------------------------------------
# Python kernels as pandas UDFs
# ---------------------------------------------------------------------------
@F.pandas_udf(T.StringType())
def sanitize_udf(s: pd.Series) -> pd.Series:
    return sanitize_series(s)


@F.pandas_udf(T.ArrayType(SPAN_STRUCT))
def html_spans_udf(raw_html: pd.Series) -> pd.Series:
    from docproc_spark.kernels.html import html_main_blocks

    def blocks(h):
        if not h:
            return []
        return [
            {"kind": k, "text": t, "media_ref": None, "page": 0, "offset": i}
            for i, (k, t) in enumerate(html_main_blocks(h))
        ]

    return raw_html.map(blocks)


# ---------------------------------------------------------------------------
# Native boilerplate classifier (JVM-side; mirrors kernels.sanitize patterns)
# ---------------------------------------------------------------------------
def boilerplate_kind_col(sanitized: Column) -> Column:
    """CASE chain over the invariant pattern list — whole-stage codegen."""
    first_line = F.trim(F.regexp_extract(sanitized, r"^([^\n]*)", 1))
    n_lines = F.size(F.split(sanitized, "\n"))
    expr = F.when((sanitized == "") | (first_line == ""), F.lit("blank"))
    for kind, pat in BOILERPLATE_PATTERNS:
        jre = "(?i)" + pat.pattern
        expr = expr.when(
            first_line.rlike(jre) | ((n_lines <= 2) & sanitized.rlike(jre)),
            F.lit(kind),
        )
    expr = expr.when(
        (F.length(sanitized) < TITLE_MAX_LEN) & (n_lines <= 1), F.lit("title")
    )
    return expr.otherwise(F.lit("none"))


# ---------------------------------------------------------------------------
# Pipeline stages
# ---------------------------------------------------------------------------
def with_derived_spans(docs: DataFrame) -> DataFrame:
    """Merge HTML-derived spans into the span array (HTML docs only)."""
    has_html = F.col("raw_html").isNotNull() & (F.length("raw_html") > 0)
    return docs.withColumn(
        "spans",
        F.when(
            has_html,
            F.concat(
                F.coalesce(F.col("spans"), F.array().cast(f"array<struct<kind:string,text:string,media_ref:string,page:int,offset:int>>")),
                html_spans_udf(F.col("raw_html")),
            ),
        ).otherwise(F.col("spans")),
    )


def explode_spans(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.coalesce(F.col("s.page"), F.lit(0)).alias("page"),
        F.coalesce(F.col("s.offset"), F.lit(0)).alias("offset"),
    )


def extract(docs: DataFrame, *, drop_kinds: frozenset = DROP_KINDS_DEFAULT) -> DataFrame:
    """Full pipeline: documents(doc_id, doc_type, raw_html, spans) → RESULT_SCHEMA."""
    docs = with_derived_spans(docs)
    rows = explode_spans(docs)

    is_textual = F.col("kind").isin(*TEXTUAL_KINDS)
    is_media = F.col("kind").isin(*MEDIA_KINDS)
    is_raster = F.col("kind") == RASTER_KIND

    rows = rows.withColumn(
        "sanitized", F.when(is_textual, sanitize_udf(F.col("text")))
    ).withColumn(
        "bp", F.when(is_textual, boilerplate_kind_col(F.col("sanitized")))
    )

    # page-level predicates needed by the rasterized fallback (computed before
    # any row is dropped, per reference semantics on RAW page content)
    w_page = Window.partitionBy("doc_id", "page")
    w_doc = Window.partitionBy("doc_id")
    rows = (
        rows.withColumn(
            "page_has_raw_text",
            F.max(
                (is_textual & (F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")).cast("int")
            ).over(w_page),
        )
        .withColumn("page_has_media", F.max(is_media.cast("int")).over(w_page))
        .withColumn("total_pages", F.max("page").over(w_doc) + F.lit(1))
    )

    # --- textual survivors: boilerplate drop + first-wins exact dedupe ------
    text_rows = rows.filter(is_textual & ~F.col("bp").isin(*drop_kinds) & (F.col("sanitized") != ""))
    w_dedup = Window.partitionBy("doc_id", F.sha2(F.col("sanitized"), 256)).orderBy(
        "page", "offset"
    )
    text_rows = text_rows.withColumn("rn", F.row_number().over(w_dedup)).filter(
        F.col("rn") == 1
    )

    # --- media occurrences: caption once per (doc, ref), first-sighting ctx -
    w_media_page = Window.partitionBy("doc_id", "page").orderBy("offset")
    media_rows = rows.filter(is_media & F.col("media_ref").isNotNull()).withColumn(
        "img_idx", F.row_number().over(w_media_page)
    )
    w_ref = Window.partitionBy("doc_id", "media_ref").orderBy("page", "offset")
    media_rows = media_rows.withColumn(
        "first_ctx",
        F.first(
            F.format_string("Page %d, image %d.", F.col("page") + 1, F.col("img_idx"))
        ).over(w_ref),
    ).withColumn(
        "caption",
        F.concat(F.lit("Figure "), F.substring("media_ref", 1, 12), F.lit(": "), F.col("first_ctx")),
    )

    # --- rasterized-page fallback -------------------------------------------
    raster_rows = rows.filter(
        is_raster
        & F.col("media_ref").isNotNull()
        & (F.col("page_has_raw_text") == 0)
        & (F.col("page_has_media") == 0)
    ).withColumn(
        "first_ctx",
        F.first(
            F.format_string("Page %d of %d.", F.col("page") + 1, F.col("total_pages"))
        ).over(w_ref),
    ).withColumn(
        "caption",
        F.concat(F.lit("Figure "), F.substring("media_ref", 1, 12), F.lit(": "), F.col("first_ctx")),
    )

    fig_rows = media_rows.select(
        "doc_id", "page", "offset", "media_ref", "caption"
    ).unionByName(raster_rows.select("doc_id", "page", "offset", "media_ref", "caption"))

    # --- per-page assembly ----------------------------------------------------
    texts_by_page = text_rows.groupBy("doc_id", "page").agg(
        F.array_sort(
            F.collect_list(F.struct("offset", "kind", F.col("sanitized").alias("text")))
        ).alias("texts")
    )
    figs_by_page = fig_rows.groupBy("doc_id", "page").agg(
        F.array_sort(
            F.collect_list(F.struct("offset", "media_ref", "caption"))
        ).alias("figs")
    )
    empty_span_array = "array<struct<offset:int,kind:string,text:string>>"
    empty_fig_array = "array<struct<offset:int,media_ref:string,caption:string>>"
    pages = (
        texts_by_page.join(figs_by_page, ["doc_id", "page"], "full_outer")
        .withColumn("texts", F.coalesce("texts", F.lit(None).cast(empty_span_array)))
        .withColumn("figs", F.coalesce("figs", F.lit(None).cast(empty_fig_array)))
    )
    page_text = F.concat_ws(
        "\n\n", F.transform(F.coalesce("texts", F.array().cast(empty_span_array)), lambda x: x["text"])
    )
    fig_list = F.concat_ws(
        " ; ", F.transform(F.coalesce("figs", F.array().cast(empty_fig_array)), lambda x: x["caption"])
    )
    part = F.regexp_replace(F.regexp_replace(page_text, r"^\s+", ""), r"\s+$", "")
    part = F.when(
        F.size(F.coalesce("figs", F.array().cast(empty_fig_array))) > 0,
        F.concat(part, F.lit("\n[Figures: "), fig_list, F.lit("]")),
    ).otherwise(part)
    pages = pages.withColumn("part", part).filter(F.col("part") != "")

    # --- per-document assembly -------------------------------------------------
    doc = pages.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("page", "part", "texts", "figs"))).alias("ps")
    )
    markdown = F.concat_ws(
        "\n\n",
        F.transform(
            "ps",
            lambda p: F.concat(
                F.lit("[Page "), (p["page"] + 1).cast("string"), F.lit("]\n"), p["part"]
            ),
        ),
    )
    raw_spans = F.flatten(
        F.transform(
            "ps",
            lambda p: F.concat(
                F.transform(
                    F.coalesce(p["texts"], F.array().cast(empty_span_array)),
                    lambda t: F.struct(
                        t["kind"].alias("kind"),
                        t["text"].alias("text"),
                        F.lit(None).cast("string").alias("media_ref"),
                        p["page"].alias("page"),
                    ),
                ),
                F.transform(
                    F.coalesce(p["figs"], F.array().cast(empty_fig_array)),
                    lambda g: F.struct(
                        F.lit("figure").alias("kind"),
                        g["caption"].alias("text"),
                        g["media_ref"].alias("media_ref"),
                        p["page"].alias("page"),
                    ),
                ),
            ),
        )
    )
    out_spans = F.transform(
        raw_spans,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["page"].alias("page"),
            i.cast("int").alias("offset"),
        ),
    )
    doc = doc.select(
        "doc_id",
        markdown.alias("markdown"),
        F.when(F.size("ps") > 0, F.element_at("ps", -1)["page"] + 1)
        .otherwise(F.lit(0))
        .cast("int")
        .alias("n_pages"),
        out_spans.alias("spans"),
    )

    # --- raw-text fallback for docs that assembled to nothing -------------------
    assembled_ids = doc.select("doc_id")
    missing = docs.join(assembled_ids, "doc_id", "left_anti")
    fb_rows = explode_spans(missing).filter(F.col("text").isNotNull())
    fallback = fb_rows.groupBy("doc_id").agg(
        F.concat_ws(
            "\n\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("page", "offset", "text"))),
                lambda x: x["text"],
            ),
        ).alias("markdown")
    )
    empty_docs = (
        missing.select("doc_id")
        .join(fallback, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("markdown", F.lit("")).alias("markdown"),
            F.lit(0).alias("n_pages"),
            F.array().cast(
                "array<struct<kind:string,text:string,media_ref:string,page:int,offset:int>>"
            ).alias("spans"),
        )
    )
    return doc.unionByName(empty_docs)
