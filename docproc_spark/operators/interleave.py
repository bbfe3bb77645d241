"""Interleaved text+media span analytics.

The corpus rows are ordered span sequences (kind, text, media_ref, page,
offset) — the reference's extraction output shape
(``docproc/llm/vision_llm.py:525-539`` assembles exactly this interleaving).
A multimodal training pipeline consumes that interleaving directly: it
mines image/caption pairs from the text surrounding each media span
(LAION/MMC4-style "nearest text" pairing), measures how text and media
alternate per document (packing and sampling decisions key off media
density), and segments documents into header-scoped sections (RAG chunking
and dataset cards both want section granularity).

All three operators here are expressed over the span ARRAY in-row — no
posexplode-then-window for the per-document passes, so ``media_context``
and ``interleave_stats`` are pure map-side projections (one scan, ZERO
exchanges, no Python; plan-guarded in tests/test_plans.py) and each
document costs O(n_spans) via single-pass ``aggregate`` folds, never
O(n²). ``section_rollup`` needs cross-span grouping, so it explodes and
shuffles ONCE on doc_id (the section groupBy reuses the window's
hashpartitioning(doc_id) — hash partitioning on a prefix of the group key
satisfies the aggregation's clustering, so no second exchange).

At 100 TB none of this changes: the in-row folds scale with executors
linearly (no cross-row dependency at all), and section_rollup's single
shuffle is keyed on doc_id, the same key the extraction pipeline already
partitions by — mega-documents are one task each, same skew profile as
extraction itself (route through pipeline_salted first if a document's
span count is pathological).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from docproc_spark.kernels.assembly import MEDIA_KINDS, TEXTUAL_KINDS

_TEXTUAL_IN = ", ".join(f"'{k}'" for k in sorted(TEXTUAL_KINDS))
_MEDIA_IN = ", ".join(f"'{k}'" for k in sorted(MEDIA_KINDS))

# a span contributes caption-candidate text iff it is textual AND non-null
_IS_TEXT = f"(s.kind IN ({_TEXTUAL_IN}) AND s.text IS NOT NULL)"
_IS_MEDIA = f"s.kind IN ({_MEDIA_IN})"


def media_context(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """One row per media span with its nearest textual neighbours.

    Columns: (id_col, pos, media_ref, before_text, after_text) where
    ``pos`` is the 0-based index of the media span in the span sequence,
    ``before_text`` is the text of the nearest PRECEDING textual span
    with non-null text (NULL if the media span leads the document) and
    ``after_text`` the nearest FOLLOWING one. This is the LAION/MMC4
    caption-candidate mining primitive over interleaved documents.

    Two O(n) folds per document (forward carrying "last textual text",
    backward over ``reverse(spans)`` carrying "next textual text"); the
    backward results reverse back into forward order so ``zip_with``
    aligns the two media lists index-by-index. Documents with NULL span
    arrays contribute no rows (explode of NULL). Zero shuffles.
    """
    fwd = f"""aggregate(
  {spans_col},
  struct(0 AS i, CAST(NULL AS STRING) AS last,
         CAST(array() AS array<struct<pos:int,media_ref:string,before_text:string>>) AS out),
  (acc, s) -> struct(
    acc.i + 1 AS i,
    IF({_IS_TEXT}, s.text, acc.last) AS last,
    IF({_IS_MEDIA},
       array_append(acc.out,
                    struct(acc.i AS pos, s.media_ref AS media_ref,
                           acc.last AS before_text)),
       acc.out) AS out),
  acc -> acc.out)"""
    bwd = f"""aggregate(
  reverse({spans_col}),
  struct(CAST(NULL AS STRING) AS nxt,
         CAST(array() AS array<struct<after_text:string>>) AS out),
  (acc, s) -> struct(
    IF({_IS_TEXT}, s.text, acc.nxt) AS nxt,
    IF({_IS_MEDIA},
       array_append(acc.out, struct(acc.nxt AS after_text)),
       acc.out) AS out),
  acc -> acc.out)"""
    combined = f"""zip_with({fwd}, reverse({bwd}),
  (a, b) -> struct(a.pos AS pos, a.media_ref AS media_ref,
                   a.before_text AS before_text, b.after_text AS after_text))"""
    return df.select(id_col, F.explode(F.expr(combined)).alias("x")).select(
        id_col, "x.*"
    )


def interleave_stats(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document text/media interleaving statistics, all integers.

    Columns (all BIGINT unless noted):
      n_spans          total spans (0 for NULL/empty arrays)
      n_text           spans with a textual kind
      n_media          spans with a media kind (image/figure)
      media_permille   floor(1000 * n_media / n_spans); NULL when n_spans=0
      n_runs           maximal runs over the T/M modality sequence
                       (spans that are neither textual nor media — e.g.
                       raster placeholders — are skipped, they neither
                       extend nor break a run)
      max_text_run     longest run of consecutive textual spans
      max_media_run    longest run of consecutive media spans
      first_media_pos  0-based index of the first media span in the FULL
                       span sequence; NULL if the document has no media

    One scan, zero exchanges, no Python — a pure projection of in-row
    O(n) folds, safe at any corpus size.
    """
    mod = (
        f"filter(transform({spans_col}, s -> CASE WHEN s.kind IN ({_TEXTUAL_IN})"
        f" THEN 'T' WHEN s.kind IN ({_MEDIA_IN}) THEN 'M' END), x -> x IS NOT NULL)"
    )
    runs = f"""aggregate(
  {mod},
  struct(CAST(NULL AS STRING) AS cur, 0L AS cur_len,
         0L AS max_t, 0L AS max_m, 0L AS n_runs),
  (acc, m) -> struct(
    m AS cur,
    IF(m = acc.cur, acc.cur_len + 1L, 1L) AS cur_len,
    greatest(acc.max_t,
             IF(m = 'T', IF(m = acc.cur, acc.cur_len + 1L, 1L), 0L)) AS max_t,
    greatest(acc.max_m,
             IF(m = 'M', IF(m = acc.cur, acc.cur_len + 1L, 1L), 0L)) AS max_m,
    acc.n_runs + IF(m = acc.cur, 0L, 1L) AS n_runs),
  acc -> struct(acc.max_t AS max_t, acc.max_m AS max_m, acc.n_runs AS n_runs))"""
    first_media = f"""aggregate(
  {spans_col},
  struct(0L AS i, CAST(-1 AS BIGINT) AS fp),
  (acc, s) -> struct(
    acc.i + 1L AS i,
    IF(acc.fp = -1L AND {_IS_MEDIA}, acc.i, acc.fp) AS fp),
  acc -> IF(acc.fp = -1L, CAST(NULL AS BIGINT), acc.fp))"""
    # size() is -1 for NULL arrays pre-ANSI and NULL under ANSI; clamp both
    n_spans = F.when(F.col(spans_col).isNull(), F.lit(0).cast("bigint")).otherwise(
        F.size(spans_col).cast("bigint")
    )
    n_text = F.coalesce(
        F.expr(f"CAST(size(filter({mod}, x -> x = 'T')) AS BIGINT)"),
        F.lit(0).cast("bigint"),
    )
    n_media = F.coalesce(
        F.expr(f"CAST(size(filter({mod}, x -> x = 'M')) AS BIGINT)"),
        F.lit(0).cast("bigint"),
    )
    r = F.expr(runs)
    return df.select(
        id_col,
        n_spans.alias("n_spans"),
        n_text.alias("n_text"),
        n_media.alias("n_media"),
        # floor() on both engines (Spark CAST truncates but DuckDB CAST
        # rounds-to-nearest, so an explicit floor is the portable form);
        # exact-integer quotients are exact in double at these magnitudes
        F.when(n_spans > 0, F.floor(F.lit(1000).cast("bigint") * n_media / n_spans))
        .cast("bigint")
        .alias("media_permille"),
        F.coalesce(r["n_runs"], F.lit(0).cast("bigint")).alias("n_runs"),
        F.coalesce(r["max_t"], F.lit(0).cast("bigint")).alias("max_text_run"),
        F.coalesce(r["max_m"], F.lit(0).cast("bigint")).alias("max_media_run"),
        F.expr(first_media).alias("first_media_pos"),
    )


def section_rollup(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Header-scoped section segmentation with per-section rollups.

    Every BODY span (textual, not a header, non-null text) belongs to the
    most recent preceding header span with non-null text; spans before the
    first header form the preamble section (sec_pos = -1, section NULL).
    Output: (id_col, sec_pos, section, n_spans, n_chars) — one row per
    non-empty section, where sec_pos is the 0-based position of the
    header span that opens the section and n_chars sums codepoint lengths
    (Spark length() and DuckDB length() both count codepoints — verified
    on astral chars, which the corpus contains).

    posexplode + one running-last window keyed on doc_id, then a groupBy
    on (doc_id, sec_pos, section). The groupBy inherits the window's
    hashpartitioning(doc_id) — partitioning on a subset of the group key
    satisfies the aggregation's required clustering — so the whole
    operator is ONE exchange (plan-guarded).
    """
    s = df.select(id_col, F.posexplode(spans_col).alias("pos", "s"))
    is_header = (F.col("s.kind") == "header") & F.col("s.text").isNotNull()
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = s.select(
        id_col,
        "pos",
        "s",
        F.last(F.when(is_header, F.col("pos")), ignorenulls=True)
        .over(w)
        .alias("hdr_pos"),
        F.last(F.when(is_header, F.col("s.text")), ignorenulls=True)
        .over(w)
        .alias("hdr_text"),
    )
    body = s.where(
        F.col("s.kind").isin(*sorted(TEXTUAL_KINDS))
        & (F.col("s.kind") != "header")
        & F.col("s.text").isNotNull()
    )
    return (
        body.groupBy(
            id_col,
            F.coalesce(F.col("hdr_pos").cast("bigint"), F.lit(-1).cast("bigint")).alias(
                "sec_pos"
            ),
            F.col("hdr_text").alias("section"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.length("s.text").cast("bigint")).alias("n_chars"),
        )
    )
