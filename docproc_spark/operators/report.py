"""Dataset-card corpus reporting — one scan, grouping-set rollups.

Training-data releases ship per-source / per-language composition tables
(doc counts, token totals, null/empty rates). This is a single CUBE
aggregation: Spark computes every grouping set in ONE pass with map-side
partial aggregation (`.cube(...)` — no per-cell re-scan, no driver loop),
and the rolled-up dimensions are COALESCED to a sentinel label so the
output is a plain table any engine reproduces (no grouping_id() dialect
differences). All metrics are integers — counts, token sums, and an
integer tokens-per-doc — so the DuckDB oracle needs no rounding contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALL_LABEL = "<all>"


def corpus_report(
    docs: DataFrame,
    dims: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Composition report over ``dims`` with full CUBE rollups.

    One output row per grouping-set cell; a rolled-up dimension shows
    ``ALL_LABEL``, and real NULL dimension values are labelled ``<null>``
    so a rollup cell and a null-valued cell can never collide. Columns:
    every dim, then n_docs, n_null_text, total_tokens, total_chars,
    tokens_per_doc (integer division; 0-doc cells cannot occur).

    Scale shape: a CUBE over d dims costs one shuffle of 2^d partial-agg
    streams — for the dataset-card d (2-3 dims) this is one pass over the
    corpus with map-side combine; never a per-cell scan or driver loop.
    """
    if not dims:
        raise ValueError("dims must be non-empty")
    from docproc_spark.functions.text import token_count_col

    missing = [d for d in dims if d not in docs.columns]
    if missing:
        raise ValueError(f"dims not in docs: {missing}")
    reserved = {
        "n_docs",
        "n_null_text",
        "total_tokens",
        "total_chars",
        "tokens_per_doc",
    }
    bad = [d for d in dims if d in reserved or d.startswith("_cr_")]
    if bad:
        raise ValueError(f"dim names collide with report columns: {bad}")
    toks = F.coalesce(token_count_col(F.col(text_col)).cast("long"), F.lit(0))
    staged = docs.select(
        *[
            F.coalesce(F.col(d).cast("string"), F.lit("<null>")).alias(d)
            for d in dims
        ],
        toks.alias("_cr_toks"),
        F.coalesce(F.length(F.col(text_col)).cast("long"), F.lit(0)).alias(
            "_cr_chars"
        ),
        F.col(text_col).isNull().cast("long").alias("_cr_null"),
    )
    agg = staged.cube(*dims).agg(
        F.count("*").alias("n_docs"),
        F.sum("_cr_null").alias("n_null_text"),
        F.sum("_cr_toks").alias("total_tokens"),
        F.sum("_cr_chars").alias("total_chars"),
    )
    return agg.select(
        *[F.coalesce(F.col(d), F.lit(ALL_LABEL)).alias(d) for d in dims],
        "n_docs",
        "n_null_text",
        "total_tokens",
        F.col("total_chars"),
        F.expr("total_tokens div n_docs").alias("tokens_per_doc"),
    )
