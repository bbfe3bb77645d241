"""Lexical retrieval over the corpus (BM25-shaped scoring).

Complements the vector side (functions/text.hash_embed + the ANN family in
operators/similarity) with classic full-text ranking, so the engine covers
both retrieval modalities a RAG stack needs. The reference has no search
path at all — this is a beyond-reference capability, built engine-portable
on purpose (every arithmetic step is IEEE-exact, so the DuckDB oracle
reproduces scores bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from docproc_spark.operators.dedupe import tokens_col


def query_terms(query: str) -> list[str]:
    """Sorted distinct lowercased whitespace tokens of a query string —
    the fixed term order both engines sum scores in (floating-point
    addition is not associative; a fixed order makes the total exact)."""
    return sorted({t for t in query.lower().split() if t})


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for ``query`` under BM25-shaped scoring:

        score(d) = sum_t idf_t * tf_t*(k1+1) / (tf_t + k1*(1-b + b*dl/avgdl))
        idf_t    = (N - df_t + 0.5) / (df_t + 0.5)

    — standard BM25 (Robertson/Sparck Jones) with the rational idf
    surrogate in place of its log: ln() is not identically rounded across
    engines (a 1-ulp difference flips ranks), while the rational form is
    monotone in df and IEEE-exact everywhere. Ranking quality is the
    BM25 family's; absolute scores are not comparable to log-idf BM25.

    Terms are ``query_terms(query)`` in sorted order, summed
    left-to-right; ties break by doc_id, zero-score documents (no query
    term present) are dropped. Returns (doc_id, score, rank).

    Plan: the per-term tf columns are one staged projection; corpus
    stats (N, sum dl, per-term df) are ONE 1-row aggregate crossJoined
    back (broadcast), so the corpus is scanned twice (stats + scoring —
    the same two-consumer shape as repeated_window_fraction; checkpoint
    upstream if the source is expensive) and never shuffled: top-k is a
    sort-limit (TakeOrderedAndProject), not a global sort. Query cost is
    O(corpus x |terms|); for interactive serving build an inverted index
    instead — this operator is the batch-scoring / evaluation path.
    """
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no tokens")
    if k <= 0:
        raise ValueError("k must be positive")

    def tf_col(term: str) -> Column:
        return F.size(F.filter(F.col("_lt"), lambda x: x == F.lit(term))).cast(
            "long"
        )

    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit("")))).alias("_lt"),
    ).select(
        "doc_id",
        F.size("_lt").cast("long").alias("dl"),
        *[tf_col(t).alias(f"tf{i}") for i, t in enumerate(terms)],
    )
    stats = staged.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dl").alias("sdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    joined = staged.crossJoin(stats)
    avgdl = F.col("sdl").cast("double") / F.col("n")
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}")
        idf = (F.col("n") - F.col(f"df{i}") + F.lit(0.5)) / (
            F.col(f"df{i}") + F.lit(0.5)
        )
        part = (idf * tf * F.lit(k1 + 1.0)) / (
            tf
            + F.lit(k1)
            * (F.lit(1.0 - b) + (F.lit(b) * F.col("dl")) / avgdl)
        )
        score = part if score is None else score + part
    scored = joined.select("doc_id", score.alias("score")).filter(
        F.col("score") > 0
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w))
