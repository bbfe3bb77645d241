"""Salted two-phase aggregation for skewed group-concat / group-agg.

A mega-document (10⁶ spans under one doc_id) turns any groupBy(doc_id) into
one straggler task. The classic fix: split the hot group into salt
sub-groups, aggregate partials, then combine the (few) partials in salt
order — correct for any associative agg, and for ORDERED concat as long as
the salt is derived from the sort key (salt ranges partition the order).

This generalizes the reference's only hand-rolled optimization family
(partial work before an expensive stage, vision_llm.py:390-409) to Spark's
shuffle model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_ordered_concat(
    df: DataFrame,
    key_col: str,
    order_col: str,
    text_col: str,
    sep: str,
    bucket: int = 1024,
) -> DataFrame:
    """concat_ws(sep, text ordered by order_col) per key, skew-safely.

    Phase 1 groups by (key, order_col div bucket): each hot key becomes
    ceil(n/bucket) ordinary-size groups spread across the cluster.
    Phase 2 groups the per-salt partials (tiny) and concatenates them in
    salt order. Result equals the direct single-phase concat.
    """
    salt = (F.col(order_col) / bucket).cast("long")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key_col, "_salt")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(F.struct(order_col, text_col))),
                    lambda x: x[text_col],
                ),
            ).alias("_part")
        )
    )
    return partial.groupBy(key_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("_salt"), F.col("_part")))),
                lambda x: x["_part"],
            ),
        ).alias("concat")
    )
