"""Top-K per group — the standard window form with deterministic tie-breaks."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_name: str = "rnk",
) -> DataFrame:
    """row_number ≤ k per group. ``order_cols`` must be a TOTAL order
    (include a unique key as the final tie-break) or the result is
    nondeterministic across runs/engines."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )
