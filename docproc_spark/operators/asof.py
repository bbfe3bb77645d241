"""As-of join (point-in-time lookup) — a custom operator Spark lacks.

For every left row, attach the LATEST right row whose timestamp is ≤ the
left row's (per key). The naive formulation is a range theta-join —
O(left × right) pairs per key before the per-row max, a scale-killer. This
implementation is the union-tag trick: tag both sides, sort once by
(key, ts, tag) with right rows first at equal timestamps (ties count, i.e.
``right_ts <= left_ts``), and carry the last non-null right payload forward
with a running window. ONE shuffle on the key, O(n log n) per key, zero
pair materialization — the standard large-scale point-in-time-correctness
shape (feature stores, trade/quote matching).

Requires right rows unique per (key, right_ts) for a deterministic match —
same as any as-of semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list | None = None,
    out_col: str = "asof",
) -> DataFrame:
    """Left rows + ``out_col`` struct of the matched right payload (null when
    no right row precedes). Left-join semantics (every left row survives)."""
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    left_row_t = (
        "struct<"
        + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields)
        + ">"
    )
    # Null-ts AND null-key right rows are ignored (matches DuckDB/engine
    # ASOF JOIN semantics — an equality join never matches NULL = NULL):
    # unfiltered, a NULL-ts row would sort before everything under the
    # default nulls-first ordering and carry its payload into every left
    # row of the key, and a NULL-KEY right row would land in the same
    # window partition as null-key LEFT rows and "match" them.
    rp = right.filter(
        F.col(right_ts).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        payload.alias("_p"),
        F.lit(None).cast(left_row_t).alias("_l"),
    )
    lp = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(rp.schema["_p"].dataType).alias("_p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    u = lp.unionByName(rp)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_p", ignorenulls=True).over(w)
    return (
        u.withColumn("_asof", carried)
        .filter(F.col("_tag") == 1)
        .select("_l.*", F.col("_asof").alias(out_col))
    )
