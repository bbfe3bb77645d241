"""Deterministic content-addressed sampling.

Training-data pipelines need samples that are REPRODUCIBLE across runs,
cluster sizes, and engines — Bernoulli RNG sampling (df.sample) gives a
different subset per run and per partitioning. Hashing the key instead
(md5 → first 32 bits → compare against fraction·2^32) is stable everywhere
a hash function is, lets disjoint splits be expressed as bucket ranges, and
pushes down as an ordinary filter (no sampling operator in the plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 0x100000000  # 2^32 — md5's first 8 hex chars


def hash_bucket_col(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 2^32) from md5(salt || key) — engine-portable
    (md5 hex is canonical; DuckDB reproduces it bit-for-bit).

    Null keys hash as the sentinel string '\\x00null' rather than null:
    an unhandled null propagates through md5 into every range predicate as
    null, silently dropping the row from the sample AND from every split —
    violating the 'membership is a pure function of (salt, key)' contract.
    """
    k = F.coalesce(key.cast("string"), F.lit("\x00null"))
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), k)), 1, 8), 16, 10
    ).cast("long")


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key."""
    return df.filter(hash_bucket_col(F.col(key_col), salt) < int(fraction * _BUCKETS))


def hash_split(
    df: DataFrame, fractions: list, key_col: str = "doc_id", salt: str = ""
) -> list:
    """Disjoint deterministic splits (e.g. [0.8, 0.1, 0.1] train/val/test).

    Consecutive bucket ranges of one hash — membership of every row is a
    pure function of (salt, key), so the same split reproduces anywhere
    and splits stay disjoint by construction."""
    total = sum(fractions)
    if total > 1.0 + 1e-9:
        raise ValueError("fractions must sum to <= 1")
    bucket = hash_bucket_col(F.col(key_col), salt)
    out, lo = [], 0
    for i, frac in enumerate(fractions):
        # boundaries from CUMULATIVE fractions — per-range int truncation
        # would leave the top buckets of [0, 2^32) in no split (rows with
        # an unlucky hash silently vanish from every output)
        hi = int(sum(fractions[: i + 1]) * _BUCKETS)
        if i == len(fractions) - 1 and total >= 1.0 - 1e-9:
            hi = _BUCKETS  # a full partition must cover the whole range
        out.append(df.filter((bucket >= lo) & (bucket < hi)))
        lo = hi
    return out


def rebalance_to_targets(
    docs: DataFrame,
    targets: dict,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic mixture rebalancing: downsample each group so the
    OUTPUT's group proportions match ``targets`` (e.g. {"web": .5,
    "books": .3, "code": .2}) while keeping as much data as possible —
    the domain-mixture step of pre-training pipelines (Pile/Dolma-style
    source weighting), done by dropping rows only, never duplicating.

    The largest achievable output is S = min_g(count_g / target_g); each
    group then keeps fraction target_g * S / count_g of its rows, chosen
    by the same content-addressed md5 rule as ``hash_sample`` (membership
    is a pure function of (salt, key) — reruns, repartitions, and the
    DuckDB oracle agree row-for-row). Expected output mixture = targets;
    per-group realized counts vary by the usual hash-binomial noise.

    Contract notes:
    - groups absent from ``targets`` are dropped (target 0);
    - a target group absent from the corpus makes the mixture
      unattainable: S = 0 and the result is EMPTY — validate upstream if
      that should be an error;
    - fractions/thresholds are IEEE-double products of (target literal,
      one long division) — bit-identical in Spark and DuckDB.

    Plan shape: one tiny groupBy(group) count, a 1-row scalar min
    crossJoin, a broadcast-size fraction table joined back (AQE
    broadcasts it), then a plain filter — the corpus is scanned once and
    never shuffled.
    """
    if not targets:
        raise ValueError("targets must be a non-empty {group: fraction} dict")
    if any(f <= 0 for f in targets.values()):
        raise ValueError("every target fraction must be > 0 (drop the group "
                         "from targets instead of giving it 0)")
    total = sum(targets.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"target fractions must sum to 1 (got {total})")
    spark = docs.sparkSession
    tgt = spark.createDataFrame(
        [(str(g), float(f)) for g, f in sorted(targets.items())],
        f"{group_col} string, _t double",
    )
    counts = docs.groupBy(group_col).agg(F.count("*").alias("_c"))
    # right join keeps target groups with no rows: their 0-count drives S
    # to 0 (empty output) instead of silently skewing the mixture
    joined = counts.join(tgt, group_col, "right").select(
        F.col(group_col), F.coalesce(F.col("_c"), F.lit(0)).alias("_c"), "_t"
    )
    s = joined.agg(F.min(F.col("_c") / F.col("_t")).alias("_s"))
    # working-column collision guard: group_col/key_col are caller-chosen,
    # so the caller's schema may already carry "_p" (the lineage-"part"
    # bug class) — extend until free
    p = "_p"
    while p in docs.columns:
        p += "_"
    frac = (
        joined.crossJoin(s)
        .select(
            group_col,
            F.when(F.col("_c") > 0, F.col("_t") * F.col("_s") / F.col("_c"))
            .otherwise(F.lit(0.0))
            .alias(p),
        )
    )
    bucket = hash_bucket_col(F.col(key_col), salt)
    return (
        docs.join(frac, group_col)
        .filter(bucket < F.floor(F.col(p) * F.lit(float(_BUCKETS))).cast("long"))
        .select(*docs.columns)
    )
