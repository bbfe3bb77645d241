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
