"""Embedding compression for ANN at scale: per-vector symmetric int8
quantization and L2 normalization.

At 100 TB an `array<float>` embedding column dominates storage and
shuffle: 768 dims × 4 B = 3 KB/doc. Symmetric int8 (q = round(x·127/amax),
scale = amax/127) cuts that 4× with ~0.5% cosine error — the standard
serving-index trade (FAISS SQ8). Everything here is built-in Column
expressions (JVM-side, codegen-friendly); the only subtlety is staging
the per-vector reduction (amax / norm) as a COLUMN before referencing it
inside a transform lambda — HOF lambda bodies are interpreted with no
subexpression elimination, so an inline reduction re-runs O(dims) work
per element (O(dims²) per vector; see the memory notes and
functions/text._bigrams_from_tokens for the same trap).

Rounding is floor(x + 0.5) — round-half-up — NOT round(): Spark
HALF_UP/HALF_EVEN and DuckDB disagree on exact .5 ties, floor never does
(engine-identical, see the PII/ratio operators for the same rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_embeddings", "dequantize_col", "l2_normalize"]


def quantize_embeddings(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, qvec array<tinyint>, scale double) per vector.

    q_i = floor(x_i·127/amax + 0.5), scale = amax/127, so
    x_i ≈ q_i·scale. All-zero vectors quantize to zeros with scale 0.
    NON-FINITE vectors (any NaN or ±inf element) also map to zeros with
    scale 0 — corrupt embeddings contribute nothing rather than
    poisoning downstream dot products (and floor(NaN) is exactly where
    engines diverge: Spark casts it to 0, DuckDB raises). The guard is
    one comparison on amax: NaN/inf elements always surface there
    because both engines order NaN above +inf above all finite values.
    |q_i| <= 127 always: |x_i| <= amax bounds the scaled value by
    127·(1+ε), and +0.5 then floor stays under 128 — the ANSI tinyint
    cast cannot overflow.
    """
    v = F.col(vec_col)
    am = "_amax"
    while am in emb.columns:
        am += "_"
    staged = emb.select(
        F.col(id_col),
        v,
        # staged as a column: referenced inside the transform lambda an
        # inline array_max would re-run per element (O(dims²)/vector)
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))).alias(am),
    )
    amax = F.col(am)
    finite_pos = (amax > 0) & (amax < F.lit(float("inf")))
    q = F.transform(
        v,
        lambda x: F.floor(x.cast("double") * F.lit(127.0) / amax + F.lit(0.5)).cast(
            "tinyint"
        ),
    )
    zeros = F.transform(v, lambda x: F.lit(0).cast("tinyint"))
    return staged.select(
        id_col,
        F.when(finite_pos, q).otherwise(zeros).alias("qvec"),
        F.when(finite_pos, amax / F.lit(127.0)).otherwise(F.lit(0.0)).alias("scale"),
    )


def dequantize_col(qvec: Column, scale: Column) -> Column:
    """array<double> reconstruction: x_i ≈ q_i·scale."""
    # scale is already a per-row scalar column — safe inside the lambda
    # (O(1) per element, unlike an inline reduction)
    return F.transform(qvec, lambda q: q.cast("double") * scale)


def l2_normalize(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    out_col: str = "unit",
) -> DataFrame:
    """Unit-norm copy of the vector column (zero vectors pass through as
    zeros rather than NaN; non-finite vectors — any NaN/±inf element —
    also map to zeros, matching quantize_embeddings' corrupt-data rule). Cosine over unit vectors reduces to a dot
    product — pre-normalizing once saves the two norms per comparison in
    every downstream brute-force/LSH/IVF scoring pass."""
    from docproc_spark.operators.similarity import norm_col

    v = F.col(vec_col)
    # collision-safe working column — a caller's own `_norm` (a natural
    # name right next to this operator) must pass through untouched
    nm = "_norm"
    while nm in emb.columns:
        nm += "_"
    staged = emb.withColumn(nm, norm_col(v))
    n = F.col(nm)
    unit = F.transform(v, lambda x: x.cast("double") / n)
    zeros = F.transform(v, lambda x: F.lit(0.0))
    return staged.withColumn(
        out_col, F.when((n > 0) & (n < F.lit(float("inf"))), unit).otherwise(zeros)
    ).drop(nm)
