"""Distributed BPE-merge training (Sennrich et al. 2016) — the tokenizer-
training step of a pre-training data pipeline, as Spark aggregations.

Shape: the corpus is reduced ONCE to a word-frequency vocabulary (one
explode + groupBy shuffle — the only pass that touches document text);
every merge round then runs on the vocabulary table alone: adjacent
symbol-pair counts (explode weighted by word freq, map-side partial
aggs), a distributed top-1 (TakeOrdered, never a global window), and a
leftmost-non-overlapping merge applied as a per-word string fold. The
initial vocabulary is localCheckpoint'ed (cuts the corpus lineage); each
round's merged vocabulary is cached, materialized, and its predecessor
unpersisted (the dup_components iterative-operator discipline, both
halves), so storage stays at one vocabulary copy however many rounds run.
At 100-TB corpus scale the vocabulary (distinct words) is orders smaller
than the corpus, so rounds are cheap after the single corpus reduction.

Cross-engine determinism: the merge decision is (count DESC, x ASC,
y ASC) — fully ordered, so the chosen pair never depends on
partitioning. The merge application is a LEFT string fold with a stack
rule ("if the accumulator ends with x at a symbol boundary and the next
symbol is y, replace that x with xy") — exactly leftmost
non-overlapping BPE merging ([a,a,a] -> [aa,a]), and expressible
bit-identically as F.aggregate in Spark and list_reduce in DuckDB, so
the whole training loop is SQL-oracle-able (the oracle unrolls rounds
into a generated CTE chain; see __spark_entry__._bpe_sql).

Symbols start as the word's codepoints, extracted with a DOTALL '(?s).'
so Unicode line separators inside a token (U+0085/U+2028/U+2029 survive
the ASCII-whitespace tokenizer) are kept as symbols rather than silently
dropped. Java regex still matches UTF-16 code units while RE2 matches
codepoints (surrogate pairs diverge) — pass ``word_pattern`` (the spare
uses '^[a-z0-9]+$') when the corpus can carry astral-plane characters
and the oracle must match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docproc_spark.operators.dedupe import tokens_col


def merge_fold_col(syms: Column, x: Column, y: Column) -> Column:
    """Apply ONE merge (x, y) -> x||y to a space-joined symbol string,
    leftmost non-overlapping, as a left fold (stack rule). A NULL x (the
    SQL oracle's exhausted-pairs round, LEFT JOIN against an empty best
    row) needs no special arm: the merge condition is three-valued-NULL,
    which CASE treats as false in both engines, so control falls through
    to the rebuild arms and the string comes back unchanged."""
    merged = F.concat(x, y)
    return F.aggregate(
        F.split(syms, " "),
        F.lit(""),
        lambda acc, cur: F.when(
            ((acc == x) | acc.endswith(F.concat(F.lit(" "), x))) & (cur == y),
            F.when(acc == x, merged).otherwise(
                F.concat(
                    F.substring(acc, F.lit(1), F.length(acc) - F.length(x)),
                    merged,
                )
            ),
        )
        .when(acc == "", cur)
        .otherwise(F.concat(acc, F.lit(" "), cur)),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(x, y, cnt): adjacent symbol pairs weighted by word frequency.
    Words with a single symbol contribute nothing (sequence(0, -1) would
    DESCEND in Spark — the >= 2 filter is load-bearing)."""
    arr = vocab.withColumn("_arr", F.split("syms", " ")).filter(
        F.size("_arr") >= 2
    )
    pairs = arr.select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_arr") - 2),
                lambda i: F.struct(
                    F.element_at(F.col("_arr"), i + 1).alias("x"),
                    F.element_at(F.col("_arr"), i + 2).alias("y"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y")).agg(
        F.sum("freq").cast("long").alias("cnt")
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    word_pattern: str | None = None,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus's
    lowercased whitespace words. Returns (rank, x, y, merged, cnt) in
    merge order; stops early if the vocabulary runs out of pairs.

    The per-round winning pair is collected to the driver (ONE row per
    round — the iterative-algorithm scalar, same class as a k-means
    convergence check); everything else stays distributed.
    """
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    spark = docs.sparkSession
    words = tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    w = docs.select(F.explode(words).alias("w"))
    if word_pattern is not None:
        w = w.filter(F.col("w").rlike(word_pattern))
    vocab = (
        w.groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .select(
            "freq",
            F.array_join(
                F.regexp_extract_all(F.col("w"), F.lit("(?s)."), 0), " "
            ).alias("syms"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    for r in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("x").asc(), F.col("y").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        bx, by, bc = best[0]["x"], best[0]["y"], best[0]["cnt"]
        merges.append((r + 1, bx, by, bx + by, bc))
        if r == n_merges - 1:
            break  # the last round's rebuilt vocabulary is never read
        # per-round cache + unpersist (the dup_components discipline,
        # BOTH halves): materialize the merged vocabulary from the
        # superseded frame's blocks, then free them — thousands of
        # merge rounds must not accumulate a copy per round. Lineage
        # depth grows one projection per round (fine); an evicted round
        # replays folds from the round-0 checkpoint, never the corpus.
        new_vocab = vocab.select(
            "freq",
            merge_fold_col(F.col("syms"), F.lit(bx), F.lit(by)).alias("syms"),
        ).cache()
        new_vocab.count()
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return spark.createDataFrame(
        merges, "rank long, x string, y string, merged string, cnt long"
    )
