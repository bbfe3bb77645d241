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


def source_overlap(
    docs: DataFrame,
    k: int = 64,
    ngram: int = 8,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Estimated cross-source content overlap for the dataset card — a
    KMV (k-minimum-values / bottom-k) sketch Jaccard estimate between
    every pair of sources, the number a curation report wants next to
    the composition table ("how much of source A is also in source B?").

    Each source's sketch is its k lexicographically-smallest DISTINCT
    md5 hashes over ``ngram``-token shingles. For a pair, take the
    bottom-k' of the sketch union (k' = min(k, |union|)) and count how
    many of those members both sources contain; J ≈ n_common / k_used
    (Bar-Yossef et al. 2002; Beyer et al. 2007). md5 ordering makes the
    sketch deterministic and engine-identical. Sources whose documents
    never reach ``ngram`` tokens have no sketch and emit no pairs.

    Returns one row per unordered pair (source_a < source_b):
    (source_a, source_b, sketch_a, sketch_b, k_used, n_common,
    jaccard_e4) — jaccard_e4 = (10000 * n_common) div k_used, an integer
    so the DuckDB oracle needs no float contract. sketch_a/sketch_b are
    the per-source DISTINCT shingle counts (sketch inputs), giving the
    reader scale context for the estimate.

    Scale shape: explode -> distinct(source, hash) is one shuffle;
    the bottom-k filter is a per-source window over the distinct frame
    (state = k rows per source); the pair table is |sources| rows — the
    self-join is trivially broadcast. The corpus is scanned once; no
    all-pairs work ever touches document rows.
    """
    from pyspark.sql import Window

    from docproc_spark.functions.text import rolling_hashes_from_tokens
    from docproc_spark.operators.dedupe import tokens_col

    if k <= 0:
        raise ValueError("k must be positive")
    if ngram <= 0:
        raise ValueError("ngram must be positive")
    toks = tokens_col(F.coalesce(F.col(text_col), F.lit("")))
    hashed = (
        docs.select(
            F.coalesce(F.col(source_col).cast("string"), F.lit("<null>")).alias(
                "source"
            ),
            toks.alias("_tk"),
        )
        .filter(F.size("_tk") >= ngram)
        .withColumn("_h", rolling_hashes_from_tokens(F.col("_tk"), ngram))
        .select("source", F.explode("_h").alias("h"))
        .distinct()
    )
    w = Window.partitionBy("source").orderBy(F.col("h").asc())
    sketches = (
        hashed.withColumn("_nd", F.count("*").over(Window.partitionBy("source")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("source")
        .agg(
            F.array_sort(F.collect_list("h")).alias("sketch"),
            F.first("_nd").cast("long").alias("n_distinct"),
        )
    )
    a = sketches.select(
        F.col("source").alias("source_a"),
        F.col("sketch").alias("_ska"),
        F.col("n_distinct").alias("sketch_a"),
    )
    b = sketches.select(
        F.col("source").alias("source_b"),
        F.col("sketch").alias("_skb"),
        F.col("n_distinct").alias("sketch_b"),
    )
    pairs = a.join(b, F.col("source_a") < F.col("source_b"))
    union_sorted = F.array_sort(F.array_union(F.col("_ska"), F.col("_skb")))
    paired = (
        pairs.withColumn(
            "k_used", F.least(F.lit(k), F.size(union_sorted)).cast("long")
        )
        .withColumn("_bottom", F.slice(union_sorted, 1, k))
        .withColumn(
            "n_common",
            F.size(
                F.array_intersect(
                    F.col("_bottom"),
                    F.array_intersect(F.col("_ska"), F.col("_skb")),
                )
            ).cast("long"),
        )
    )
    return paired.select(
        "source_a",
        "source_b",
        "sketch_a",
        "sketch_b",
        "k_used",
        "n_common",
        F.expr("(10000 * n_common) div k_used").cast("long").alias("jaccard_e4"),
    )


def domain_report(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-registered-domain composition rollup for a web corpus — the
    domain table of a crawl dataset card (C4/Dolma publish exactly this:
    docs and tokens per domain, distinct-host fan-out, share of corpus).
    Uses the PSL-free ``registered_domain`` approximation from
    functions/web (documented there).

    Columns: domain, n_docs, n_hosts (distinct canonical hosts),
    n_pages (distinct canonical URLs — spelling variants collapse),
    total_tokens, total_chars, tokens_per_doc (integer division),
    docs_permille (1000*n_docs div corpus size — integer, so the oracle
    needs no float contract).

    Scale shape: canonicalization is map-side; ONE groupBy shuffle on
    domain with map-side partial aggregation. Domain keys are Zipfian —
    AQE skew handling applies, and no per-domain state grows beyond the
    two distinct-count aggregates (use approx_count_distinct at real
    crawl scale; exact here for the oracle contract). The corpus total
    rides the same pass as a window-free broadcast join of a 1-row
    aggregate.
    """
    from docproc_spark.functions.text import token_count_col
    from docproc_spark.functions.web import (
        canonicalize_url,
        registered_domain,
        url_host,
    )

    u = F.col(url_col)
    staged = docs.select(
        registered_domain(u).alias("domain"),
        url_host(u).alias("_host"),
        canonicalize_url(u).alias("_page"),
        F.coalesce(
            token_count_col(F.col(text_col)).cast("long"), F.lit(0)
        ).alias("_toks"),
        F.coalesce(F.length(F.col(text_col)).cast("long"), F.lit(0)).alias(
            "_chars"
        ),
    )
    agg = staged.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("_host").alias("n_hosts"),
        F.countDistinct("_page").alias("n_pages"),
        F.sum("_toks").alias("total_tokens"),
        F.sum("_chars").alias("total_chars"),
    )
    total = staged.agg(F.count("*").alias("_corpus_docs"))
    return agg.join(F.broadcast(total)).select(
        "domain",
        "n_docs",
        "n_hosts",
        "n_pages",
        "total_tokens",
        "total_chars",
        F.expr("total_tokens div n_docs").alias("tokens_per_doc"),
        F.expr("(1000 * n_docs) div _corpus_docs").alias("docs_permille"),
    )


def media_report(catalogue: DataFrame) -> DataFrame:
    """Dataset-card media composition over an embedded-media catalogue
    (sources/media_sidecar.py shape: one row per distinct blob per
    document with codec-free header facts).

    One row per (media_kind, format) cell — NULL dimensions labelled
    ``<null>`` (unsniffable blobs are their own honest category) — with
    the rollup counts a multimodal release publishes: blob rows,
    distinct blobs corpus-wide, carrying documents, times shown, byte
    and duration totals, beacon-pixel count (both dims ≤ 2 — the
    tracker signature), and min/max dimensions. All metrics integers,
    so the oracle needs no rounding contract.

    Scale shape: ONE groupBy over the catalogue (already orders of
    magnitude smaller than payloads) with map-side partial aggregation;
    the distinct-blob count is exact per cell via count(DISTINCT) —
    one expand, still a single shuffle."""
    lab = lambda c: F.coalesce(F.col(c), F.lit("<null>"))  # noqa: E731
    beacon = (
        (F.col("width") <= 2) & (F.col("height") <= 2)
    ).cast("long")
    return (
        catalogue.groupBy(
            lab("media_kind").alias("media_kind"),
            lab("format").alias("format"),
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("media_ref").alias("n_blobs"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(F.coalesce(F.col("n_refs"), F.lit(0))).alias("n_shown"),
            F.sum(F.coalesce(F.col("n_bytes"), F.lit(0))).alias(
                "total_bytes"
            ),
            F.sum(F.coalesce(F.col("duration_ms"), F.lit(0))).alias(
                "total_duration_ms"
            ),
            F.sum(F.coalesce(beacon, F.lit(0))).alias("n_beacons"),
            F.min("width").alias("min_width"),
            F.max("width").alias("max_width"),
            F.min("height").alias("min_height"),
            F.max("height").alias("max_height"),
        )
    )
