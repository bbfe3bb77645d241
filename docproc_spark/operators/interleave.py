"""Interleaved text+media span analytics.

The corpus rows are ordered span sequences (kind, text, media_ref, page,
offset) — the reference's extraction output shape
(``docproc/llm/vision_llm.py:525-539`` assembles exactly this interleaving).
A multimodal training pipeline consumes that interleaving directly: it
mines image/caption pairs from the text surrounding each media span
(LAION/MMC4-style "nearest text" pairing), measures how text and media
alternate per document (packing and sampling decisions key off media
density), and segments documents into header-scoped sections (RAG chunking
and dataset cards both want section granularity).

All three operators here are expressed over the span ARRAY in-row — no
posexplode-then-window for the per-document passes, so ``media_context``
and ``interleave_stats`` are pure map-side projections (one scan, ZERO
exchanges, no Python; plan-guarded in tests/test_plans.py) and each
document costs O(n_spans) via single-pass ``aggregate`` folds, never
O(n²). ``section_rollup`` needs cross-span grouping, so it explodes and
shuffles ONCE on doc_id (the section groupBy reuses the window's
hashpartitioning(doc_id) — hash partitioning on a prefix of the group key
satisfies the aggregation's clustering, so no second exchange).

At 100 TB none of this changes: the in-row folds scale with executors
linearly (no cross-row dependency at all), and section_rollup's single
shuffle is keyed on doc_id, the same key the extraction pipeline already
partitions by — mega-documents are one task each, same skew profile as
extraction itself (route through pipeline_salted first if a document's
span count is pathological).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from docproc_spark.kernels.assembly import MEDIA_KINDS, TEXTUAL_KINDS
from docproc_spark.operators.dedupe import TOKEN_SPLIT

_TEXTUAL_IN = ", ".join(f"'{k}'" for k in sorted(TEXTUAL_KINDS))
_MEDIA_IN = ", ".join(f"'{k}'" for k in sorted(MEDIA_KINDS))

# a span contributes caption-candidate text iff it is textual AND non-null
_IS_TEXT = f"(s.kind IN ({_TEXTUAL_IN}) AND s.text IS NOT NULL)"
_IS_MEDIA = f"s.kind IN ({_MEDIA_IN})"


def media_context(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """One row per media span with its nearest textual neighbours.

    Columns: (id_col, pos, media_ref, self_text, before_text,
    after_text) where ``pos`` is the 0-based index of the media span in
    the span sequence, ``self_text`` is the media span's OWN text (the
    publisher's alt attribute from HTML ingestion, or a provider
    caption; NULL when absent), ``before_text`` is the text of the
    nearest PRECEDING textual span with non-null text (NULL if the
    media span leads the document) and ``after_text`` the nearest
    FOLLOWING one. This is the LAION/MMC4 caption-candidate mining
    primitive over interleaved documents.

    Two O(n) folds per document (forward carrying "last textual text",
    backward over ``reverse(spans)`` carrying "next textual text"); the
    backward results reverse back into forward order so ``zip_with``
    aligns the two media lists index-by-index. Documents with NULL span
    arrays contribute no rows (explode of NULL). Zero shuffles.
    """
    fwd = f"""aggregate(
  {spans_col},
  struct(0 AS i, CAST(NULL AS STRING) AS last,
         CAST(array() AS array<struct<pos:int,media_ref:string,self_text:string,before_text:string>>) AS out),
  (acc, s) -> struct(
    acc.i + 1 AS i,
    IF({_IS_TEXT}, s.text, acc.last) AS last,
    IF({_IS_MEDIA},
       array_append(acc.out,
                    struct(acc.i AS pos, s.media_ref AS media_ref,
                           s.text AS self_text, acc.last AS before_text)),
       acc.out) AS out),
  acc -> acc.out)"""
    bwd = f"""aggregate(
  reverse({spans_col}),
  struct(CAST(NULL AS STRING) AS nxt,
         CAST(array() AS array<struct<after_text:string>>) AS out),
  (acc, s) -> struct(
    IF({_IS_TEXT}, s.text, acc.nxt) AS nxt,
    IF({_IS_MEDIA},
       array_append(acc.out, struct(acc.nxt AS after_text)),
       acc.out) AS out),
  acc -> acc.out)"""
    combined = f"""zip_with({fwd}, reverse({bwd}),
  (a, b) -> struct(a.pos AS pos, a.media_ref AS media_ref,
                   a.self_text AS self_text,
                   a.before_text AS before_text, b.after_text AS after_text))"""
    return df.select(id_col, F.explode(F.expr(combined)).alias("x")).select(
        id_col, "x.*"
    )


def interleave_stats(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document text/media interleaving statistics, all integers.

    Columns (all BIGINT unless noted):
      n_spans          total spans (0 for NULL/empty arrays)
      n_text           spans with a textual kind
      n_media          spans with a media kind (image/figure)
      media_permille   floor(1000 * n_media / n_spans); NULL when n_spans=0
      n_runs           maximal runs over the T/M modality sequence
                       (spans that are neither textual nor media — e.g.
                       raster placeholders — are skipped, they neither
                       extend nor break a run)
      max_text_run     longest run of consecutive textual spans
      max_media_run    longest run of consecutive media spans
      first_media_pos  0-based index of the first media span in the FULL
                       span sequence; NULL if the document has no media

    One scan, zero exchanges, no Python — a pure projection of in-row
    O(n) folds, safe at any corpus size.
    """
    mod = (
        f"filter(transform({spans_col}, s -> CASE WHEN s.kind IN ({_TEXTUAL_IN})"
        f" THEN 'T' WHEN s.kind IN ({_MEDIA_IN}) THEN 'M' END), x -> x IS NOT NULL)"
    )
    runs = f"""aggregate(
  {mod},
  struct(CAST(NULL AS STRING) AS cur, 0L AS cur_len,
         0L AS max_t, 0L AS max_m, 0L AS n_runs),
  (acc, m) -> struct(
    m AS cur,
    IF(m = acc.cur, acc.cur_len + 1L, 1L) AS cur_len,
    greatest(acc.max_t,
             IF(m = 'T', IF(m = acc.cur, acc.cur_len + 1L, 1L), 0L)) AS max_t,
    greatest(acc.max_m,
             IF(m = 'M', IF(m = acc.cur, acc.cur_len + 1L, 1L), 0L)) AS max_m,
    acc.n_runs + IF(m = acc.cur, 0L, 1L) AS n_runs),
  acc -> struct(acc.max_t AS max_t, acc.max_m AS max_m, acc.n_runs AS n_runs))"""
    first_media = f"""aggregate(
  {spans_col},
  struct(0L AS i, CAST(-1 AS BIGINT) AS fp),
  (acc, s) -> struct(
    acc.i + 1L AS i,
    IF(acc.fp = -1L AND {_IS_MEDIA}, acc.i, acc.fp) AS fp),
  acc -> IF(acc.fp = -1L, CAST(NULL AS BIGINT), acc.fp))"""
    # size() is -1 for NULL arrays pre-ANSI and NULL under ANSI; clamp both
    n_spans = F.when(F.col(spans_col).isNull(), F.lit(0).cast("bigint")).otherwise(
        F.size(spans_col).cast("bigint")
    )
    n_text = F.coalesce(
        F.expr(f"CAST(size(filter({mod}, x -> x = 'T')) AS BIGINT)"),
        F.lit(0).cast("bigint"),
    )
    n_media = F.coalesce(
        F.expr(f"CAST(size(filter({mod}, x -> x = 'M')) AS BIGINT)"),
        F.lit(0).cast("bigint"),
    )
    r = F.expr(runs)
    return df.select(
        id_col,
        n_spans.alias("n_spans"),
        n_text.alias("n_text"),
        n_media.alias("n_media"),
        # floor() on both engines (Spark CAST truncates but DuckDB CAST
        # rounds-to-nearest, so an explicit floor is the portable form);
        # exact-integer quotients are exact in double at these magnitudes
        F.when(n_spans > 0, F.floor(F.lit(1000).cast("bigint") * n_media / n_spans))
        .cast("bigint")
        .alias("media_permille"),
        F.coalesce(r["n_runs"], F.lit(0).cast("bigint")).alias("n_runs"),
        F.coalesce(r["max_t"], F.lit(0).cast("bigint")).alias("max_text_run"),
        F.coalesce(r["max_m"], F.lit(0).cast("bigint")).alias("max_media_run"),
        F.expr(first_media).alias("first_media_pos"),
    )


def section_rollup(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Header-scoped section segmentation with per-section rollups.

    Every BODY span (textual, not a header, non-null text) belongs to the
    most recent preceding header span with non-null text; spans before the
    first header form the preamble section (sec_pos = -1, section NULL).
    Output: (id_col, sec_pos, section, n_spans, n_chars) — one row per
    non-empty section, where sec_pos is the 0-based position of the
    header span that opens the section and n_chars sums codepoint lengths
    (Spark length() and DuckDB length() both count codepoints — verified
    on astral chars, which the corpus contains).

    posexplode + one running-last window keyed on doc_id, then a groupBy
    on (doc_id, sec_pos, section). The groupBy inherits the window's
    hashpartitioning(doc_id) — partitioning on a subset of the group key
    satisfies the aggregation's required clustering — so the whole
    operator is ONE exchange (plan-guarded).
    """
    s = df.select(id_col, F.posexplode(spans_col).alias("pos", "s"))
    is_header = (F.col("s.kind") == "header") & F.col("s.text").isNotNull()
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = s.select(
        id_col,
        "pos",
        "s",
        F.last(F.when(is_header, F.col("pos")), ignorenulls=True)
        .over(w)
        .alias("hdr_pos"),
        F.last(F.when(is_header, F.col("s.text")), ignorenulls=True)
        .over(w)
        .alias("hdr_text"),
    )
    body = s.where(
        F.col("s.kind").isin(*sorted(TEXTUAL_KINDS))
        & (F.col("s.kind") != "header")
        & F.col("s.text").isNotNull()
    )
    return (
        body.groupBy(
            id_col,
            F.coalesce(F.col("hdr_pos").cast("bigint"), F.lit(-1).cast("bigint")).alias(
                "sec_pos"
            ),
            F.col("hdr_text").alias("section"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.length("s.text").cast("bigint")).alias("n_chars"),
        )
    )


def media_frequency(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide media identity rollup: one row per distinct media_ref.

    Because ``media_ref`` is the sha256 of the blob bytes (the reference's
    identity contract, ``docproc/llm/vision_llm.py:292-294``), grouping on
    it IS content-level media dedupe across the whole corpus: the one logo
    stamped on 10^6 pages collapses to a single row here. Columns:

      media_ref   the content hash
      n_spans     total occurrences across all documents
      n_docs      distinct documents containing it
      first_doc / first_pos
                  the deterministic first sighting — minimum
                  (doc_id, pos) in lexicographic struct order, the doc
                  whose surrounding text should caption the asset (M8's
                  first-sighting-context rule at corpus scope)

    Spans with NULL media_ref (media that never resolved to bytes) are
    excluded — they have no identity to group on. One narrow projection
    (doc_id, pos, media_ref — the text never leaves the scan) and one
    shuffle keyed on media_ref with map-side partial aggregation; the
    first-sighting is a comparison-ordered struct min, not a window. At
    100 TB the media_ref key is content-hash-uniform — no skew by
    construction (the WHOLE POINT of a repeated logo is that it lands on
    one key, and that key's state is four integers, not the blob)."""
    media = df.select(
        F.col(id_col), F.posexplode(spans_col).alias("pos", "s")
    ).where(
        F.col("s.kind").isin(*sorted(MEDIA_KINDS)) & F.col("s.media_ref").isNotNull()
    )
    first = F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first")
    return (
        media.groupBy(F.col("s.media_ref").alias("media_ref"))
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.countDistinct(id_col).alias("n_docs"),
            first,
        )
        .select(
            "media_ref",
            "n_spans",
            "n_docs",
            F.col(f"first.{id_col}").alias("first_doc"),
            F.col("first.pos").cast("bigint").alias("first_pos"),
        )
    )


def strip_template_media(
    df: DataFrame,
    min_docs: int = 2,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove template media (chrome logos, nav icons, watermark stamps)
    corpus-wide: a media span whose ``media_ref`` appears in >=
    ``min_docs`` DISTINCT documents is boilerplate and is dropped from
    every document's span sequence. The textual analogue is
    ``dedupe.drop_repeated_lines``; this is its interleaved-payload form.

    Returns (id_col, spans_col, n_removed): the surviving spans in
    original order (non-media spans are never touched), and how many
    media spans were stripped. NULL span arrays pass through as NULL
    with n_removed = 0.

    Plan shape: the template set is heavy hitters BY DEFINITION (each
    member occupies >= min_docs documents, so |set| <= corpus_media /
    min_docs, and real template sets are dozens), so it folds to a ONE
    ROW sorted array and broadcast-joins back; the document table itself
    is NEVER shuffled — the strip is an in-row array filter
    (plan-guarded: no hashpartitioning(doc_id) anywhere). min_docs must
    be >= 2: at 1 the "template set" is every media hash in the corpus
    and the broadcast contract breaks."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    refs = df.select(
        F.col(id_col).alias("_d"),
        F.explode(
            F.expr(
                f"transform(filter({spans_col}, s -> {_IS_MEDIA}"
                " AND s.media_ref IS NOT NULL), s -> s.media_ref)"
            )
        ).alias("ref"),
    )
    templates = (
        refs.groupBy("ref")
        .agg(F.countDistinct("_d").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .agg(F.sort_array(F.collect_set("ref")).alias("_tmpl"))
    )
    is_template = (
        "(" + _IS_MEDIA + " AND s.media_ref IS NOT NULL"
        " AND array_contains(_tmpl, s.media_ref))"
    )
    kept = F.expr(f"filter({spans_col}, s -> NOT {is_template})")
    out_cols = [
        F.col(c) for c in df.columns if c not in (spans_col,)
    ]
    return df.crossJoin(F.broadcast(templates)).select(
        *out_cols,
        kept.alias(spans_col),
        F.when(F.col(spans_col).isNull(), F.lit(0).cast("bigint"))
        .otherwise((F.size(spans_col) - F.size(kept)).cast("bigint"))
        .alias("n_removed"),
    )


def gate_media_spans(
    df: DataFrame,
    media: DataFrame,
    *,
    min_width: int | None = None,
    min_height: int | None = None,
    min_bytes: int | None = None,
    blocked_formats: tuple[str, ...] = (),
    drop_unknown: bool = False,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop image spans whose BLOB fails metadata gates — the curation
    pass that kills beacon pixels, sub-resolution icons, and unwanted
    container formats before any decode, using the embedded-media
    catalogue (sources/media_sidecar.py: one row per distinct blob per
    document with codec-free header metadata).

    A span is dropped when its ``media_ref`` has a catalogue row that
    violates any enabled gate: ``width < min_width``,
    ``height < min_height``, ``n_bytes < min_bytes``, or ``format`` in
    ``blocked_formats``. Dimension/size gates only fire when the fact is
    known; a blob with NULL metadata (unsniffable container) drops only
    under ``drop_unknown=True`` — and "unknown" means the relevant gated
    fact is missing, so with only ``min_bytes`` set, a known-size blob
    with unknown format is NOT unknown. Spans whose ref has no catalogue
    row at all (e.g. URL-identified web images) are never touched —
    gate those by frequency (``strip_template_media``) instead.

    Returns (all original columns, spans_col filtered in original order,
    n_removed). NULL span arrays pass through as NULL with n_removed 0.

    Plan shape (the 100-TB contract): the CATALOGUE — already one row
    per distinct blob per document, orders of magnitude smaller than the
    span payload — is filtered map-side to the violating rows, folded to
    one small array per doc_id (one shuffle of the small side), then
    joined on the document table's OWN key: AQE broadcasts it when tiny,
    hash-joins otherwise, and the strip itself is an in-row array
    filter. The wide span payload is never exploded and never regrouped."""
    gates = []
    unknown = []
    if min_width is not None:
        gates.append(F.col("width") < min_width)
        unknown.append(F.col("width").isNull())
    if min_height is not None:
        gates.append(F.col("height") < min_height)
        unknown.append(F.col("height").isNull())
    if min_bytes is not None:
        gates.append(F.col("n_bytes") < min_bytes)
        unknown.append(F.col("n_bytes").isNull())
    if blocked_formats:
        gates.append(F.col("format").isin(*blocked_formats))
    if not gates:
        raise ValueError("no gate enabled")
    bad = F.lit(False)
    for g in gates:
        bad = bad | F.coalesce(g, F.lit(False))
    if drop_unknown and unknown:
        miss = F.lit(True)
        for u in unknown:
            miss = miss & u
        bad = bad | miss
    bad_per_doc = (
        media.where(bad)
        .groupBy(F.col(id_col).alias("_gd"))
        .agg(F.sort_array(F.collect_set("media_ref")).alias("_bad"))
    )
    is_gated = (
        "(" + _IS_MEDIA + " AND s.media_ref IS NOT NULL"
        " AND array_contains(_bad, s.media_ref))"
    )
    kept = F.when(F.col("_bad").isNull(), F.col(spans_col)).otherwise(
        F.expr(f"filter({spans_col}, s -> NOT {is_gated})")
    )
    out_cols = [F.col(c) for c in df.columns if c != spans_col]
    return (
        df.join(
            bad_per_doc, on=df[id_col] == bad_per_doc["_gd"], how="left"
        )
        .select(
            *out_cols,
            kept.alias(spans_col),
            F.when(F.col(spans_col).isNull(), F.lit(0).cast("bigint"))
            .otherwise((F.size(spans_col) - F.size(kept)).cast("bigint"))
            .alias("n_removed"),
        )
    )


def _span_cost(s: Column, image_tokens: int) -> Column:
    """Training cost of one span: ``image_tokens`` if media, whitespace
    token count if textual with non-null text, else 0. Shared by
    pack_multimodal (per-document totals) and multimodal_chunks
    (per-chunk budgeting) so a document's cost and the sum of its
    chunks' costs agree by construction."""
    toks = F.filter(F.split(F.trim(s["text"]), TOKEN_SPLIT), lambda t: t != "")
    is_media = F.coalesce(s["kind"].isin(*sorted(MEDIA_KINDS)), F.lit(False))
    is_text = (
        F.coalesce(s["kind"].isin(*sorted(TEXTUAL_KINDS)), F.lit(False))
        & s["text"].isNotNull()
    )
    return (
        F.when(is_media, F.lit(image_tokens))
        .when(is_text, F.size(toks))
        .otherwise(F.lit(0))
        .cast("long")
    )


def pack_multimodal(
    docs: DataFrame,
    n_shards: int,
    image_tokens: int = 576,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    rank_buckets: int = 32,
) -> DataFrame:
    """Balanced shard assignment for INTERLEAVED documents: a document's
    training cost is its whitespace token count over textual spans plus
    ``image_tokens`` per media span (the visual-token budget a
    LLaVA-style encoder spends per image — 576 = the 24x24 patch grid of
    ViT-L/14 at 336px), and documents deal serpentine across
    ``n_shards`` in (cost DESC, doc_id ASC) order so every shard carries
    a near-equal token+image load. Documents are never split (an image
    cannot straddle two sequences), which is exactly why text-only
    ``pack_sequences`` is the wrong tool for interleaved corpora.

    Output: (id_col, cost, rank, shard). The cost is ONE in-row O(n)
    fold per document (the span text never shuffles); the global order
    comes from rank.global_row_number's range-bucketed exact rank —
    no single-reducer window — and the serpentine shard is a closed form
    of the rank, reproducible by any engine (rank.assign_shards)."""
    if image_tokens <= 0:
        raise ValueError(f"image_tokens must be positive, got {image_tokens}")

    from docproc_spark.operators.rank import assign_shards

    cost = F.coalesce(
        F.aggregate(
            F.col(spans_col),
            F.lit(0).cast("long"),
            lambda acc, s: acc + _span_cost(s, image_tokens),
        ),
        F.lit(0).cast("long"),
    )
    narrow = docs.select(F.col(id_col), cost.alias("cost"))
    return assign_shards(
        narrow,
        n_shards,
        id_col=id_col,
        n_tokens_col="cost",
        rank_buckets=rank_buckets,
    ).withColumnRenamed("n_tokens", "cost")


def mine_caption_pairs(
    df: DataFrame,
    min_tokens: int = 3,
    max_tokens: int = 64,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-gated image/caption pair mining over interleaved documents
    (the LAION/MMC4 recipe minus the CLIP re-ranker, which needs model
    weights this engine treats as an external provider).

    For every media span WITH an identity (non-null ``media_ref``), the
    caption candidate is, in priority order under the same whitespace
    token-count gate [min_tokens, max_tokens]:

      1. the media span's OWN text — the publisher's alt attribute from
         HTML ingestion (side='alt'); the author's caption beats any
         proximity heuristic when it qualifies
      2. the nearest preceding textual span (side='before'; captions
         overwhelmingly precede inline figures in reading order)
      3. the nearest following one (side='after')

    Media spans where nothing qualifies produce no pair (a 2-token
    "Figure 3" stub or a 4k-token body paragraph is not a caption).

    Output: (id_col, pos, media_ref, caption, n_tokens, side).

    Plan shape: builds on media_context, so it is a single scan with
    ZERO exchanges — the token gate and side selection are in-row Column
    expressions over the already-aligned (before_text, after_text)
    columns. At 100 TB this is a pure map stage; the downstream pair
    table is what shuffles (by media_ref, in media_frequency terms), not
    this operator."""
    if not (0 < min_tokens <= max_tokens):
        raise ValueError(
            f"need 0 < min_tokens <= max_tokens, got {min_tokens}..{max_tokens}"
        )

    def _ntok(c: Column) -> Column:
        return F.size(F.filter(F.split(F.trim(c), TOKEN_SPLIT), lambda t: t != ""))

    ctx = media_context(df, spans_col=spans_col, id_col=id_col).where(
        F.col("media_ref").isNotNull()
    )
    ns = _ntok(F.col("self_text"))
    nb, na = _ntok(F.col("before_text")), _ntok(F.col("after_text"))
    ok_s = F.col("self_text").isNotNull() & ns.between(min_tokens, max_tokens)
    ok_b = F.col("before_text").isNotNull() & nb.between(min_tokens, max_tokens)
    ok_a = F.col("after_text").isNotNull() & na.between(min_tokens, max_tokens)
    return (
        ctx.withColumn(
            "side", F.when(ok_s, "alt").when(ok_b, "before").when(ok_a, "after")
        )
        .where(F.col("side").isNotNull())
        .select(
            id_col,
            "pos",
            "media_ref",
            F.when(F.col("side") == "alt", F.col("self_text"))
            .when(F.col("side") == "before", F.col("before_text"))
            .otherwise(F.col("after_text"))
            .alias("caption"),
            F.when(F.col("side") == "alt", ns)
            .when(F.col("side") == "before", nb)
            .otherwise(na)
            .cast("bigint")
            .alias("n_tokens"),
            "side",
        )
    )


def media_jaccard_pairs(
    df: DataFrame,
    max_docs_per_ref: int = 64,
    min_jaccard_e3: int = 500,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document near-dup candidates by SHARED MEDIA IDENTITY: two pages
    embedding mostly the same images are mirrors/recrawls even when the
    surrounding prose was rewritten (the text-shingle detectors upstream
    miss exactly this case — media refs are sha256-of-blob, so identity
    survives re-encoding of the HTML around it).

    Universe: each document's DISTINCT non-null media refs, MINUS
    template refs — a ref present in more than ``max_docs_per_ref``
    distinct documents is site chrome (the strip_template_media
    population) and is excluded from BOTH the candidate join and the
    per-document set sizes, keeping the two sides of the Jaccard
    consistent. That cap is also the scale contract: a corpus-wide logo
    would otherwise emit C(n_docs, 2) pairs from one key. With it, one
    ref contributes at most C(cap, 2) pairs, so candidates are bounded
    by |refs| * cap^2 / 2 — linear in the corpus, never O(n^2).

    Output: (a, b, shared, na, nb, jaccard_e3) for a < b with
    jaccard_e3 = floor(1000 * shared / (na + nb - shared)) >=
    ``min_jaccard_e3``; integer permille so every engine agrees
    bit-for-bit. Shuffles: ref-keyed groupBy (template detection),
    ref-keyed self-join (candidates), pair-keyed groupBy — all on
    content-hash keys, uniform by construction after the cap."""
    if max_docs_per_ref < 1:
        raise ValueError(f"max_docs_per_ref must be >= 1, got {max_docs_per_ref}")
    # GetArrayStructFields (spans.kind / spans.media_ref) instead of a
    # lambda over the struct array: Catalyst's nested-schema pruning sees
    # through direct subfield access but not through transform/filter
    # lambdas, and this operator's branch fan-out re-reads the source —
    # the pruning keeps every re-read to the two narrow subfields (the
    # span TEXT never loads; plan-asserted on ReadSchema)
    ref_arr = F.array_distinct(
        F.filter(
            F.zip_with(
                F.col(f"{spans_col}.kind"),
                F.col(f"{spans_col}.media_ref"),
                lambda k, r: F.when(
                    k.isin(*sorted(MEDIA_KINDS)) & r.isNotNull(), r
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )
    refs = df.select(F.col(id_col).alias("_d"), F.explode(ref_arr).alias("ref"))
    # refs are already distinct per document, so count(*) == n_docs
    kept = (
        refs.withColumn(
            "nd", F.count(F.lit(1)).over(Window.partitionBy("ref"))
        )
        .where(F.col("nd") <= max_docs_per_ref)
        .drop("nd")
    )
    sizes = kept.groupBy("_d").agg(F.count(F.lit(1)).alias("n_refs"))
    a = kept.select(F.col("_d").alias("a"), "ref")
    b = kept.select(F.col("_d").alias("b"), "ref")
    shared = (
        a.join(b, "ref")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("_d").alias("a"), F.col("n_refs").alias("na"))
    sb = sizes.select(F.col("_d").alias("b"), F.col("n_refs").alias("nb"))
    return (
        shared.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard_e3",
            F.floor(
                (F.lit(1000) * F.col("shared"))
                / (F.col("na") + F.col("nb") - F.col("shared"))
            ),
        )
        .where(F.col("jaccard_e3") >= min_jaccard_e3)
        .select("a", "b", "shared", "na", "nb", "jaccard_e3")
    )


def multimodal_chunks(
    docs: DataFrame,
    budget: int = 2048,
    image_tokens: int = 576,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """Budgeted chunking of interleaved documents with SPAN-ATOMIC
    placement: each span costs ``_span_cost`` tokens (text = whitespace
    tokens, media = ``image_tokens``) and lands in chunk
    floor(prefix / budget) where prefix is the running cost of all spans
    BEFORE it — so a media span is never split across chunks (an image
    cannot straddle two training sequences) and reading order is
    preserved within and across chunks. A span whose own cost exceeds
    the budget still occupies exactly one chunk and pushes later spans
    into the next (the mega-span routes whole, matching pack_multimodal's
    never-split contract). Zero-cost leading spans land in chunk 0.

    Output one row per (document, chunk): (id_col, chunk_id, n_spans,
    n_media, n_tokens, first_pos, last_pos). NULL/empty span arrays
    produce no rows. This feeds sequence construction for multimodal
    training the way pack_sequences feeds text-only training — the
    difference, and the reason pack_sequences is the wrong tool here, is
    the atomic media placement and the per-chunk media census.

    Plan shape: the cost prefix is ONE in-row O(n) fold per document
    (span text never shuffles — the fold emits (pos, chunk_id, cost,
    is_media) integers only), then one explode + one groupBy keyed on
    (doc_id, chunk_id) — the same doc_id-prefix shuffle key the
    extraction pipeline already partitions by, so mega-documents keep
    the skew profile extraction already handles (their chunk_ids fan
    the key out further, which HELPS)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if image_tokens <= 0:
        raise ValueError(f"image_tokens must be positive, got {image_tokens}")
    marked = F.aggregate(
        F.col(spans_col),
        F.struct(
            F.lit(0).cast("long").alias("i"),
            F.lit(0).cast("long").alias("prefix"),
            F.expr(
                "CAST(array() AS"
                " array<struct<pos:bigint,chunk_id:bigint,cost:bigint,is_media:int>>)"
            ).alias("out"),
        ),
        lambda acc, s: F.struct(
            (acc["i"] + 1).alias("i"),
            (acc["prefix"] + _span_cost(s, image_tokens)).alias("prefix"),
            F.array_append(
                acc["out"],
                F.struct(
                    acc["i"].alias("pos"),
                    F.floor(acc["prefix"] / budget).alias("chunk_id"),
                    _span_cost(s, image_tokens).alias("cost"),
                    F.coalesce(
                        s["kind"].isin(*sorted(MEDIA_KINDS)), F.lit(False)
                    )
                    .cast("int")
                    .alias("is_media"),
                ),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    return (
        docs.select(F.col(id_col), F.explode(marked).alias("x"))
        .groupBy(id_col, F.col("x.chunk_id").alias("chunk_id"))
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("x.is_media").cast("bigint").alias("n_media"),
            F.sum("x.cost").alias("n_tokens"),
            F.min("x.pos").alias("first_pos"),
            F.max("x.pos").alias("last_pos"),
        )
    )


def curate_interleaved(
    df: DataFrame,
    min_docs_template: int = 2,
    min_text_spans: int = 1,
    min_tokens: int = 20,
    max_media_permille: int = 800,
    max_gap: int = 2,
    min_ctx_permille: int = 500,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """The interleaved-corpus curation recipe as ONE job with per-stage
    verdicts — the multimodal sibling of ``functions.web.curate_web``
    (same Dolma attributes-then-mix pattern: every row keeps its drop
    reasons, the final ``keep`` is their conjunction).

    Stages:
      1. template strip — media in >= ``min_docs_template`` distinct
         documents is chrome, removed from every span sequence
         (``strip_template_media``; ``n_removed`` is the verdict trail)
      2. text gate — ``text_keep``: >= ``min_text_spans`` textual spans
         AND >= ``min_tokens`` whitespace tokens survive the strip (a
         page that is only images is not interleaved training data)
      3. media-density gate — ``media_keep``: media spans are <=
         ``max_media_permille`` of the cleaned sequence (gallery/banner
         farms fail; documents with no media pass trivially)
      4. contextualization gate — ``ctx_keep``: >= ``min_ctx_permille``
         of the cleaned media spans sit within ``max_gap`` positions of
         a textual span (in the CLEANED sequence — chrome removal pulls
         text and its figure together); an image dump with no
         surrounding prose fails even at acceptable density. Documents
         with no media pass trivially.

    Output: (id_col, spans_col cleaned, n_removed, n_text, n_media,
    n_tokens, media_permille, ctx_permille, text_keep, media_keep,
    ctx_keep, keep). NULL span sequences fail text_keep (keep=false)
    and pass the media gates vacuously.

    Plan shape: strip_template_media contributes the template-set branch
    (folds to one broadcast row — the document table never shuffles) and
    every gate is an in-row O(n) integer fold over the cleaned array —
    the whole recipe adds ZERO exchanges on the document table. At
    10^12 documents this is one map pass plus one heavy-hitter
    aggregation, exactly the curate_web cost model."""
    if max_gap < 1:
        raise ValueError(f"max_gap must be >= 1, got {max_gap}")
    for name, v in (
        ("max_media_permille", max_media_permille),
        ("min_ctx_permille", min_ctx_permille),
    ):
        if not 0 <= v <= 1000:
            raise ValueError(f"{name} must be in [0, 1000], got {v}")

    cleaned = strip_template_media(
        df, min_docs=min_docs_template, spans_col=spans_col, id_col=id_col
    )
    sc = spans_col
    n_text = F.coalesce(
        F.expr(f"CAST(size(filter({sc}, s -> {_IS_TEXT})) AS BIGINT)"),
        F.lit(0).cast("bigint"),
    )
    n_media = F.coalesce(
        F.expr(f"CAST(size(filter({sc}, s -> {_IS_MEDIA})) AS BIGINT)"),
        F.lit(0).cast("bigint"),
    )
    n_spans = F.when(
        F.col(sc).isNull(), F.lit(0).cast("bigint")
    ).otherwise(F.size(sc).cast("bigint"))
    def _text_tokens(s: Column) -> Column:
        toks = F.filter(
            F.split(F.trim(s["text"]), TOKEN_SPLIT), lambda t: t != ""
        )
        is_text = (
            F.coalesce(s["kind"].isin(*sorted(TEXTUAL_KINDS)), F.lit(False))
            & s["text"].isNotNull()
        )
        return F.when(is_text, F.size(toks)).otherwise(F.lit(0)).cast("long")

    n_tokens = F.coalesce(
        F.aggregate(
            F.col(sc),
            F.lit(0).cast("long"),
            lambda acc, s: acc + _text_tokens(s),
        ),
        F.lit(0).cast("long"),
    )
    # media contextualization: for each media span in the CLEANED
    # sequence, is a textual span within max_gap positions on either
    # side? Two O(n) integer folds (forward: distance to last textual;
    # backward over reverse: distance to next), zipped with OR — the
    # media_context machinery with positions instead of text.
    fwd_ok = f"""aggregate(
  {sc},
  struct(0L AS i, -1000000000L AS lt,
         CAST(array() AS array<boolean>) AS out),
  (acc, s) -> struct(
    acc.i + 1L AS i,
    IF({_IS_TEXT}, acc.i, acc.lt) AS lt,
    IF({_IS_MEDIA},
       array_append(acc.out, acc.i - acc.lt <= {max_gap}L), acc.out) AS out),
  acc -> acc.out)"""
    bwd_ok = f"""aggregate(
  reverse({sc}),
  struct(0L AS i, -1000000000L AS lt,
         CAST(array() AS array<boolean>) AS out),
  (acc, s) -> struct(
    acc.i + 1L AS i,
    IF({_IS_TEXT}, acc.i, acc.lt) AS lt,
    IF({_IS_MEDIA},
       array_append(acc.out, acc.i - acc.lt <= {max_gap}L), acc.out) AS out),
  acc -> acc.out)"""
    n_media_ctx = F.coalesce(
        F.expr(
            f"CAST(size(filter(zip_with({fwd_ok}, reverse({bwd_ok}),"
            " (a, b) -> a OR b), x -> x)) AS BIGINT)"
        ),
        F.lit(0).cast("bigint"),
    )
    media_permille = F.when(
        n_spans > 0, F.floor(F.lit(1000).cast("bigint") * n_media / n_spans)
    ).cast("bigint")
    ctx_permille = F.when(
        n_media > 0, F.floor(F.lit(1000).cast("bigint") * n_media_ctx / n_media)
    ).cast("bigint")
    text_keep = (n_text >= min_text_spans) & (n_tokens >= min_tokens)
    media_keep = (n_media == 0) | (media_permille <= max_media_permille)
    ctx_keep = (n_media == 0) | (ctx_permille >= min_ctx_permille)
    return cleaned.select(
        id_col,
        sc,
        "n_removed",
        n_text.alias("n_text"),
        n_media.alias("n_media"),
        n_tokens.alias("n_tokens"),
        media_permille.alias("media_permille"),
        ctx_permille.alias("ctx_permille"),
        text_keep.alias("text_keep"),
        media_keep.alias("media_keep"),
        ctx_keep.alias("ctx_keep"),
        (text_keep & media_keep & ctx_keep).alias("keep"),
    )
