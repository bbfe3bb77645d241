"""URL handling for a web-scale training-data pipeline.

Web crawls reach the same page through many URL spellings — scheme/host
case, ``www.`` prefixes, default ports, tracking query parameters
(``utm_*``/``fbclid``/...), parameter order, trailing slashes, fragments.
Canonicalizing before URL-level dedupe / per-domain capping is the
standard first pass of CommonCrawl-derived pipelines (CCNet, C4, Dolma all
dedupe or group by normalized URL/host before any content pass).

All JVM-side Column expressions (string/array builtins inside whole-stage
codegen; no Python, no shuffle) — canonicalization is a pure map-side
projection at any corpus size. Only ``url_dedupe`` shuffles, once, on the
canonical-URL hash.

Semantics (documented choices, mirrored bit-for-bit by the SQL oracles):
  - missing scheme → ``http`` assumed; scheme and host lowercased, path
    and query values left case-sensitive;
  - userinfo (up to the first ``@`` in the authority) stripped;
  - default ports dropped (``:80`` for http, ``:443`` for https; any
    other port kept); one leading ``www.`` stripped;
  - fragment dropped; tracking params dropped (``utm_`` prefix or an
    exact name in TRACKING_PARAMS, matched on the lowercased key);
    surviving ``k=v`` params sorted bytewise and rejoined — bytewise is
    exact for the ASCII params real trackers use;
  - path: runs of trailing ``/`` stripped, empty path → ``/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Exact-name tracking params (lowercased key match); utm_* is a prefix
# rule. The usual suspects from CommonCrawl cleaning recipes.
TRACKING_PARAMS = (
    "fbclid",
    "gclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
    "igshid",
    "ref",
    "ref_src",
)


def _strip_fragment(url: Column) -> Column:
    return F.substring_index(F.trim(url), "#", 1)


def _base_and_query(url: Column) -> tuple[Column, Column]:
    defrag = _strip_fragment(url)
    base = F.substring_index(defrag, "?", 1)
    query = F.when(
        F.instr(defrag, "?") > 0,
        defrag.substr(F.instr(defrag, "?") + F.lit(1), F.length(defrag)),
    ).otherwise(F.lit(""))
    return base, query


def _scheme_and_rest(base: Column) -> tuple[Column, Column]:
    has_scheme = F.instr(base, "://") > 0
    scheme = F.when(
        has_scheme, F.lower(F.substring_index(base, "://", 1))
    ).otherwise(F.lit("http"))
    rest = F.when(
        has_scheme, base.substr(F.instr(base, "://") + F.lit(3), F.length(base))
    ).otherwise(base)
    return scheme, rest


def _canonical_host(scheme: Column, rest: Column) -> Column:
    hostport = F.lower(
        F.regexp_replace(F.substring_index(rest, "/", 1), r"^[^@]*@", "")
    )
    deport = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    return F.regexp_replace(deport, r"^www\.", "")


def _canonical_path(rest: Column) -> Column:
    rawpath = F.when(
        F.instr(rest, "/") > 0, rest.substr(F.instr(rest, "/"), F.length(rest))
    ).otherwise(F.lit(""))
    trimmed = F.regexp_replace(rawpath, "/+$", "")
    return F.when(trimmed == "", F.lit("/")).otherwise(trimmed)


def _kept_params(query: Column) -> Column:
    def _keep(p: Column) -> Column:
        key = F.lower(F.substring_index(p, "=", 1))
        drop = key.startswith("utm_")
        for name in TRACKING_PARAMS:
            drop = drop | (key == name)
        return (p != "") & ~drop

    return F.array_sort(F.filter(F.split(query, "&"), _keep))


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules; NULL stays NULL."""
    base, query = _base_and_query(url)
    scheme, rest = _scheme_and_rest(base)
    host = _canonical_host(scheme, rest)
    path = _canonical_path(rest)
    params = _kept_params(query)
    tail = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, tail)


def url_host(url: Column) -> Column:
    """Canonical host of ``url`` (lowercased, no userinfo/default port/www)."""
    base, _ = _base_and_query(url)
    scheme, rest = _scheme_and_rest(base)
    return _canonical_host(scheme, rest)


def registered_domain(url: Column) -> Column:
    """Last two dot-labels of the canonical host (port stripped) — a
    public-suffix-list-free approximation of the registered domain
    (wrong for multi-label suffixes like ``.co.uk``; documented)."""
    bare = F.substring_index(url_host(url), ":", 1)
    return F.when(
        F.instr(bare, ".") > 0, F.regexp_extract(bare, r"[^.]+\.[^.]+$", 0)
    ).otherwise(bare)


def url_dedupe(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level first-wins dedupe: canonicalize, keep the lowest id per
    canonical URL. Returns every input row with its verdict so callers can
    audit (filter on ``keep`` to drop).

    Scale shape: canonicalization is map-side; the verdict is ONE shuffle
    on the canonical-URL hash (min-id window — deterministic keeper, same
    contract as operators/dedupe.first_wins_dedupe). Canonical URLs are
    near-unique keys, so the shuffle is skew-free by construction; at
    10^12 rows this is a plain hash-partitioned window, no salting needed.
    """
    u = F.col(url_col)
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        u.alias("url"),
        canonicalize_url(u).alias("canonical_url"),
        url_host(u).alias("host"),
        registered_domain(u).alias("domain"),
    )
    w = Window.partitionBy("canonical_url")
    return staged.withColumn(
        "keep", F.col("doc_id") == F.min("doc_id").over(w)
    )


def curate_web(
    docs: DataFrame,
    blocklist,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_sentences: int = 5,
    min_ttr: float = 0.1,
    max_hits: int = 0,
) -> DataFrame:
    """The full C4/Dolma-style web-curation recipe as ONE job: mojibake
    repair → C4 line cleaning → page rules → lexical-diversity screen →
    blocklist screen → canonical-URL first-wins dedupe. Every row keeps
    its per-stage verdicts (``c4_keep`` / ``lex_keep`` / ``block_keep`` /
    ``url_keep``) plus the final ``keep`` conjunction, so the drop
    reasons are auditable — the Dolma attributes-then-mix pattern.

    Composes the Column-level combinators (mojibake_fix_col,
    c4_line_keep_col, blocklist_hits_col, canonicalize_url), NOT the
    DataFrame wrappers — so the whole recipe is a single staged
    projection followed by ONE shuffle (the canonical-URL window). At
    10^12 documents that is one map pass over the corpus and one
    near-unique-key exchange; running the five wrappers separately would
    cost five scans plus four joins to reassemble the verdicts."""
    from docproc_spark.functions.text import (
        blocklist_hits_col,
        c4_line_keep_col,
        mojibake_count_col,
        mojibake_fix_col,
    )
    from docproc_spark.operators.dedupe import tokens_col

    if not 0.0 <= min_ttr <= 1.0:
        raise ValueError("min_ttr must be in [0, 1]")
    term_list = sorted({str(t).lower() for t in blocklist})
    if not term_list:
        raise ValueError("blocklist must be non-empty")

    t = F.coalesce(F.col(text_col), F.lit(""))
    staged = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(url_col).alias("url"),
            t.alias("_t"),
            mojibake_fix_col(t).alias("_fixed"),
            mojibake_count_col(t).alias("n_mojibake"),
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
        )
        .withColumn("_lines", F.split(F.col("_fixed"), "\n"))
        .withColumn(
            "_kept",
            F.filter(F.col("_lines"), lambda ln: c4_line_keep_col(ln, min_words)),
        )
        .withColumn("clean_text", F.array_join(F.col("_kept"), "\n"))
        .withColumn("_toks", tokens_col(F.lower(F.col("clean_text"))))
    )
    n_sentences = (
        F.length(F.col("clean_text"))
        - F.length(F.regexp_replace(F.col("clean_text"), r"[.!?]", ""))
    ).cast("long")
    n_tokens = F.size(F.col("_toks")).cast("long")
    ttr = F.when(
        n_tokens > 0,
        F.size(F.array_distinct(F.col("_toks"))).cast("double") / n_tokens,
    ).otherwise(F.lit(None).cast("double"))
    hits = blocklist_hits_col(F.col("_toks"), term_list)
    c4_keep = (
        ~F.lower(F.col("_fixed")).contains("lorem ipsum")
        & ~F.col("_fixed").contains("{")
        & (n_sentences >= min_sentences)
    )
    verdicts = staged.select(
        "doc_id",
        "url",
        "canonical_url",
        "clean_text",
        "n_mojibake",
        c4_keep.alias("c4_keep"),
        ((n_tokens > 0) & (ttr >= F.lit(min_ttr))).alias("lex_keep"),
        (F.size(hits) <= max_hits).alias("block_keep"),
    )
    w = Window.partitionBy("canonical_url")
    return verdicts.withColumn(
        "url_keep", F.col("doc_id") == F.min("doc_id").over(w)
    ).withColumn(
        "keep",
        F.col("c4_keep")
        & F.col("lex_keep")
        & F.col("block_keep")
        & F.col("url_keep"),
    )


# Meta-robots / rel=canonical signals. Both attribute orders are matched
# (HTML attribute order is free); (?i) covers the mixed-case spellings
# real pages use. Character-class-only regex + ASCII-only case folding —
# Java regex and DuckDB's RE2 agree byte-for-byte (the HREF_PATTERN
# discipline in functions/graph.py).
ROBOTS_META_PATTERNS = (
    '(?i)<meta\\s[^>]*name="robots"[^>]*content="([^"]*)"',
    '(?i)<meta\\s[^>]*content="([^"]*)"[^>]*name="robots"',
)
CANONICAL_LINK_PATTERNS = (
    '(?i)<link\\s[^>]*rel="canonical"[^>]*href="([^"]*)"',
    '(?i)<link\\s[^>]*href="([^"]*)"[^>]*rel="canonical"',
)


# Page-metadata signals (dataset provenance columns every web corpus
# carries — C4/Dolma keep title/description/date alongside the text).
# Same regex discipline as above: character classes only, both attribute
# orders, (?i) for case. OpenGraph wins over the plain tag/meta form when
# both are present (it is the page's own curated statement).
TITLE_PATTERNS = (
    '(?i)<meta\\s[^>]*property="og:title"[^>]*content="([^"]*)"',
    '(?i)<meta\\s[^>]*content="([^"]*)"[^>]*property="og:title"',
    "(?i)<title[^>]*>([^<]*)</title>",
)
DESCRIPTION_PATTERNS = (
    '(?i)<meta\\s[^>]*name="description"[^>]*content="([^"]*)"',
    '(?i)<meta\\s[^>]*content="([^"]*)"[^>]*name="description"',
    '(?i)<meta\\s[^>]*property="og:description"[^>]*content="([^"]*)"',
    '(?i)<meta\\s[^>]*content="([^"]*)"[^>]*property="og:description"',
)
PUBLISHED_PATTERNS = (
    '(?i)<meta\\s[^>]*property="article:published_time"[^>]*content="([^"]*)"',
    '(?i)<meta\\s[^>]*content="([^"]*)"[^>]*property="article:published_time"',
)


def _clean_meta(col: Column) -> Column:
    # collapse internal whitespace runs; explicit class (not \s) so Java
    # and RE2 agree on the character set ([\x0B] is \s in Java only)
    return F.nullif(F.trim(F.regexp_replace(col, "[ \t\n\r]+", " ")), F.lit(""))


def html_page_metadata(
    docs: DataFrame, html_col: str = "raw_html", id_col: str = "doc_id"
) -> DataFrame:
    """Title / description / published-time extraction from raw HTML:
    OpenGraph ``og:title`` (falling back to ``<title>``), meta
    ``description`` (falling back to ``og:description``), and
    ``article:published_time``. NULL when absent; internal whitespace
    runs collapsed. Pure map-side JVM regex — zero shuffle, no Python;
    at crawl scale this rides the same scan as the other page filters."""
    html = F.coalesce(F.col(html_col), F.lit(""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        _clean_meta(first_extract(html, TITLE_PATTERNS)).alias("title"),
        _clean_meta(first_extract(html, DESCRIPTION_PATTERNS)).alias(
            "description"
        ),
        _clean_meta(first_extract(html, PUBLISHED_PATTERNS)).alias(
            "published_at"
        ),
    )


def first_extract(col: Column, patterns: tuple[str, ...]) -> Column:
    """First non-empty ``regexp_extract`` over ``patterns`` in order
    ('' when none match — Spark and DuckDB agree on that no-match value)."""
    out = F.regexp_extract(col, patterns[0], 1)
    for p in patterns[1:]:
        out = F.when(out != "", out).otherwise(F.regexp_extract(col, p, 1))
    return out


def html_robots_flags(
    docs: DataFrame, html_col: str = "raw_html", id_col: str = "doc_id"
) -> DataFrame:
    """Meta-robots + rel=canonical extraction: ``noindex``/``nofollow``
    directives (pages a compliant pipeline must drop / whose outlinks it
    must not follow) and the page's declared canonical href (NULL when
    absent). Pure map-side JVM regex — zero shuffle, no Python; at crawl
    scale this runs inside the same scan as the other page filters."""
    html = F.coalesce(F.col(html_col), F.lit(""))
    content = F.lower(first_extract(html, ROBOTS_META_PATTERNS))
    canon = F.nullif(F.trim(first_extract(html, CANONICAL_LINK_PATTERNS)), F.lit(""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        (F.instr(content, "noindex") > 0).alias("noindex"),
        (F.instr(content, "nofollow") > 0).alias("nofollow"),
        canon.alias("canonical_href"),
    )


def canonical_consolidate(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "raw_html",
    id_col: str = "doc_id",
) -> DataFrame:
    """rel=canonical consolidation + first-wins dedupe on the effective
    URL: pages that DECLARE a canonical dedupe against it (the CMS's own
    statement that two URLs are one page — catches duplicates URL
    canonicalization alone cannot, e.g. print/mobile variants), pages
    that don't dedupe on their own canonicalized URL. The declared href
    resolves against the page's canonical scheme/host under the same
    rules as link extraction (absolute / protocol-relative /
    root-relative; anything else falls back to the page URL).

    Returns every row with (url, canonical_href, effective_url, keep) —
    audit-friendly, filter on ``keep`` to drop. Scale shape: extraction +
    resolution are map-side; the verdict is ONE near-unique-key window
    shuffle on effective_url (the url_dedupe contract)."""
    from docproc_spark.functions.graph import resolve_href  # function-local:
    # graph.py imports this module at import time; the deferred import
    # breaks the cycle without duplicating the resolution rules.

    u = F.col(url_col)
    html = F.coalesce(F.col(html_col), F.lit(""))
    src = canonicalize_url(u)
    scheme = F.substring_index(src, "://", 1)
    host = F.substring_index(F.substring_index(src, "://", -1), "/", 1)
    canon = F.nullif(F.trim(first_extract(html, CANONICAL_LINK_PATTERNS)), F.lit(""))
    resolved = resolve_href(scheme, host, canon)
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        u.alias("url"),
        canon.alias("canonical_href"),
        canonicalize_url(F.coalesce(resolved, u)).alias("effective_url"),
    )
    w = Window.partitionBy("effective_url")
    return staged.withColumn(
        "keep", F.col("doc_id") == F.min("doc_id").over(w)
    )


def build_url_index(
    docs: DataFrame,
    path: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> None:
    """Persist the crawl's seen-URL set for INCREMENTAL frontier dedupe —
    the production shape where yesterday's 10^12-URL corpus is indexed
    ONCE and every new crawl batch probes it without re-scanning old
    URLs (``url_dedupe`` re-canonicalizes the whole corpus per run).

    Layout under ``path`` (the build_minhash_index conventions):
      - ``seen/`` (canonical_url, doc_id, bucket_mod) partitioned by
        ``url_bucket`` = md5(canonical_url) mod ``n_buckets`` — a new
        batch prunes its probe to the partitions its keys hash into;
        first-wins within the build (lowest doc_id per canonical URL).
      - ``meta/`` one row carrying ``bucket_mod``: queries derive the
        modulus FROM the index (a caller-default mismatch cannot occur),
        and the meta row survives an EMPTY corpus where seen/ has no
        files to infer anything from.
      - ``_SUCCESS`` root marker written LAST (complete-commit probe).
    """
    import os

    from docproc_spark.operators.dedupe import _hash_bucket_col

    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    spark = docs.sparkSession
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
    )
    w = Window.partitionBy("canonical_url")
    (
        staged.withColumn("_m", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("_m"))
        .select(
            "canonical_url",
            "doc_id",
            F.lit(n_buckets).alias("bucket_mod"),
            _hash_bucket_col(F.col("canonical_url"), n_buckets).alias(
                "url_bucket"
            ),
        )
        .write.mode("overwrite")
        .partitionBy("url_bucket")
        .parquet(f"{path}/seen")
    )
    spark.createDataFrame(
        [(n_buckets,)], "bucket_mod int"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass


def urls_vs_index(
    new_urls: DataFrame,
    path: str,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Probe a new crawl batch against a ``build_url_index`` seen-set.
    Returns every batch row with its verdicts: ``first_in_batch``
    (first-wins within the batch), ``seen_before`` (canonical URL
    already in the index), ``keep`` = first_in_batch AND NOT
    seen_before — the URLs actually worth fetching; filter on it, then
    ``update_url_index`` the keepers.

    Scale shape: the batch canonicalizes map-side; the probe reads ONLY
    the index partitions the batch's keys hash into (an explicit
    ``url_bucket IN (...)`` partition predicate whose size is bounded by
    the recorded ``bucket_mod``, never by batch size; an empty batch
    probes nothing — F.lit(False), not a full scan); the verdict is one
    near-unique-key window + one bucket-colocated left join.
    """
    from docproc_spark.operators.dedupe import _hash_bucket_col

    spark = new_urls.sparkSession
    mod = spark.read.parquet(f"{path}/meta").first()["bucket_mod"]
    staged = new_urls.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
    ).withColumn(
        "url_bucket", _hash_bucket_col(F.col("canonical_url"), mod)
    )
    # bounded collect: distinct bucket ids, <= bucket_mod rows
    buckets = [
        r["url_bucket"] for r in staged.select("url_bucket").distinct().collect()
    ]
    seen = spark.read.parquet(f"{path}/seen")
    pruned = seen.where(
        F.col("url_bucket").isin(buckets) if buckets else F.lit(False)
    ).select(
        F.col("canonical_url").alias("s_url"),
        F.col("url_bucket").alias("s_bucket"),
    )
    wb = Window.partitionBy("canonical_url")
    flagged = staged.withColumn(
        "first_in_batch", F.col("doc_id") == F.min("doc_id").over(wb)
    )
    j = flagged.join(
        pruned,
        (F.col("canonical_url") == F.col("s_url"))
        & (F.col("url_bucket") == F.col("s_bucket")),
        "left",
    )
    return j.select(
        "doc_id",
        "url",
        "canonical_url",
        "url_bucket",
        "first_in_batch",
        F.col("s_url").isNotNull().alias("seen_before"),
        (F.col("first_in_batch") & F.col("s_url").isNull()).alias("keep"),
    )


def update_url_index(verdicts: DataFrame, path: str) -> None:
    """Append a probed batch's keepers to the seen-set (the
    ``urls_vs_index`` → fetch → update cycle). Idempotence is the
    caller's contract (lineage/batch-id gating, as streaming/ingest.py
    does for extraction batches); re-appending the same keepers would
    create duplicate seen rows, which ``urls_vs_index`` tolerates
    (seen_before is an EXISTS probe) but wastes index bytes."""
    spark = verdicts.sparkSession
    mod = spark.read.parquet(f"{path}/meta").first()["bucket_mod"]
    (
        verdicts.where(F.col("keep"))
        .select(
            "canonical_url",
            "doc_id",
            F.lit(mod).alias("bucket_mod"),
            "url_bucket",
        )
        .write.mode("append")
        .partitionBy("url_bucket")
        .parquet(f"{path}/seen")
    )


# Extensions whose URLs are media/binary fetches, not HTML pages — the
# crawl-frontier filter that keeps an extraction pipeline from wasting
# fetch budget on bytes it will quarantine anyway.
MEDIA_EXTENSIONS = (
    "jpg", "jpeg", "png", "gif", "webp", "svg", "ico",
    "mp3", "mp4", "avi", "mov", "webm", "wav",
    "zip", "gz", "tar", "rar", "7z",
    "exe", "dmg", "iso", "css", "js", "woff", "woff2", "ttf",
)


def url_features(
    urls: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Crawl-prioritization features of a URL — the classic inputs to a
    frontier classifier (depth and query count anti-correlate with page
    quality; digit-heavy paths mark calendars/session ids; media
    extensions never yield text). Everything is computed on the CANONICAL
    form so spellings of one page get one feature row, and every feature
    is an integer/boolean/string so engines agree bit-for-bit.

    Output: (doc_id, url, canonical_url, host, reg_domain, depth,
    path_len, n_params, digit_permille, ext, is_media) —
      depth          = non-empty path segments ("/" → 0)
      path_len       = characters in the canonical path
      n_params       = surviving query params after tracking-param strip
      digit_permille = 1000 * digits-in-path / path_len (int division)
      ext            = trailing ".xyz" of the last segment, lowercased,
                       1-5 alphanumerics (else ''); is_media = ext in
                       MEDIA_EXTENSIONS.

    Pure map-side projection: one scan, zero shuffle, no Python.
    """
    canon = canonicalize_url(F.col(url_col))
    path = F.regexp_replace(
        F.substring_index(
            F.split_part(canon, F.lit("://"), F.lit(2)), "?", 1
        ),
        "^[^/]*",
        "",
    )
    seg_arr = F.filter(F.split(path, "/"), lambda s: s != "")
    q = F.when(
        F.instr(canon, "?") > 0,
        F.substr(canon, F.instr(canon, "?") + 1),
    ).otherwise(F.lit(""))
    n_params = F.when(q == "", F.lit(0)).otherwise(
        F.size(F.split(q, "&"))
    )
    digits = F.length(F.regexp_replace(path, "[^0-9]", ""))
    last_seg = F.element_at(F.concat(F.array(F.lit("")), seg_arr), -1)
    ext = F.lower(F.regexp_extract(last_seg, r"\.([0-9A-Za-z]{1,5})$", 1))
    return urls.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        canon.alias("canonical_url"),
        url_host(F.col(url_col)).alias("host"),
        registered_domain(F.col(url_col)).alias("reg_domain"),
        F.size(seg_arr).cast("int").alias("depth"),
        F.length(path).cast("int").alias("path_len"),
        n_params.cast("int").alias("n_params"),
        (digits * 1000 / F.greatest(F.length(path), F.lit(1)))
        .cast("int")
        .alias("digit_permille"),
        ext.alias("ext"),
        ext.isin(*MEDIA_EXTENSIONS).alias("is_media"),
    )


# Lowercased substrings that mark an HTTP-200 page as a de-facto error
# page ("soft 404"). Substring containment, not regex — the check must
# read identically in every engine, and these phrases are distinctive
# enough that word boundaries add nothing.
SOFT404_MARKERS = (
    "page not found",
    "404 not found",
    "error 404",
    "no longer exists",
    "page unavailable",
    "page you requested",
    "page does not exist",
)


def soft404_flags(
    pages: DataFrame,
    title_col: str = "title",
    text_col: str = "text",
    probe_chars: int = 400,
    id_col: str = "doc_id",
) -> DataFrame:
    """Soft-404 detection: servers that answer missing URLs with HTTP 200
    and an apology page poison a crawl corpus (every dead link on a big
    site becomes one more copy of the same non-page). Heuristic: any
    SOFT404_MARKER as a substring of the lowercased title, or of the
    lowercased first ``probe_chars`` characters of the body (error pages
    say so up front; probing the full body would flag articles ABOUT 404
    pages). Adds (soft404, soft404_src ∈ {'title','body',NULL}).

    Map-side only — one scan, zero shuffle, no Python; NULL title/text
    probe as empty.
    """
    title_l = F.lower(F.coalesce(F.col(title_col), F.lit("")))
    head_l = F.lower(
        F.substring(F.coalesce(F.col(text_col), F.lit("")), 1, probe_chars)
    )
    t_hit = F.lit(False)
    b_hit = F.lit(False)
    for m in SOFT404_MARKERS:
        t_hit = t_hit | title_l.contains(m)
        b_hit = b_hit | head_l.contains(m)
    return pages.withColumns(
        {
            "soft404": t_hit | b_hit,
            "soft404_src": F.when(t_hit, F.lit("title")).when(
                b_hit, F.lit("body")
            ),
        }
    )


def latest_captures(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    text_col: str = "text",
) -> DataFrame:
    """Recrawl snapshot dedupe + change detection.

    A continuous crawl captures the same URL many times (CommonCrawl
    publishes ~monthly snapshots; a frontier recrawls hot pages daily).
    Training corpora keep ONE capture per URL — the latest — but the
    change signal matters too: pages whose payload never changes are
    template/chrome candidates, and the changed-fraction per host drives
    recrawl scheduling.

    Output, one row per distinct URL:
      url, last_ts            the latest capture (ties on ts broken by
                              the lexicographically greatest payload
                              hash, so the keeper is deterministic even
                              on duplicate timestamps)
      n_captures              total captures of the URL
      n_distinct_payloads     distinct non-NULL payload hashes seen
      payload_sha             md5 of the kept capture's payload
      changed                 latest payload differs from the previous
                              capture's (NULL when there is no previous
                              capture; NULL-safe comparison, so NULL→NULL
                              payloads count as unchanged)

    ONE exchange: every column is a window over partitionBy(url). At
    crawl scale the URL key is near-unique-per-group (captures per URL ≪
    rows), so the shuffle is as balanced as the corpus itself; no
    collect, no Python.
    """
    h = F.md5(F.col(text_col)).alias("payload_sha")
    asc = Window.partitionBy("url").orderBy(
        F.col("ts").asc(), F.col("payload_sha").asc()
    )
    desc = Window.partitionBy("url").orderBy(
        F.col("ts").desc(), F.col("payload_sha").desc()
    )
    full = Window.partitionBy("url")
    d = (
        captures.select(F.col(url_col).alias("url"), F.col(ts_col).alias("ts"), h)
        .withColumn("prev_sha", F.lag("payload_sha").over(asc))
        .withColumn("has_prev", F.lag(F.lit(1)).over(asc).isNotNull())
        .withColumn("rn", F.row_number().over(desc))
        .withColumn("n_captures", F.count(F.lit(1)).over(full))
        .withColumn(
            "n_distinct_payloads",
            F.size(F.collect_set("payload_sha").over(full)).cast("bigint"),
        )
    )
    return d.where(F.col("rn") == 1).select(
        "url",
        F.col("ts").alias("last_ts"),
        F.col("n_captures").cast("bigint").alias("n_captures"),
        "n_distinct_payloads",
        "payload_sha",
        F.when(
            F.col("has_prev"), ~F.col("payload_sha").eqNullSafe(F.col("prev_sha"))
        ).alias(
            "changed"
        ),
    )
