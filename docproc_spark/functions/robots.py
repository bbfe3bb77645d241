"""robots.txt parsing + URL permission — the crawl-politeness layer.

A web-scale corpus pipeline must be able to answer "was this capture
allowed?" both at crawl time and retroactively (Dolma/C4 re-filter
CommonCrawl captures against robots policies). This module implements
the RFC 9309 (Robots Exclusion Protocol) core as pure DataFrame ops:

``parse_robots``  — robots.txt bodies → one row per (host, group, rule)
``robots_allowed`` — URL table × rule table → per-URL allow/deny verdict

Subset semantics (documented; mirrored bit-for-bit by the SQL oracles):
  - line model: split on LF; ``#`` starts a comment; keys are
    case-insensitive; recognized keys: user-agent / allow / disallow /
    crawl-delay (the de-facto politeness extension — parsed into
    ``crawl_delays``/``crawl_schedule``, ignored by permission
    matching); everything else (sitemap, host, ...) is ignored;
  - group model (RFC 9309 §2.1): consecutive ``user-agent`` lines open a
    group; allow/disallow lines attach to the most recent group; rules
    before any user-agent line are ignored;
  - group selection (§2.2.1): if any group on the host names the agent
    exactly (ASCII-case-insensitive product token match), only those
    groups apply; otherwise the ``*`` groups; otherwise everything is
    allowed. Groups do NOT merge across the exact/``*`` boundary;
  - matching (§2.2.2): a rule matches when the URL's canonical
    path+query starts with the rule path, LITERAL prefix only (the
    ``*`` / ``$`` wildcard extension is out of this subset — a rule
    path containing ``*`` simply never matches, which is the
    conservative read for Disallow); empty-path rules match nothing;
  - decision: longest matching rule path wins; at equal length allow
    wins (§2.2.2); no matching rule → allowed.

Scale shape: parsing is per-host windows over robots LINES (a robots
file is KB — thousands of lines at most — so the per-host partition is
trivially bounded). The verdict is one host-keyed join (rules side is
hosts × tens of rules — orders of magnitude smaller than the URL side;
AQE handles host skew) followed by ONE near-unique-key groupBy with
map-side partial aggregation. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RECOGNIZED_KEYS = ("user-agent", "allow", "disallow", "crawl-delay")


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """Parse robots.txt bodies into a rule table.

    Input: one row per host with the raw robots.txt text. Output: one
    row per (host, group_id, rule) — columns (host, group_id, agents
    array<string> sorted+lowercased, pos, directive ∈ {allow, disallow,
    crawl-delay}, path). For crawl-delay rows ``path`` carries the raw
    value (``crawl_delays`` parses it); permission matching ignores
    them. Hosts pass through ``url_host`` so they compare equal to the
    canonical hosts ``robots_allowed`` derives from URLs.
    """
    from docproc_spark.functions.web import url_host

    lines = robots.select(
        url_host(F.col(host_col)).alias("host"),
        F.posexplode(
            F.split(F.coalesce(F.col(body_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    cleaned = lines.select(
        "host",
        "pos",
        F.trim(F.substring_index(F.col("line"), "#", 1)).alias("l"),
    ).where(F.instr(F.col("l"), ":") > 0)
    keyed = cleaned.select(
        "host",
        "pos",
        F.lower(F.trim(F.substring_index(F.col("l"), ":", 1))).alias("key"),
        F.trim(
            F.col("l").substr(
                F.instr(F.col("l"), ":") + F.lit(1), F.length(F.col("l"))
            )
        ).alias("value"),
    ).where(F.col("key").isin(*RECOGNIZED_KEYS))
    w = Window.partitionBy("host").orderBy("pos")
    flagged = (
        keyed.withColumn("is_ua", F.col("key") == "user-agent")
        .withColumn(
            "_boundary",
            (
                F.col("is_ua")
                & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
            ).cast("long"),
        )
        .withColumn(
            "group_id",
            F.sum("_boundary").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    agents = (
        flagged.where("is_ua")
        .groupBy("host", "group_id")
        .agg(
            F.array_sort(F.collect_set(F.lower(F.col("value")))).alias(
                "agents"
            )
        )
    )
    rules = flagged.where(
        (~F.col("is_ua")) & (F.col("group_id") > 0) & (F.col("value") != "")
    ).select(
        "host",
        "group_id",
        "pos",
        F.col("key").alias("directive"),
        F.col("value").alias("path"),
    )
    return rules.join(agents, ["host", "group_id"])


def _applicable_rules(rules: DataFrame, agent: str) -> DataFrame:
    """RFC 9309 §2.2.1 group selection over a ``parse_robots`` table:
    hosts with a group naming ``agent`` exactly use ONLY those groups,
    the rest fall back to their ``*`` groups. A per-host window over the
    small rules table."""
    agent_l = agent.lower()
    wh = Window.partitionBy("host")
    has_exact = (
        F.max(
            F.array_contains(F.col("agents"), F.lit(agent_l)).cast("int")
        ).over(wh)
        == 1
    )
    return rules.withColumn("_exact_host", has_exact).where(
        F.when(
            F.col("_exact_host"),
            F.array_contains(F.col("agents"), F.lit(agent_l)),
        ).otherwise(F.array_contains(F.col("agents"), F.lit("*")))
    )


def crawl_delays(rules: DataFrame, agent: str) -> DataFrame:
    """Per-host crawl-delay (seconds) for ``agent``: the MAX integer
    ``Crawl-delay`` value among the agent's applicable groups (the
    conservative read when groups disagree; non-integer values are
    ignored — the de-facto grammar is whole seconds). Hosts without a
    parseable delay emit no row; callers supply their default. Output:
    (host, delay_s)."""
    return (
        _applicable_rules(rules, agent)
        .where(
            (F.col("directive") == "crawl-delay")
            & F.col("path").rlike("^[0-9]+$")
        )
        .groupBy("host")
        .agg(F.max(F.col("path").cast("long")).alias("delay_s"))
    )


def _canonical_path_q(canonical_url: Column) -> Column:
    """path+query of a canonical URL (always starts with ``/`` — the
    canonicalizer normalizes an empty path to ``/``)."""
    rest = F.substring_index(canonical_url, "://", -1)
    return rest.substr(F.instr(rest, "/"), F.length(rest))


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-URL robots verdict for ``agent`` against a ``parse_robots``
    rule table. Returns one row per input URL: (doc_id, url, host,
    allowed, matched_directive, matched_path, matched_len) — the
    matched_* columns are NULL when no rule applied (which is itself an
    allow).

    Scale shape: group selection is a per-host window over the SMALL
    rules table; the URL join is host-keyed (AQE skew-split on mega
    hosts); the verdict is one near-unique-key groupBy with map-side
    combine — matched rules per URL are tens, not corpus-sized.
    """
    from docproc_spark.functions.web import canonicalize_url

    applicable = (
        _applicable_rules(rules, agent)
        .where(F.col("directive").isin("allow", "disallow"))
        # literal-prefix subset: wildcard paths never match (see module doc)
        .where(~F.col("path").contains("*"))
        .select(
            F.col("host").alias("r_host"),
            F.col("directive").alias("r_directive"),
            F.col("path").alias("r_path"),
        )
    )
    cu = canonicalize_url(F.col(url_col))
    host = F.substring_index(F.substring_index(cu, "://", -1), "/", 1)
    u = urls.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        host.alias("host"),
        _canonical_path_q(cu).alias("_path_q"),
    )
    j = u.join(
        applicable,
        (u["host"] == applicable["r_host"])
        & F.col("_path_q").startswith(F.col("r_path")),
        "left",
    )
    # longest-match-then-allow as ONE max over a comparison-ordered
    # struct; two same-length matching prefixes of one string are equal,
    # so (len, is_allow) fully determines the winner
    best = F.max(
        F.when(
            F.col("r_path").isNotNull(),
            F.struct(
                F.length("r_path").cast("long").alias("l"),
                (F.col("r_directive") == "allow").alias("a"),
                F.col("r_directive").alias("d"),
                F.col("r_path").alias("p"),
            ),
        )
    )
    g = j.groupBy("doc_id", "url", "host").agg(best.alias("_b"))
    return g.select(
        "doc_id",
        "url",
        "host",
        (F.col("_b").isNull() | F.col("_b.a")).alias("allowed"),
        F.col("_b.d").alias("matched_directive"),
        F.col("_b.p").alias("matched_path"),
        F.col("_b.l").alias("matched_len"),
    )


# --- sitemap parsing: the discovery half of the crawl layer -----------------

_SM_URL_BLOCK = r"(?s)<url(?:\s[^>]*)?>(.*?)</url>"
_SM_INDEX_BLOCK = r"(?s)<sitemap(?:\s[^>]*)?>(.*?)</sitemap>"
# 0.0–1.0 with an optional fraction: anything else (e.g. "1.5", "high")
# is out of the sitemaps.org domain and parses to NULL
_SM_PRIORITY_OK = r"^(0(\.[0-9]+)?|1(\.0+)?)$"


def _sm_field(entry: Column, tag: str) -> Column:
    return F.nullif(
        F.trim(F.regexp_extract(entry, f"<{tag}>([^<]*)</{tag}>", 1)),
        F.lit(""),
    )


def parse_sitemaps(
    sitemaps: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml"
) -> DataFrame:
    """Parse sitemaps.org XML (urlset AND sitemapindex documents) into an
    entry table: (sitemap_url, is_index, loc, lastmod, changefreq,
    priority). ``is_index`` rows are child-sitemap references a crawler
    fetches next; the rest are page URLs (the crawl frontier robots.txt
    then gates). ``priority`` parses only the sitemaps.org 0.0–1.0
    domain (NULL otherwise); ``lastmod`` stays the raw W3C-datetime
    string. Entries without a ``<loc>`` are dropped.

    Regex subset (documented): entry blocks are matched with non-greedy
    ``(?s)`` patterns — spellings Java and RE2 agree on — so CDATA
    wrappers and XML comments inside an entry are out of scope; fields
    are simple ``<tag>text</tag>`` pairs. Pure map-side JVM regex + one
    explode; zero shuffle, no Python — a sitemap file is bounded (50k
    entries by spec), so per-row fan-out is bounded too."""
    xml = F.coalesce(F.col(xml_col), F.lit(""))

    def tagged(pattern: str, is_index: bool) -> Column:
        return F.transform(
            F.regexp_extract_all(xml, F.lit(pattern), F.lit(1)),
            lambda e: F.struct(
                F.lit(is_index).alias("is_index"), e.alias("entry")
            ),
        )

    entries = sitemaps.select(
        F.col(url_col).alias("sitemap_url"),
        F.explode(
            F.concat(tagged(_SM_URL_BLOCK, False), tagged(_SM_INDEX_BLOCK, True))
        ).alias("x"),
    )
    prio_s = _sm_field(F.col("x.entry"), "priority")
    return entries.select(
        "sitemap_url",
        F.col("x.is_index").alias("is_index"),
        _sm_field(F.col("x.entry"), "loc").alias("loc"),
        _sm_field(F.col("x.entry"), "lastmod").alias("lastmod"),
        _sm_field(F.col("x.entry"), "changefreq").alias("changefreq"),
        F.when(prio_s.rlike(_SM_PRIORITY_OK), prio_s.cast("double")).alias(
            "priority"
        ),
    ).where(F.col("loc").isNotNull())


def crawl_schedule(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    default_delay_s: int = 1,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Politeness schedule for a crawl frontier: robots-allowed URLs
    only, one serial per-host queue, each host paced by its Crawl-delay
    (``crawl_delays``; ``default_delay_s`` where none parses). Output:
    (doc_id, url, host, delay_s, slot, fetch_offset_s) — ``slot`` is the
    URL's 0-based position in its host queue (deterministic: doc_id
    order), ``fetch_offset_s`` = slot × delay_s, the earliest polite
    fetch time relative to the host queue's start.

    Scale shape: the verdict join is ``robots_allowed``; the queue
    position is ONE row_number window per host. Politeness itself
    serializes fetches per host, so a per-host sequential number is the
    honest cost model — and a mega-host partition can swap in the
    range-bucketed two-pass rank (operators/rank.py) without changing
    the contract, since slot only depends on (host, doc_id) order.
    """
    if default_delay_s < 0:
        raise ValueError("default_delay_s must be >= 0")
    verdicts = robots_allowed(
        urls, rules, agent, url_col=url_col, id_col=id_col
    ).where(F.col("allowed"))
    delays = crawl_delays(rules, agent)
    staged = verdicts.join(delays, "host", "left").select(
        "doc_id",
        "url",
        "host",
        F.coalesce(F.col("delay_s"), F.lit(default_delay_s))
        .cast("long")
        .alias("delay_s"),
    )
    w = Window.partitionBy("host").orderBy("doc_id")
    return staged.withColumn(
        "slot", (F.row_number().over(w) - F.lit(1)).cast("long")
    ).withColumn("fetch_offset_s", F.col("slot") * F.col("delay_s"))


def rank_frontier(
    urls: DataFrame,
    sitemap_entries: DataFrame,
    authority: DataFrame,
    default_priority_permille: int = 500,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frontier prioritization: order candidate URLs by the three signals
    a crawler has BEFORE fetching — the site's own declared importance
    (sitemap ``priority``), the web's vote (distinct referring domains,
    ``domain_authority``), and URL shape (shallow beats deep). The three
    collapse into ONE bigint so ordering is total, engine-exact and
    cheap to sort/top-k on:

        score = prio_permille * 10^9
              + least(ref_domains, 999999) * 10^3
              + (999 - least(depth, 999))

    i.e. lexicographic (declared priority, authority, shallowness).
    Sitemap priority joins on the CANONICAL loc (max per loc when
    sitemaps disagree; permille via floor(p*1000+0.5), exact for
    sitemaps.org's 1-2 decimal grammar); URLs no sitemap mentions get
    ``default_priority_permille``. Authority joins on the registered
    domain of ``domain_authority``'s ``dst_domain`` key; unknown domains
    count 0.

    Output: (doc_id, url, canonical_url, host, prio_permille,
    ref_domains, depth, score). Two joins, both against aggregated
    (small) sides AQE can broadcast; no window — callers top-k or sort,
    which Spark runs as TakeOrdered without a single-partition exchange.
    """
    from docproc_spark.functions.web import canonicalize_url, url_features

    feats = url_features(urls, url_col=url_col, id_col=id_col).select(
        "doc_id", "url", "canonical_url", "host", "reg_domain", "depth"
    )
    prio = (
        sitemap_entries.where(~F.col("is_index") & F.col("priority").isNotNull())
        .select(
            canonicalize_url(F.col("loc")).alias("p_url"),
            F.floor(F.col("priority") * 1000 + F.lit(0.5))
            .cast("long")
            .alias("p_permille"),
        )
        .groupBy("p_url")
        .agg(F.max("p_permille").alias("p_permille"))
    )
    auth = authority.select(
        F.col("dst_domain").alias("a_domain"),
        F.col("n_source_domains").alias("a_refs"),
    )
    staged = (
        feats.join(prio, feats["canonical_url"] == prio["p_url"], "left")
        .join(auth, feats["reg_domain"] == auth["a_domain"], "left")
        .select(
            "doc_id",
            "url",
            "canonical_url",
            "host",
            F.coalesce(F.col("p_permille"), F.lit(default_priority_permille))
            .cast("long")
            .alias("prio_permille"),
            F.coalesce(F.col("a_refs"), F.lit(0)).cast("long").alias("ref_domains"),
            F.col("depth").cast("long").alias("depth"),
        )
    )
    score = (
        F.col("prio_permille") * F.lit(1000000000)
        + F.least(F.col("ref_domains"), F.lit(999999)) * F.lit(1000)
        + (F.lit(999) - F.least(F.col("depth"), F.lit(999)))
    )
    return staged.withColumn("score", score.cast("long"))
