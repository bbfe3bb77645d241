"""Link-graph operators (functions/graph.py): extraction semantics,
domain authority, integer PageRank — plus the plan-shape guards that make
them viable at crawl scale (map-side extraction, bounded shuffles,
partitioning-independent ranks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docproc_spark.functions.graph import (
    anchor_texts,
    domain_authority,
    extract_links,
    pagerank,
)
from docproc_spark.plans import plan_summary
from docproc_spark.plans.explain import executed_plan as _plan


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, raw_html string")


HTML = (
    '<p>intro</p>'
    '<a href="https://Other.NET/p?utm_x=1&b=2">ext link</a>'
    '<a class="c" href="/local/">loc</a>'
    '<a href="//cdn.example.org:443/x">cdn</a>'
    '<a href="mailto:a@b.c">m</a><a href="#top">t</a>'
    '<a href="rel/p">r</a><a href="javascript:void(0)">j</a>'
    '<a href="HTTP://SITE.com:80/up">Nested <b>bold</b></a>'
)


class TestExtractLinks:
    def test_resolution_rules(self, spark):
        out = extract_links(
            _pages(spark, [(1, "https://www.Site.com:443/a", HTML)])
        ).orderBy("pos").collect()
        # mailto/#frag/path-relative/javascript drop; four links survive
        assert [r.dst_url for r in out] == [
            "https://other.net/p?b=2",  # absolute, tracking param stripped
            "https://site.com/local",  # root-relative, trailing / trimmed
            "https://cdn.example.org/x",  # protocol-relative: page scheme
            # https attaches, then canonicalization drops the :443 default
            "http://site.com/up",  # absolute, case + default port folded
        ]
        # pos is the 1-based position among ALL matched anchors — dropped
        # links (mailto/#frag/relative/javascript at 4,5,6,7) leave gaps
        assert [r.pos for r in out] == [1, 2, 3, 8]
        assert out[0].src_url == "https://site.com/a"
        # anchor is the first text run only; nested markup truncates
        assert out[3].anchor == "Nested"
        assert [r.is_internal for r in out] == [False, True, False, True]

    def test_no_links_and_null_html(self, spark):
        out = extract_links(
            _pages(
                spark,
                [(1, "https://a.com/", "<p>none</p>"), (2, "https://b.com/", None)],
            )
        )
        assert out.count() == 0

    def test_repeated_hrefs_stay_repeated(self, spark):
        html = '<a href="/x">a</a><a href="/x">b</a>'
        out = extract_links(_pages(spark, [(1, "https://a.com/", html)]))
        assert out.count() == 2

    def test_plan_is_mapside_only(self, spark, tmp_path):
        src = str(tmp_path / "pages")
        _pages(
            spark, [(i, f"https://s{i % 5}.com/p", HTML) for i in range(50)]
        ).write.parquet(src)
        out = extract_links(spark.read.parquet(src))
        s = plan_summary(out)
        assert s["scans"] == 1
        assert s["exchanges"] == 0, "link extraction must not shuffle"
        plan = _plan(out)
        assert "EvalPython" not in plan, "no Python in the extraction path"


class TestDomainAuthority:
    def test_counts(self, spark):
        rows = [
            (1, "https://a.com/1", '<a href="https://hub.com/x">h</a>'),
            (2, "https://b.com/1", '<a href="https://hub.com/y">h</a>'
             '<a href="https://hub.com/z">h2</a>'),
            (3, "https://hub.com/self", '<a href="/internal">i</a>'),
        ]
        out = {
            r.dst_domain: r
            for r in domain_authority(extract_links(_pages(spark, rows))).collect()
        }
        hub = out["hub.com"]
        assert hub.n_inlinks == 4
        assert hub.n_external_inlinks == 3
        assert hub.n_source_domains == 2, "internal self-vote must not count"

    def test_plan_single_groupkey_shuffle(self, spark, tmp_path):
        src = str(tmp_path / "pages")
        _pages(
            spark, [(i, f"https://s{i % 7}.com/p", HTML) for i in range(60)]
        ).write.parquet(src)
        out = domain_authority(extract_links(spark.read.parquet(src)))
        plan = _plan(out)
        assert "Exchange SinglePartition" not in plan
        assert "hashpartitioning(dst_domain" in plan


class TestAnchorTexts:
    def test_topk_sorted_distinct(self, spark):
        rows = [
            (1, "https://a.com/1", '<a href="https://t.com/x">zeta</a>'),
            (2, "https://b.com/1", '<a href="https://t.com/x">alpha</a>'
             '<a href="https://t.com/x">alpha</a>'
             '<a href="https://t.com/x">mid</a>'
             '<a href="https://t.com/x"> </a>'),
        ]
        out = anchor_texts(extract_links(_pages(spark, rows)), k=2).collect()
        assert len(out) == 1
        r = out[0]
        assert r.dst_url == "https://t.com/x"
        assert r.n_refs == 5
        assert r.n_source_pages == 2
        # distinct, empty dropped, bytewise sort, top-2 of {alpha,mid,zeta}
        assert r.anchors_topk == "alpha | mid"


class TestPagerank:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src long, dst long")

    def test_hub_outranks_and_mass_bounded(self, spark):
        # bidirectional star: everyone ↔ 0 — stable dynamics, hub on top
        pairs = [(i, 0) for i in range(1, 6)] + [(0, i) for i in range(1, 6)]
        pr = {
            r.node: r.rank_bits
            for r in pagerank(self._edges(spark, pairs), iters=4).collect()
        }
        assert len(pr) == 6
        assert pr[0] == max(pr.values()), "hub must rank first"
        # integer mass never exceeds the total (truncation only shrinks)
        assert sum(pr.values()) <= (1 << 40)
        # leaves are symmetric → identical ranks
        assert len({pr[i] for i in range(1, 6)}) == 1

    def test_partitioning_independent(self, spark):
        pairs = [(i, (i * 7 + 3) % 23) for i in range(200)]
        e = self._edges(spark, pairs).where("src <> dst")
        a = {r.node: r.rank_bits for r in pagerank(e, iters=3).collect()}
        b = {
            r.node: r.rank_bits
            for r in pagerank(e.repartition(13), iters=3).collect()
        }
        assert a == b, "integer ranks must not depend on partitioning"

    def test_matches_float_reference(self, spark):
        # classic float PageRank on the same graph: integer ranks must
        # agree to ~1e-9 relative (truncation loses < iters * N / 2^40)
        pairs = [(1, 2), (2, 3), (3, 1), (4, 1), (1, 3), (2, 4)]
        got = {
            r.node: r.rank
            for r in pagerank(self._edges(spark, pairs), iters=3).collect()
        }
        nodes = sorted({n for p in pairs for n in p})
        out = {n: [d for s, d in pairs if s == n] for n in nodes}
        rank = {n: 1.0 / len(nodes) for n in nodes}
        for _ in range(3):
            nxt = {n: 0.15 / len(nodes) for n in nodes}
            for u in nodes:
                for v in out[u]:
                    nxt[v] += 0.85 * rank[u] / len(out[u])
            rank = nxt
        for n in nodes:
            assert got[n] == pytest.approx(rank[n], abs=1e-6)

    def test_empty_edges(self, spark):
        out = pagerank(self._edges(spark, []), iters=2)
        assert out.count() == 0
        assert out.columns == ["node", "rank_bits", "rank"]

    def test_no_single_partition_exchange(self, spark, tmp_path):
        src = str(tmp_path / "edges")
        self._edges(
            spark, [(i, (i * 5 + 1) % 40) for i in range(300)]
        ).write.parquet(src)
        out = pagerank(spark.read.parquet(src), iters=2)
        assert "Exchange SinglePartition" not in _plan(out)


class TestGraphHypothesis:
    """Property guards: canonicalization is idempotent (a canonical URL
    re-canonicalizes to itself — extract_links relies on this when it
    derives the resolution base from the canonical src), and extracted
    edges are always canonical with strictly increasing page positions."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _url = st.builds(
        lambda scheme, www, host, port, path, slash, params, frag: (
            scheme
            + www
            + host
            + port
            + "/"
            + path
            + slash
            + ("?" + "&".join(params) if params else "")
            + frag
        ),
        st.sampled_from(["http://", "HTTPS://", "https://", ""]),
        st.sampled_from(["", "www.", "WWW."]),
        st.sampled_from(["Example.COM", "a.b.example.net", "localhost", "x.org"]),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.sampled_from(["", "p", "A/B", "p/q/r"]),
        st.sampled_from(["", "/", "//"]),
        st.lists(
            st.sampled_from(
                ["a=1", "b=2", "utm_source=x", "fbclid=abc", "Z=9"]
            ),
            max_size=3,
        ),
        st.sampled_from(["", "#top", "#a-b"]),
    )

    @given(st.lists(_url, min_size=1, max_size=30, unique=True))
    @settings(max_examples=8, deadline=None)
    def test_canonicalize_idempotent(self, spark, urls):
        from docproc_spark.functions.web import canonicalize_url

        df = spark.createDataFrame([(u,) for u in urls], "url string")
        c1 = canonicalize_url(F.col("url"))
        rows = df.select(
            c1.alias("once"), canonicalize_url(c1).alias("twice")
        ).collect()
        for r in rows:
            assert r.once == r.twice, r

    _snippet = st.sampled_from(
        [
            '<a href="https://X.org/p">t</a>',
            '<a href="/r/">x</a>',
            '<a href="//cdn.y.net/z?utm_a=1">y</a>',
            '<a href="#f">f</a>',
            '<a href="mailto:a@b.c">m</a>',
            "<p>plain</p>",
            "<a name=anchor>no href</a>",
            '<a href="">empty</a>',
            "broken <a href=\"unclosed",
        ]
    )

    @given(st.lists(_snippet, min_size=0, max_size=12))
    @settings(max_examples=8, deadline=None)
    def test_edges_canonical_and_ordered(self, spark, parts):
        from docproc_spark.functions.graph import extract_links
        from docproc_spark.functions.web import canonicalize_url

        df = spark.createDataFrame(
            [(1, "https://WWW.Base.com:443/d/", "".join(parts))],
            "doc_id long, url string, raw_html string",
        )
        out = extract_links(df)
        rows = out.withColumn(
            "recanon", canonicalize_url(F.col("dst_url"))
        ).orderBy("pos").collect()
        last = 0
        for r in rows:
            assert r.dst_url is not None and r.dst_url == r.recanon
            assert r.src_url == "https://base.com/d"
            assert r.pos > last, "positions strictly increase in page order"
            last = r.pos


class TestRobotsCanonical:
    def test_robots_flags(self, spark):
        from docproc_spark.functions.web import html_robots_flags

        rows = [
            (1, '<meta name="robots" content="noindex, nofollow">'),
            (2, '<meta content="NOINDEX" name="ROBOTS">'),  # reversed+case
            (3, '<meta name="robots" content="index, follow">'),
            (4, "<p>no meta at all</p>"),
            (5, None),
            (6, '<link href="https://c.com/x" rel="canonical"><p>t</p>'),
        ]
        df = spark.createDataFrame(rows, "doc_id long, raw_html string")
        out = {r.doc_id: r for r in html_robots_flags(df).collect()}
        assert out[1].noindex is True and out[1].nofollow is True
        assert out[2].noindex is True and out[2].nofollow is False
        assert out[3].noindex is False and out[3].nofollow is False
        assert out[4].noindex is False and out[4].canonical_href is None
        assert out[5].noindex is False
        assert out[6].canonical_href == "https://c.com/x"

    def test_canonical_consolidate(self, spark):
        from docproc_spark.functions.web import canonical_consolidate

        canon = '<link rel="canonical" href="https://one.com/page">'
        rows = [
            # two print/mobile variants both declaring the same canonical
            (1, "https://one.com/page?print=1", canon),
            (2, "https://m.one.com/page", canon),
            # the canonical page itself, declaring nothing
            (3, "https://one.com/page", ""),
            # root-relative canonical resolves against the page host
            (4, "https://two.com/a?x=1",
             '<link href="/a" rel="canonical">'),
            (5, "https://two.com/a", ""),
            # unresolvable canonical falls back to the page URL
            (6, "https://three.com/p",
             '<link rel="canonical" href="see-other">'),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string, raw_html string")
        out = {r.doc_id: r for r in canonical_consolidate(df).collect()}
        assert out[1].effective_url == "https://one.com/page"
        assert out[2].effective_url == "https://one.com/page"
        assert out[3].effective_url == "https://one.com/page"
        # first-wins across the consolidated group
        assert out[1].keep is True and out[2].keep is False
        assert out[3].keep is False
        assert out[4].effective_url == "https://two.com/a"
        assert out[4].keep is True and out[5].keep is False
        assert out[6].effective_url == "https://three.com/p"
        assert out[6].keep is True and out[6].canonical_href == "see-other"

    def test_robots_plan_zero_shuffle(self, spark, tmp_path):
        from docproc_spark.functions.web import html_robots_flags

        src = str(tmp_path / "pages")
        spark.createDataFrame(
            [(i, '<meta name="robots" content="noindex">') for i in range(40)],
            "doc_id long, raw_html string",
        ).write.parquet(src)
        out = html_robots_flags(spark.read.parquet(src))
        s = plan_summary(out)
        assert s["scans"] == 1 and s["exchanges"] == 0
        assert "EvalPython" not in _plan(out)
