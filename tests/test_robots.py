"""robots.txt parsing + RFC 9309 permission evaluation
(docproc_spark/functions/robots.py) and the page-metadata / script-mix /
domain-report web operators added alongside it."""

from __future__ import annotations

import pytest

from docproc_spark.plans import plan_summary
from docproc_spark.plans.explain import executed_plan as _plan


def _verdicts(spark, bodies, urls, agent="TestBot"):
    from docproc_spark.functions.robots import parse_robots, robots_allowed

    robots = spark.createDataFrame(bodies, ["host", "robots_txt"])
    u = spark.createDataFrame(
        [(i, x) for i, x in enumerate(urls)], ["doc_id", "url"]
    )
    out = robots_allowed(u, parse_robots(robots), agent)
    return {r["url"]: r.asDict() for r in out.collect()}


class TestParseRobots:
    def test_groups_and_rules(self, spark):
        from docproc_spark.functions.robots import parse_robots

        body = (
            "Disallow: /orphan\n"  # before any group: ignored
            "# comment only\n"
            "USER-AGENT: MegaBot\n"
            "User-agent: testbot\n"  # consecutive UAs share one group
            "DISALLOW : /p3 # trailing comment\n"
            "Crawl-delay: 10\n"  # kept (politeness extension)
            "Sitemap: http://h.example.com/s.xml\n"  # unknown: ignored
            "Allow:\n"  # empty path: matches nothing, dropped
            "User-agent: *\n"  # new group
            "Disallow: /x\n"
        )
        rows = (
            parse_robots(spark.createDataFrame([("H.example.com", body)],
                                               ["host", "robots_txt"]))
            .orderBy("pos")
            .collect()
        )
        assert [(r["directive"], r["path"], list(r["agents"])) for r in rows] == [
            ("disallow", "/p3", ["megabot", "testbot"]),
            ("crawl-delay", "10", ["megabot", "testbot"]),
            ("disallow", "/x", ["*"]),
        ]
        # host is canonicalized (lowercased) so it joins against URL hosts
        assert all(r["host"] == "h.example.com" for r in rows)


class TestRobotsAllowed:
    def test_longest_match_and_tie(self, spark):
        v = _verdicts(
            spark,
            [("a.com", "User-agent: *\nDisallow: /p\nAllow: /pub\n"
                       "Disallow: /t\nAllow: /t")],
            ["http://a.com/p1", "http://a.com/pub/x", "http://a.com/q",
             "http://a.com/t"],
        )
        assert v["http://a.com/p1"]["allowed"] is False
        assert v["http://a.com/pub/x"]["allowed"] is True  # longer allow wins
        assert v["http://a.com/q"]["allowed"] is True  # no rule matches
        assert v["http://a.com/q"]["matched_directive"] is None
        assert v["http://a.com/t"]["allowed"] is True  # equal length: allow

    def test_exact_agent_group_preempts_star(self, spark):
        body = ("User-agent: *\nDisallow: /\n"
                "User-agent: testbot\nDisallow: /priv")
        v = _verdicts(spark, [("a.com", body)],
                      ["http://a.com/ok", "http://a.com/priv/x"])
        # the '*' group's Disallow-everything does NOT apply to testbot
        assert v["http://a.com/ok"]["allowed"] is True
        assert v["http://a.com/priv/x"]["allowed"] is False
        # ...but it does apply to an agent with no exact group
        w = _verdicts(spark, [("a.com", body)], ["http://a.com/ok"],
                      agent="OtherBot")
        assert w["http://a.com/ok"]["allowed"] is False

    def test_wildcard_paths_never_match(self, spark):
        v = _verdicts(
            spark,
            [("a.com", "User-agent: *\nDisallow: /p/*\nDisallow: /q")],
            ["http://a.com/p/x", "http://a.com/q/x"],
        )
        assert v["http://a.com/p/x"]["allowed"] is True  # literal subset
        assert v["http://a.com/q/x"]["allowed"] is False

    def test_missing_host_and_empty_body_allow(self, spark):
        v = _verdicts(
            spark,
            [("a.com", "User-agent: *\nDisallow:")],
            ["http://a.com/x", "http://nobody.com/y"],
        )
        assert all(r["allowed"] for r in v.values())

    def test_url_canonicalization_feeds_matching(self, spark):
        # www./port spellings land on the same canonical host as the rule
        v = _verdicts(
            spark,
            [("a.com", "User-agent: *\nDisallow: /p")],
            ["http://www.a.com:80/p1?utm_source=x"],
        )
        assert v["http://www.a.com:80/p1?utm_source=x"]["allowed"] is False

    def test_query_participates_in_match(self, spark):
        # RFC 9309 matches path + query; canonical form keeps real params
        v = _verdicts(
            spark,
            [("a.com", "User-agent: *\nDisallow: /p?a=1")],
            ["http://a.com/p?a=1", "http://a.com/p"],
        )
        assert v["http://a.com/p?a=1"]["allowed"] is False
        assert v["http://a.com/p"]["allowed"] is True

    def test_one_row_per_url(self, spark):
        from docproc_spark.functions.robots import (
            parse_robots,
            robots_allowed,
        )

        robots = spark.createDataFrame(
            [("a.com", "User-agent: *\nDisallow: /a\nDisallow: /ab\n"
                       "Allow: /abc")],
            ["host", "robots_txt"],
        )
        urls = spark.createDataFrame(
            [(i, f"http://a.com/abc{i}") for i in range(20)],
            ["doc_id", "url"],
        )
        out = robots_allowed(urls, parse_robots(robots), "x")
        assert out.count() == 20
        assert out.select("doc_id").distinct().count() == 20
        assert all(r["allowed"] for r in out.collect())


class TestPageMetadata:
    def test_extraction_and_fallbacks(self, spark):
        from docproc_spark.functions.web import html_page_metadata

        docs = spark.createDataFrame(
            [
                (0, '<head><meta property="og:title" content="OG">'
                    "<title>T</title></head>"),
                (1, "<head><title> A \n  B </title></head>"),
                (2, '<head><meta property="og:title" content="">'
                    "<title>FB</title></head>"),
                (3, "<p>none</p>"),
                (4, None),
            ],
            ["doc_id", "raw_html"],
        )
        got = {r["doc_id"]: r for r in html_page_metadata(docs).collect()}
        assert got[0]["title"] == "OG"
        assert got[1]["title"] == "A B"  # whitespace runs collapse
        assert got[2]["title"] == "FB"  # empty og falls through
        assert got[3]["title"] is None and got[4]["title"] is None


class TestScriptMix:
    def test_counts_and_dominant(self, spark):
        from docproc_spark.functions.text import script_mix

        docs = spark.createDataFrame(
            [(0, "abc Привет"),  # Привет
             (1, "123 !!!"), (2, None)],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r for r in script_mix(docs).collect()}
        assert got[0]["n_latin"] == 3 and got[0]["n_cyrillic"] == 6
        assert got[0]["dominant_script"] == "cyrillic"
        assert got[0]["script_confidence"] == pytest.approx(6 / 9)
        assert got[1]["dominant_script"] is None
        assert got[1]["script_confidence"] is None
        assert got[2]["n_latin"] == 0

    def test_tie_breaks_in_table_order(self, spark):
        from docproc_spark.functions.text import script_mix

        docs = spark.createDataFrame(
            [(0, "ab Пр")], ["doc_id", "text"]
        )
        row = script_mix(docs).collect()[0]
        assert row["n_latin"] == row["n_cyrillic"] == 2
        assert row["dominant_script"] == "latin"


class TestDomainReport:
    def test_rollup(self, spark):
        from docproc_spark.operators.report import domain_report

        docs = spark.createDataFrame(
            [
                (0, "one two three", "http://www.a.site.com/x"),
                (1, "four five", "https://b.site.com/x?utm_source=1"),
                (2, "six", "https://b.site.com/x"),  # same canonical page
                (3, None, "http://c.other.net/y"),
            ],
            ["doc_id", "text", "url"],
        )
        got = {r["domain"]: r for r in domain_report(docs).collect()}
        s = got["site.com"]
        assert s["n_docs"] == 3 and s["n_hosts"] == 2 and s["n_pages"] == 2
        assert s["total_tokens"] == 6 and s["tokens_per_doc"] == 2
        assert s["docs_permille"] == 750
        o = got["other.net"]
        assert o["n_docs"] == 1 and o["total_tokens"] == 0


class TestPlanShapes:
    def test_metadata_and_script_mix_zero_shuffle(self, spark, tmp_path):
        from docproc_spark.functions.text import script_mix
        from docproc_spark.functions.web import html_page_metadata

        src = str(tmp_path / "pages")
        spark.createDataFrame(
            [(i, f"<head><title>T{i}</title></head>") for i in range(50)],
            "doc_id long, raw_html string",
        ).write.parquet(src)
        docs = spark.read.parquet(src)
        for op, col in ((html_page_metadata, None),
                        (script_mix, "raw_html")):
            out = op(docs) if col is None else op(docs, text_col=col)
            s = plan_summary(out)
            assert s["scans"] == 1
            assert s["exchanges"] == 0, f"{op.__name__} must not shuffle"
            assert "EvalPython" not in _plan(out)

    def test_robots_verdict_no_cartesian_one_agg_exchange(
        self, spark, tmp_path
    ):
        from docproc_spark.functions.robots import (
            parse_robots,
            robots_allowed,
        )

        src = str(tmp_path / "urls")
        spark.createDataFrame(
            [(i, f"http://h{i % 3}.com/p{i % 7}") for i in range(200)],
            "doc_id long, url string",
        ).write.parquet(src)
        robots = spark.createDataFrame(
            [(f"h{i}.com", "User-agent: *\nDisallow: /p1") for i in range(3)],
            ["host", "robots_txt"],
        )
        out = robots_allowed(
            spark.read.parquet(src), parse_robots(robots), "x"
        )
        plan = _plan(out)
        assert "CartesianProduct" not in plan
        assert "EvalPython" not in plan
        assert out.count() == 200


class TestParseSitemaps:
    def test_urlset_fields_and_priority_domain(self, spark):
        from docproc_spark.functions.robots import parse_sitemaps

        xml = (
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<url><loc> https://a.com/p </loc><lastmod>2024-01-02</lastmod>"
            "<changefreq>daily</changefreq><priority>0.8</priority></url>"
            "<url><loc>https://a.com/q</loc><priority>1.5</priority></url>"
            "<url><lastmod>2024-01-01</lastmod></url>"  # no loc: dropped
            "</urlset>"
        )
        sm = spark.createDataFrame([("s.xml", xml)], ["sitemap_url", "xml"])
        rows = {r["loc"]: r for r in parse_sitemaps(sm).collect()}
        assert set(rows) == {"https://a.com/p", "https://a.com/q"}
        p = rows["https://a.com/p"]
        assert (p["lastmod"], p["changefreq"], p["priority"]) == (
            "2024-01-02", "daily", 0.8,
        )
        assert p["is_index"] is False
        assert rows["https://a.com/q"]["priority"] is None  # out of domain

    def test_sitemapindex_entries(self, spark):
        from docproc_spark.functions.robots import parse_sitemaps

        xml = (
            "<sitemapindex><sitemap><loc>https://c.com/a.xml</loc>"
            "<lastmod>2024-01-01T00:00:00Z</lastmod></sitemap>"
            "<sitemap><loc>https://c.com/b.xml</loc></sitemap>"
            "</sitemapindex>"
        )
        sm = spark.createDataFrame([("i.xml", xml)], ["sitemap_url", "xml"])
        rows = parse_sitemaps(sm).collect()
        assert len(rows) == 2 and all(r["is_index"] for r in rows)
        assert {r["loc"] for r in rows} == {
            "https://c.com/a.xml", "https://c.com/b.xml",
        }

    def test_null_and_garbage_xml_yield_no_rows(self, spark):
        from docproc_spark.functions.robots import parse_sitemaps

        sm = spark.createDataFrame(
            [("a.xml", None), ("b.xml", "not xml at all"),
             ("c.xml", "<urlset></urlset>")],
            ["sitemap_url", "xml"],
        )
        assert parse_sitemaps(sm).count() == 0

    def test_frontier_composition_with_robots(self, spark):
        # the crawl-seeding composition: sitemap locs gated by robots
        from docproc_spark.functions.robots import (
            parse_robots,
            parse_sitemaps,
            robots_allowed,
        )
        from pyspark.sql import functions as F

        sm = spark.createDataFrame(
            [("s.xml", "<urlset><url><loc>http://a.com/pub/1</loc></url>"
                       "<url><loc>http://a.com/priv/1</loc></url></urlset>")],
            ["sitemap_url", "xml"],
        )
        locs = (
            parse_sitemaps(sm)
            .where(~F.col("is_index"))
            .select(F.monotonically_increasing_id().alias("doc_id"),
                    F.col("loc").alias("url"))
        )
        rules = parse_robots(spark.createDataFrame(
            [("a.com", "User-agent: *\nDisallow: /priv")],
            ["host", "robots_txt"],
        ))
        got = {r["url"]: r["allowed"]
               for r in robots_allowed(locs, rules, "bot").collect()}
        assert got == {"http://a.com/pub/1": True,
                       "http://a.com/priv/1": False}

    def test_sitemap_parse_zero_shuffle(self, spark, tmp_path):
        from docproc_spark.functions.robots import parse_sitemaps

        src = str(tmp_path / "sm")
        spark.createDataFrame(
            [(f"s{i}.xml",
              f"<urlset><url><loc>https://a.com/{i}</loc></url></urlset>")
             for i in range(40)],
            "sitemap_url string, xml string",
        ).write.parquet(src)
        out = parse_sitemaps(spark.read.parquet(src))
        s = plan_summary(out)
        assert s["scans"] == 1 and s["exchanges"] == 0
        assert "EvalPython" not in _plan(out)


class TestCrawlDelay:
    def test_delay_parses_and_group_scopes(self, spark):
        from docproc_spark.functions.robots import crawl_delays, parse_robots

        rules = parse_robots(spark.createDataFrame(
            [("a.com", "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n"
                       "User-agent: fast\nCrawl-delay: 1"),
             ("b.com", "User-agent: *\nCrawl-delay: soon"),  # non-integer
             ("c.com", "User-agent: *\nDisallow: /")],      # no delay
            ["host", "robots_txt"],
        ))
        star = {r["host"]: r["delay_s"]
                for r in crawl_delays(rules, "SomeBot").collect()}
        assert star == {"a.com": 5}
        fast = {r["host"]: r["delay_s"]
                for r in crawl_delays(rules, "fast").collect()}
        assert fast == {"a.com": 1}  # exact group preempts '*'

    def test_crawl_delay_line_ends_a_user_agent_run(self, spark):
        from docproc_spark.functions.robots import parse_robots

        # RFC 9309: a non-UA line closes the UA accumulation, so the
        # second UA opens a NEW group (it must not inherit 'a')
        body = ("User-agent: a\nCrawl-delay: 9\n"
                "User-agent: b\nDisallow: /z")
        rows = parse_robots(spark.createDataFrame(
            [("h.com", body)], ["host", "robots_txt"]
        )).collect()
        by_dir = {r["directive"]: r for r in rows}
        assert list(by_dir["crawl-delay"]["agents"]) == ["a"]
        assert list(by_dir["disallow"]["agents"]) == ["b"]

    def test_schedule_slots_and_offsets(self, spark):
        from docproc_spark.functions.robots import (
            crawl_schedule,
            parse_robots,
        )

        rules = parse_robots(spark.createDataFrame(
            [("slow.com", "User-agent: *\nCrawl-delay: 10\nDisallow: /no")],
            ["host", "robots_txt"],
        ))
        urls = spark.createDataFrame(
            [(0, "http://slow.com/a"), (1, "http://slow.com/b"),
             (2, "http://slow.com/no/x"),  # disallowed: excluded
             (3, "http://fast.com/a"), (4, "http://fast.com/b")],
            ["doc_id", "url"],
        )
        got = {r["doc_id"]: r
               for r in crawl_schedule(urls, rules, "bot").collect()}
        assert 2 not in got  # disallowed URL never scheduled
        assert (got[0]["slot"], got[0]["fetch_offset_s"]) == (0, 0)
        assert (got[1]["slot"], got[1]["fetch_offset_s"]) == (1, 10)
        assert got[1]["delay_s"] == 10
        # default-delay host: slots advance at 1 s
        assert (got[3]["fetch_offset_s"], got[4]["fetch_offset_s"]) == (0, 1)
        assert got[3]["delay_s"] == 1


class TestUrlFrontier:
    def test_probe_update_cycle(self, spark, tmp_path):
        from docproc_spark.functions.web import (
            build_url_index,
            update_url_index,
            urls_vs_index,
        )

        path = str(tmp_path / "urlidx")
        base = spark.createDataFrame(
            [(0, "http://a.com/p1"), (1, "https://www.B.com/x?utm_s=1")],
            ["doc_id", "url"],
        )
        build_url_index(base, path, n_buckets=16)
        batch = spark.createDataFrame(
            [(10, "http://a.com/p1#frag"),   # spelling of a seen URL
             (11, "https://b.com/x"),        # canonical match of base 1
             (12, "http://c.com/new"),       # genuinely new
             (13, "http://C.com/new/")],     # batch-internal duplicate
            ["doc_id", "url"],
        )
        v = {r["doc_id"]: r for r in urls_vs_index(batch, path).collect()}
        assert v[10]["seen_before"] and not v[10]["keep"]
        assert v[11]["seen_before"] and not v[11]["keep"]
        assert v[12]["keep"] and v[12]["first_in_batch"]
        assert not v[13]["first_in_batch"] and not v[13]["keep"]
        # update, then the same batch probes as fully seen
        update_url_index(urls_vs_index(batch, path), path)
        v2 = urls_vs_index(batch, path).collect()
        assert all(r["seen_before"] for r in v2)
        assert not any(r["keep"] for r in v2)

    def test_empty_batch_probes_nothing(self, spark, tmp_path):
        from docproc_spark.functions.web import build_url_index, urls_vs_index

        path = str(tmp_path / "urlidx2")
        build_url_index(
            spark.createDataFrame([(0, "http://a.com/")], ["doc_id", "url"]),
            path, n_buckets=8,
        )
        empty = spark.createDataFrame([], "doc_id long, url string")
        out = urls_vs_index(empty, path)
        assert out.count() == 0

    def test_probe_prunes_index_partitions(self, spark, tmp_path):
        from docproc_spark.functions.web import build_url_index, urls_vs_index

        path = str(tmp_path / "urlidx3")
        base = spark.createDataFrame(
            [(i, f"http://h{i}.com/p{i}") for i in range(200)],
            ["doc_id", "url"],
        )
        build_url_index(base, path, n_buckets=64)
        batch = spark.createDataFrame(
            [(1000, "http://h3.com/p3")], ["doc_id", "url"]
        )
        out = urls_vs_index(batch, path)
        plan = _plan(out)
        # the seen/ scan must carry the url_bucket partition predicate
        assert "url_bucket" in plan
        row = out.collect()[0]
        assert row["seen_before"] and not row["keep"]
