"""Unit tests for interleaved-span analytics (operators/interleave.py) and
recrawl snapshot dedupe (functions/web.py latest_captures).

The DuckDB parity gate (test_queries.py) covers these on the full 2000-doc
span corpus; these tests pin the EDGE semantics on handcrafted rows: NULL
and empty span arrays, media at sequence boundaries, raster spans that
neither extend nor break modality runs, header-less preambles, duplicate
timestamps, and all-NULL payloads.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from docproc_spark.functions.web import latest_captures
from docproc_spark.operators.interleave import (
    interleave_stats,
    media_context,
    section_rollup,
)

_SPAN_SCHEMA = (
    "doc_id long, spans array<struct<"
    "kind:string,text:string,media_ref:string,page:int,offset:int>>"
)


def _docs(spark):
    rows = [
        # interleaved: header, text, image, text, figure, header, text,
        # raster (neither modality), image, table
        (1, [("header", "Intro", None, 0, 0),
             ("text", "hello world", None, 0, 1),
             ("image", None, "m1", 0, 2),
             ("text", "after img", None, 0, 3),
             ("figure", None, "m2", 0, 4),
             ("header", "Sec2", None, 0, 5),
             ("text", "body2", None, 0, 6),
             ("raster", None, None, 0, 7),
             ("image", None, "m3", 0, 8),
             ("table", "a | b", None, 0, 9)]),
        (2, None),
        (3, [("image", None, "solo", 0, 0)]),
        (4, []),
        # preamble text before any header; header with NULL text is NOT a
        # section start
        (5, [("text", "pre", None, 0, 0),
             ("header", None, None, 0, 1),
             ("text", "still pre", None, 0, 2)]),
    ]
    return spark.createDataFrame(rows, _SPAN_SCHEMA)


class TestMediaContext:
    def test_nearest_textual_neighbours(self, spark):
        got = {
            (r.doc_id, r.pos): (r.media_ref, r.before_text, r.after_text)
            for r in media_context(_docs(spark)).collect()
        }
        assert got[(1, 2)] == ("m1", "hello world", "after img")
        # media spans themselves never supply context text
        assert got[(1, 4)] == ("m2", "after img", "Sec2")
        # raster span at pos 7 is skipped over, not used as context
        assert got[(1, 8)] == ("m3", "body2", "a | b")

    def test_document_boundaries_yield_nulls(self, spark):
        got = {r.doc_id: r for r in media_context(_docs(spark)).collect()
               if r.doc_id == 3}
        assert got[3].before_text is None and got[3].after_text is None

    def test_null_and_empty_spans_contribute_no_rows(self, spark):
        ids = {r.doc_id for r in media_context(_docs(spark)).collect()}
        assert 2 not in ids and 4 not in ids and 5 not in ids


class TestInterleaveStats:
    def test_runs_and_counts(self, spark):
        got = {r.doc_id: r for r in interleave_stats(_docs(spark)).collect()}
        r1 = got[1]
        # modality seq (raster skipped): T T M T M T T M T → 7 runs
        assert (r1.n_spans, r1.n_text, r1.n_media) == (10, 6, 3)
        assert r1.n_runs == 7
        assert r1.max_text_run == 2 and r1.max_media_run == 1
        assert r1.media_permille == 300
        assert r1.first_media_pos == 2

    def test_null_and_empty_spans_are_zero_rows_not_dropped(self, spark):
        got = {r.doc_id: r for r in interleave_stats(_docs(spark)).collect()}
        for doc in (2, 4):
            r = got[doc]
            assert (r.n_spans, r.n_text, r.n_media, r.n_runs) == (0, 0, 0, 0)
            assert r.media_permille is None and r.first_media_pos is None

    def test_all_media_doc(self, spark):
        r = {x.doc_id: x for x in interleave_stats(_docs(spark)).collect()}[3]
        assert r.media_permille == 1000 and r.max_media_run == 1
        assert r.n_runs == 1 and r.max_text_run == 0


class TestSectionRollup:
    def test_sections_scope_to_most_recent_header(self, spark):
        got = {
            (r.doc_id, r.sec_pos): (r.section, r.n_spans, r.n_chars)
            for r in section_rollup(_docs(spark)).collect()
        }
        # Intro owns "hello world" (11) + "after img" (9)
        assert got[(1, 0)] == ("Intro", 2, 20)
        # Sec2 owns "body2" (5) + table "a | b" (5)
        assert got[(1, 5)] == ("Sec2", 2, 10)

    def test_preamble_and_null_text_header(self, spark):
        got = {
            (r.doc_id, r.sec_pos): (r.section, r.n_spans, r.n_chars)
            for r in section_rollup(_docs(spark)).collect()
        }
        # header with NULL text does not open a section: both text spans
        # stay in the preamble (sec_pos -1, section NULL)
        assert got[(5, -1)] == (None, 2, len("pre") + len("still pre"))

    def test_media_only_docs_emit_no_sections(self, spark):
        ids = {r.doc_id for r in section_rollup(_docs(spark)).collect()}
        assert ids == {1, 5}


class TestLatestCaptures:
    def _caps(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, fetch_ts long, text string"
        )

    def test_latest_kept_and_change_flag(self, spark):
        out = {r.url: r for r in latest_captures(self._caps(spark, [
            ("u1", 1, "aaa"), ("u1", 2, "bbb"), ("u1", 3, "bbb"),
            ("u2", 5, "x"),
        ])).collect()}
        assert out["u1"].last_ts == 3 and out["u1"].n_captures == 3
        assert out["u1"].n_distinct_payloads == 2
        assert out["u1"].changed is False  # 2→3 identical payload
        assert out["u2"].changed is None  # single capture: no prior

    def test_changed_true_on_payload_flip(self, spark):
        out = latest_captures(self._caps(spark, [
            ("u", 1, "old"), ("u", 2, "new"),
        ])).collect()[0]
        assert out.changed is True and out.last_ts == 2

    def test_null_payloads_count_as_unchanged(self, spark):
        out = latest_captures(self._caps(spark, [
            ("u", 1, None), ("u", 2, None),
        ])).collect()[0]
        assert out.changed is False
        assert out.n_distinct_payloads == 0 and out.payload_sha is None

    def test_duplicate_ts_breaks_tie_deterministically(self, spark):
        # same ts: keeper is the lexicographically greatest payload hash;
        # run twice to confirm determinism
        caps = self._caps(spark, [("u", 7, "alpha"), ("u", 7, "beta")])
        a = latest_captures(caps).collect()[0]
        b = latest_captures(caps).collect()[0]
        assert a.payload_sha == b.payload_sha
        assert a.n_captures == 2 and a.n_distinct_payloads == 2
