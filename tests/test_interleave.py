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

    def test_self_text_carries_the_media_spans_own_text(self, spark):
        rows = [(9, [("text", "around it", None, 0, 0),
                     ("image", "publisher alt", "m", 0, 1),
                     ("figure", None, "n", 0, 2)])]
        df = spark.createDataFrame(rows, _SPAN_SCHEMA)
        got = {r.pos: r for r in media_context(df).collect()}
        assert got[1].self_text == "publisher alt"
        assert got[2].self_text is None
        # a media span's own text still never feeds NEIGHBOUR context
        assert got[2].before_text == "around it"

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


class TestMediaFrequency:
    def _docs(self, spark):
        from docproc_spark.operators.interleave import media_frequency
        rows = [
            (1, [("text", "a", None, 0, 0), ("image", None, "logo", 0, 1),
                 ("image", None, "logo", 0, 2), ("figure", None, "fig_a", 0, 3)]),
            (2, [("image", None, "logo", 0, 0),
                 ("image", None, None, 0, 1)]),   # NULL ref: no identity
            (3, None),
        ]
        return media_frequency(spark.createDataFrame(rows, _SPAN_SCHEMA))

    def test_corpus_rollup_and_first_sighting(self, spark):
        got = {r.media_ref: r for r in self._docs(spark).collect()}
        assert set(got) == {"logo", "fig_a"}  # NULL refs excluded
        logo = got["logo"]
        assert (logo.n_spans, logo.n_docs) == (3, 2)
        assert (logo.first_doc, logo.first_pos) == (1, 1)
        assert (got["fig_a"].n_spans, got["fig_a"].n_docs) == (1, 1)


class TestStripTemplateMedia:
    def _out(self, spark, rows, **kw):
        from docproc_spark.operators.interleave import strip_template_media
        df = spark.createDataFrame(rows, _SPAN_SCHEMA)
        return {r.doc_id: r for r in strip_template_media(df, **kw).collect()}

    def test_template_removed_everywhere_unique_kept(self, spark):
        got = self._out(spark, [
            (1, [("text", "t", None, 0, 0), ("image", None, "logo", 0, 1),
                 ("figure", None, "unique", 0, 2)]),
            (2, [("image", None, "logo", 0, 0)]),
        ])
        assert [s.media_ref for s in got[1].spans if s.kind != "text"] == ["unique"]
        assert got[1].n_removed == 1
        assert got[2].spans == [] and got[2].n_removed == 1

    def test_kind_gate_protects_textual_spans(self, spark):
        # a textual span carrying a template-valued media_ref is NOT media
        # and must survive
        got = self._out(spark, [
            (1, [("image", None, "logo", 0, 0), ("text", "x", "logo", 0, 1)]),
            (2, [("image", None, "logo", 0, 0)]),
        ])
        assert [s.kind for s in got[1].spans] == ["text"]

    def test_null_spans_pass_through(self, spark):
        got = self._out(spark, [
            (1, None),
            (2, [("image", None, "a", 0, 0)]),
            (3, [("image", None, "a", 0, 0)]),
        ])
        assert got[1].spans is None and got[1].n_removed == 0

    def test_min_docs_guard(self, spark):
        from docproc_spark.operators.interleave import strip_template_media
        import pytest
        df = spark.createDataFrame([], _SPAN_SCHEMA)
        with pytest.raises(ValueError):
            strip_template_media(df, min_docs=1)


class TestPackMultimodal:
    def test_cost_and_serpentine(self, spark):
        from docproc_spark.operators.interleave import pack_multimodal
        rows = [
            (1, [("text", "one two three", None, 0, 0)]),        # 3 tokens
            (2, [("image", None, "m", 0, 0)]),                   # 10
            (3, [("text", "a b", None, 0, 0),
                 ("figure", None, "f", 0, 1)]),                  # 2 + 10
            (4, []),                                             # 0
            (5, None),                                           # 0
        ]
        df = spark.createDataFrame(rows, _SPAN_SCHEMA)
        got = {r.doc_id: r for r in
               pack_multimodal(df, 2, image_tokens=10).collect()}
        assert {d: r.cost for d, r in got.items()} == {
            1: 3, 2: 10, 3: 12, 4: 0, 5: 0}
        # rank order: cost DESC, doc_id ASC -> 3,2,1,4,5; serpentine over
        # 2 shards: block0 L->R (0,1), block1 R->L (1,0), block2 L->R (0,)
        assert [got[d].rank for d in (3, 2, 1, 4, 5)] == [1, 2, 3, 4, 5]
        assert [got[d].shard for d in (3, 2, 1, 4, 5)] == [0, 1, 1, 0, 0]

    def test_image_tokens_guard(self, spark):
        from docproc_spark.operators.interleave import pack_multimodal
        import pytest
        df = spark.createDataFrame([], _SPAN_SCHEMA)
        with pytest.raises(ValueError):
            pack_multimodal(df, 2, image_tokens=0)


class TestMineCaptionPairs:
    def _out(self, spark, rows, **kw):
        from docproc_spark.operators.interleave import mine_caption_pairs
        df = spark.createDataFrame(rows, _SPAN_SCHEMA)
        return mine_caption_pairs(df, **kw).collect()

    def test_side_preference_and_token_gate(self, spark):
        long = " ".join(["w"] * 70)
        got = self._out(spark, [
            # before qualifies (3 tokens) -> 'before' wins even though
            # after also qualifies
            (1, [("text", "a nice caption", None, 0, 0),
                 ("image", None, "m1", 0, 1),
                 ("text", "also three tokens", None, 0, 2)]),
            # before too long (70 tokens) -> falls through to after
            (2, [("text", long, None, 0, 0),
                 ("image", None, "m2", 0, 1),
                 ("text", "after side caption", None, 0, 2)]),
            # neither qualifies: before too short (2), after missing
            (3, [("text", "too short", None, 0, 0),
                 ("image", None, "m3", 0, 1)]),
            # NULL media_ref: no identity, no pair
            (4, [("text", "a nice caption", None, 0, 0),
                 ("image", None, None, 0, 1)]),
            # qualifying alt text beats a qualifying neighbour
            (5, [("text", "neighbour caption here", None, 0, 0),
                 ("image", "publisher wrote this alt", "m5", 0, 1)]),
            # alt too short (2 tokens): falls through to before
            (6, [("text", "neighbour caption here", None, 0, 0),
                 ("image", "short alt", "m6", 0, 1)]),
        ], min_tokens=3, max_tokens=64)
        by_ref = {r.media_ref: r for r in got}
        assert set(by_ref) == {"m1", "m2", "m5", "m6"}
        assert (by_ref["m1"].side, by_ref["m1"].caption, by_ref["m1"].n_tokens) \
            == ("before", "a nice caption", 3)
        assert (by_ref["m2"].side, by_ref["m2"].caption) \
            == ("after", "after side caption")
        assert (by_ref["m5"].side, by_ref["m5"].caption, by_ref["m5"].n_tokens) \
            == ("alt", "publisher wrote this alt", 4)
        assert (by_ref["m6"].side, by_ref["m6"].caption) \
            == ("before", "neighbour caption here")

    def test_bounds_guard(self, spark):
        from docproc_spark.operators.interleave import mine_caption_pairs
        import pytest
        df = spark.createDataFrame([], _SPAN_SCHEMA)
        with pytest.raises(ValueError):
            mine_caption_pairs(df, min_tokens=0)
        with pytest.raises(ValueError):
            mine_caption_pairs(df, min_tokens=5, max_tokens=4)


class TestMediaJaccardPairs:
    def _out(self, spark, rows, **kw):
        from docproc_spark.operators.interleave import media_jaccard_pairs
        df = spark.createDataFrame(rows, _SPAN_SCHEMA)
        return media_jaccard_pairs(df, **kw).collect()

    def test_shared_sets_and_template_cap(self, spark):
        rows = [
            # docs 1,2 share {x,y}; doc 3 shares only x with them;
            # 'logo' is in all four docs -> template at cap 3, excluded
            (1, [("image", None, "x", 0, 0), ("figure", None, "y", 0, 1),
                 ("image", None, "logo", 0, 2),
                 ("image", None, "x", 0, 3)]),   # duplicate ref in-doc: once
            (2, [("image", None, "x", 0, 0), ("image", None, "y", 0, 1),
                 ("image", None, "logo", 0, 2)]),
            (3, [("image", None, "x", 0, 0), ("image", None, "z", 0, 1),
                 ("image", None, "logo", 0, 2)]),
            (4, [("image", None, "logo", 0, 0)]),
        ]
        got = {(r.a, r.b): r for r in
               self._out(spark, rows, max_docs_per_ref=3, min_jaccard_e3=1)}
        assert set(got) == {(1, 2), (1, 3), (2, 3)}
        r12 = got[(1, 2)]
        assert (r12.shared, r12.na, r12.nb, r12.jaccard_e3) == (2, 2, 2, 1000)
        assert got[(1, 3)].jaccard_e3 == 333  # 1 / (2+2-1)

    def test_threshold_filters(self, spark):
        rows = [
            (1, [("image", None, "x", 0, 0), ("image", None, "u1", 0, 1),
                 ("image", None, "u2", 0, 2)]),
            (2, [("image", None, "x", 0, 0)]),
        ]
        # jaccard = 1/3 -> 333; threshold 500 kills it
        assert self._out(spark, rows, min_jaccard_e3=500) == []
        kept = self._out(spark, rows, min_jaccard_e3=333)
        assert len(kept) == 1 and kept[0].jaccard_e3 == 333

    def test_cap_guard(self, spark):
        from docproc_spark.operators.interleave import media_jaccard_pairs
        import pytest
        df = spark.createDataFrame([], _SPAN_SCHEMA)
        with pytest.raises(ValueError):
            media_jaccard_pairs(df, max_docs_per_ref=0)


class TestMultimodalChunks:
    def _out(self, spark, rows, **kw):
        from docproc_spark.operators.interleave import multimodal_chunks
        df = spark.createDataFrame(rows, _SPAN_SCHEMA)
        return {(r.doc_id, r.chunk_id): r for r in
                multimodal_chunks(df, **kw).collect()}

    def test_budget_boundaries_and_atomic_media(self, spark):
        got = self._out(spark, [
            # costs: 3 text, 10 media, 2 text, 10 media -> prefixes
            # 0,3,13,15; budget 10 -> chunks 0,0,1,1
            (1, [("text", "a b c", None, 0, 0),
                 ("image", None, "m", 0, 1),
                 ("text", "d e", None, 0, 2),
                 ("figure", None, "f", 0, 3)]),
            # oversize span (media 10 > budget... no: single span cost 10
            # with budget 10 in chunk 0, next span prefix 10 -> chunk 1
            (2, [("image", None, "m", 0, 0),
                 ("text", "x", None, 0, 1)]),
            (3, []),
            (4, None),
        ], budget=10, image_tokens=10)
        assert set(got) == {(1, 0), (1, 1), (2, 0), (2, 1)}
        c10 = got[(1, 0)]
        assert (c10.n_spans, c10.n_media, c10.n_tokens,
                c10.first_pos, c10.last_pos) == (2, 1, 13, 0, 1)
        c11 = got[(1, 1)]
        assert (c11.n_spans, c11.n_media, c11.n_tokens,
                c11.first_pos, c11.last_pos) == (2, 1, 12, 2, 3)
        assert (got[(2, 0)].n_spans, got[(2, 1)].n_spans) == (1, 1)

    def test_oversize_span_occupies_one_chunk(self, spark):
        long = " ".join(["w"] * 25)   # cost 25 > budget 10
        got = self._out(spark, [
            (1, [("text", long, None, 0, 0),
                 ("text", "a", None, 0, 1)]),
        ], budget=10, image_tokens=10)
        # prefix 0 -> chunk 0 for the mega span; next prefix 25 -> chunk 2
        assert set(got) == {(1, 0), (1, 2)}
        assert got[(1, 0)].n_tokens == 25

    def test_zero_cost_spans_land_in_current_chunk(self, spark):
        got = self._out(spark, [
            (1, [("image", None, None, 0, 0),          # media, cost 10
                 ("text", None, "x", 0, 1),            # null text: cost 0
                 ("raster", "ignored", None, 0, 2)]),  # unknown kind: cost 0
        ], budget=10, image_tokens=10)
        # prefixes 0,10,10 -> chunks 0,1,1
        assert got[(1, 0)].n_spans == 1
        assert (got[(1, 1)].n_spans, got[(1, 1)].n_tokens) == (2, 0)

    def test_guards(self, spark):
        from docproc_spark.operators.interleave import multimodal_chunks
        import pytest
        df = spark.createDataFrame([], _SPAN_SCHEMA)
        with pytest.raises(ValueError):
            multimodal_chunks(df, budget=0)
        with pytest.raises(ValueError):
            multimodal_chunks(df, image_tokens=0)


class TestCurateInterleaved:
    def _out(self, spark, rows, **kw):
        from docproc_spark.operators.interleave import curate_interleaved
        df = spark.createDataFrame(rows, _SPAN_SCHEMA)
        return {r.doc_id: r for r in curate_interleaved(df, **kw).collect()}

    def _rows(self):
        body = " ".join(f"w{i}" for i in range(25))
        return [
            # healthy: template logo stripped, figure contextualized
            (1, [("text", body, None, 0, 0),
                 ("image", None, "logo", 0, 1),
                 ("image", None, "fig1", 0, 2),
                 ("text", "closing words here", None, 0, 3)]),
            (2, [("image", None, "logo", 0, 0),
                 ("text", body, None, 0, 1)]),
            # gallery: 5 uncontextualized images of 6 cleaned spans
            (3, [("image", None, "logo", 0, 0),
                 ("image", None, "g1", 0, 1), ("image", None, "g2", 0, 2),
                 ("image", None, "g3", 0, 3), ("image", None, "g4", 0, 4),
                 ("image", None, "g5", 0, 5),
                 ("text", body, None, 0, 6)]),
            (4, None),
            (5, []),
            # too few tokens
            (6, [("text", "just five words right here", None, 0, 0)]),
        ]

    def test_verdict_trail(self, spark):
        got = self._out(spark, self._rows(), min_docs_template=2,
                        min_tokens=20, max_media_permille=600,
                        max_gap=2, min_ctx_permille=700)
        r1 = got[1]
        assert (r1.n_removed, r1.n_text, r1.n_media) == (1, 2, 1)
        assert (r1.media_permille, r1.ctx_permille) == (333, 1000)
        assert r1.keep and r1.text_keep and r1.media_keep and r1.ctx_keep
        assert got[2].keep and got[2].n_media == 0
        assert got[2].ctx_permille is None  # no media: vacuous gate
        r3 = got[3]
        assert (r3.media_permille, r3.ctx_permille) == (833, 400)
        assert (r3.text_keep, r3.media_keep, r3.ctx_keep, r3.keep) \
            == (True, False, False, False)
        # NULL / empty / short docs fail the text gate, pass media gates
        for d in (4, 5, 6):
            assert not got[d].keep and not got[d].text_keep
            assert got[d].media_keep and got[d].ctx_keep

    def test_cleaned_spans_returned(self, spark):
        got = self._out(spark, self._rows(), min_docs_template=2)
        assert [s.media_ref for s in got[1].spans if s.kind == "image"] \
            == ["fig1"]
        assert got[4].spans is None

    def test_gate_guards(self, spark):
        from docproc_spark.operators.interleave import curate_interleaved
        import pytest
        df = spark.createDataFrame([], _SPAN_SCHEMA)
        with pytest.raises(ValueError):
            curate_interleaved(df, max_gap=0)
        with pytest.raises(ValueError):
            curate_interleaved(df, max_media_permille=1001)


class TestGateMediaSpans:
    _MEDIA_SCHEMA = (
        "doc_id long, media_ref string, n_bytes long, format string, "
        "width int, height int"
    )

    def _frames(self, spark):
        docs = spark.createDataFrame(
            [
                (1, [("text", "hello", None, 0, 0),
                     ("image", None, "beacon", 0, 1),
                     ("image", None, "photo", 0, 2)]),
                (2, [("image", None, "mystery", 0, 0)]),
                (3, [("image", None, "uncatalogued", 0, 0)]),
                (4, None),
            ],
            _SPAN_SCHEMA,
        )
        media = spark.createDataFrame(
            [
                (1, "beacon", 43, "gif", 1, 1),
                (1, "photo", 120000, "jpeg", 800, 600),
                (2, "mystery", None, None, None, None),
            ],
            self._MEDIA_SCHEMA,
        )
        return docs, media

    def test_dimension_gate_drops_beacons_only(self, spark):
        from docproc_spark.operators.interleave import gate_media_spans

        docs, media = self._frames(spark)
        out = {
            r["doc_id"]: r
            for r in gate_media_spans(
                docs, media, min_width=10, min_height=10
            ).collect()
        }
        assert [s["media_ref"] for s in out[1]["spans"] if s["kind"] == "image"] == ["photo"]
        assert out[1]["n_removed"] == 1
        assert [s["text"] for s in out[1]["spans"] if s["kind"] == "text"] == ["hello"]
        # unknown dims kept by default; uncatalogued refs never touched
        assert out[2]["n_removed"] == 0 and len(out[2]["spans"]) == 1
        assert out[3]["n_removed"] == 0 and len(out[3]["spans"]) == 1
        assert out[4]["spans"] is None and out[4]["n_removed"] == 0

    def test_drop_unknown_metadata(self, spark):
        from docproc_spark.operators.interleave import gate_media_spans

        docs, media = self._frames(spark)
        out = {
            r["doc_id"]: r
            for r in gate_media_spans(
                docs, media, min_width=10, min_height=10, drop_unknown=True
            ).collect()
        }
        assert out[2]["spans"] == [] and out[2]["n_removed"] == 1
        # uncatalogued (no row at all) is STILL untouched — unknown
        # means a catalogue row with missing facts
        assert out[3]["n_removed"] == 0

    def test_blocked_formats_and_min_bytes(self, spark):
        from docproc_spark.operators.interleave import gate_media_spans

        docs, media = self._frames(spark)
        out = {
            r["doc_id"]: r
            for r in gate_media_spans(
                docs, media, blocked_formats=("jpeg",)
            ).collect()
        }
        assert [s["media_ref"] for s in out[1]["spans"] if s["kind"] == "image"] == ["beacon"]
        out2 = {
            r["doc_id"]: r
            for r in gate_media_spans(docs, media, min_bytes=1000).collect()
        }
        assert [s["media_ref"] for s in out2[1]["spans"] if s["kind"] == "image"] == ["photo"]

    def test_no_gate_raises(self, spark):
        import pytest as _pytest

        from docproc_spark.operators.interleave import gate_media_spans

        docs, media = self._frames(spark)
        with _pytest.raises(ValueError):
            gate_media_spans(docs, media)
