"""SRT / WebVTT subtitle ingestion (sources/subtitles.py).

Fixtures are spec-faithful subtitle texts with hand-computed cue
expectations; the DuckDB round-trip spares (subtitle_cues_synth,
transcript_stats_synth in test_queries.py) pin the parser against
formula-planted corpora — these tests pin the EDGE semantics: CRLF,
BOM, missing index lines, malformed blocks, VTT tags/NOTE blocks,
hour-less timestamps, cue settings.
"""

from __future__ import annotations

import pytest

from docproc_spark.sources.subtitles import (
    load_subtitles,
    parse_srt,
    parse_vtt,
    transcript_stats,
)

SRT = (
    "1\r\n00:00:01,000 --> 00:00:03,500\r\nHello there.\r\n\r\n"
    "2\r\n00:00:04,000 --> 00:00:06,000\r\nTwo lines\r\nof text\r\n\r\n"
    "not a cue at all\r\n\r\n"
    "00:01:00,000 --> 00:01:02,000\r\nno index line\r\n"
)

VTT = (
    "WEBVTT - with a header comment\n\n"
    "NOTE this block is skipped\nentirely\n\n"
    "intro\n00:01.000 --> 00:03.000 align:start position:10%\n"
    "<v Speaker>Hi <i>there</i></v>\n\n"
    "01:00:00.000 --> 01:00:02.500\nhour-long show\n"
)


class TestParsers:
    def test_srt_blocks_crlf_and_optional_index(self):
        assert parse_srt(SRT) == [
            (0, 1000, 3500, "Hello there."),
            (1, 4000, 6000, "Two lines\nof text"),
            (2, 60000, 62000, "no index line"),
        ]

    def test_vtt_notes_tags_settings_and_short_ts(self):
        assert parse_vtt(VTT) == [
            (0, 1000, 3000, "Hi there"),
            (1, 3600000, 3602500, "hour-long show"),
        ]

    def test_empty_and_garbage(self):
        assert parse_srt("") == []
        assert parse_srt("garbage\nwithout\ntimings") == []
        assert parse_vtt("WEBVTT\n") == []

    def test_vtt_skip_rules_note_word_style_exact(self):
        # NOTE comments with or without trailing text on its line;
        # STYLE/REGION open blocks only as an EXACT line — identifiers
        # like 'NOTES…', 'STYLEGUIDE', or 'STYLE guide' are legal cues
        body = (
            "WEBVTT\n\n"
            "NOTES for the exam\n00:01.000 --> 00:02.000\ncue one\n\n"
            "STYLEGUIDE\n00:03.000 --> 00:04.000\ncue two\n\n"
            "STYLE guide\n00:05.000 --> 00:06.000\ncue three\n\n"
            "STYLE\n::cue { color: red }\n\n"
            "REGION\nid:r1\n\n"
            "NOTE\nactually a comment\n\n"
            "NOTE trailing text comment\n"
        )
        assert parse_vtt(body) == [
            (0, 1000, 2000, "cue one"),
            (1, 3000, 4000, "cue two"),
            (2, 5000, 6000, "cue three"),
        ]

    def test_vtt_header_without_blank_line_keeps_first_cue(self):
        body = "WEBVTT\n00:01.000 --> 00:02.000\nfirst cue\n"
        assert parse_vtt(body) == [(0, 1000, 2000, "first cue")]

    def test_vtt_tab_separated_cue_settings(self):
        body = "WEBVTT\n\n00:01.000 --> 00:02.000\talign:start\nhi\n"
        assert parse_vtt(body) == [(0, 1000, 2000, "hi")]

    def test_vtt_arrow_with_no_end_time_is_dropped(self):
        assert parse_vtt("WEBVTT\n\n00:01.000 --> \ndangling\n") == []


@pytest.mark.usefixtures("spark")
class TestSpark:
    def test_load_and_stats(self, spark):
        df = spark.createDataFrame(
            [
                ("a.srt", "srt", bytearray(SRT.encode())),
                ("b.vtt", "vtt", bytearray(("﻿" + VTT).encode())),
                ("c.sub", "sub", bytearray(b"whatever")),
            ],
            "doc_id string, fmt string, content binary",
        )
        cues = load_subtitles(df).collect()
        ok = [r for r in cues if r["parse_error"] is None]
        bad = [r for r in cues if r["parse_error"] is not None]
        assert len(ok) == 5 and [r["doc_id"] for r in bad] == ["c.sub"]
        a = sorted(
            (r for r in ok if r["doc_id"] == "a.srt"),
            key=lambda r: r["cue_idx"],
        )
        assert [r["start_ms"] for r in a] == [1000, 4000, 60000]

        stats = {
            r["doc_id"]: r
            for r in transcript_stats(load_subtitles(df)).collect()
        }
        sa = stats["a.srt"]
        assert sa["n_cues"] == 3
        assert sa["span_ms"] == 61000
        assert sa["speech_ms"] == 2500 + 2000 + 2000
        assert sa["speech_permille"] == 1000 * 6500 // 61000
        assert sa["n_tokens"] == 2 + 4 + 3
        assert sa["tokens_per_min"] == 9 * 60000 // 6500
        assert "c.sub" not in stats  # quarantine rows excluded
