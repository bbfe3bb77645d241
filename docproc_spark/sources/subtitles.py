"""SRT / WebVTT subtitle ingestion — video transcripts as corpus text.

A multimodal training pipeline's audio/video documents carry their text
as subtitle tracks (YouTube-scale corpora arrive as media + .vtt; film
datasets as .srt). These kernels parse the two dominant formats into
timed cue rows — the transcript table that joins media by doc_id and
feeds the text pipeline (quality, lang-id, dedupe) like any document:

  SRT     numbered blocks `N\\n HH:MM:SS,mmm --> HH:MM:SS,mmm\\n text`
          separated by blank lines; comma millisecond separator; index
          line optional in the wild (some writers omit it).
  WebVTT  `WEBVTT` magic; cues `[id\\n] HH:MM:SS.mmm --> HH:MM:SS.mmm
          [settings]\\n text`; dot millisecond separator, hours
          optional; NOTE/STYLE/REGION blocks skipped; basic tags
          (<i>, <b>, <c.cls>, <v Speaker>) stripped from cue text.

Both parsers are defensive (a malformed block is skipped, never raises)
and return cues in file order. Timestamps are integer milliseconds —
engine-portable, no float drift.

Spark shape: ``load_subtitles`` is one mapInPandas crossing over a
binaryFile frame (same contract as the other sources — per-document
quarantine on undecodable bytes); ``transcript_stats`` rolls cues up to
the per-document facts a curation pass gates on (speech density, cue
rate, token throughput) in ONE groupBy.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docproc_spark.sources.html import sniff_charset

__all__ = [
    "parse_srt",
    "parse_vtt",
    "SUBTITLE_CUE_SCHEMA",
    "load_subtitles",
    "transcript_stats",
]

_TS = re.compile(
    r"(?:(\d{1,3}):)?(\d{1,2}):(\d{2})[.,](\d{3})"
)
_ARROW = re.compile(
    r"(?:(?:\d{1,3}:)?\d{1,2}:\d{2}[.,]\d{3})\s*-->\s*"
    r"(?:(?:\d{1,3}:)?\d{1,2}:\d{2}[.,]\d{3})"
)
_VTT_TAG = re.compile(r"</?[^>\n]*>")


def _ms(ts: str) -> int | None:
    m = _TS.fullmatch(ts.strip())
    if not m:
        return None
    h = int(m.group(1) or 0)
    return ((h * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 + int(
        m.group(4)
    )


def _cue_from_block(lines: list[str], vtt: bool) -> tuple | None:
    """(start_ms, end_ms, text) from one blank-line-separated block, or
    None when the block has no valid timing line."""
    for i, line in enumerate(lines):
        if "-->" in line and _ARROW.search(line):
            a, _, b = line.partition("-->")
            start = _ms(a)
            # cue settings separate by space OR tab (WebVTT allows both)
            end_tok = b.split()
            end = _ms(end_tok[0]) if end_tok else None
            if start is None or end is None:
                return None
            text = "\n".join(lines[i + 1 :]).strip()
            if vtt:
                text = _VTT_TAG.sub("", text)
            return (start, end, text)
    return None


def _blocks(body: str) -> Iterator[list[str]]:
    block: list[str] = []
    for line in body.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        if line.strip() == "":
            if block:
                yield block
                block = []
        else:
            block.append(line)
    if block:
        yield block


def parse_srt(body: str) -> list[tuple[int, int, int, str]]:
    """SRT text → [(cue_idx, start_ms, end_ms, text)] in file order;
    cue_idx is the 0-based PARSE order (the file's own numbering is
    unreliable in the wild). Malformed blocks are skipped."""
    out = []
    for block in _blocks(body):
        cue = _cue_from_block(block, vtt=False)
        if cue is not None:
            out.append((len(out), *cue))
    return out


def parse_vtt(body: str) -> list[tuple[int, int, int, str]]:
    """WebVTT text → [(cue_idx, start_ms, end_ms, text)]; NOTE/STYLE/
    REGION comment blocks skipped, inline tags stripped.

    Skip rules are WORD matches, not prefixes: a cue whose identifier
    line merely starts with 'NOTES…' is a legal cue and must parse
    (only NOTE followed by whitespace/end-of-line comments a block, and
    comment text cannot contain '-->' per the spec). A sloppy file
    whose WEBVTT header line is not followed by a blank line keeps its
    first cue: the header LINE is dropped, the rest of the block
    parses."""
    out = []
    for i, block in enumerate(_blocks(body)):
        first = block[0].strip()
        token = first.split(None, 1)[0] if first.split() else ""
        # NOTE comments with trailing text on the same line; STYLE and
        # REGION open their blocks only as an EXACT line (a line like
        # 'STYLE guide' is a legal cue identifier per the spec)
        if token == "NOTE" or first in ("STYLE", "REGION"):
            continue
        if i == 0 and token == "WEBVTT":
            block = block[1:]  # header line; a missing blank line must
            if not block:  # not swallow the first cue into this block
                continue
        cue = _cue_from_block(block, vtt=True)
        if cue is not None:
            out.append((len(out), *cue))
    return out


SUBTITLE_CUE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("cue_idx", T.IntegerType(), True),
        T.StructField("start_ms", T.LongType(), True),
        T.StructField("end_ms", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)


def load_subtitles(
    docs: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    fmt_col: str = "fmt",
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, fmt in {srt,vtt}, content:binary) → one row per cue
    (SUBTITLE_CUE_SCHEMA). Bytes decode through the WHATWG charset
    cascade (subtitle files in the wild are utf-8-with-BOM or cp1252);
    an unknown format quarantines the document, a cue-less file yields
    zero rows (empty transcript, not an error)."""
    import pandas as pd

    cols = [f.name for f in SUBTITLE_CUE_SCHEMA]

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[dict] = []
            for did, fmt, blob in zip(
                pdf[doc_id_col], pdf[fmt_col], pdf[content_col]
            ):
                try:
                    fmt_n = (fmt or "").lower().lstrip(".")
                    if fmt_n not in ("srt", "vtt"):
                        raise ValueError(f"unsupported subtitle format: {fmt_n!r}")
                    raw = bytes(blob)
                    codec, errors = sniff_charset(raw)
                    body = raw.decode(codec, errors).lstrip("﻿")
                    cues = (parse_srt if fmt_n == "srt" else parse_vtt)(body)
                    for idx, s, e, text in cues:
                        out.append(
                            {
                                "doc_id": did,
                                "cue_idx": idx,
                                "start_ms": s,
                                "end_ms": e,
                                "text": text,
                                "parse_error": None,
                            }
                        )
                except Exception as e:  # noqa: BLE001 — per-doc quarantine
                    out.append(
                        {
                            "doc_id": did,
                            **{c: None for c in cols[1:-1]},
                            "parse_error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(gen, schema=SUBTITLE_CUE_SCHEMA)


def transcript_stats(cues: DataFrame) -> DataFrame:
    """Per-document transcript facts from a cue table — what an
    audio/video curation pass gates on before any ASR/alignment work:

      n_cues, span_ms        first-start → last-end extent
      speech_ms              sum of cue durations (overlaps summed —
                             karaoke-style stacked cues count twice by
                             design; gate on the ratio, not the sum)
      speech_permille        1000·speech/span (0 when span is 0)
      n_chars, n_tokens      whitespace tokens over all cue text
      tokens_per_min         against SPEECH time (integer, 0-safe)

    ONE groupBy(doc_id) with map-side partials; quarantine rows
    (parse_error set) are excluded."""
    toks = F.size(
        F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    )
    toks = F.when(
        F.trim(F.coalesce(F.col("text"), F.lit(""))) == "", F.lit(0)
    ).otherwise(toks)
    agg = (
        cues.where(F.col("parse_error").isNull())
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_cues"),
            (F.max("end_ms") - F.min("start_ms")).alias("span_ms"),
            F.sum(F.col("end_ms") - F.col("start_ms")).alias("speech_ms"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias(
                "n_chars"
            ),
            F.sum(toks).cast("long").alias("n_tokens"),
        )
    )
    return agg.select(
        "doc_id",
        "n_cues",
        "span_ms",
        "speech_ms",
        F.expr(
            "CASE WHEN span_ms > 0 THEN (1000 * speech_ms) div span_ms"
            " ELSE 0 END"
        ).alias("speech_permille"),
        "n_chars",
        "n_tokens",
        F.expr(
            "CASE WHEN speech_ms > 0 THEN (n_tokens * 60000) div speech_ms"
            " ELSE 0 END"
        ).alias("tokens_per_min"),
    )
