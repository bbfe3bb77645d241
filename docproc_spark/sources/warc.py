"""WARC (ISO 28500) web-archive ingestion — the format 100-TB web corpora
actually arrive in (Common Crawl ships ~64k ~1 GB ``.warc.gz`` files per
crawl).

The reference has no web ingestion at all (its loader registry is
pdf/docx/pptx/xlsx — /root/reference/docproc/doc/loaders/factory.py:12-18);
this source exists because the engine's north rule makes interleaved web
documents a first-class input. It closes the gap between "a directory of
.html files" (sources/html.py) and the real thing: archive files holding
millions of HTTP captures.

Format notes (all from the public ISO 28500 spec / Common Crawl docs):

  - a WARC file is a concatenation of records; ``.warc.gz`` compresses each
    record as an independent gzip member (so archives are splittable by
    member boundary). Both one-big-gzip and member-per-record decompress
    identically through a multi-member zlib loop.
  - a record is ``WARC/1.x\\r\\n``, header lines, blank line, then exactly
    ``Content-Length`` block bytes, then ``\\r\\n\\r\\n``.
  - a ``response`` record's block is a raw HTTP response: status line,
    headers, body. Bodies may be chunked (Transfer-Encoding) and/or
    compressed (Content-Encoding gzip/deflate) — both are undone here.

Charset precedence for HTML payloads follows WHATWG: BOM beats the HTTP
``charset=`` parameter beats the in-document meta prescan — the HTTP label
is resolved through the same WHATWG label table as sources/html.py, and a
UTF-16/32 HTTP label is honored only when a BOM corroborates it (a bare
label over ASCII-compatible bytes is the same lie the meta rule guards).

Spark-first shape: one distributed ``binaryFile`` scan (one row per WARC
file), one ``mapInPandas`` crossing that parses records and yields one row
per capture — no shuffle, no driver-side work, linear fan-out with
executors. Memory bound per task = one DECOMPRESSED archive (Common Crawl
~1 GB gz → ~4-5 GB raw); at cluster scale schedule one file per task and
size executor memory for it. Malformed records quarantine individually
(``parse_error`` row + resync to the next ``WARC/`` magic) — one bad
capture must not sink a million-record archive.

Non-HTML captures (images, PDFs riding HTTP) keep their payload identity
as ``payload_sha256`` — the same sha256-of-bytes media identity raw-bytes
PPTX/PDF ingestion emits — so cross-archive media dedupe can run without
retaining payload bytes in the row.
"""

from __future__ import annotations

import codecs
import hashlib
import zlib
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from docproc_spark.kernels.mediainfo import sniff_media_header
from docproc_spark.sources.html import _CP1252_LABELS, sniff_charset

# codec-free header facts of a NON-HTML payload (kernels/mediainfo),
# sniffed while the bytes are in hand — the capture row itself keeps
# only identity + metadata, never the payload
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("media_kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)

WARC_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source_file", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("fetch_time", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("payload_len", T.LongType(), True),
        T.StructField("payload_sha256", T.StringType(), True),
        T.StructField("media_meta", MEDIA_META_TYPE, True),
        T.StructField("raw_html", T.StringType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)

_HTML_TYPES = ("text/html", "application/xhtml+xml")


class WarcFormatError(ValueError):
    pass


def gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; plain bytes pass
    through untouched. Trailing garbage after the last member raises —
    a truncated download should quarantine loudly, not parse half."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    out = []
    rest = data
    while rest.startswith(b"\x1f\x8b"):
        d = zlib.decompressobj(wbits=47)  # 47 = auto gzip header
        out.append(d.decompress(rest))
        if not d.eof:
            raise WarcFormatError("truncated gzip member")
        rest = d.unused_data
    if rest.strip(b"\x00"):
        raise WarcFormatError("trailing non-gzip bytes after gzip members")
    return b"".join(out)


def _parse_headers(raw: bytes) -> dict[str, str]:
    """Header block (no leading request/status/version line handling) →
    lowercase-keyed dict. Folded continuation lines (obs-fold) append."""
    headers: dict[str, str] = {}
    last = None
    for line in raw.split(b"\n"):
        line = line.rstrip(b"\r")
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            continue  # tolerate junk header lines
        last = name.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")
    return headers


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield {"headers": dict, "block": bytes} per record, or
    {"parse_error": str} for an unrecoverable region (then resyncs to the
    next ``WARC/`` magic so later records still parse)."""
    raw = gunzip_members(data)
    pos = 0
    n = len(raw)
    while pos < n:
        # lenient inter-record whitespace
        while pos < n and raw[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not raw.startswith(b"WARC/", pos):
            nxt = raw.find(b"\nWARC/", pos)
            yield {"parse_error": f"no WARC magic at byte {pos}"}
            if nxt == -1:
                return
            pos = nxt + 1
            continue
        hdr_end = raw.find(b"\r\n\r\n", pos)
        # some writers emit bare-LF header blocks. BOUND the LF search by
        # the CRLF hit: unbounded, a CRLF archive whose record bodies
        # lack "\n\n" (binary payloads) would rescan to the next distant
        # occurrence on EVERY record — O(n²) on a 100k-record archive.
        # (A CRLF header region itself can never contain "\n\n".)
        if hdr_end == -1:
            hdr_end_lf = raw.find(b"\n\n", pos)
        else:
            hdr_end_lf = raw.find(b"\n\n", pos, hdr_end)
        if hdr_end == -1 or (hdr_end_lf != -1 and hdr_end_lf < hdr_end):
            hdr_end, skip = hdr_end_lf, 2
        else:
            skip = 4
        if hdr_end == -1:
            yield {"parse_error": f"unterminated record header at byte {pos}"}
            return
        version_end = raw.find(b"\n", pos)
        headers = _parse_headers(raw[version_end + 1 : hdr_end])
        body_start = hdr_end + skip
        try:
            length = int(headers["content-length"])
            if length < 0 or body_start + length > n:
                raise ValueError(f"bad content-length {length}")
        except (KeyError, ValueError) as e:
            yield {"parse_error": f"{type(e).__name__}: {e}"}
            # body_start sits right AFTER the header terminator, whose
            # last byte is the \n our magic search anchors on — start one
            # byte back or a record beginning exactly at body_start is lost
            nxt = raw.find(b"\nWARC/", max(pos, body_start - 1))
            if nxt == -1:
                return
            pos = nxt + 1
            continue
        yield {"headers": headers, "block": raw[body_start : body_start + length]}
        pos = body_start + length


def _dechunk(body: bytes) -> bytes:
    """Undo HTTP/1.1 chunked transfer coding."""
    out = []
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol == -1:
            raise WarcFormatError("unterminated chunk size line")
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        size = int(size_token, 16)
        if size == 0:
            return b"".join(out)
        start = eol + 2
        if start + size > len(body):
            raise WarcFormatError("chunk overruns body")
        out.append(body[start : start + size])
        pos = start + size + 2  # skip chunk-data CRLF


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """Raw HTTP response block → (status, lowercase headers, decoded body).

    Undoes chunked transfer coding and gzip/deflate content coding, so the
    returned body is the actual representation bytes.
    """
    sep = block.find(b"\r\n\r\n")
    skip = 4
    # bounded like iter_warc_records' header search (same quadratic trap)
    sep_lf = block.find(b"\n\n") if sep == -1 else block.find(b"\n\n", 0, sep)
    if sep == -1 or (sep_lf != -1 and sep_lf < sep):
        sep, skip = sep_lf, 2
    if sep == -1:
        raise WarcFormatError("no header/body separator in HTTP block")
    head, body = block[:sep], block[sep + skip :]
    line_end = head.find(b"\n")
    status_line = head[: line_end if line_end != -1 else len(head)].rstrip(b"\r")
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise WarcFormatError(f"bad status line {status_line[:40]!r}")
    status = int(parts[1])
    headers = _parse_headers(head[line_end + 1 :]) if line_end != -1 else {}
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    coding = headers.get("content-encoding", "").strip().lower()
    if coding in ("gzip", "x-gzip"):
        body = zlib.decompress(body, wbits=47)
    elif coding == "deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:  # raw-deflate servers (the classic IIS quirk)
            body = zlib.decompress(body, wbits=-15)
    return status, headers, body


def _http_charset(content_type: str) -> str | None:
    for param in content_type.split(";")[1:]:
        name, sep, value = param.partition("=")
        if sep and name.strip().lower() == "charset":
            return value.strip().strip("\"'").lower() or None
    return None


def decode_http_html(body: bytes, content_type: str) -> str:
    """WHATWG precedence: BOM > HTTP charset label > meta prescan cascade.

    The HTTP label resolves through the same WHATWG label rules as the
    meta sniff; UTF-16/32 labels are honored only with a corroborating
    BOM (sniff_charset's BOM branch already wins in that case).
    """
    has_bom = body.startswith((b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff"))
    label = _http_charset(content_type or "")
    if label and not has_bom:
        if label in _CP1252_LABELS or label == "x-user-defined":
            return body.decode("cp1252", "replace")
        try:
            info = codecs.lookup(label)
            if getattr(info, "_is_text_encoding", True) and not info.name.startswith(
                ("utf-16", "utf-32")
            ):
                return body.decode(label, "replace")
        except LookupError:
            pass  # unknown transport label: fall through to the sniff
    codec, errors = sniff_charset(body)
    return body.decode(codec, errors).lstrip("﻿")


def iter_capture_rows(data: bytes, source_file: str) -> Iterator[dict]:
    """Captures of one WARC archive as WARC_OUT_SCHEMA dicts, streamed —
    the consumer decides how much to hold (load_warc yields bounded
    chunks; peak memory stays decompressed-archive + one chunk)."""
    n_out = 0

    def base(i: int) -> dict:
        return {
            "doc_id": f"{source_file}#{i}",
            "source_file": source_file,
            "warc_type": None,
            "url": None,
            "fetch_time": None,
            "http_status": None,
            "content_type": None,
            "payload_len": None,
            "payload_sha256": None,
            "media_meta": None,
            "raw_html": None,
            "parse_error": None,
        }

    try:
        records = iter_warc_records(data)
        for i, rec in enumerate(records):
            row = base(i)
            if "parse_error" in rec:
                row["parse_error"] = rec["parse_error"]
                n_out += 1
                yield row
                continue
            h = rec["headers"]
            wtype = h.get("warc-type", "").lower() or None
            row["warc_type"] = wtype
            row["url"] = h.get("warc-target-uri")
            row["fetch_time"] = h.get("warc-date")
            rid = h.get("warc-record-id")
            if rid:
                row["doc_id"] = rid.strip("<>")
            if wtype not in ("response", "conversion"):
                continue  # warcinfo/request/metadata: no capture payload
            try:
                if wtype == "response":
                    status, hh, body = parse_http_response(rec["block"])
                    row["http_status"] = status
                    ctype = hh.get("content-type", "")
                else:  # conversion records carry the payload directly
                    body = rec["block"]
                    ctype = h.get("content-type", "")
                row["content_type"] = ctype.split(";")[0].strip().lower() or None
                row["payload_len"] = len(body)
                row["payload_sha256"] = hashlib.sha256(body).hexdigest()
                if row["content_type"] in _HTML_TYPES:
                    row["raw_html"] = decode_http_html(body, ctype)
                else:
                    # media facts while the bytes are in hand — a later
                    # pass would have to re-read the whole archive
                    meta = sniff_media_header(body)
                    if meta["format"] is not None:
                        row["media_meta"] = {
                            k: meta[k]
                            for k in (
                                "format", "media_kind", "width", "height",
                                "duration_ms", "sample_rate", "channels",
                            )
                        }
            except Exception as e:  # noqa: BLE001 — per-record quarantine
                row["parse_error"] = f"{type(e).__name__}: {e}"
            n_out += 1
            yield row
    except Exception as e:  # noqa: BLE001 — whole-archive failure (bad gzip)
        row = base(n_out)
        row["parse_error"] = f"{type(e).__name__}: {e}"
        yield row


def warc_record_rows(data: bytes, source_file: str) -> list[dict]:
    """All captures of one WARC archive, materialized (test/driver aid)."""
    return list(iter_capture_rows(data, source_file))


def load_warc(
    files: DataFrame,
    *,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, content:binary) per archive → one row per capture.

    One Arrow-batched mapInPandas crossing over the binaryFile scan; zero
    shuffle. ``doc_id`` in = the archive's id (relative path); out = the
    capture's WARC-Record-ID (falling back to ``archive#index``).
    """
    import pandas as pd

    id_c, b_c = doc_id_col, content_col

    def gen(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in WARC_OUT_SCHEMA]
        for pdf in batches:
            for fid, blob in zip(pdf[id_c], pdf[b_c]):
                # chunked yields over the streaming parser: a
                # million-capture archive must never materialize as one
                # pandas frame / Arrow batch
                chunk: list[dict] = []
                for row in iter_capture_rows(bytes(blob), str(fid)):
                    chunk.append(row)
                    if len(chunk) >= 2048:
                        yield pd.DataFrame(chunk, columns=cols)
                        chunk = []
                if chunk:
                    yield pd.DataFrame(chunk, columns=cols)

    return files.mapInPandas(gen, schema=WARC_OUT_SCHEMA)


def extractable_capture_col():
    """The keep predicate splitting a capture table into extract-ready
    HTML documents vs everything else (quarantine, non-HTML payloads,
    error statuses). One definition so documents/rest partitions are
    exact complements."""
    from pyspark.sql import functions as F

    return (
        F.col("parse_error").isNull()
        & F.col("raw_html").isNotNull()
        & (F.length("raw_html") > 0)
        & (F.coalesce(F.col("http_status"), F.lit(200)) < 400)
    )


def warc_to_documents(captures: DataFrame) -> DataFrame:
    """WARC capture rows → the shared document table (OOXML_OUT_SCHEMA),
    ready for ``extract_table``: HTML captures (status<400, non-empty
    markup) become doc_type='html' rows; everything else is dropped here
    (media identity lives in the capture table's payload_sha256)."""
    from pyspark.sql import functions as F

    from docproc_spark.sources.ooxml import OOXML_OUT_SCHEMA

    keep = extractable_capture_col()
    out = captures.filter(keep).select(
        F.col("doc_id"),
        F.lit("html").alias("doc_type"),
        F.col("raw_html"),
        F.lit(None).cast(OOXML_OUT_SCHEMA["spans"].dataType).alias("spans"),
        F.lit(0).cast("long").alias("n_spans"),
        F.lit(None).cast("array<string>").alias("sheet_names"),
        F.lit(None).cast("string").alias("parse_error"),
    )
    return out
