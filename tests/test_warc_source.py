"""WARC web-archive ingestion (sources/warc.py).

The invariant: a directory of real .warc/.warc.gz archives ingests into
one capture row per HTTP response — HTML payloads charset-decoded into
``raw_html`` (WHATWG precedence: BOM > HTTP charset > meta prescan),
every payload carrying sha256-of-bytes identity, malformed records
quarantined individually — and extraction over ``warc_documents`` is
IDENTICAL to extraction over an in-memory table of the same markup.
"""

import gzip
import hashlib
import re
import zlib

import pytest

from docproc_spark.sources.warc import (
    WarcFormatError,
    decode_http_html,
    gunzip_members,
    iter_warc_records,
    parse_http_response,
    warc_record_rows,
)

HTML = (
    b"<html><body><article><h1>Archive title</h1>"
    b"<p>This captured paragraph is comfortably long enough to be kept "
    b"by the density stripper.</p></article></body></html>"
)


def warc_record(
    rtype: str,
    block: bytes,
    url: str | None = None,
    rid: str | None = None,
    extra: dict | None = None,
) -> bytes:
    headers = [f"WARC-Type: {rtype}", f"Content-Length: {len(block)}"]
    if url:
        headers.append(f"WARC-Target-URI: {url}")
    if rid:
        headers.append(f"WARC-Record-ID: <{rid}>")
    headers.append("WARC-Date: 2026-08-18T00:00:00Z")
    for k, v in (extra or {}).items():
        headers.append(f"{k}: {v}")
    head = "WARC/1.0\r\n" + "\r\n".join(headers) + "\r\n\r\n"
    return head.encode("latin-1") + block + b"\r\n\r\n"


def http_response(
    body: bytes,
    status: int = 200,
    ctype: str = "text/html",
    extra_headers: tuple[tuple[str, str], ...] = (),
) -> bytes:
    lines = [f"HTTP/1.1 {status} X", f"Content-Type: {ctype}",
             f"Content-Length: {len(body)}"]
    lines += [f"{k}: {v}" for k, v in extra_headers]
    return ("\r\n".join(lines) + "\r\n\r\n").encode("latin-1") + body


def simple_archive() -> bytes:
    recs = [
        warc_record("warcinfo", b"software: test\r\n"),
        warc_record(
            "response", http_response(HTML), url="https://ex.com/a",
            rid="urn:uuid:aaaa",
        ),
        warc_record(
            "response",
            http_response(b"\xff\xd8jpegish bytes", ctype="image/jpeg"),
            url="https://ex.com/logo.jpg", rid="urn:uuid:bbbb",
        ),
    ]
    return b"".join(recs)


class TestRecordParsing:
    def test_plain_and_member_gzip_parse_identically(self):
        data = simple_archive()
        per_member = b"".join(
            gzip.compress(r) for r in [
                warc_record("warcinfo", b"software: test\r\n"),
                warc_record("response", http_response(HTML),
                            url="https://ex.com/a", rid="urn:uuid:aaaa"),
                warc_record("response",
                            http_response(b"\xff\xd8jpegish bytes",
                                          ctype="image/jpeg"),
                            url="https://ex.com/logo.jpg",
                            rid="urn:uuid:bbbb"),
            ]
        )
        one_big = gzip.compress(data)
        plain = list(iter_warc_records(data))
        assert [r["headers"]["warc-type"] for r in plain] == [
            "warcinfo", "response", "response"
        ]
        for variant in (per_member, one_big):
            got = list(iter_warc_records(variant))
            assert [
                (r["headers"]["warc-type"], r["block"]) for r in got
            ] == [(r["headers"]["warc-type"], r["block"]) for r in plain]

    def test_truncated_gzip_raises(self):
        with pytest.raises(WarcFormatError):
            gunzip_members(gzip.compress(simple_archive())[:-8])

    def test_malformed_record_resyncs_to_next(self):
        bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"  # no content-length
        data = bad + warc_record("response", http_response(HTML),
                                 url="https://ex.com/x")
        got = list(iter_warc_records(data))
        errs = [r for r in got if "parse_error" in r]
        ok = [r for r in got if "headers" in r]
        assert len(errs) == 1 and "KeyError" in errs[0]["parse_error"]
        assert len(ok) == 1 and ok[0]["headers"]["warc-target-uri"] == "https://ex.com/x"

    def test_http_chunked_and_gzip_content_coding(self):
        payload = HTML
        chunked = b"".join(
            b"%x\r\n%s\r\n" % (len(c), c)
            for c in [payload[:40], payload[40:]]
        ) + b"0\r\n\r\n"
        status, hh, body = parse_http_response(
            http_response(chunked,
                          extra_headers=(("Transfer-Encoding", "chunked"),))
        )
        assert (status, body) == (200, payload)

        gz = gzip.compress(payload)
        _, _, body = parse_http_response(
            http_response(gz, extra_headers=(("Content-Encoding", "gzip"),))
        )
        assert body == payload
        # raw-deflate server quirk
        co = zlib.compressobj(wbits=-15)
        raw = co.compress(payload) + co.flush()
        _, _, body = parse_http_response(
            http_response(raw, extra_headers=(("Content-Encoding", "deflate"),))
        )
        assert body == payload


class TestCharsetPrecedence:
    def test_http_label_beats_meta(self):
        body = b"<meta charset='utf-8'><p>caf\xe9</p>"
        assert "café" in decode_http_html(body, "text/html; charset=iso-8859-1")

    def test_bom_beats_http_label(self):
        body = "﻿<p>café</p>".encode("utf-8")
        assert "café" in decode_http_html(body, "text/html; charset=iso-8859-1")

    def test_utf16_http_label_without_bom_is_ignored(self):
        body = b"<p>plain ascii content</p>"
        assert "plain ascii" in decode_http_html(body, "text/html; charset=utf-16")

    def test_unknown_label_falls_through_to_sniff(self):
        body = "<p>résumé</p>".encode("utf-8")
        assert "résumé" in decode_http_html(body, "text/html; charset=bogus-enc")


class TestRowMapping:
    def test_rows_capture_identity_and_html(self):
        rows = warc_record_rows(simple_archive(), "crawl/a.warc")
        # warcinfo drops; two captures remain
        assert [r["warc_type"] for r in rows] == ["response", "response"]
        html_row, jpg_row = rows
        assert html_row["doc_id"] == "urn:uuid:aaaa"
        assert html_row["url"] == "https://ex.com/a"
        assert html_row["http_status"] == 200
        assert "Archive title" in html_row["raw_html"]
        assert html_row["payload_sha256"] == hashlib.sha256(HTML).hexdigest()
        assert jpg_row["raw_html"] is None
        assert jpg_row["content_type"] == "image/jpeg"
        assert jpg_row["payload_sha256"] == hashlib.sha256(
            b"\xff\xd8jpegish bytes"
        ).hexdigest()

    def test_whole_archive_failure_quarantines_one_row(self):
        rows = warc_record_rows(gzip.compress(b"x")[:-4], "bad.warc.gz")
        assert len(rows) == 1 and rows[0]["parse_error"]


class TestSparkIngestion:
    def test_load_warc_and_extract_parity(self, spark, tmp_path):
        from docproc_spark.facade import DocprocSpark
        from docproc_spark.schema import DOCUMENTS_SCHEMA

        d = tmp_path / "crawl"
        d.mkdir()
        (d / "a.warc").write_bytes(simple_archive())
        (d / "b.warc.gz").write_bytes(
            gzip.compress(
                warc_record(
                    "response",
                    http_response(HTML.replace(b"Archive title", b"Second doc")),
                    url="https://ex.com/b", rid="urn:uuid:cccc",
                )
            )
        )

        eng = DocprocSpark(spark=spark)
        captures = {r["doc_id"]: r for r in eng.load_warc(str(d)).collect()}
        assert set(captures) == {"urn:uuid:aaaa", "urn:uuid:bbbb", "urn:uuid:cccc"}
        assert captures["urn:uuid:cccc"]["source_file"] == "b.warc.gz"

        via_warc = {
            r["doc_id"]: r
            for r in eng.extract_table(eng.warc_documents(str(d))).collect()
        }
        assert set(via_warc) == {"urn:uuid:aaaa", "urn:uuid:cccc"}  # jpeg dropped
        manual = spark.createDataFrame(
            [
                ("urn:uuid:aaaa", "html", HTML.decode(), None),
                ("urn:uuid:cccc", "html",
                 HTML.replace(b"Archive title", b"Second doc").decode(), None),
            ],
            schema=DOCUMENTS_SCHEMA,
        )
        via_memory = {
            r["doc_id"]: r for r in eng.extract_table(manual).collect()
        }
        for did in via_warc:
            assert via_warc[did]["markdown"] == via_memory[did]["markdown"]
            assert [tuple(s) for s in via_warc[did]["spans"]] == [
                tuple(s) for s in via_memory[did]["spans"]
            ]

    def test_load_warc_plan_is_single_scan_no_shuffle(self, spark, tmp_path):
        from docproc_spark.facade import DocprocSpark
        from tests.test_plans import _plan, plan_summary

        d = tmp_path / "crawl"
        d.mkdir()
        (d / "a.warc").write_bytes(simple_archive())
        eng = DocprocSpark(spark=spark)
        out = eng.load_warc(str(d))
        s = plan_summary(out)
        plan = _plan(out)
        # plan_summary's "scans" counts parquet scans only; binaryFile
        # scans render as their own node
        assert len(re.findall(r"Scan binaryFile", plan)) == 1
        assert s["exchanges"] == 0, "WARC ingestion must not shuffle"


def test_warc_parser_never_hangs_or_crashes_on_mutations():
    """Robustness contract: arbitrary corruption of a valid archive must
    yield rows (possibly quarantine rows) — never hang, never raise out
    of warc_record_rows, never corrupt the process. Deterministic
    mutation fuzz over BOTH spellings (plain + per-member gzip)."""
    import random
    import time

    bases = [
        bytearray(simple_archive()),
        bytearray(
            b"".join(
                gzip.compress(r)
                for r in [
                    warc_record("warcinfo", b"software: test\r\n"),
                    warc_record("response", http_response(HTML),
                                url="https://ex.com/a", rid="urn:uuid:aaaa"),
                ]
            )
        ),
    ]
    rng = random.Random(4321)
    t0 = time.time()
    for i in range(120):
        data = bytearray(bases[i % len(bases)])
        for _ in range(rng.randint(1, 12)):
            op = rng.randint(0, 2)
            pos = rng.randrange(len(data))
            if op == 0:
                data[pos] = rng.randrange(256)
            elif op == 1:
                del data[pos : pos + rng.randint(1, 40)]
            else:
                data[pos:pos] = bytes(
                    rng.randrange(256) for _ in range(rng.randint(1, 20))
                )
        rows = warc_record_rows(bytes(data), f"fuzz_{i}.warc")
        assert isinstance(rows, list)
    assert time.time() - t0 < 30, "mutation fuzz too slow on garbage input"


def test_many_binary_records_parse_in_linear_time():
    """Quadratic guard: a CRLF archive of many binary captures whose
    bodies contain no "\\n\\n" must parse linearly — the bare-LF header
    fallback search is bounded by the CRLF hit, never scanning ahead
    into megabytes of payload per record."""
    import time

    body = bytes(range(1, 128)) * 400  # ~50 KB, no 0x0A pairs
    rec = warc_record(
        "response",
        http_response(body, ctype="application/octet-stream"),
        url="https://ex.com/bin",
    )
    data = rec * 2000  # ~100 MB total
    t0 = time.time()
    rows = warc_record_rows(data, "bin.warc")
    took = time.time() - t0
    assert len(rows) == 2000
    assert all(r["parse_error"] is None for r in rows)
    assert took < 20, f"parse took {took:.1f}s — header search may be quadratic"


class TestIngestWarc:
    def test_ingest_warc_checkpoint_split_and_resume(self, spark, tmp_path):
        """ingest_warc: one parse pass checkpointed to parquet; documents
        and rest are exact complements of the capture table; the
        documents scan composes with the lineage-resumable extraction
        path (crash after one bucket → resume finishes the rest, output
        equal to a straight run)."""
        from docproc_spark.facade import DocprocSpark
        from docproc_spark.sources.lineage import run_with_lineage

        d = tmp_path / "crawl"
        d.mkdir()
        (d / "a.warc").write_bytes(simple_archive())
        (d / "b.warc.gz").write_bytes(
            gzip.compress(
                warc_record(
                    "response",
                    http_response(HTML.replace(b"Archive title", b"Second doc")),
                    url="https://ex.com/b", rid="urn:uuid:cccc",
                )
            )
            + gzip.compress(
                warc_record(
                    "response",
                    http_response(b"gone", status=404),
                    url="https://ex.com/dead", rid="urn:uuid:dddd",
                )
            )
        )

        eng = DocprocSpark(spark=spark)
        docs, rest = eng.ingest_warc(str(d), str(tmp_path / "captures"))
        doc_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
        rest_ids = {r["doc_id"] for r in rest.select("doc_id").collect()}
        assert doc_ids == {"urn:uuid:aaaa", "urn:uuid:cccc"}
        # complement: jpeg capture + 404 html; nothing lost, no overlap
        assert rest_ids == {"urn:uuid:bbbb", "urn:uuid:dddd"}

        # resumable extraction over the checkpointed captures
        out, lineage = str(tmp_path / "out"), str(tmp_path / "lineage")
        with pytest.raises(RuntimeError):
            run_with_lineage(
                docs, out, lineage, eng.extract_table, n_parts=2, fail_after=1
            )
        done_second = run_with_lineage(
            docs, out, lineage, eng.extract_table, n_parts=2
        )
        assert len(done_second) == 1  # only the un-checkpointed bucket reran
        got = {
            r["doc_id"]: r["markdown"]
            for r in spark.read.parquet(out).collect()
        }
        want = {
            r["doc_id"]: r["markdown"]
            for r in eng.extract_table(docs).collect()
        }
        assert got == want and set(got) == doc_ids


def test_warc_roundtrip_hypothesis():
    """Property: any list of records built with valid framing parses back
    to exactly its headers and blocks — binary blocks, LF-pair payloads,
    WARC magic inside payloads, empty blocks, gzip spelling."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    header_val = st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        min_size=0, max_size=30,
    ).map(str.strip)
    record = st.tuples(
        st.sampled_from(["response", "metadata", "request", "conversion"]),
        st.binary(min_size=0, max_size=400),
        header_val,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(record, min_size=1, max_size=8), st.booleans())
    def check(recs, gz):
        raw = b"".join(
            warc_record(rt, block, url=u or None) for rt, block, u in recs
        )
        data = gzip.compress(raw) if gz else raw
        got = list(iter_warc_records(data))
        assert [r.get("parse_error") for r in got] == [None] * len(recs)
        assert [(r["headers"]["warc-type"], r["block"]) for r in got] == [
            (rt, block) for rt, block, _ in recs
        ]

    check()


class TestWetExport:
    """export_wet (sources/writers.py) round-trips through this engine's
    own WARC parser: conversion records, octet-correct Content-Length,
    deterministic record ids, multi-shard output."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [("d1", "plain text", "http://a.com/p1"),
             ("d2", "unicode: café — 30°", "http://b.com/x"),
             ("d3", None, None),  # NULL text -> empty payload
             ("d4", "ends with newline\n", "http://c.com/y")],
            ["doc_id", "markdown", "url"],
        )

    def test_roundtrip_through_own_parser(self, spark, tmp_path):
        import glob

        from docproc_spark.sources.warc import warc_record_rows
        from docproc_spark.sources.writers import export_wet

        out = str(tmp_path / "wet")
        export_wet(self._docs(spark), out, url_col="url")
        data = b"".join(
            open(p, "rb").read()
            for p in sorted(glob.glob(f"{out}/part-*"))
        )
        rows = warc_record_rows(data, "wet")
        assert [r["parse_error"] for r in rows] == [None] * 4
        assert all(r["warc_type"] == "conversion" for r in rows)
        assert all(r["content_type"] == "text/plain" for r in rows)
        by_url = {r["url"]: r for r in rows}
        # octet length, not character length (café/— are multi-byte)
        exp = "unicode: café — 30°".encode()
        assert by_url["http://b.com/x"]["payload_len"] == len(exp)
        assert (by_url["http://b.com/x"]["payload_sha256"]
                == hashlib.sha256(exp).hexdigest())
        assert by_url[None]["payload_len"] == 0  # NULL text kept, empty
        # trailing-newline payload survives record framing exactly
        assert (by_url["http://c.com/y"]["payload_sha256"]
                == hashlib.sha256(b"ends with newline\n").hexdigest())
        assert all(r["fetch_time"] == "2024-01-01T00:00:00Z" for r in rows)

    def test_record_ids_deterministic_across_exports(self, spark, tmp_path):
        import glob

        from docproc_spark.sources.warc import warc_record_rows
        from docproc_spark.sources.writers import export_wet

        docs = self._docs(spark)
        ids = []
        for name in ("w1", "w2"):
            out = str(tmp_path / name)
            export_wet(docs, out, url_col="url")
            data = b"".join(
                open(p, "rb").read()
                for p in sorted(glob.glob(f"{out}/part-*"))
            )
            rows = warc_record_rows(data, name)
            ids.append(sorted(r["doc_id"] for r in rows))
        assert ids[0] == ids[1]
        assert all(i.startswith("urn:uuid:") for i in ids[0])
        assert len(set(ids[0])) == 4  # distinct per document

    def test_multi_partition_shards_each_parse(self, spark, tmp_path):
        import glob

        from docproc_spark.sources.warc import warc_record_rows
        from docproc_spark.sources.writers import export_wet

        docs = spark.range(50).selectExpr(
            "cast(id as string) AS doc_id",
            "repeat('x', cast(id as int)) AS markdown",
        ).repartition(4)
        out = str(tmp_path / "sharded")
        export_wet(docs, out)
        parts = sorted(glob.glob(f"{out}/part-*"))
        assert len(parts) == 4  # one shard per partition, executor-written
        total = 0
        for p in parts:
            rows = warc_record_rows(open(p, "rb").read(), p)
            assert all(r["parse_error"] is None for r in rows)
            total += len(rows)
        assert total == 50
