"""Facade / config / job / writer tests (mirrors the reference's
tests/test_facade.py + test_config.py + test_cli.py shapes)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from docproc_spark import corpus
from docproc_spark.config import EngineConfig, parse_config
from docproc_spark.facade import DocprocSpark


def _docs(spark, n=30, seed=5):
    return corpus.corpus_df(spark, n, seed=seed, mega_spans=100, partitions=2)


class TestConfig:
    def test_defaults(self):
        cfg = EngineConfig()
        assert cfg.ingest.drop_exact_duplicates
        assert cfg.drop_kinds == frozenset({"thank_you", "questions", "blank"})
        assert cfg.ingest.use_vision is False

    def test_parse_is_pure(self, tmp_path):
        p = tmp_path / "a.yml"
        p.write_text("ingest:\n  drop_boilerplate: false\n")
        a = parse_config(str(p))
        b = parse_config(None)
        assert a.ingest.drop_boilerplate is False
        assert b.ingest.drop_boilerplate is True  # no global mutation
        assert a.drop_kinds == frozenset()

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("DOCPROC_SPARK_SHUFFLE_PARTITIONS", "7")
        cfg = parse_config(None)
        assert cfg.spark.shuffle_partitions == 7

    def test_rag_schema_defaults(self):
        """Reference parity: rag backend / top_k=5 / chunk_size=512
        defaults (docproc/config/schema.py:72-80, mirrored by reference
        tests/test_config.py:8-30)."""
        cfg = EngineConfig()
        assert cfg.rag.backend in ("clara", "embedding")
        assert cfg.rag.top_k == 5
        assert cfg.rag.chunk_size == 512
        assert cfg.rag.namespace == "default"
        assert cfg.rag.persist_path is None

    def test_rag_from_file_and_env(self, tmp_path, monkeypatch):
        p = tmp_path / "r.yml"
        p.write_text("rag:\n  top_k: 9\n  backend: embedding\n")
        cfg = parse_config(str(p))
        assert cfg.rag.top_k == 9 and cfg.rag.chunk_size == 512
        monkeypatch.setenv("DOCPROC_SPARK_RAG_CHUNK_SIZE", "1024")
        cfg2 = parse_config(str(p))
        assert cfg2.rag.chunk_size == 1024


class TestFacade:
    def test_extract_table(self, spark):
        eng = DocprocSpark(spark=spark)
        res = eng.extract_table(_docs(spark))
        assert res.count() == 30
        assert set(res.columns) == {"doc_id", "markdown", "n_pages", "spans"}

    def test_extract_to_files_with_pages_prefix(self, spark, tmp_path):
        eng = DocprocSpark(spark=spark)
        out = str(tmp_path / "md")
        n = eng.extract_to_files(_docs(spark, n=10), out)
        assert n == 10
        files = sorted(os.listdir(out))
        assert len(files) == 10
        # hello_docx (idx 0..3) → "[Page 1]\nHello world" with PAGES prefix
        body = open(os.path.join(out, "doc_00000000.md")).read()
        assert body == "<!-- PAGES: 1 -->\n[Page 1]\nHello world"

    def test_boilerplate_toggle(self, spark, tmp_path):
        p = tmp_path / "cfg.yml"
        p.write_text("ingest:\n  drop_boilerplate: false\n")
        eng = DocprocSpark.from_config_path(str(p), spark=spark)
        # "Thank you!" survives when the drop is disabled
        import pandas as pd

        from docproc_spark.schema import DOCUMENTS_SCHEMA

        docs = spark.createDataFrame(
            pd.DataFrame(
                [
                    {
                        "doc_id": "d1",
                        "doc_type": "x",
                        "raw_html": None,
                        "spans": [
                            {"kind": "text", "text": "Thank you!", "media_ref": None,
                             "page": 0, "offset": 0}
                        ],
                    }
                ],
                columns=["doc_id", "doc_type", "raw_html", "spans"],
            ),
            schema=DOCUMENTS_SCHEMA,
        )
        res = eng.extract_table(docs).collect()[0]
        assert "Thank you!" in res["markdown"]


class TestJob:
    def test_job_main_resumable(self, spark, tmp_path):
        src = str(tmp_path / "in")
        corpus.corpus_df(spark, 20, seed=11, mega_spans=100, partitions=2).write.parquet(src)
        out = str(tmp_path / "out")
        lin = str(tmp_path / "lin")
        from docproc_spark.job import main

        rc = main(["--input", src, "--output", out, "--lineage", lin, "--n-parts", "3"])
        assert rc == 0
        assert spark.read.parquet(out).select("doc_id").distinct().count() == 20
        assert spark.read.parquet(lin).count() == 3


class TestWriters:
    def test_csv_newline_escape(self, spark, tmp_path):
        from docproc_spark.sources.writers import csv_escaped

        df = spark.createDataFrame([("a\nb", 1)], ["t", "n"])
        out = str(tmp_path / "csv")
        csv_escaped(df, out)
        back = spark.read.option("header", True).csv(out).collect()[0]
        assert back["t"] == r"a\nb"  # literal backslash-n, reference semantics

    def test_jsonl(self, spark, tmp_path):
        from docproc_spark.sources.writers import jsonl

        df = spark.createDataFrame([("x", 1), ("y", 2)], ["t", "n"])
        out = str(tmp_path / "jl")
        jsonl(df, out)
        lines = []
        for f in os.listdir(out):
            if f.endswith(".json"):
                lines += [json.loads(l) for l in open(os.path.join(out, f)) if l.strip()]
        assert sorted(l["t"] for l in lines) == ["x", "y"]


class TestQuarantine:
    def test_split_supported(self, spark):
        import pandas as pd

        from docproc_spark.schema import DOCUMENTS_SCHEMA

        docs = spark.createDataFrame(
            pd.DataFrame(
                [
                    {"doc_id": "ok", "doc_type": "pdf", "raw_html": None, "spans": []},
                    {"doc_id": "bad", "doc_type": "exe", "raw_html": None, "spans": []},
                    {"doc_id": "untyped", "doc_type": None, "raw_html": None, "spans": []},
                ],
                columns=["doc_id", "doc_type", "raw_html", "spans"],
            ),
            schema=DOCUMENTS_SCHEMA,
        )
        eng = DocprocSpark(spark=spark)
        ok, bad = eng.split_supported(docs)
        assert {r["doc_id"] for r in ok.collect()} == {"ok", "untyped"}
        assert {r["doc_id"] for r in bad.collect()} == {"bad"}


class TestProviders:
    def test_stub_provider_cached_and_deterministic(self):
        import pandas as pd

        from docproc_spark.providers import get_provider

        p1 = get_provider("stub")
        p2 = get_provider("stub")
        assert p1 is p2
        refs = pd.Series(["a" * 64])
        ctx = pd.Series(["Page 1, image 1."])
        assert list(p1.caption_batch(refs, ctx)) == [
            "Figure aaaaaaaaaaaa: Page 1, image 1."
        ]

    def test_http_provider_stubbed(self):
        import pandas as pd
        import pytest as _pytest

        from docproc_spark.providers import get_provider

        with _pytest.raises(NotImplementedError):
            get_provider("http").caption_batch(pd.Series(["x"]), pd.Series(["y"]))

    def test_unknown_provider(self):
        import pytest as _pytest

        from docproc_spark.providers import get_provider

        with _pytest.raises(ValueError, match="Unsupported provider"):
            get_provider("nope")


class TestVisionKernels:
    def test_strip_md_fences(self):
        import pandas as pd

        from docproc_spark.kernels.captions import strip_md_fences_series

        s = pd.Series(['```json\n{"a": 1}\n```', "plain", "```\nx\n```"])
        assert list(strip_md_fences_series(s)) == ['{"a": 1}', "plain", "x"]

    def test_strip_md_fences_trailing_prose_and_unfenced(self):
        """Reference parity (vision_llm.py:107-118): only in-block lines
        survive a fenced reply — trailing prose after the closing fence is
        dropped; replies not STARTING with ``` pass through untouched even
        if they contain fences mid-text."""
        import pandas as pd

        from docproc_spark.kernels.captions import strip_md_fences_series

        s = pd.Series(
            [
                '```json\n{"a": 1}\n```\nNote: done.',   # trailing prose dropped
                'prefix\n```\n{"b": 2}\n```',             # not fence-led: untouched
                "```json\n{\n  \"c\": 3\n}\n```",        # multi-line body kept
                None,
            ]
        )
        assert list(strip_md_fences_series(s)) == [
            '{"a": 1}',
            'prefix\n```\n{"b": 2}\n```',
            '{\n  "c": 3\n}',
            "",
        ]

    def test_flatten_extraction_field_order(self):
        from docproc_spark.kernels.captions import flatten_extraction

        d = {
            "text": "body",
            "equations": ["e=mc2", ""],
            "tables": "| a |",
            "figures_descriptions": ["fig one"],
            "data_points": {"k": 1},
        }
        assert flatten_extraction(d) == (
            "body\nEquations: e=mc2\n| a |\nFigures: fig one\nData: {'k': 1}"
        )
        assert flatten_extraction({}) == ""
        assert flatten_extraction({"text": "", "equations": None}) == ""


class TestSqliteSink:
    def test_roundtrip_types_and_batching(self, spark, tmp_path):
        """W4: reference type map (int/bool->INTEGER, float->REAL,
        str/complex->TEXT JSON), executemany batches, single-file mode."""
        import sqlite3

        from docproc_spark.sources.writers import write_sqlite

        rows = [
            (i, float(i) / 4, f"line\nbreak {i}", i % 2 == 0, [i, i + 1])
            for i in range(2500)  # > 2 executemany batches of 1000
        ]
        df = spark.createDataFrame(
            rows, "id long, score double, text string, flag boolean, arr array<int>"
        )
        db = str(tmp_path / "out.sqlite")
        write_sqlite(df, db, "results", batch_size=1000)

        con = sqlite3.connect(db)
        cols = {r[1]: r[2] for r in con.execute("PRAGMA table_info(results)")}
        assert cols == {
            "id": "INTEGER",
            "score": "REAL",
            "text": "TEXT",
            "flag": "INTEGER",
            "arr": "TEXT",
        }
        got = con.execute(
            "SELECT id, score, text, flag, arr FROM results ORDER BY id"
        ).fetchall()
        assert len(got) == 2500
        assert got[7] == (7, 1.75, "line\nbreak 7", 0, "[7,8]")
        con.close()

    def test_sharded_mode(self, spark, tmp_path):
        import glob
        import sqlite3

        from docproc_spark.sources.writers import write_sqlite

        df = spark.range(100).repartition(4)
        base = str(tmp_path / "shard.sqlite")
        write_sqlite(df, base, "t", single_file=False)
        shards = sorted(glob.glob(base + ".part-*"))
        assert len(shards) == 4
        total = 0
        for s in shards:
            con = sqlite3.connect(s)
            total += con.execute("SELECT count(*) FROM t").fetchone()[0]
            con.close()
        assert total == 100

    def test_markdown_export_distributed(self, spark, tmp_path):
        from docproc_spark.sources.writers import export_markdown_files_distributed

        df = spark.createDataFrame(
            [("a", "# A"), ("b", "# B"), ("c", None)], "doc_id string, markdown string"
        ).repartition(3)
        out = str(tmp_path / "md")
        export_markdown_files_distributed(df, out)
        assert (tmp_path / "md" / "a.md").read_text() == "# A"
        assert (tmp_path / "md" / "c.md").read_text() == ""


class TestLoadFiles:
    def test_directory_of_real_files_to_markdown(self, spark, tmp_path):
        """The reference CLI's file-in entry: a dir of real .pdf/.docx/
        .xlsx files ingests distributed (binaryFile + mapInPandas) and
        extracts end-to-end; unparseable files carry parse_error."""
        from docproc_spark.facade import DocprocSpark
        from tests.test_ooxml import make_docx, make_xlsx
        from tests.test_pdf_source import make_pdf

        d = tmp_path / "in"
        d.mkdir()
        (d / "a.pdf").write_bytes(make_pdf())
        (d / "b.docx").write_bytes(make_docx())
        (d / "c.xlsx").write_bytes(make_xlsx())
        (d / "broken.docx").write_bytes(b"not a zip")
        (d / "ignored.txt").write_bytes(b"skip me")

        eng = DocprocSpark(spark=spark)
        table = eng.load_files(str(d))
        rows = {r["doc_id"]: r for r in table.collect()}
        assert set(rows) == {"a.pdf", "b.docx", "c.xlsx", "broken.docx"}
        assert rows["broken.docx"]["parse_error"] is not None
        ok = table.filter("parse_error IS NULL").drop("sheet_names", "parse_error")
        res = {r["doc_id"]: r for r in eng.extract_table(ok).collect()}
        assert "Hello world" in res["b.docx"]["markdown"]
        assert res["a.pdf"]["n_pages"] == 2

    def test_xlsm_routes_to_xlsx_parser(self, spark, tmp_path):
        """Macro-enabled workbooks share the xlsx loader (reference
        factory.py:18: '.xlsm': XLSXLoader) — same zip+XML kernel here;
        the glob, the parser registry, and doc_type all accept it."""
        from docproc_spark.facade import DocprocSpark
        from tests.test_ooxml import make_xlsx

        d = tmp_path / "in"
        d.mkdir()
        (d / "macro.xlsm").write_bytes(make_xlsx())
        (d / "plain.xlsx").write_bytes(make_xlsx())

        eng = DocprocSpark(spark=spark)
        rows = {r["doc_id"]: r for r in eng.load_files(str(d)).collect()}
        assert set(rows) == {"macro.xlsm", "plain.xlsx"}
        m, p = rows["macro.xlsm"], rows["plain.xlsx"]
        assert m["parse_error"] is None and m["doc_type"] == "xlsm"
        assert [tuple(s) for s in m["spans"]] == [tuple(s) for s in p["spans"]]
        assert m["sheet_names"] == p["sheet_names"]

    def test_ingest_files_checkpoint_flow(self, spark, tmp_path):
        """ingest_files: parse once → parquet → scan-backed (documents,
        quarantine) split; extraction from the checkpoint matches the
        direct path, and the scan carries the ingest-time n_spans column
        the routing probe/pushdown need."""
        from docproc_spark.facade import DocprocSpark
        from tests.test_ooxml import make_docx
        from tests.test_pdf_source import make_pdf

        d = tmp_path / "in"
        d.mkdir()
        (d / "a.pdf").write_bytes(make_pdf())
        (d / "b.docx").write_bytes(make_docx())
        (d / "broken.docx").write_bytes(b"not a zip")

        eng = DocprocSpark(spark=spark)
        docs, quarantine = eng.ingest_files(str(d), str(tmp_path / "tbl"))
        assert {r["doc_id"] for r in quarantine.collect()} == {"broken.docx"}
        assert "n_spans" in docs.columns
        res = {
            r["doc_id"]: r
            for r in eng.extract_table(
                docs.drop("sheet_names", "parse_error")
            ).collect()
        }
        assert set(res) == {"a.pdf", "b.docx"}
        assert "Hello world" in res["b.docx"]["markdown"]

    def test_same_named_files_in_subdirs_do_not_collide(self, spark, tmp_path):
        """doc_id is the path RELATIVE to the ingest root: two files both
        named report.docx under different subdirectories must stay two
        distinct documents (doc_id is the unique key for dedupe/lineage/
        joins downstream)."""
        from docproc_spark.facade import DocprocSpark
        from tests.test_ooxml import make_docx

        d = tmp_path / "in"
        (d / "q1").mkdir(parents=True)
        (d / "q2").mkdir()
        (d / "q1" / "report.docx").write_bytes(make_docx())
        (d / "q2" / "report.docx").write_bytes(make_docx())

        eng = DocprocSpark(spark=spark)
        table = eng.load_files(str(d) + "/*")
        ids = {r["doc_id"] for r in table.select("doc_id").collect()}
        assert ids == {"q1/report.docx", "q2/report.docx"}

    def test_ingest_root_computation(self):
        """Root derivation behind relative doc_ids: scheme'd roots are
        kept verbatim (os.path.abspath would mangle s3a:// into a local
        path, silently reinstating the bare-name collision); globs
        anchor at the last separator before the first wildcard."""
        import os

        from docproc_spark.facade import _ingest_root

        assert _ingest_root("s3a://bucket/data") == ("s3a://bucket/data/", True)
        assert _ingest_root("s3a://bucket/data/*") == ("s3a://bucket/data/", True)
        assert _ingest_root("hdfs://nn:8020/corp/{a,b}") == (
            "hdfs://nn:8020/corp/",
            True,
        )
        assert _ingest_root("/tmp/in") == ("/tmp/in/", False)
        assert _ingest_root("/tmp/in/*.pdf") == ("/tmp/in/", False)
        assert _ingest_root("/tmp/in/q?/x") == ("/tmp/in/", False)
        rel_root, kept = _ingest_root("data")
        assert not kept and rel_root == os.path.abspath("data") + "/"


class TestCompletions:
    """Reference cli.py:94-112 parity: a completions subcommand emitting a
    sourceable script per shell (shtab-free; flags introspected from the
    real parser)."""

    def test_bash_script_covers_all_flags(self, capsys):
        from docproc_spark.job import build_parser, main, render_completions

        assert main(["--completions", "bash"]) == 0
        out = capsys.readouterr().out
        for a in build_parser()._actions:
            for opt in a.option_strings:
                if opt.startswith("--"):
                    assert opt in out, opt
        assert "complete -F" in out

    def test_zsh_script(self):
        from docproc_spark.job import build_parser, render_completions

        z = render_completions(build_parser(), "zsh")
        assert z.startswith("#compdef docproc-spark")
        assert "--input[" in z and "compdef" in z

    def test_bash_script_sources_cleanly(self, tmp_path):
        import subprocess

        from docproc_spark.job import build_parser, render_completions

        f = tmp_path / "comp.sh"
        f.write_text(render_completions(build_parser(), "bash"))
        r = subprocess.run(["bash", "-c", f"source {f} && echo OK"],
                           capture_output=True, text=True)
        assert r.returncode == 0 and "OK" in r.stdout


class TestBatchingVisionProvider:
    def test_no_progress_deadline_bounds_whole_call(self):
        """All workers hung: the call must end ~one timeout window after
        the last progress, NOT one fresh window per queued batch (6
        batches x 0.5s would be ~3s; the no-progress deadline makes it
        ~0.5s + poll ticks)."""
        import threading
        import time

        import pandas as pd

        from docproc_spark.providers import BatchingVisionProvider

        class HangingTransport:
            def describe_batch(self, items):
                threading.Event().wait()  # forever

        prov = BatchingVisionProvider(
            HangingTransport(), batch_size=1, max_parallel=1, timeout_s=0.5
        )
        refs = pd.Series([f"r{i}" for i in range(6)])
        ctx = pd.Series([""] * 6)
        t0 = time.monotonic()
        out = list(prov.caption_batch(refs, ctx))
        wall = time.monotonic() - t0
        assert out == [""] * 6
        assert wall < 2.5, f"call took {wall:.1f}s — per-slot windows re-armed"


    """Reference vision request shape (vision_llm.py:128-165,349-352,448-482)
    against the fake transport: batch size 5, wrong-length blanking,
    skip-and-log on failure/timeout."""

    def _series(self, n):
        import pandas as pd

        refs = pd.Series([f"ref{i:04d}" for i in range(n)])
        ctxs = pd.Series([f"Page {i // 5 + 1}, image {i % 5 + 1}." for i in range(n)])
        return refs, ctxs

    def test_batches_of_five(self):
        from docproc_spark.providers import BatchingVisionProvider, FakeVisionTransport

        t = FakeVisionTransport()
        p = BatchingVisionProvider(t)
        refs, ctxs = self._series(12)
        out = p.caption_batch(refs, ctxs)
        assert [len(b) for b in t.calls] == [5, 5, 2]
        assert len(out) == 12 and out[0] == f"desc({refs[0][:8]}|{ctxs[0]})"

    def test_wrong_length_reply_blanks_that_batch(self):
        from docproc_spark.providers import BatchingVisionProvider, FakeVisionTransport

        p = BatchingVisionProvider(FakeVisionTransport(wrong_length_on_call=2),
                                   max_parallel=1)
        refs, ctxs = self._series(12)
        out = p.caption_batch(refs, ctxs)
        assert list(out[5:10]) == [""] * 5          # batch 2 blanked
        assert all(v != "" for v in out[:5]) and all(v != "" for v in out[10:])

    def test_transport_failure_skips_batch_only(self):
        from docproc_spark.providers import BatchingVisionProvider, FakeVisionTransport

        p = BatchingVisionProvider(FakeVisionTransport(fail_on_call=1),
                                   max_parallel=1)
        refs, ctxs = self._series(7)
        out = p.caption_batch(refs, ctxs)
        assert list(out[:5]) == [""] * 5 and all(v != "" for v in out[5:])

    def test_timeout_skips_batch(self):
        from docproc_spark.providers import BatchingVisionProvider, FakeVisionTransport

        p = BatchingVisionProvider(FakeVisionTransport(delay_s=0.5),
                                   timeout_s=0.05, max_parallel=1)
        refs, ctxs = self._series(3)
        out = p.caption_batch(refs, ctxs)
        assert list(out) == [""] * 3


class TestInitConfig:
    def test_init_config_writes_loadable_yaml(self, tmp_path):
        from docproc_spark.config import parse_config
        from docproc_spark.job import main

        p = str(tmp_path / "cfg" / "engine.yml")
        rc = main(["--init-config", p])
        assert rc == 0 and os.path.exists(p)
        cfg = parse_config(p)
        assert cfg.ingest.drop_exact_duplicates is True
        assert cfg.spark.arrow_batch == 32768

    def test_missing_input_errors(self):
        import pytest as _pytest

        from docproc_spark.job import main

        with _pytest.raises(SystemExit) as exc:
            main([])
        assert exc.value.code != 0


class TestPollingOcrProvider:
    """Reference OCR orchestration shape (vision_llm.py:214-289) against
    the fake transport: <100-byte skip, poll-until-done, failure/timeout
    skip-and-log, line join, describe+tags combine."""

    def test_poll_until_done_and_line_join(self):
        import pandas as pd

        from docproc_spark.providers import FakeOcrTransport, PollingOcrProvider

        p = PollingOcrProvider(FakeOcrTransport(polls_until_done=3))
        blobs = pd.Series([b"x" * 200, b"y" * 300])
        out = p.ocr_batch(blobs)
        assert all("\n" in v and v.startswith("line1(") for v in out)

    def test_small_images_skipped(self):
        import pandas as pd

        from docproc_spark.providers import FakeOcrTransport, PollingOcrProvider

        t = FakeOcrTransport()
        p = PollingOcrProvider(t)
        out = p.ocr_batch(pd.Series([b"tiny", None, b"z" * 150]))
        assert list(out[:2]) == ["", ""] and out[2] != ""
        assert len(t.submitted) == 1  # skipped images never hit the API

    def test_failed_and_timedout_operations_blank(self):
        import hashlib

        import pandas as pd

        from docproc_spark.providers import FakeOcrTransport, PollingOcrProvider

        bad = b"b" * 200
        bad_op = hashlib.sha256(bad).hexdigest()[:16]
        p = PollingOcrProvider(FakeOcrTransport(fail_ids={bad_op}))
        assert list(p.ocr_batch(pd.Series([bad]))) == [""]
        slow = PollingOcrProvider(FakeOcrTransport(polls_until_done=99), max_polls=3)
        assert list(slow.ocr_batch(pd.Series([b"s" * 200]))) == [""]

    def test_describe_and_ocr_combine(self):
        import pandas as pd

        from docproc_spark.providers import FakeOcrTransport, PollingOcrProvider

        p = PollingOcrProvider(FakeOcrTransport(polls_until_done=1))
        out = p.describe_and_ocr_batch(pd.Series([b"c" * 200]))[0]
        cap, l1, l2, tags = out.split("\n")
        assert cap.startswith("caption(") and l1.startswith("line1(")
        assert tags == "Tags: tagA, tagB, tagC"


def test_iceberg_detection_and_write_table_routing(spark, tmp_path):
    """iceberg_available must be False in this Iceberg-less container (a
    bare py4j attribute probe always "succeeded" — missing class paths
    resolve to JavaPackage without raising, making the parquet fallback
    dead code), and write_table must route paths — absolute, relative,
    URI — to parquet, never to writeTo()."""
    from docproc_spark.sources.tables import (
        _is_table_identifier,
        iceberg_available,
        write_table,
    )

    assert iceberg_available(spark) is False

    assert _is_table_identifier("catalog.db.tbl")
    assert _is_table_identifier("db.tbl")
    assert not _is_table_identifier("/abs/path")
    assert not _is_table_identifier("out/results")
    assert not _is_table_identifier("s3a://bucket/tbl")
    assert not _is_table_identifier("file:/tmp/x")
    assert not _is_table_identifier("plain")

    dst = str(tmp_path / "wt_out")
    df = spark.range(3).toDF("doc_id")
    write_table(df, dst)
    assert spark.read.parquet(dst).count() == 3


def test_config_knobs_are_wired(spark):
    """use_llm_refine routes extract output through the refine stage
    (markdown replaced by the chunk->chat->rejoin text); use_vision picks
    the caption provider for caption_media; arrow_batch reaches
    get_spark. A knob must never promise behavior the engine doesn't
    implement (config.py's own rule)."""
    import inspect

    import pandas as pd

    from docproc_spark.config import EngineConfig
    from docproc_spark.facade import DocprocSpark
    from docproc_spark.kernels.captions import caption_stub
    from docproc_spark.schema import DOCUMENTS_SCHEMA
    from docproc_spark.session import get_spark

    assert "arrow_batch" in inspect.signature(get_spark).parameters

    doc = {
        "doc_id": "r1", "doc_type": "pdf", "raw_html": None,
        "spans": [{"kind": "text", "text": "Alpha beta.", "media_ref": None,
                   "page": 0, "offset": 0}],
    }
    docs = spark.createDataFrame(pd.DataFrame([doc]), schema=DOCUMENTS_SCHEMA)

    cfg = EngineConfig()
    cfg.ingest.use_llm_refine = True
    eng = DocprocSpark(spark=spark, config=cfg)
    plain = DocprocSpark(spark=spark).extract_table(docs).collect()[0]["markdown"]
    refined = eng.extract_table(docs).collect()[0]["markdown"]
    # stub-chat is deterministic and differs from raw for page-marked text
    assert refined != plain
    assert eng.extract_table(docs).columns == ["doc_id", "markdown", "n_pages", "spans"]

    media = spark.createDataFrame(
        pd.DataFrame({"media_ref": ["m1"], "context": ["Page 1, image 1."]})
    )
    caps = {r["media_ref"]: r["caption"]
            for r in DocprocSpark(spark=spark).caption_media(media).collect()}
    assert caps["m1"] == caption_stub("m1", "Page 1, image 1.")


def test_write_table_filename_routing_and_iceberg_mode():
    """Dotted relative FILENAMES must be filesystem destinations, not
    catalog identifiers ('out.parquet' previously became a bogus
    `out`.`parquet` Iceberg table on Iceberg-enabled clusters)."""
    from docproc_spark.sources.tables import _is_table_identifier

    for fname in ("out.parquet", "results.db", "x.sqlite", "dump.jsonl",
                  "notes.md", "t.csv", "w.orc"):
        assert not _is_table_identifier(fname), fname
    # real identifiers still route to the catalog
    assert _is_table_identifier("cat.db.tbl")
    assert _is_table_identifier("warehouse.documents")


def test_config_env_path_typo_errors(monkeypatch, tmp_path):
    """An explicitly set DOCPROC_SPARK_CONFIG pointing nowhere must raise
    like parse_config(bad_path) would — never silently fall back to
    defaults."""
    monkeypatch.setenv("DOCPROC_SPARK_CONFIG", str(tmp_path / "nope.ymll"))
    with pytest.raises(FileNotFoundError, match="DOCPROC_SPARK_CONFIG"):
        parse_config(None)
    # a VALID env path still loads
    good = tmp_path / "ok.yml"
    good.write_text("spark:\n  shuffle_partitions: 5\n")
    monkeypatch.setenv("DOCPROC_SPARK_CONFIG", str(good))
    assert parse_config(None).spark.shuffle_partitions == 5


def test_rag_config_consumed_by_facade(spark):
    """rag.chunk_size and rag.top_k must be REAL knobs: facade.rag_chunks
    chunks at chunk_size and facade.rag_search returns top_k rows."""
    from docproc_spark.config import EngineConfig
    from docproc_spark.facade import DocprocSpark

    cfg = EngineConfig()
    cfg.rag.chunk_size = 8
    cfg.rag.top_k = 3
    eng = DocprocSpark(spark=spark, config=cfg)
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(20)) + " needle") for i in range(6)],
        "doc_id long, text string",
    )
    chunks = eng.rag_chunks(docs).collect()
    assert chunks and all(r["n_tokens"] <= 8 for r in chunks)
    hits = eng.rag_search(docs, "needle").collect()
    assert len(hits) == 3


def test_refine_fanout_is_checkpointed(spark):
    """With use_llm_refine on, extract_table must materialize the extract
    result before the refine join — both join sides derive from it and
    fan-out gets no CSE, so an uncheckpointed plan runs the whole
    extraction twice. A checkpointed plan shows the join reading
    ExistingRDD scans, not two copies of the extraction subtree."""
    from docproc_spark import corpus
    from docproc_spark.config import EngineConfig
    from docproc_spark.facade import DocprocSpark

    cfg = EngineConfig()
    cfg.ingest.use_llm_refine = True
    cfg.ingest.refine_provider = "stub-chat"
    eng = DocprocSpark(spark=spark, config=cfg)
    docs = corpus.corpus_df(spark, 8, seed=11, mega_spans=50, partitions=2)
    out = eng.extract_table(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, "extract result not checkpointed pre-join"
    # the extraction pipeline's groupBy shuffle must NOT appear twice
    assert plan.count("Exchange hashpartitioning(doc_id") <= 1, plan[:800]
    rows = out.collect()
    assert len(rows) == 8 and all(r["markdown"] is not None for r in rows)
