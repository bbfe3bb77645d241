"""Salted (two-phase) mega-doc path: oracle parity + routing.

The salted plan recomputes the exact assemble_document semantics
relationally; these tests assert span-sequence + markdown equality against
the single-process oracle for EVERY fixture class (not just mega docs — the
relational path must be a drop-in), plus the automatic routing and a large
mega-doc straggler check.
"""

from __future__ import annotations

import pandas as pd
import pytest

from docproc_spark import corpus, oracle
from docproc_spark.pipeline import extract
from docproc_spark.pipeline_salted import extract_salted
from docproc_spark.schema import DOCUMENTS_SCHEMA

N_DOCS = 180
MEGA_SPANS = 600


def _tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


@pytest.fixture(scope="module")
def results(spark):
    docs = corpus.corpus_df(spark, N_DOCS, seed=42, mega_spans=MEGA_SPANS, partitions=8)
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in extract_salted(docs).collect()
    }
    want = oracle.extract_corpus(
        corpus.gen_doc(i, seed=42, mega_spans=MEGA_SPANS) for i in range(N_DOCS)
    )
    return got, want


def test_salted_all_docs_present(results):
    got, want = results
    assert set(got) == set(want)


def test_salted_span_sequence_equality(results):
    got, want = results
    bad = [d for d in want if _tuples(got[d]["spans"]) != _tuples(want[d]["spans"])]
    assert not bad, (
        f"{len(bad)} docs mismatch, first: {bad[0]}\n"
        f"spark={_tuples(got[bad[0]]['spans'])[:8]}\n"
        f"oracle={_tuples(want[bad[0]]['spans'])[:8]}"
    )


def test_salted_markdown_and_pages(results):
    got, want = results
    bad = [
        d
        for d in want
        if got[d]["markdown"] != want[d]["markdown"]
        or got[d]["n_pages"] != want[d]["n_pages"]
    ]
    assert not bad, (
        f"first: {bad[:1]}\nspark={got[bad[0]]['markdown'][:300]!r}\n"
        f"oracle={want[bad[0]]['markdown'][:300]!r}"
    )


def test_routing_splits_by_span_count(spark):
    """extract() routes >threshold docs through the salted branch and the
    union reproduces every doc exactly once with oracle parity."""
    docs = [corpus.gen_doc(i, seed=5, mega_spans=3000) for i in range(40)]
    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "doc_type", "raw_html", "spans"]),
        schema=DOCUMENTS_SCHEMA,
    )
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in extract(df, mega_doc_threshold=1000).collect()
    }
    assert len(got) == 40  # no doc lost or duplicated by the split
    for d in docs:
        want = oracle.extract_doc(d)
        assert _tuples(got[d["doc_id"]]["spans"]) == _tuples(want["spans"]), d["doc_id"]
        assert got[d["doc_id"]]["markdown"] == want["markdown"], d["doc_id"]


def test_salted_dedupe_toggle(spark):
    docs = [corpus.gen_doc(i, seed=11) for i in range(60)
            if corpus.doc_class_for_index(i) == "dup_spans"]
    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "doc_type", "raw_html", "spans"]),
        schema=DOCUMENTS_SCHEMA,
    )
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in extract_salted(df, drop_exact_duplicates=False).collect()
    }
    for d in docs:
        want = oracle.extract_doc(d, drop_exact_duplicates=False)
        assert _tuples(got[d["doc_id"]]["spans"]) == _tuples(want["spans"])


def test_mega_doc_routes_salted_with_hash_parity(spark, tmp_path):
    """A >threshold doc goes through the salted branch of the DEFAULT
    extract() and matches the oracle hash-for-hash (markdown md5 +
    span-sequence md5 — collecting 120k spans through py4j is the slow part,
    so compare hashes computed engine-side)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    idx = next(i for i in range(200) if corpus.doc_class_for_index(i) == "mega_doc")
    doc = corpus.gen_doc(idx, seed=42, mega_spans=120_000)
    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()),
         ("page", pa.int32()), ("offset", pa.int32())]
    )
    schema = pa.schema(
        [("doc_id", pa.string()), ("doc_type", pa.string()),
         ("raw_html", pa.string()), ("spans", pa.list_(span_t))]
    )
    src = str(tmp_path / "mega.parquet")
    pq.write_table(pa.Table.from_pylist([doc], schema=schema), src)

    res = extract(spark.read.parquet(src))  # default threshold: 100k → salted
    span_strs = F.transform(
        F.col("spans"),
        lambda s: F.concat_ws(
            "\x1f", s["kind"], s["text"],
            F.coalesce(s["media_ref"], F.lit("")), s["offset"].cast("string"),
        ),
    )
    row = res.select(
        "n_pages",
        F.size("spans").alias("n_spans"),
        F.md5("markdown").alias("mdh"),
        F.md5(F.array_join(span_strs, "\x1e")).alias("sph"),
    ).collect()[0]

    want = oracle.extract_doc(doc)
    mdh = hashlib.md5(want["markdown"].encode()).hexdigest()
    parts = [
        f"{s['kind']}\x1f{s['text']}\x1f{s['media_ref'] or ''}\x1f{s['offset']}"
        for s in want["spans"]
    ]
    sph = hashlib.md5("\x1e".join(parts).encode()).hexdigest()
    assert row["n_spans"] == len(want["spans"])
    assert row["n_pages"] == want["n_pages"]
    assert row["mdh"] == mdh and row["sph"] == sph


def test_salted_equals_array_path_fresh_seed(spark):
    """The two physical plans are interchangeable: identical output on a
    corpus seed no other test uses (cross-validation without the oracle)."""
    docs = corpus.corpus_df(spark, 90, seed=99, mega_spans=300, partitions=4)
    a = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in extract(docs, mega_doc_threshold=None).collect()
    }
    b = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in extract_salted(docs).collect()
    }
    assert set(a) == set(b)
    for d in a:
        assert a[d]["markdown"] == b[d]["markdown"], d
        assert a[d]["n_pages"] == b[d]["n_pages"], d
        assert _tuples(a[d]["spans"]) == _tuples(b[d]["spans"]), d
