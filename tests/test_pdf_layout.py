"""PDF layout kernels: reading order + region detection, python↔Spark parity."""

from __future__ import annotations

from docproc_spark.kernels.pdf_layout import blocks_df_to_spans, blocks_to_spans

BLOCKS = [
    # page 0, out of order on purpose
    {"page": 0, "x0": 300.0, "y0": 100.0, "x1": 500.0, "y1": 120.0, "text": "right column"},
    {"page": 0, "x0": 50.0, "y0": 100.0, "x1": 250.0, "y1": 120.0, "text": "left column"},
    {"page": 0, "x0": 50.0, "y0": 20.0, "x1": 500.0, "y1": 35.0, "text": "Running Header"},
    {"page": 0, "x0": 50.0, "y0": 760.0, "x1": 500.0, "y1": 780.0, "text": "Page 1 of 9"},
    {"page": 0, "x0": 50.0, "y0": 400.0, "x1": 500.0, "y1": 450.0,
     "text": "a | b | c\nd | e | f"},
    {"page": 0, "x0": 50.0, "y0": 200.0, "x1": 500.0, "y1": 210.0, "text": "   "},
    # page 1
    {"page": 1, "x0": 50.0, "y0": 120.0, "x1": 500.0, "y1": 140.0, "text": "second page body"},
]

PAGE_H = 800.0


def test_reading_order_and_regions():
    spans = blocks_to_spans(BLOCKS, page_height=PAGE_H)
    assert [s["text"] for s in spans] == [
        "Running Header",
        "left column",
        "right column",
        "a | b | c\nd | e | f",
        "Page 1 of 9",
        "second page body",
    ]
    assert [s["kind"] for s in spans] == [
        "header", "text", "text", "table", "footer", "text",
    ]
    assert [s["offset"] for s in spans] == list(range(6))


def test_spark_matches_python(spark):
    rows = [{"doc_id": "d1", **b} for b in BLOCKS]
    df = spark.createDataFrame(rows)
    got = sorted(
        (r["offset"], r["kind"], r["text"], r["page"])
        for r in blocks_df_to_spans(df, page_height=PAGE_H).collect()
    )
    want = sorted(
        (s["offset"], s["kind"], s["text"], s["page"])
        for s in blocks_to_spans(BLOCKS, page_height=PAGE_H)
    )
    assert got == want


def test_feeds_extraction_pipeline(spark):
    """Layout output composes with the flagship pipeline."""
    from pyspark.sql import functions as F

    from docproc_spark.pipeline import extract

    rows = [{"doc_id": "d1", **b} for b in BLOCKS]
    spans = blocks_df_to_spans(spark.createDataFrame(rows), page_height=PAGE_H)
    docs = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct("kind", "text", "media_ref", "page", "offset")
        ).alias("spans")
    ).withColumn("doc_type", F.lit("pdf")).withColumn("raw_html", F.lit(None).cast("string"))
    res = extract(docs).collect()[0]
    assert "[Page 1]" in res["markdown"] and "[Page 2]" in res["markdown"]
    assert "left column" in res["markdown"]
    assert "Page 1 of 9" in res["markdown"]  # footer kept (not boilerplate-dropped)


def test_df_path_matches_kernel_on_whitespace_blocks(spark):
    """The DataFrame path must agree with the scalar kernel on blocks that
    differ under str.strip() vs F.trim (tabs, NBSP): '\\t\\t' dropped,
    '\\tfoo' emitted as 'foo' (offsets shift identically)."""
    import pandas as pd

    from docproc_spark.kernels.pdf_layout import blocks_df_to_spans, blocks_to_spans

    blocks = [
        {"page": 0, "x0": 0.0, "y0": 10.0, "x1": 100.0, "y1": 20.0, "text": "\t\t"},
        {"page": 0, "x0": 0.0, "y0": 30.0, "x1": 100.0, "y1": 40.0, "text": "\tfoo"},
        {"page": 0, "x0": 0.0, "y0": 50.0, "x1": 100.0, "y1": 60.0, "text": " "},
        {"page": 0, "x0": 0.0, "y0": 70.0, "x1": 100.0, "y1": 80.0, "text": "bar "},
    ]
    want = [
        (s["kind"], s["text"], s["page"], s["offset"])
        for s in blocks_to_spans(blocks, page_height=800.0)
    ]
    df = spark.createDataFrame(
        pd.DataFrame([{**b, "doc_id": "d1"} for b in blocks])
    )
    got = [
        (r["kind"], r["text"], r["page"], r["offset"])
        for r in blocks_df_to_spans(df, page_height=800.0)
        .orderBy("offset")
        .collect()
    ]
    # y-center 35 < 0.08*800: the surviving first block is a header
    assert got == want == [("header", "foo", 0, 0), ("text", "bar", 0, 1)]
