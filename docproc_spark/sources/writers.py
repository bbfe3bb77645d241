"""Sinks with reference writer semantics.

  CSV      newlines in values escaped as literal \\n, headers on
           (reference writer/csv.py:88-108)
  JSONL    one object per line (writer/json.py:60-85 — df.write.json IS jsonl)
  markdown pages-comment prefix "<!-- PAGES: n -->\\n" when page count > 0
           (facade.py:92-96, cli.py:228-232)

The reference flushes every 1000 rows (csv.py:81); Spark's file commit
protocol supersedes that — partition-atomic task commits + job commit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def csv_escaped(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV with the reference's newline escape: '\\n' in values → literal \\n."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StringType):
            out = out.withColumn(
                f.name, F.regexp_replace(F.col(f.name), "\n", r"\\n")
            )
    out.write.mode(mode).option("header", True).csv(path)


def jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def with_pages_prefix(
    df: DataFrame, markdown_col: str = "markdown", n_pages_col: str = "n_pages"
) -> DataFrame:
    """Prefix "<!-- PAGES: n -->\\n" when n_pages > 0 (reference exact)."""
    prefixed = F.when(
        F.col(n_pages_col) > 0,
        F.concat(
            F.lit("<!-- PAGES: "),
            F.col(n_pages_col).cast("string"),
            F.lit(" -->\n"),
            F.col(markdown_col),
        ),
    ).otherwise(F.col(markdown_col))
    return df.withColumn(markdown_col, prefixed)


def export_markdown_files(df: DataFrame, out_dir: str) -> int:
    """Write one .md file per document (the reference CLI's output shape).

    Driver-side convenience for small result sets; the table sink is the
    real path at scale.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for row in df.select("doc_id", "markdown").toLocalIterator():
        with open(os.path.join(out_dir, f"{row['doc_id']}.md"), "w") as f:
            f.write(row["markdown"] or "")
        n += 1
    return n
