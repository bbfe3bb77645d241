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


def write_sqlite(
    df: DataFrame,
    db_path: str,
    table: str,
    batch_size: int = 1000,
    single_file: bool = True,
) -> None:
    """SQLite sink with the reference writer's semantics
    (reference writer/sqlite.py:40-176): type map int/bool→INTEGER,
    float→REAL, str/dict/list→TEXT with complex values JSON-encoded
    (sqlite.py:65-74), batched executemany of ``batch_size`` rows per
    transaction (sqlite.py:103-117). Types come from the Spark schema —
    explicit, not first-row inference.

    Executor-side via foreachPartition (no driver materialization).
    single_file=True coalesces to ONE writing task (SQLite is a
    single-writer file — the reference's single-process shape; assumes the
    path is reachable from the executor, true in local/shared-fs deploys).
    single_file=False writes one shard per partition
    (``{db_path}.part-NNNNN``) — the parallel shape at scale.

    Idempotent AND multi-table: each task copies the existing target db
    (if any) to a task-attempt temp file, DROPs + recreates ONLY ``table``
    inside it, and atomically renames over the target on success — a job
    re-run REPLACES the table (not the whole file: other tables previously
    written to the same db survive, matching the reference's
    one-writer-per-table shape, sqlite.py:40-57), and a Spark task retry
    after a partial write leaves no half-committed rows behind (the temp
    file of the dead attempt is simply abandoned). With single_file=False,
    stale ``.part-NNNNN`` shards beyond the new partition count are
    removed up front — a re-run with fewer partitions must not leave a
    reader unioning fresh and stale shards.
    """
    from pyspark import TaskContext

    def sqlite_type(dt: T.DataType) -> str:
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                           T.BooleanType)):
            return "INTEGER"
        if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
            return "REAL"
        return "TEXT"  # str + JSON-encoded complex, like the reference

    prep = df
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            prep = prep.withColumn(f.name, F.to_json(F.col(f.name)))
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType,
                                     T.DateType)):
            prep = prep.withColumn(f.name, F.col(f.name).cast("string"))
        elif isinstance(f.dataType, T.DecimalType):
            # sqlite3 cannot bind decimal.Decimal — the type map says REAL,
            # so the value must actually arrive as a float
            prep = prep.withColumn(f.name, F.col(f.name).cast("double"))
    cols = prep.schema.fields
    col_names = [f.name for f in cols]
    cols_def = ", ".join(f"{f.name} {sqlite_type(f.dataType)}" for f in cols)
    drop_sql = f"DROP TABLE IF EXISTS {table};"
    create_sql = f"CREATE TABLE IF NOT EXISTS {table} ({cols_def});"
    insert_sql = (
        f"INSERT INTO {table} ({', '.join(col_names)}) "
        f"VALUES ({', '.join('?' * len(col_names))});"
    )

    def write_partition(rows):
        import os
        import sqlite3

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        attempt = tc.taskAttemptId() if tc is not None else 0
        path = db_path if single_file else f"{db_path}.part-{pid:05d}"
        tmp = f"{path}.tmp-{attempt}"
        if os.path.exists(tmp):
            os.remove(tmp)
        if os.path.exists(path):
            # start from the existing db so OTHER tables survive the
            # atomic rename; only `table` is dropped and rebuilt
            import shutil

            shutil.copyfile(path, tmp)
        con = sqlite3.connect(tmp)
        try:
            cur = con.cursor()
            cur.execute(drop_sql)
            cur.execute(create_sql)
            batch = []
            for r in rows:
                batch.append(tuple(r[c] for c in col_names))
                if len(batch) >= batch_size:
                    cur.executemany(insert_sql, batch)
                    con.commit()
                    batch = []
            if batch:
                cur.executemany(insert_sql, batch)
            con.commit()
        finally:
            con.close()
        os.replace(tmp, path)  # atomic commit of the whole partition

    if single_file:
        # repartition(1), NOT coalesce(1): coalesce propagates the 1-task
        # constraint UPSTREAM to the last shuffle boundary, serializing
        # the whole scan+prep pipeline; repartition inserts an exchange so
        # prep stays parallel and only the sqlite write is single-task
        prep.repartition(1).foreachPartition(write_partition)
        return

    def write_partition_yielding_pid(rows):
        write_partition(rows)
        tc = TaskContext.get()
        yield tc.partitionId() if tc is not None else 0

    # The job's own output drives stale-shard cleanup: mapPartitions
    # yields each partition id that actually committed (bounded collect —
    # one int per partition), so (a) cleanup happens only AFTER the whole
    # job succeeded (a mid-job failure leaves every pre-existing shard in
    # place instead of a mixed old/partial sink), and (b) the live-shard
    # set is what was written, not a separate getNumPartitions() probe
    # that can diverge from the executed plan under AQE coalescing.
    written = set(prep.rdd.mapPartitions(write_partition_yielding_pid).collect())
    import glob
    import os as _os
    import re as _re

    live = {f"{db_path}.part-{pid:05d}" for pid in written}
    for shard in glob.glob(f"{db_path}.part-*"):
        if (
            _re.fullmatch(_re.escape(db_path) + r"\.part-(\d{5})", shard)
            and shard not in live
        ):
            _os.remove(shard)


def export_markdown_files_distributed(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    markdown_col: str = "markdown",
) -> None:
    """One .md file per document, written from EXECUTORS via
    foreachPartition — the scale-safe variant of export_markdown_files
    (no toLocalIterator; assumes out_dir is a shared filesystem, which is
    what a one-file-per-doc layout requires on any cluster)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows):
        for r in rows:
            fname = os.path.join(out_dir, f"{r[id_col]}.md")
            with open(fname, "w", encoding="utf-8") as fh:
                fh.write(r[markdown_col] or "")

    df.select(id_col, markdown_col).foreachPartition(write_partition)


def export_markdown_files(df: DataFrame, out_dir: str) -> int:
    """Write one .md file per document (the reference CLI's output shape).

    Driver-side convenience for small result sets; the table sink or
    export_markdown_files_distributed is the real path at scale.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for row in df.select("doc_id", "markdown").toLocalIterator():
        with open(os.path.join(out_dir, f"{row['doc_id']}.md"), "w") as f:
            f.write(row["markdown"] or "")
        n += 1
    return n


def wet_record_col(
    id_col: Column,
    text_col: Column,
    warc_date: str,
    url_col: Column | None = None,
) -> Column:
    """One WARC/1.0 ``conversion`` record (the WET convention: extracted
    plain text re-framed as a web archive) as a Column expression.
    Content-Length counts UTF-8 OCTETS (octet_length, not character
    length); the record id is a deterministic urn:uuid built from
    md5(doc_id) so re-exports are byte-identical. ``warc_date`` is a
    caller-supplied literal — export is a pure function of its input."""
    t = F.coalesce(text_col, F.lit(""))
    h = F.md5(id_col.cast("string"))
    rid = F.concat(
        F.lit("urn:uuid:"),
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"),
        F.substring(h, 17, 4), F.lit("-"),
        F.substring(h, 21, 12),
    )
    uri = (
        # NULL url -> omit the header (concat with NULL would null the
        # whole record out of the shard)
        F.coalesce(
            F.concat(F.lit("WARC-Target-URI: "), url_col, F.lit("\r\n")),
            F.lit(""),
        )
        if url_col is not None
        else F.lit("")
    )
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: <"),
        rid,
        F.lit(f">\r\nWARC-Date: {warc_date}\r\n"),
        uri,
        F.lit("Content-Type: text/plain\r\nContent-Length: "),
        F.octet_length(t).cast("string"),
        F.lit("\r\n\r\n"),
        t,
        # record terminator is CRLF CRLF; the last byte comes from the
        # text sink's lineSep (it rejects an empty separator), so the
        # column itself ends one byte short
        F.lit("\r\n\r"),
    )


def export_wet(
    df: DataFrame,
    path: str,
    warc_date: str = "2024-01-01T00:00:00Z",
    id_col: str = "doc_id",
    text_col: str = "markdown",
    url_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Export extraction output as WET-style web-archive shards — the
    format CommonCrawl distributes extracted text in, and the natural
    hand-off from this engine to downstream corpus consumers. One
    ``conversion`` record per document, spec-framed (``lineSep`` pinned
    to ``\\n`` — it completes each record's final CRLF, see
    ``wet_record_col`` — so shard bytes are framing-exact);
    one shard per partition, written from executors. Round-trips through
    this engine's own WARC parser (sources/warc.py handles conversion
    records) — asserted in tests."""
    rec = wet_record_col(
        F.col(id_col),
        F.col(text_col),
        warc_date,
        F.col(url_col) if url_col else None,
    )
    (
        df.select(rec.alias("value"))
        .write.mode(mode)
        .option("lineSep", "\n")
        .text(path)
    )
