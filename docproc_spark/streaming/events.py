"""Structured Streaming operators over the events table.

The reference is batch-only (a CLI); these exist because the engine's
north-star corpus is continuously ingested in production. Local smoke runs
drive them with a file source + Trigger.AvailableNow-style synchronous
processing (memory sink), using the same column logic as the batch
operators so batch/stream parity is testable.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window event counts with late-data watermark.

    Parquet naive timestamps arrive as TIMESTAMP_NTZ; watermarks require
    TIMESTAMP_LTZ — the cast is wall-time-preserving under the UTC session.
    """
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (streaming analog of operators.sessionize)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def dedupe_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once dedupe on event_id (first arrival wins).

    dropDuplicatesWithinWatermark — NOT dropDuplicates(['event_id']): with
    a plain dropDuplicates whose subset lacks the event-time column, the
    watermark only discards late input rows and the id state store never
    evicts — unbounded growth on a continuous ingest, the exact failure
    this operator exists to prevent. The WithinWatermark variant evicts an
    id's state once the watermark passes its event time + delay, and still
    drops duplicates arriving inside the bound (the realistic
    at-least-once-delivery replay case). The semantic trade is explicit: a
    duplicate arriving LATER than the lateness bound after the original is
    emitted again — by then it is late data by contract anyway.
    """
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def clicks_purchases_join(
    events: DataFrame, lookback: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join (attribution): every click matched to
    the same user's purchases in the preceding ``lookback`` window.

    The canonical two-stream join shape: watermarks on BOTH sides plus the
    time-range predicate are what let Spark evict join state — without
    them a stream-stream join buffers forever. Inner join, append mode
    (matches emit as they arrive; the watermark only bounds state)."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (clicks.user_id == purchases.p_user)
        & (purchases.purchase_ts <= clicks.click_ts)
        & (purchases.purchase_ts >= clicks.click_ts - F.expr(f"INTERVAL {lookback}"))
    )
    return clicks.join(purchases, cond).select(
        "click_id", "purchase_id", "purchase_value"
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running event count + value sum,
    maintained across micro-batches with applyInPandasWithState.

    The GroupState holds (n_events, total_value) per user; each batch emits
    the updated running totals for users present in the batch. This is the
    engine's template for arbitrary stateful per-key logic that windowed
    aggregations can't express (the batch operators cover everything the
    reference needs; this exists for the streaming-ingest deployment).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _commit_staging_dir(tmp_d: str, final_d: str) -> str:
    """Atomically promote a COMPLETE private staging dir to its final
    name; returns the dir to read from. Handles every failure mode of a
    bare rename: a concurrent winner with a complete dir (use theirs,
    drop ours), a pre-existing INCOMPLETE dir without _SUCCESS (e.g. a
    crashed legacy run that wrote in place — repaired by replacement,
    where a bare rename would fail ENOTEMPTY forever and silently serve
    the incomplete data), and an unclaimable final name (serve this run
    from the private complete copy; correct, leaks one dir)."""
    import shutil

    try:
        os.rename(tmp_d, final_d)
        return final_d
    except OSError:
        pass
    if os.path.exists(os.path.join(final_d, "_SUCCESS")):
        shutil.rmtree(tmp_d, ignore_errors=True)
        return final_d
    shutil.rmtree(final_d, ignore_errors=True)
    try:
        os.rename(tmp_d, final_d)
        return final_d
    except OSError:
        return tmp_d


def run_stream_once(
    spark: SparkSession,
    events_path: str,
    transform,
    query_name: str = "stream_out",
    output_mode: str = "complete",
    max_files_per_trigger: int | None = None,
    n_chunks: int = 1,
) -> DataFrame:
    """Drive a streaming transform over a static parquet dir to completion
    (memory sink), return the result as a batch DataFrame.

    Default output mode is "complete": with a finite file source nothing
    ever advances the watermark past the last window, so append mode would
    hold every window back — complete emits the current aggregate state.

    ``n_chunks`` > 1 re-stages the input as that many files and (with
    ``max_files_per_trigger=1``) forces multiple micro-batches — the way to
    exercise cross-batch state in stateful operators.
    """
    schema = spark.read.parquet(events_path).schema
    src = events_path
    # Staging dirs are DETERMINISTIC per (source, mtime, n_chunks) and
    # reused — a mkdtemp per invocation leaked one /tmp dir (and, for the
    # chunked path, a full corpus copy) per correctness/bench run.
    abs_src = os.path.abspath(events_path)
    try:
        st = os.stat(abs_src)
        # mtime_ns + size: second-resolution mtime let a regenerated
        # source within the same second silently reuse stale chunks
        stamp = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        stamp = "0:0"
    key = hashlib.md5(f"{abs_src}:{stamp}:{n_chunks}".encode()).hexdigest()[:12]
    if n_chunks > 1:
        d = os.path.join(tempfile.gettempdir(), f"stream_chunks_{key}")
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            # write to a private tmp dir and rename into place: a
            # concurrent run sharing the key must only ever see a COMPLETE
            # staging dir (the half-written-chunks race), and rename is
            # atomic on one filesystem. Loser of the race keeps the
            # winner's dir and discards its own copy.
            tmp_d = f"{d}.tmp-{os.getpid()}"
            spark.read.parquet(events_path).repartition(n_chunks).write.mode(
                "overwrite"
            ).parquet(tmp_d)
            src = _commit_staging_dir(tmp_d, d)
        else:
            src = d
    elif os.path.isfile(events_path):
        # FileStreamSource requires a directory — stage a symlink dir
        d = os.path.join(tempfile.gettempdir(), f"stream_src_{key}")
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, os.path.basename(events_path))
        # lexists, not exists: exists() follows the link, so a DANGLING
        # symlink (target regenerated under a new name) reads as absent
        # and the re-symlink raises EEXIST forever. Two concurrent runs
        # share the deterministic key — the loser of the create race must
        # tolerate EEXIST, then both must agree the link targets abs_src.
        if os.path.lexists(link):
            tgt = os.readlink(link) if os.path.islink(link) else None
            if tgt != abs_src:
                os.unlink(link)
        if not os.path.lexists(link):
            try:
                os.symlink(abs_src, link)
            except FileExistsError:
                pass  # concurrent run won the race with the same target
        src = d
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src)
    out = transform(stream)
    q = (
        out.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
