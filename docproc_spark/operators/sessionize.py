"""Gap-based sessionization over an event stream (batch form).

lag + cumulative-sum-of-gap-starts — one shuffle on the user key; the same
logic streams via session_window(ts, gap) in streaming/events.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign a 1-based session_id per user (new session when the gap from
    the previous event exceeds gap_minutes)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    prev_ts = F.lag(ts_col).over(w)
    # microsecond gap arithmetic — unix_timestamp() truncates to whole
    # seconds, misclassifying gaps that straddle the threshold within the
    # truncation window (events carry microsecond timestamps; the DuckDB
    # oracle compares epoch_us). TIMESTAMP_NTZ→timestamp keeps wall time
    # under the UTC session timezone.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.unix_micros(prev_ts.cast("timestamp"))
    new_session = (
        prev_ts.isNull() | (us - prev_us > gap_minutes * 60 * 1_000_000)
    ).cast("int")
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session summary: n_sessions, n_events, events per session."""
    s = sessionize(events, gap_minutes=gap_minutes)
    return (
        s.groupBy("user_id")
        .agg(
            F.max("session_id").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .withColumn(
            "avg_events_per_session",
            F.round(F.col("n_events") / F.col("n_sessions"), 4),
        )
    )
