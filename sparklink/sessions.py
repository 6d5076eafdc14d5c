"""Sessionization over the events stream table.

Batch form: gap-based sessions via lag + running count (window functions),
fully SQL-expressible (oracle-checked). Streaming form: native
``F.session_window`` aggregation with watermark (sparklink.streaming).
A training-data pipeline uses this to segment interaction logs into
conversations — the inverse of canonicalize's grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30, user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """(event_id, user_id, ts, session_idx, session_id): a new session
    starts when the gap to the user's previous event exceeds gap_minutes.

    Plan: one shuffle (window partitionBy user) reused by both window
    functions (lag + running sum) — Catalyst plans a single exchange.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull() | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_minutes * 60)
    ).cast("int")
    return (
        events.withColumn("_new", new_session)
        .withColumn("session_idx", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .drop("_new")
        .withColumn("session_id", F.concat(F.col(user_col).cast("string"), F.lit("#"), F.col("session_idx").cast("string")))
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregates: bounds, event count, value sum (cents)."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
    )
