"""Structured Streaming surface (SURVEY §2.5 note).

The reference is pure batch; its nearest streaming analogue is gazetteer
incremental matching (gazetteer_example/gazetteer_example.py:157-159):
new messy records arrive, get matched against the static canonical index,
matches are written back. That maps to ``readStream -> foreachBatch(match
+ write)`` here. A watermarked windowed rollup over the events table is
included as the standard streaming-aggregation operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklink.canonicalize import canonicalize


def stream_gazetteer_matches(
    spark,
    gazetteer,
    stream_source_dir: str,
    transcripts_schema,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Micro-batch gazetteer: each arriving batch of transcript rows is
    canonicalized per-conversation and matched against the persisted
    canonical index; (messy_id, canonical_id, score) appended to out_dir.

    Semantics note: a conversation's turns are assumed to arrive within one
    file/batch (the fixture writes whole conversations); cross-batch turn
    assembly would need applyInPandasWithState session windows — out of the
    reference's scope (it matches complete records too).
    """
    stream = spark.readStream.schema(transcripts_schema).parquet(stream_source_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        records = canonicalize(batch_df)
        matches = gazetteer.match(records)
        (
            matches.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = stream.writeStream.foreachBatch(handle_batch).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events_rollup(
    events_stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed aggregation over the events stream: late rows
    beyond the watermark are dropped, counts/sums emitted per (window,
    event_type). The streaming form of q_events_daily."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ parquet -> event-time type
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide or window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
    )
