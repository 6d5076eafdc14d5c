"""Structured Streaming: gazetteer micro-batch matching + watermarked rollup."""

import tempfile

import pytest
from pyspark.sql import functions as F

from sparklink.streaming import stream_events_rollup, stream_gazetteer_matches


def test_stream_gazetteer_matches_equals_batch(spark, tmp_path_factory):
    from sparklink.canonicalize import canonicalize
    from sparklink.linkage import SparkGazetteer, SparkRecordLink
    from sparklink.synth import make_labeled_pairs, make_transcripts

    tp, truth = make_transcripts(n_entities=40, seed=23, two_sources=True)
    labeled = make_labeled_pairs(truth, tp, seed=23)
    t = spark.createDataFrame(tp)
    records = canonicalize(t, extra_cols=["source"]).cache()
    rl = SparkRecordLink()
    rl.fit(records, spark.createDataFrame(labeled))

    canonical = records.filter(F.col("source") == "b").drop("source").cache()
    messy_rows = t.filter(F.col("source") == "a").drop("source")

    gaz = SparkGazetteer(model=rl.model, threshold=rl.threshold)
    gaz.index(canonical)

    base = tmp_path_factory.mktemp("stream")
    src, out, chk = str(base / "src"), str(base / "out"), str(base / "chk")
    # two "arriving" files
    messy_rows.filter(F.col("conv_id") < "c0000500").write.mode("overwrite").parquet(src)
    messy_rows.filter(F.col("conv_id") >= "c0000500").write.mode("append").parquet(src)

    q = stream_gazetteer_matches(spark, gaz, src, t.drop("source").schema, out, chk)
    q.awaitTermination(300)

    streamed = spark.read.parquet(out).select("messy_id", "canonical_id")
    batch = gaz.match(canonicalize(messy_rows)).select("messy_id", "canonical_id")
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
    gaz.unindex()


def test_stream_events_rollup_matches_batch(spark, tmp_path_factory):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    base = tmp_path_factory.mktemp("ev")
    src, chk = str(base / "src"), str(base / "chk")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    rolled = stream_events_rollup(stream, window="1 day", watermark="1 day")
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select window.start as day, event_type, n_events, value_cents from rollup_test")
    want = events.groupBy(F.window("ts", "1 day").alias("window"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
    ).select(F.col("window.start").alias("day"), "event_type", "n_events", "value_cents")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stateful_conversation_assembly_matches_batch(spark, tmp_path_factory):
    """Turns of each conversation split across TWO micro-batch files; the
    applyInPandasWithState assembler's final version must canonicalize to
    exactly the batch canonicalize of the full input."""
    from sparklink.canonicalize import canonicalize
    from sparklink.streaming import stream_assemble_conversations
    from sparklink.synth import make_transcripts

    tp, _ = make_transcripts(n_entities=12, seed=31)
    t = spark.createDataFrame(tp)
    base = tmp_path_factory.mktemp("state_stream")
    src, chk = str(base / "src"), str(base / "chk")
    # batch 1: even turn_idx; batch 2: odd — every conversation spans both
    t.filter(F.col("turn_idx") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    t.filter(F.col("turn_idx") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(t.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_assemble_conversations(stream)
        .writeStream.format("memory")
        .queryName("assembly_test")
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    emitted = spark.sql("select * from assembly_test")
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id")
    final = (
        emitted.withColumn("_maxv", F.max("version").over(w))
        .filter(F.col("version") == F.col("_maxv"))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    got = canonicalize(final).toPandas().sort_values("conv_id").reset_index(drop=True)
    want = canonicalize(t).toPandas().sort_values("conv_id").reset_index(drop=True)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    for col in ["n_turns", "conv_text", "first_user_text", "last_assistant_text"]:
        assert got[col].tolist() == want[col].tolist(), col
