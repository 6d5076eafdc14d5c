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


def test_stateful_assembly_three_batches_interleaved(spark, tmp_path_factory):
    """Late-turn coverage (r4 VERDICT #8): the turns of every conversation
    split across THREE micro-batches, with one unrelated conversation
    arriving whole in the middle batch — final assembled state must
    canonicalize identically to the batch path."""
    from sparklink.canonicalize import canonicalize
    from sparklink.streaming import stream_assemble_conversations
    from sparklink.synth import make_transcripts

    tp, _ = make_transcripts(n_entities=10, seed=47)
    t = spark.createDataFrame(tp).cache()
    ids = sorted(r.conv_id for r in t.select("conv_id").distinct().collect())
    interloper = ids[0]  # arrives whole in batch 2
    split = t.filter(F.col("conv_id") != interloper)
    base = tmp_path_factory.mktemp("state_stream3")
    src, chk = str(base / "src"), str(base / "chk")
    split.filter(F.col("turn_idx") % 3 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    split.filter(F.col("turn_idx") % 3 == 1).unionByName(
        t.filter(F.col("conv_id") == interloper)
    ).coalesce(1).write.mode("append").parquet(src)
    split.filter(F.col("turn_idx") % 3 == 2).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(t.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_assemble_conversations(stream)
        .writeStream.format("memory")
        .queryName("assembly3_test")
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    emitted = spark.sql("select * from assembly3_test")
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id")
    final = (
        emitted.withColumn("_maxv", F.max("version").over(w))
        .filter(F.col("version") == F.col("_maxv"))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    # conversations split over 3 files saw 3 state updates
    assert emitted.filter(F.col("conv_id") != interloper).agg(F.max("version")).collect()[0][0] == 3
    got = canonicalize(final).toPandas().sort_values("conv_id").reset_index(drop=True)
    want = canonicalize(t).toPandas().sort_values("conv_id").reset_index(drop=True)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    for col in ["n_turns", "conv_text", "first_user_text", "last_assistant_text"]:
        assert got[col].tolist() == want[col].tolist(), col


def test_stream_match_new_evolving_state(spark, tmp_path_factory):
    """Streaming incremental ER: each micro-batch match_new's against the
    EVOLVING corpus state — a brand-new entity created by batch 1 must be
    a match target for batch 2 (the property stream_gazetteer_matches,
    whose index is static, does not have)."""
    import json
    import os
    import time

    from sparklink.pipeline import SparkDedupe
    from sparklink.score import FieldModel
    from sparklink.streaming import stream_match_new
    from sparklink.synth import write_fixture

    root = str(tmp_path_factory.mktemp("smn"))
    paths = write_fixture(spark, f"{root}/data", n_entities=24, seed=11)
    t = spark.read.parquet(paths["transcripts"])

    art = json.load(open("models/transcript_model.json"))
    dd = SparkDedupe(model=FieldModel.from_json(json.dumps(art)), threshold=float(art["threshold"]))

    # pick an entity whose conversations the FULL pipeline clusters
    # together (model-resolvable by construction): its convs go to the
    # two stream batches; everything else is the base corpus
    em_full = dd.partition(t)
    grp = (
        em_full.groupBy("canon_id")
        .agg(F.collect_list("record_id").alias("ids"))
        .where(F.size("ids") >= 2)
        .orderBy("canon_id")
        .first()
    )
    c1, c2 = sorted(grp["ids"])[:2]
    all_ids = sorted(r.conv_id for r in t.select("conv_id").distinct().collect())
    others = [i for i in all_ids if i not in (c1, c2)]
    batch1_ids = [c1] + others[:3]
    batch2_ids = [c2]
    base_t = t.where(F.col("conv_id").isin(others[3:]))
    em0 = dd.partition(base_t).localCheckpoint(eager=True)
    base_canons = {r.canon_id for r in em0.select("canon_id").distinct().collect()}

    src = f"{root}/stream_src"
    os.makedirs(src, exist_ok=True)
    t.where(F.col("conv_id").isin(batch1_ids)).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)  # distinct mtimes -> file order = batch order
    t.where(F.col("conv_id").isin(batch2_ids)).coalesce(1).write.mode("append").parquet(src)

    out, ckpt = f"{root}/deltas", f"{root}/ckpt"
    q = stream_match_new(
        spark, dd, src, t.schema, base_t, em0, out, ckpt, max_files_per_trigger=1
    )
    assert q.awaitTermination(600)

    deltas = spark.read.parquet(out)
    m = {r.record_id: (r.canon_id, r.batch_id) for r in deltas.collect()}
    # every streamed conversation resolved exactly once
    assert set(m) == set(batch1_ids) | set(batch2_ids)
    assert deltas.count() == len(m)
    # the two same-entity convs landed in DIFFERENT batches, share a canon
    # that did not exist in the base map: the later batch matched the
    # entity the earlier batch created
    assert m[c1][1] != m[c2][1]
    assert m[c1][0] == m[c2][0]
    assert m[c1][0] not in base_canons
