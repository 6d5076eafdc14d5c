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


def stream_match_new(
    spark,
    dd,
    stream_source_dir: str,
    transcripts_schema,
    existing_transcripts: DataFrame,
    entity_map: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuous incremental entity resolution: each arriving micro-batch
    of transcripts runs ``SparkDedupe.match_new`` against the CURRENT
    corpus state, and the state EVOLVES — an entity first seen in batch 1
    is a match target for batch 2. This is the streaming form of the
    reference's daily-ingest loop (gazetteer_postgres_example.py:285-345:
    search new rows against the index, UPDATE matches, INSERT the rest),
    with the three-way match_new semantics (gazetteer assign + in-batch
    dedupe + chain closure) per batch.

    The corpus state (canonical records + entity map) lives in the driver
    closure as lineage-bounded snapshots, unioned with each batch's
    output. Delivery semantics: the source checkpoint makes input files
    exactly-once across restarts, while the delta append to ``out_dir``
    is at-least-once on mid-batch retry — rows carry ``batch_id``, so a
    reader dedupes with ``row_number() over (partition by record_id order
    by batch_id)``. On restart, rebuild the state as initial corpus +
    appended deltas before calling this again; a production deployment
    holds both tables in a Catalog/Iceberg warehouse and MERGEs the delta
    instead (sinks.upsert_entity_map shape).

    Cost note: match_new re-indexes the gazetteer over the full corpus
    state each batch — O(corpus) per batch, the price of matching against
    everything seen so far. With ``dd.catalog`` attached the index build
    is fingerprint-cached, but the fingerprint changes every batch by
    construction; batch cadence should be sized accordingly (minutes, not
    milliseconds — the reference's analogue is a daily job).
    """
    state = {
        "records": canonicalize(existing_transcripts).localCheckpoint(eager=True),
        "em": entity_map.select("record_id", "canon_id", "cluster_score").localCheckpoint(eager=True),
    }

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # state is INSERT-only (matching the reference's daily-ingest
        # whose UPDATE path touches matched canonical rows, not re-sent
        # messy ones): a conv_id that re-arrives in a later micro-batch —
        # a duplicate send, or turns split across batches (assemble them
        # upstream with stream_assemble_conversations if that can happen)
        # — is anti-joined out here rather than unioned in as a duplicate
        # record with a second entity-map row (r4 ADVICE)
        batch_df = batch_df.join(
            state["em"].select(F.col("record_id").alias("conv_id")), "conv_id", "left_anti"
        )
        if batch_df.isEmpty():
            return
        # materialize the delta BEFORE the append so the union below never
        # re-runs the match plan, and the written rows are the unioned rows
        delta = dd.match_new(batch_df, state["records"], state["em"]).localCheckpoint(eager=True)
        delta.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)
        state["em"] = state["em"].unionByName(delta).localCheckpoint(eager=True)
        state["records"] = (
            state["records"].unionByName(canonicalize(batch_df)).localCheckpoint(eager=True)
        )

    reader = spark.readStream.schema(transcripts_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(stream_source_dir)
    writer = stream.writeStream.foreachBatch(handle_batch).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_assemble_conversations(transcript_stream: DataFrame) -> DataFrame:
    """Cross-batch conversation assembly — the custom stateful streaming
    operator (applyInPandasWithState, SURVEY §7 streaming note): turns of
    one conversation may arrive in different micro-batches; per-conv_id
    state accumulates every turn seen so far and each update emits the
    conversation's FULL turn set with a version counter (Update mode).
    Downstream batch ``canonicalize`` consumes the latest version per
    conversation, so ordering/cleaning/turn-collision semantics stay
    identical to the batch path (the state op only assembles — it never
    re-implements canonicalization).

    State is the JSON-encoded list of raw turns (exact-duplicate rows
    dropped; (conv,turn_idx) collisions kept so canonicalize's
    earliest-ts dedup applies unchanged). At 10^12-turn scale the state
    store shards by conv_id across executors; per-group state stays tiny
    (one conversation)."""
    import json

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "conv_id string, version int, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    state_schema = "turns string, version int"

    def assemble(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.exists:
            turns_raw, version = state.get
            turns = {tuple(t) for t in json.loads(turns_raw)}
        else:
            turns, version = set(), 0

        def _n(x):
            return None if x is None or (isinstance(x, float) and pd.isna(x)) else x

        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                ts = None if pd.isna(r.ts) else int(pd.Timestamp(r.ts).value // 1000)
                turns.add((int(r.turn_idx), _n(r.role), _n(r.text), _n(r.tool), ts))
        version += 1
        state.update((json.dumps(sorted(turns, key=lambda t: (t[0], str(t[1]), str(t[2])))), version))
        rows = sorted(turns, key=lambda t: (t[0], str(t[1]), str(t[2])))
        yield pd.DataFrame(
            {
                "conv_id": [conv_id] * len(rows),
                "version": [version] * len(rows),
                "turn_idx": [t[0] for t in rows],
                "role": [t[1] for t in rows],
                "text": [t[2] for t in rows],
                "tool": [t[3] for t in rows],
                "ts": [pd.NaT if t[4] is None else pd.Timestamp(t[4], unit="us") for t in rows],
            }
        )

    return transcript_stream.groupBy("conv_id").applyInPandasWithState(
        assemble, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


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
