"""Streaming-semantics operators, registry-facing.

Each query here runs a REAL Structured Streaming query (file source →
``availableNow`` trigger → memory sink) and returns its result — these
are rows-only checks because the semantics (watermark late-drop,
within-watermark dedup, checkpointed redelivery) exist only on streams;
the window *arithmetic* itself is oracle-verified in batch by
operators/windows.py (SURVEY.md §2-C, driver contract note on
non-SQL-expressible ops).

Topic directories and checkpoints live under a per-query temp dir; the
memory-sink table name is unique per run so repeated driver invocations
don't collide.
"""

from __future__ import annotations

import os
import tempfile
import uuid as uuidlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table
from watermill_kinesis_spark.streaming import source as stream_source
from watermill_kinesis_spark.streaming.semantics import dedup_by_uuid


def _event_messages(spark: SparkSession, sf_dir: str, where=None) -> DataFrame:
    """events → canonical messages; event time rides in the metadata
    map as an ISO string (the payload stays opaque, like the
    reference's model)."""
    ev = load_table(spark, sf_dir, "events")
    if where is not None:
        ev = ev.where(where)
    return ev.select(
        F.col("event_id").cast("string").alias("uuid"),
        F.encode("props", "UTF-8").alias("payload"),
        F.create_map(
            F.lit("partitionKey"), F.col("user_id").cast("string"),
            F.lit("eventType"), F.col("event_type"),
            F.lit("eventTime"), F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        ).alias("metadata"),
    )


def _run_available_now(stream_df: DataFrame, name: str, checkpoint: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


@query("stream_roundtrip_counts", tags=("streaming",))
def stream_roundtrip_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish→subscribe round trip through the wire format on a real
    stream: events become messages, land in a sharded topic directory,
    are re-read with ``readStream`` + envelope decode (corrupt-skip
    on), and counted per event type. Verifies the full §3.1/§3.2
    lifecycle — marshal → transport → unmarshal — end to end. Rows-only: live streaming offsets and
    watermark state are not SQL-expressible; the arithmetic twin is
    oracle-checked in batch and the streaming invariants are asserted
    in tests/test_streaming.py."""
    run_id = uuidlib.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"wk_stream_{run_id}_")
    topic = os.path.join(base, "topic")
    msgs = _event_messages(spark, sf_dir, F.col("event_id") < 2000)
    stream_source.write_stream_files(msgs, topic, n_shards=4)
    decoded = stream_source.subscribe(spark, topic)
    counted = decoded.select(
        F.col("metadata").getItem("eventType").alias("event_type"),
        F.col("metadata").getItem("shardID").alias("shard_id"),
    )
    name = f"roundtrip_{run_id}"
    _run_available_now(counted, name, os.path.join(base, "ckpt"))
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("shard_id").alias("n_shards"),
        )
        .orderBy("event_type")
    )


@query("stream_dedup_uuid", tags=("streaming",))
def stream_dedup_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once → effective exactly-once: batch 1 of the topic is
    fully duplicated into batch 2 (simulated redelivery after a crash,
    reference README.md:51-53), and ``dropDuplicatesWithinWatermark``
    on the message uuid suppresses every replay. Output counts equal
    the unique-message count. Rows-only: live streaming offsets and
    watermark state are not SQL-expressible; the arithmetic twin is
    oracle-checked in batch and the streaming invariants are asserted
    in tests/test_streaming.py."""
    run_id = uuidlib.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"wk_dedup_{run_id}_")
    topic = os.path.join(base, "topic")
    msgs = _event_messages(spark, sf_dir, F.col("event_id") < 1000)
    # batch0: all messages; batch1: the same messages again (redelivery)
    stream_source.write_stream_files(msgs, topic, file_label="b0")
    stream_source.write_stream_files(msgs, topic, file_label="b1")
    decoded = stream_source.subscribe(spark, topic).withColumn(
        "event_time", F.col("metadata").getItem("eventTime").cast("timestamp")
    )
    deduped = dedup_by_uuid(decoded, delay="1 hour")
    name = f"dedup_{run_id}"
    _run_available_now(
        deduped.select("uuid"), name, os.path.join(base, "ckpt")
    )
    return spark.table(name).agg(
        F.count(F.lit(1)).alias("n_delivered"),
        F.countDistinct("uuid").alias("n_unique"),
    )


@query("watermark_late_drop", tags=("streaming",))
def watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics across a checkpointed restart: run 1
    processes the fresh events and commits its watermark; run 2 (same
    checkpoint — the crash/replay path) delivers only *ancient* events,
    ≥ 48 h older than the committed watermark, whose 6-hour windows are
    long closed — every one is dropped by late-record filtering
    (rows-only: watermark state is streaming-only semantics)
    (visible as ``numRowsDroppedByWatermark``). Two separate runs
    because Spark's late filter uses the watermark committed by the
    PREVIOUS batch: in-run it lags one micro-batch, across restart it
    gates immediately. Output exposes n_fresh/n_late inputs so the
    drop is visible: n_counted ≤ n_fresh despite n_late extra rows."""
    run_id = uuidlib.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"wk_wm_{run_id}_")
    topic = os.path.join(base, "topic")
    ev = load_table(spark, sf_dir, "events")
    fresh = _event_messages(spark, sf_dir, F.col("event_id") < 2000)
    # the reference point is the FRESH batch's own max event time —
    # that is what the watermark will be derived from after batch 0
    cutoff = ev.where(F.col("event_id") < 2000).agg(F.max("ts")).collect()[0][0]
    import datetime

    late_bound = cutoff - datetime.timedelta(hours=48)
    # batch 1 re-delivers OLD events from batch 0's range (event ids
    # correlate with time in the testdata, so a disjoint id range would
    # not be late) — the classic replay-after-crash arrival pattern
    late = _event_messages(
        spark,
        sf_dir,
        (F.col("event_id") < 2000) & (F.col("ts") < F.lit(late_bound)),
    )
    ckpt = os.path.join(base, "ckpt")
    out_dir = os.path.join(base, "out")

    def run_once() -> None:
        decoded = stream_source.subscribe(spark, topic).withColumn(
            "event_time", F.col("metadata").getItem("eventTime").cast("timestamp")
        )
        windowed = (
            decoded.withWatermark("event_time", "1 hour")
            .groupBy(F.window("event_time", "6 hours"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "n",
            )
        )
        q = (
            windowed.writeStream.format("json")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    stream_source.write_stream_files(fresh, topic, file_label="b0")
    run_once()  # commits the fresh watermark
    stream_source.write_stream_files(late, topic, file_label="b1")
    run_once()  # replay run: every late row gated by the watermark
    n_fresh, n_late = fresh.count(), late.count()
    return spark.read.json(out_dir).agg(
        F.sum("n").cast("bigint").alias("n_counted"),
        F.count(F.lit(1)).alias("n_windows"),
        F.lit(n_fresh).alias("n_fresh_input"),
        F.lit(n_late).alias("n_late_input"),
    )


@query("stream_stateful_accounting", tags=("streaming", "stateful"))
def stream_stateful_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (`applyInPandasWithState`) across a
    checkpointed restart: run 1 streams batch b0, run 2 (same
    checkpoint) streams b1 — per-key totals in run 2 CONTINUE from
    run 1's persisted state (cumulative ≥ batch counts), proving the
    state store survives the restart like the reference's checkpointed
    sequence numbers (subscriber.go:65-75). Rows-only: custom state is
    not SQL-expressible; invariants asserted in tests."""
    from watermill_kinesis_spark.streaming.stateful import key_accounting

    run_id = uuidlib.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"wk_state_{run_id}_")
    topic = os.path.join(base, "topic")
    ckpt = os.path.join(base, "ckpt")
    out_dir = os.path.join(base, "out")

    def run_once() -> None:
        decoded = stream_source.subscribe(spark, topic)
        acct = key_accounting(decoded)
        q = (
            acct.writeStream.format("json")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    b0 = _event_messages(spark, sf_dir, F.col("event_id") < 600)
    b1 = _event_messages(
        spark, sf_dir, (F.col("event_id") >= 600) & (F.col("event_id") < 1200)
    )
    stream_source.write_stream_files(b0, topic, file_label="b0")
    run_once()
    stream_source.write_stream_files(b1, topic, file_label="b1")
    run_once()  # restart: state restored from checkpoint, counts continue

    out = spark.read.schema(
        "partition_key string, n_messages long, n_bytes long, batch_messages long"
    ).json(out_dir)
    return out.groupBy("partition_key").agg(
        F.max("n_messages").alias("total_messages"),
        F.max("n_bytes").alias("total_bytes"),
        F.count(F.lit(1)).alias("n_emissions"),
    )


@query("stream_static_join", tags=("streaming", "join"))
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the live message stream enriches against the
    static customer dimension (loaded once per micro-batch, broadcast by
    Catalyst). The standard streaming-enrichment shape — dim lookups
    need no state, no watermark. Rows-only: live streaming offsets and
    watermark state are not SQL-expressible; the arithmetic twin is
    oracle-checked in batch and the streaming invariants are asserted
    in tests/test_streaming.py."""
    run_id = uuidlib.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"wk_ssj_{run_id}_")
    topic = os.path.join(base, "topic")
    msgs = _event_messages(spark, sf_dir, F.col("event_id") < 2000)
    stream_source.write_stream_files(msgs, topic)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("partition_key"),
        "c_mktsegment",
    )
    decoded = stream_source.subscribe(spark, topic).select(
        F.col("metadata").getItem("partitionKey").alias("partition_key")
    )
    enriched = decoded.join(cust, "partition_key", "left")
    name = f"ssj_{run_id}"
    _run_available_now(enriched, name, os.path.join(base, "ckpt"))
    return (
        spark.table(name)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


def _watermarked_click_buy_join(
    spark: SparkSession, sf_dir: str, prefix: str, how: str
):
    """Shared scaffolding for the stream-stream funnel joins: publish
    one batch of events to a topic, subscribe twice (clicks /
    purchases), watermark both sides 2 h, and join on same-user within
    a 1-hour window with the given join type. Returns the name of the
    memory table holding (user_c, click_ts, buy_ts) rows."""
    run_id = uuidlib.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"wk_{prefix}_{run_id}_")
    topic = os.path.join(base, "topic")
    msgs = _event_messages(spark, sf_dir, F.col("event_id") < 4000)
    stream_source.write_stream_files(msgs, topic)

    def side(kind: str, ts_alias: str, key_alias: str):
        return (
            stream_source.subscribe(spark, topic)
            .where(F.col("metadata").getItem("eventType") == kind)
            .select(
                F.col("metadata").getItem("partitionKey").alias(key_alias),
                F.col("metadata")
                .getItem("eventTime")
                .cast("timestamp")
                .alias(ts_alias),
            )
            .withWatermark(ts_alias, "2 hours")
        )

    clicks = side("click", "click_ts", "user_c")
    buys = side("purchase", "buy_ts", "user_b")
    joined = clicks.join(
        buys,
        (F.col("user_c") == F.col("user_b"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        how,
    )
    name = f"{prefix}_{run_id}"
    _run_available_now(
        joined.select("user_c", "click_ts", "buy_ts"),
        name,
        os.path.join(base, "ckpt"),
    )
    return name


@query("stream_stream_join", tags=("streaming", "join"))
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks and a time-range
    condition: click events join purchase events of the same user
    within 1 hour — both sides buffer state bounded by their
    watermarks, the canonical funnel/attribution shape. Rows-only:
    stream-stream state semantics are not SQL-expressible (DuckDB has
    no notion of two buffered sides)."""
    name = _watermarked_click_buy_join(spark, sf_dir, "s2j", "inner")
    return spark.table(name).agg(
        F.count(F.lit(1)).alias("n_attributed"),
        F.countDistinct("user_c").alias("n_users"),
    )


@query("stream_left_outer_join", tags=("streaming", "join"))
def stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join with watermarks: every click
    joins its within-1-hour purchase, and clicks with NO matching
    purchase are emitted null-padded once the watermark passes their
    join window — the semantics that separates outer from inner
    stream joins (Spark buffers the left row until the watermark
    proves no match can still arrive; an inner join would silently
    drop it). The canonical abandoned-funnel shape: conversion AND
    abandonment from one join. Rows-only: two watermark-bounded state
    buffers with timeout-driven null emission are not SQL-expressible;
    tests/test_streaming.py pins matched + abandoned = emitted rows
    AND brackets the abandoned count between the batch recompute and
    its watermark-flushable subset (clicks whose window never ages
    past the final watermark legitimately stay buffered at
    end-of-stream — the documented outer-join tail holdback)."""
    name = _watermarked_click_buy_join(spark, sf_dir, "slo", "left_outer")
    return spark.table(name).agg(
        F.count(F.lit(1)).alias("n_click_rows"),
        F.sum(F.when(F.col("buy_ts").isNotNull(), 1).otherwise(0)).alias(
            "n_matched"
        ),
        F.sum(F.when(F.col("buy_ts").isNull(), 1).otherwise(0)).alias(
            "n_abandoned"
        ),
        F.countDistinct("user_c").alias("n_users"),
    )


@query("statestore_reader_audit", tags=("streaming", "state", "observability"))
def statestore_reader_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's State Data Source: after a checkpointed streaming
    aggregation, ``spark.read.format("statestore")`` opens the state
    store FILES themselves — the ops/debugging face that lets an
    operator audit, backfill-verify, or migrate streaming state
    without replaying the stream (the engine-side replacement for the
    reference's "inspect the DynamoDB lease/checkpoint table"
    workflow). A per-key running count runs over one publish batch,
    then the state rows read back from the checkpoint must agree with
    the live query's own output: per-key counts AND the operator
    metadata (one 'stateStoreSave' operator). Rows-only: state-file
    layout is engine-internal; the count arithmetic itself is
    oracle-verified in batch by partition_key_group."""
    run_id = uuidlib.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"wk_ssr_{run_id}_")
    topic = os.path.join(base, "topic")
    ckpt = os.path.join(base, "ckpt")
    name = f"ssr_{run_id}"

    msgs = _event_messages(spark, sf_dir, F.col("event_id") < 2000)
    stream_source.write_stream_files(msgs, topic)
    counts = (
        stream_source.subscribe(spark, topic)
        .select(F.col("metadata").getItem("partitionKey").alias("partition_key"))
        .groupBy("partition_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    live = spark.table(name).select(
        "partition_key", F.col("n").alias("n_live")
    )
    meta = spark.read.format("state-metadata").load(ckpt)
    n_operators = meta.count()
    st = spark.read.format("statestore").load(ckpt)
    # key/value struct field names follow the aggregation's grouping
    # column and agg alias — resolve from the schema, not by guess
    key_field = st.schema["key"].dataType.names[0]
    val_field = st.schema["value"].dataType.names[0]
    state = st.select(
        F.col(f"key.{key_field}").alias("partition_key"),
        F.col(f"value.{val_field}").alias("n_state"),
    )
    return (
        state.join(live, "partition_key", "full_outer")
        .select(
            "partition_key",
            "n_state",
            "n_live",
            (F.col("n_state") == F.col("n_live")).alias("state_matches_live"),
            F.lit(n_operators).alias("n_state_operators"),
        )
        .orderBy("partition_key")
    )


def has_tws_runtime() -> bool:
    """``transformWithStateInPandas`` needs the protobuf-based state
    server protocol: the API exists in pyspark, but the streaming
    python runner crashes without ``google.protobuf``. The gate now
    goes through :mod:`..streaming.pbcompat`, which also discovers
    the Google Cloud SDK's vendored pure-python runtime when no pip
    package exists (this sandbox's case — r6 VERDICT task 6 closed
    the perpetual skip this way). An environment with NO runtime at
    all still gets an honest absence instead of a red query."""
    from watermill_kinesis_spark.streaming.stateful import HAS_TWS

    return HAS_TWS


def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (named state variables on a handle,
    RocksDB state store, timers, schema evolution) — running the SAME
    per-key accounting as ``stream_stateful_accounting`` across a
    checkpointed restart: run 1 streams batch b0, run 2 (same
    checkpoint) streams b1, and run-2 totals CONTINUE from run 1's
    persisted ValueState. Rows-only: custom state is not
    SQL-expressible; continuation invariants asserted in
    tests/test_streaming.py."""
    from watermill_kinesis_spark.streaming.pbcompat import (
        ensure_protobuf_on_workers,
    )
    from watermill_kinesis_spark.streaming.stateful import key_accounting_tws

    # ship the protobuf runtime to the session's python workers when
    # only a vendored copy exists (see pbcompat) — the state-schema
    # validation worker imports the stubs before any engine code runs
    if not ensure_protobuf_on_workers(spark):
        raise RuntimeError(
            "transformWithState requires a google.protobuf runtime"
        )

    run_id = uuidlib.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"wk_tws_{run_id}_")
    topic = os.path.join(base, "topic")
    ckpt = os.path.join(base, "ckpt")
    out_dir = os.path.join(base, "out")

    prior_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:

        def run_once() -> None:
            decoded = stream_source.subscribe(spark, topic)
            acct = key_accounting_tws(decoded)
            q = (
                acct.writeStream.format("json")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        b0 = _event_messages(spark, sf_dir, F.col("event_id") < 600)
        b1 = _event_messages(
            spark, sf_dir, (F.col("event_id") >= 600) & (F.col("event_id") < 1200)
        )
        stream_source.write_stream_files(b0, topic, file_label="b0")
        run_once()
        stream_source.write_stream_files(b1, topic, file_label="b1")
        run_once()  # restart: ValueState restored, totals continue
    finally:
        if prior_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prior_provider
            )

    out = spark.read.schema(
        "partition_key string, n_messages long, n_bytes long, batch_messages long"
    ).json(out_dir)
    return out.groupBy("partition_key").agg(
        F.max("n_messages").alias("total_messages"),
        F.max("n_bytes").alias("total_bytes"),
        F.count(F.lit(1)).alias("n_emissions"),
    )


if has_tws_runtime():  # pragma: no cover - container lacks protobuf
    query("stream_transform_with_state", tags=("streaming", "stateful", "spark4"))(
        stream_transform_with_state
    )


@query("stream_update_mode_counts", tags=("streaming", "output-mode"))
def stream_update_mode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update output mode — the third face of streaming aggregation
    output (append emits only finalized groups, complete re-emits all
    state, UPDATE emits just the groups a batch touched). Two publish
    batches flow through one unwatermarked running count; the memory
    sink accumulates one row per (key, update), and the LAST update
    per key must equal the batch ground truth. Rows-only: output-mode
    mechanics are not SQL-expressible; the count arithmetic is
    oracle-verified in batch by partition_key_group."""
    run_id = uuidlib.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"wk_upd_{run_id}_")
    topic = os.path.join(base, "topic")
    name = f"upd_{run_id}"

    for lo, hi, label in ((0, 1000, "b0"), (1000, 2000, "b1")):
        msgs = _event_messages(
            spark, sf_dir, (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        )
        stream_source.write_stream_files(msgs, topic, file_label=label)

    counts = (
        stream_source.subscribe(spark, topic)
        .select(F.col("metadata").getItem("partitionKey").alias("partition_key"))
        .groupBy("partition_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("partition_key")
        .agg(F.max("n").alias("n_messages"))
        .orderBy("partition_key")
    )


@query("stream_complete_mode_topk", tags=("streaming", "output-mode"))
def stream_complete_mode_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete output mode — the last of the three aggregation output
    modes (append emits finalized groups, update emits touched groups,
    COMPLETE re-emits the whole result table every batch): a running
    per-event-type leaderboard where each batch's emission REPLACES
    the sink table, the mode dashboards want. After draining two
    publish batches the final table must equal the batch ground truth
    exactly — not accumulate emissions. Rows-only: output-mode
    mechanics are not SQL-expressible; the count arithmetic is
    oracle-checked in batch by partition_key_group."""
    run_id = uuidlib.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"wk_cmp_{run_id}_")
    topic = os.path.join(base, "topic")
    name = f"cmp_{run_id}"

    for lo, hi, label in ((0, 1000, "b0"), (1000, 2000, "b1")):
        msgs = _event_messages(
            spark, sf_dir, (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        )
        stream_source.write_stream_files(msgs, topic, file_label=label)

    counts = (
        stream_source.subscribe(spark, topic)
        .select(F.col("metadata").getItem("eventType").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # complete mode: the memory sink holds exactly the LAST emission
    return spark.table(name).orderBy("event_type")
