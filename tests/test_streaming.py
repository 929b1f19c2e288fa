"""Streaming-layer tests, mirroring the reference's own test strategy
(SURVEY.md §5) Spark-first:

- codec round trip through a real stream, corrupt records skipped
  (reference subscriber.go:54-59)
- the no-loss/no-dup count invariant from subscriber_test.go:27-102,
  here as checkpointed restart + replay + uuid dedup = exactly-once
- publish chunking >500 and per-record failure retry — the two bugs
  the reference left open (publisher.go:65 TODO, publisher.go:84)
- per-key shard routing (marshaller.go:65-69)
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import Row, functions as F

from watermill_kinesis_spark import codec
from watermill_kinesis_spark.schema import MESSAGE_SCHEMA
from watermill_kinesis_spark.streaming import (
    CollectingPublisher,
    DirectoryPublisher,
    publish_batch,
    subscribe,
    write_stream_files,
)
from watermill_kinesis_spark.streaming.sink import PutRecordsEntry, put_chunked


def _messages(spark, n=100):
    rows = [
        Row(
            uuid=f"u-{i}",
            payload=f"payload-{i}".encode(),
            metadata={"partitionKey": f"k{i % 7}", "seq": str(i)},
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MESSAGE_SCHEMA)


def test_put_chunked_splits_above_500(spark):
    pub = CollectingPublisher()
    entries = [PutRecordsEntry(f"d{i}", f"k{i%3}") for i in range(1201)]
    n = put_chunked(pub, entries)
    assert n == 1201
    assert [len(c) for c in pub.calls] == [500, 500, 201]


def test_put_chunked_retries_partial_failures(spark):
    pub = CollectingPublisher(fail_first=5)
    entries = [PutRecordsEntry(f"d{i}", None) for i in range(10)]
    n = put_chunked(pub, entries)
    assert n == 10
    assert len(pub.records) == 10  # every failed record eventually landed
    assert len(pub.calls) == 2  # one retry call for the 5 failures


def test_put_chunked_raises_after_retry_budget(spark):
    class AlwaysFail:
        def put_records(self, entries):
            from watermill_kinesis_spark.streaming.sink import PutRecordsResult

            return PutRecordsResult(failed_indexes=list(range(len(entries))))

    with pytest.raises(RuntimeError, match="failed after"):
        put_chunked(AlwaysFail(), [PutRecordsEntry("d", None)], max_retries=2)


class _StubKinesisClient:
    """Mimics the boto3 kinesis client's put_records response shape:
    every call fails the first ``fail_first`` records once (throttle
    ErrorCode, the partial-failure mode the reference discards at
    publisher.go:84)."""

    def __init__(self, fail_first: int = 0):
        self.calls: list[dict] = []
        self.landed: list[dict] = []
        self._fail_budget = fail_first

    def put_records(self, StreamName, Records):
        self.calls.append({"StreamName": StreamName, "Records": Records})
        n_fail = min(self._fail_budget, len(Records))
        self._fail_budget -= n_fail
        out = []
        for i, r in enumerate(Records):
            if i < n_fail:
                out.append(
                    {
                        "ErrorCode": "ProvisionedThroughputExceededException",
                        "ErrorMessage": "Rate exceeded",
                    }
                )
            else:
                self.landed.append(r)
                out.append({"SequenceNumber": str(len(self.landed)), "ShardId": "shardId-0"})
        return {"FailedRecordCount": n_fail, "Records": out}


def test_kinesis_publisher_chunking_and_partial_failure_retry(spark):
    """The boto3-backed transport: ≤500-record PutRecords calls, utf-8
    Data, non-empty PartitionKey, and per-record retry of exactly the
    entries whose response row carries an ErrorCode."""
    from watermill_kinesis_spark.streaming.sink import KinesisPublisher

    client = _StubKinesisClient(fail_first=7)
    pub = KinesisPublisher("my-stream", client=client)
    entries = [PutRecordsEntry(f"d{i}", f"k{i % 3}" if i % 5 else None) for i in range(1203)]
    n = put_chunked(pub, entries)
    assert n == 1203
    # 3 chunks + 1 retry call for the 7 throttled records
    assert [len(c["Records"]) for c in client.calls] == [500, 7, 500, 203]
    assert all(c["StreamName"] == "my-stream" for c in client.calls)
    assert len(client.landed) == 1203
    # every record landed exactly once, bytes round-trip, keys non-empty
    datas = sorted(r["Data"].decode("utf-8") for r in client.landed)
    assert datas == sorted(f"d{i}" for i in range(1203))
    assert all(r["PartitionKey"] for r in client.landed)
    # keyless entries route under the shared default key
    assert sum(1 for r in client.landed if r["PartitionKey"] == "0") == len(
        [e for e in entries if e.partition_key is None]
    )


def test_kinesis_publisher_exhausts_retry_budget(spark):
    from watermill_kinesis_spark.streaming.sink import KinesisPublisher

    client = _StubKinesisClient(fail_first=10**9)  # throttle forever
    pub = KinesisPublisher("s", client=client)
    with pytest.raises(RuntimeError, match="failed after"):
        put_chunked(pub, [PutRecordsEntry("d", "k")], max_retries=2)


def test_builder_wires_kinesis_transport(spark):
    """with_kinesis flips the transport and the factory builds the
    boto3-backed publisher for the topic-as-stream-name (no directory
    endpoint required)."""
    from watermill_kinesis_spark.api import PublisherBuilder

    pub = (
        PublisherBuilder()
        .with_kinesis(region_name="eu-west-1", endpoint_url="http://localhost:4566")
        .build()
    )
    factory = pub._transport_factory("orders-stream")
    # the factory is executor-side; building it must not require boto3
    # here — only calling it does. Verify the closure carries the config.
    import inspect

    closure = inspect.getclosurevars(factory).nonlocals
    assert closure["stream_name"] == "orders-stream"
    assert closure["region_name"] == "eu-west-1"
    assert closure["endpoint_url"] == "http://localhost:4566"


def test_stream_roundtrip_with_corrupt_skip(spark, tmp_path):
    topic = str(tmp_path / "topic")
    msgs = _messages(spark, 60)
    write_stream_files(msgs, topic, n_shards=3)
    # poison record injected into one shard file (subscriber.go:54-59)
    poison = json.dumps(
        {
            "data": "{not valid json",
            "partition_key": "k0",
            "sequence_number": "999",
            "shard_id": "shard-0",
            "approximate_arrival_timestamp": None,
        }
    )
    with open(os.path.join(topic, "shard-0-poison.json"), "w") as f:
        f.write(poison + "\n")

    decoded = subscribe(spark, topic)
    q = (
        decoded.writeStream.format("memory")
        .queryName("rt_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("rt_test").collect()
    assert len(out) == 60  # poison skipped, nothing else lost
    by_uuid = {r.uuid: r for r in out}
    assert by_uuid["u-3"].payload == b"payload-3"
    assert by_uuid["u-3"].metadata["seq"] == "3"
    # system keys injected on consume (marshaller.go:35-40, subscriber.go:60)
    assert by_uuid["u-3"].metadata["partitionKey"] == "k3"
    assert by_uuid["u-3"].metadata["shardID"].startswith("shard-")


def test_same_key_same_shard(spark, tmp_path):
    """Kinesis routing contract: one partition key never spans shards."""
    topic = str(tmp_path / "topic")
    write_stream_files(_messages(spark, 200), topic, n_shards=4)
    shard_of: dict[str, set] = {}
    for fname in os.listdir(topic):
        with open(os.path.join(topic, fname)) as f:
            for line in f:
                rec = json.loads(line)
                shard_of.setdefault(rec["partition_key"], set()).add(rec["shard_id"])
    assert shard_of and all(len(s) == 1 for s in shard_of.values())


def test_restart_replay_exactly_once(spark, tmp_path):
    """The subscriber_test.go invariant under failure: process batch 1,
    'crash', deliver batch 2 after restart from the SAME checkpoint —
    every message delivered at least once, and uuid-dedup yields
    exactly the written set."""
    topic = str(tmp_path / "topic")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    m1 = _messages(spark, 50)
    write_stream_files(m1, topic, n_shards=2, file_label="b0")

    def run_once():
        decoded = subscribe(spark, topic)
        q = (
            decoded.selectExpr("uuid", "CAST(payload AS STRING) AS body")
            .writeStream.format("json")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # first run commits batch 0
    time.sleep(0.2)
    rows2 = [
        Row(uuid=f"u-{i}", payload=b"second", metadata={"partitionKey": "k"})
        for i in range(50, 80)
    ]
    write_stream_files(
        spark.createDataFrame(rows2, MESSAGE_SCHEMA), topic, n_shards=2, file_label="b1"
    )
    run_once()  # restart from checkpoint: only new files processed

    delivered = spark.read.json(out_dir)
    # no loss: all 80 unique messages present exactly once in the sink
    assert delivered.count() == 80
    assert delivered.select("uuid").distinct().count() == 80


def test_envelope_matches_reference_wire_format(spark):
    """The on-disk record's data field is the exact MessageData JSON
    shape from marshaller.go:16-20."""
    msgs = _messages(spark, 1)
    wire = codec.marshal(msgs).collect()[0]
    env = json.loads(wire.data)
    assert set(env) == {"watermill_message_uuid", "data", "headers"}
    assert env["watermill_message_uuid"] == "u-0"
    import base64

    assert base64.b64decode(env["data"]) == b"payload-0"
    assert env["headers"]["partitionKey"] == "k0"
    assert wire.partition_key == "k0"


def test_publish_batch_through_directory_publisher(spark, tmp_path):
    """publish → directory 'service' → subscribe: the sink and source
    interoperate on the wire format."""
    topic = str(tmp_path / "svc_topic")
    msgs = _messages(spark, 30)
    publish_batch(msgs, lambda: DirectoryPublisher(topic, n_shards=2))
    back = codec.unmarshal(
        spark.read.json(topic), drop_corrupt=True
    )
    rows = back.collect()
    assert len(rows) == 30
    assert {r.uuid for r in rows} == {f"u-{i}" for i in range(30)}


def test_directory_publisher_routing_is_deterministic(tmp_path):
    """Shard routing must not depend on PYTHONHASHSEED: the same
    partition key lands in the same shard file across processes/runs
    (per-key FIFO contract, reference marshaller.go:65-69). crc32 is
    process-independent; builtin hash() is not."""
    import zlib

    from watermill_kinesis_spark.streaming.sink import PutRecordsEntry

    topic = str(tmp_path / "det_topic")
    pub = DirectoryPublisher(topic, n_shards=4)
    keys = [f"key-{i}" for i in range(20)]
    pub.put_records([PutRecordsEntry('{"x":1}', k) for k in keys])
    routed = {}
    for fname in os.listdir(topic):
        shard = int(fname.split("-")[1])
        with open(os.path.join(topic, fname)) as f:
            for line in f:
                routed[json.loads(line)["partition_key"]] = shard
    for k in keys:
        assert routed[k] == zlib.crc32(k.encode()) % 4


def test_watermark_late_drop_semantics(spark, sf_dir):
    """Replayed ancient events must not re-open closed windows."""
    from watermill_kinesis_spark.operators.streaming_batch import watermark_late_drop

    row = watermark_late_drop(spark, sf_dir).collect()[0]
    assert row.n_late_input > 0, "testdata must produce a late batch"
    assert row.n_counted <= row.n_fresh_input


def test_stream_dedup_uuid_exactly_once(spark, sf_dir):
    from watermill_kinesis_spark.operators.streaming_batch import stream_dedup_uuid

    row = stream_dedup_uuid(spark, sf_dir).collect()[0]
    assert row.n_delivered == row.n_unique


def test_stateful_accounting_survives_restart(spark, sf_dir):
    """applyInPandasWithState totals must continue across a
    checkpointed restart (state restored, not reset)."""
    from watermill_kinesis_spark.operators.streaming_batch import (
        stream_stateful_accounting,
    )

    rows = stream_stateful_accounting(spark, sf_dir).collect()
    assert rows, "no accounting rows emitted"
    # keys touched in both runs emitted twice, with monotone totals ⇒
    # max(total) strictly greater than a single batch's contribution
    multi = [r for r in rows if r.n_emissions >= 2]
    assert multi, "no key spanned both runs — state continuity not exercised"
    for r in multi[:20]:
        assert r.total_messages >= r.n_emissions


def test_stream_static_join_enriches_all_rows(spark, sf_dir):
    """Every streamed message must find its customer dimension row
    (left join ⇒ no null segment when keys are customer-derived)."""
    from watermill_kinesis_spark.operators.streaming_batch import stream_static_join

    rows = stream_static_join(spark, sf_dir).collect()
    assert rows, "no enriched rows"
    segs = {r.c_mktsegment for r in rows}
    assert None not in segs, "stream row missed its dimension lookup"
    assert sum(r.n for r in rows) > 0


def test_stream_stream_join_within_interval(spark, sf_dir):
    """Attributed purchases exist and each user counts at most its
    click-purchase pairs inside the 1-hour window."""
    from watermill_kinesis_spark.operators.streaming_batch import stream_stream_join

    row = stream_stream_join(spark, sf_dir).collect()[0]
    assert row.n_attributed >= row.n_users >= 0


def test_stream_left_outer_join_conserves_clicks(spark, sf_dir):
    """Outer-join semantics: matched + abandoned accounts for every
    click exactly, and the abandoned count equals the batch-side
    anti-join recompute (clicks with NO same-user purchase within
    1 hour) — proving the watermark actually flushed the null-padded
    state instead of dropping it at end-of-stream."""
    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.streaming_batch import (
        stream_left_outer_join,
    )
    from watermill_kinesis_spark.sources.tables import load_table

    row = stream_left_outer_join(spark, sf_dir).collect()[0]
    assert row.n_click_rows == row.n_matched + row.n_abandoned
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 4000)
    # timestamps ride the wire as second-precision strings: truncate
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.date_trunc("second", "ts").alias("cts")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("ub"), F.date_trunc("second", "ts").alias("bts")
    )
    join_cond = (
        (F.col("user_id") == F.col("ub"))
        & (F.col("bts") >= F.col("cts"))
        & (F.col("bts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR"))
    )
    batch_abandoned = clicks.join(buys, join_cond, "left_anti")
    n_abandoned_total = batch_abandoned.count()
    # end-of-stream caveat: a click whose join window never ages past
    # the final watermark (min of the two sides' max ts, minus the 2 h
    # delay) stays buffered and is NOT emitted null-padded — so the
    # stream reports between [flushable, total] abandoned clicks
    max_c = clicks.agg(F.max("cts")).first()[0]
    max_b = buys.agg(F.max("bts")).first()[0]
    wm = min(max_c, max_b)
    n_flushable = batch_abandoned.where(
        F.col("cts") + F.expr("INTERVAL 3 HOUR") < F.lit(wm)
    ).count()
    assert n_flushable <= row.n_abandoned <= n_abandoned_total
    # ...and the tail holdback is the ONLY discrepancy allowed
    assert n_abandoned_total - row.n_abandoned <= (
        batch_abandoned.count() - n_flushable
    )


def test_rate_limited_drain_paces_micro_batches(spark, sf_dir, tmp_path):
    """Backpressure mapping (SURVEY.md §4.2): the reference bounds
    in-flight work structurally (unbuffered channel, 1 msg/shard;
    KCL MaxRecords per fetch) — here the same contract is
    maxFilesPerTrigger: a 4-file topic drained at 1 file/trigger must
    take ≥4 micro-batches, each bounded, with no loss overall."""
    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.messages import messages_from_events
    from watermill_kinesis_spark.streaming import source as stream_source

    topic = str(tmp_path / "topic")
    msgs = messages_from_events(spark, sf_dir).where(
        F.col("uuid").cast("bigint") < 800
    )
    n_in = msgs.count()
    stream_source.write_stream_files(msgs, topic, n_shards=4)

    decoded = stream_source.subscribe(spark, topic, max_files_per_trigger=1)
    q = (
        decoded.select("uuid")
        .writeStream.format("memory")
        .queryName("paced_drain")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(progress) >= 4  # one batch per file: bounded in-flight work
    assert max(p["numInputRows"] for p in progress) < n_in  # never all at once
    assert spark.table("paced_drain").count() == n_in  # and nothing lost


def test_reshard_mid_stream_no_loss(spark, sf_dir, tmp_path):
    """Shard split tolerance (reference §2-A #9: KCL TERMINATE/SHARD_END
    checkpointing when Kinesis reshards): the topic starts at 2 shards,
    is drained, then grows to 6 shards for a second batch consumed from
    the SAME checkpoint — the new shards must be picked up with no loss
    and no redelivery of the old shards' records."""
    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.messages import messages_from_events
    from watermill_kinesis_spark.streaming import source as stream_source

    topic = str(tmp_path / "topic")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    uid = F.col("uuid").cast("bigint")
    all_msgs = messages_from_events(spark, sf_dir)
    b0 = all_msgs.where(uid < 600)
    b1 = all_msgs.where((uid >= 600) & (uid < 1200))

    def drain():
        q = (
            stream_source.subscribe(spark, topic)
            .select("uuid", F.col("metadata").getItem("shardID").alias("shard_id"))
            .writeStream.format("json")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    stream_source.write_stream_files(b0, topic, n_shards=2, file_label="pre")
    drain()
    stream_source.write_stream_files(b1, topic, n_shards=6, file_label="post")
    drain()  # SAME checkpoint: only the new shards' files are unread

    out = spark.read.schema("uuid string, shard_id string").json(out_dir)
    n_in = b0.count() + b1.count()
    assert out.count() == n_in  # no loss across the split...
    assert out.select("uuid").distinct().count() == n_in  # ...and no replay
    # the second batch actually landed on the widened shard space
    assert out.select("shard_id").distinct().count() > 2


def test_idempotent_sink_survives_batch_replay(spark, sf_dir, tmp_path):
    """Crash-after-write-before-commit: delete the last epoch's commit
    marker and rerun — the replayed epoch must OVERWRITE its own output
    (same batch_id directory), so the sink holds exactly-once counts
    even though the engine's contract is at-least-once."""
    import os

    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.streaming_batch import _event_messages
    from watermill_kinesis_spark.streaming import source as stream_source
    from watermill_kinesis_spark.streaming.sink import idempotent_batch_sink

    topic = str(tmp_path / "topic")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    msgs = _event_messages(spark, sf_dir, F.col("event_id") < 400)
    stream_source.write_stream_files(msgs, topic)
    n_in = msgs.count()

    def run_once(ckpt_dir):
        q = (
            stream_source.subscribe(spark, topic)
            .writeStream.foreachBatch(idempotent_batch_sink(out))
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(ckpt)
    first = spark.read.parquet(out).count()
    assert first == n_in

    # simulate the crash window: the write happened, the commit didn't.
    # The replica checkpoint stands in for the restarted process (the
    # original session pins the live commit log and rejects external
    # edits to it).
    import shutil

    ckpt2 = str(tmp_path / "ckpt_after_crash")
    shutil.copytree(ckpt, ckpt2)
    # drop the query-id metadata so the restarted run registers a fresh
    # id (the manager treats a same-id query on a live path as
    # concurrent); offsets/commits — the actual progress — are kept
    os.remove(os.path.join(ckpt2, "metadata"))
    crc = os.path.join(ckpt2, ".metadata.crc")
    if os.path.exists(crc):
        os.remove(crc)
    commits = sorted(
        c for c in os.listdir(os.path.join(ckpt2, "commits"))
        if not c.startswith(".")
    )
    os.remove(os.path.join(ckpt2, "commits", commits[-1]))
    ccrc = os.path.join(ckpt2, "commits", f".{commits[-1]}.crc")
    if os.path.exists(ccrc):
        os.remove(ccrc)
    run_once(ckpt2)  # replays the uncommitted epoch into the SAME batch dir

    replayed = spark.read.parquet(out)
    assert replayed.count() == n_in  # no duplicates
    assert replayed.select("uuid").distinct().count() == n_in


def test_poison_batch_lands_in_dlq_and_stream_progresses(spark, sf_dir, tmp_path):
    """Bounded-retry → dead-letter: a batch whose processing keeps
    failing replays from the checkpoint (nack) exactly max_attempts-1
    times, then is quarantined under the DLQ and the stream completes —
    unlike the reference, whose unbounded nack loop
    (subscriber/subscriber.go:92-95) would wedge the shard forever.
    Every input row ends up in exactly one of: main sink, DLQ."""
    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.streaming_batch import _event_messages
    from watermill_kinesis_spark.streaming import source as stream_source
    from watermill_kinesis_spark.streaming.sink import (
        dead_letter_sink,
        idempotent_batch_sink,
    )

    topic = str(tmp_path / "topic")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    dlq = str(tmp_path / "dlq")
    msgs = _event_messages(spark, sf_dir, F.col("event_id") < 200)
    stream_source.write_stream_files(msgs, topic)
    n_in = msgs.count()
    # the poison marker: whichever batch carries this uuid fails
    poison_uuid = msgs.orderBy("uuid").first().uuid

    inner = idempotent_batch_sink(out)

    def picky(batch_df, batch_id):
        if batch_df.where(F.col("uuid") == poison_uuid).count() > 0:
            raise RuntimeError("poison batch: downstream keeps failing")
        inner(batch_df, batch_id)

    sink = dead_letter_sink(picky, dlq, max_attempts=3)

    def run_once():
        q = (
            stream_source.subscribe(spark, topic, max_files_per_trigger=1)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            return True
        except Exception:
            return False

    # attempt 1 and 2 fail (nack → replay-from-checkpoint on restart);
    # attempt 3 quarantines and the stream runs to completion
    attempts = 0
    while not run_once():
        attempts += 1
        assert attempts < 10, "stream never progressed past the poison batch"
    assert attempts == 2  # two failed runs before the quarantine run

    quarantined = spark.read.parquet(dlq)
    delivered = spark.read.parquet(out)
    assert quarantined.where(F.col("uuid") == poison_uuid).count() == 1
    assert delivered.where(F.col("uuid") == poison_uuid).count() == 0
    # conservation: every row in exactly one place
    assert quarantined.count() + delivered.count() == n_in
    assert quarantined.select("uuid").union(delivered.select("uuid")).distinct().count() == n_in


def test_chaos_reshard_corrupt_poison_restart_conserves_rows(spark, sf_dir, tmp_path):
    """One scenario, every failure mode the reference's transport can
    see, at once: corrupt records interleaved mid-stream (poison-record
    skip, subscriber.go:54-59), a reshard mid-stream (new shard files
    appear, §2-A #9), a poison BATCH that keeps failing downstream
    (bounded-retry → DLQ, vs the reference's unbounded nack), and
    restarts from the checkpoint after every failure. Invariant: every
    valid input message lands in exactly one of {main sink, DLQ},
    corrupt records in neither, nothing duplicated."""
    import json as jsonlib

    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.streaming_batch import _event_messages
    from watermill_kinesis_spark.streaming import source as stream_source
    from watermill_kinesis_spark.streaming.sink import (
        dead_letter_sink,
        idempotent_batch_sink,
    )

    topic = str(tmp_path / "topic")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    dlq = str(tmp_path / "dlq")

    # wave 1: two shards of valid messages
    msgs1 = _event_messages(spark, sf_dir, F.col("event_id") < 150)
    stream_source.write_stream_files(msgs1, topic, n_shards=2, file_label="w1")
    # corrupt records appended into an existing shard file's stream
    with open(f"{topic}/shard-0-corrupt.json", "w") as f:
        f.write(
            jsonlib.dumps(
                {
                    "data": "%%%not-base64-envelope%%%",
                    "partition_key": "kx",
                    "sequence_number": "999",
                    "shard_id": "shard-0",
                    "approximate_arrival_timestamp": None,
                }
            )
            + "\n"
            + "{truncated json\n"
        )
    # wave 2 = the reshard: files for two NEW shards appear mid-stream
    msgs2 = _event_messages(
        spark, sf_dir, (F.col("event_id") >= 150) & (F.col("event_id") < 250)
    )
    stream_source.write_stream_files(msgs2, topic, n_shards=4, file_label="w2")

    n_valid = msgs1.count() + msgs2.count()
    poison_uuid = msgs2.orderBy("uuid").first().uuid

    inner = idempotent_batch_sink(out)

    def picky(batch_df, batch_id):
        if batch_df.where(F.col("uuid") == poison_uuid).count() > 0:
            raise RuntimeError("downstream rejects this batch")
        inner(batch_df, batch_id)

    sink = dead_letter_sink(picky, dlq, max_attempts=2)

    def run_once():
        q = (
            stream_source.subscribe(spark, topic, max_files_per_trigger=2)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            return True
        except Exception:
            return False

    restarts = 0
    while not run_once():
        restarts += 1
        assert restarts < 10, "stream wedged"
    assert restarts == 1  # one nack replay, then quarantine

    delivered = spark.read.parquet(out)
    quarantined = spark.read.parquet(dlq)
    # conservation: all valid rows exactly once across sink+DLQ
    assert delivered.count() + quarantined.count() == n_valid
    all_uuids = delivered.select("uuid").union(quarantined.select("uuid"))
    assert all_uuids.distinct().count() == n_valid
    assert quarantined.where(F.col("uuid") == poison_uuid).count() == 1
    # corrupt records skipped, not delivered anywhere
    assert delivered.where(F.col("metadata")["partitionKey"] == "kx").count() == 0
    # the resharded wave's messages arrived (shard spread grew)
    shards = {
        r[0]
        for r in delivered.select(F.col("metadata")["shardID"]).distinct().collect()
    }
    assert len(shards) >= 3, f"reshard files not consumed: {shards}"


def test_streaming_progress_metrics_surface(spark, sf_dir, tmp_path):
    """Observability parity: the engine reports per-batch progress
    (rows, source offsets, durations) through the StreamingQuery
    progress API — the structured replacement for the reference's
    logged per-batch counts (its StdLogger, logger.go:54-177)."""
    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.streaming_batch import _event_messages
    from watermill_kinesis_spark.streaming import source as stream_source

    topic = str(tmp_path / "topic")
    msgs = _event_messages(spark, sf_dir, F.col("event_id") < 300)
    stream_source.write_stream_files(msgs, topic)
    n_in = msgs.count()

    q = (
        stream_source.subscribe(spark, topic)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p is not None]
    assert progresses, "no progress events recorded"
    assert sum(p["numInputRows"] for p in progresses) == n_in
    last = progresses[-1]
    assert last["sources"] and "durationMs" in last
    assert last["batchId"] >= 0


def test_state_ttl_expires_idle_keys(spark, sf_dir, tmp_path):
    """Bounded state for unbounded key spaces: keys idle past the TTL
    emit a final expired row with their intact totals, and the state is
    removed. Uses a live micro-batch query (processing-time timeouts
    fire while the query runs — an availableNow trigger never
    self-terminates once timeout batches are being scheduled)."""
    import time

    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.streaming_batch import _event_messages
    from watermill_kinesis_spark.streaming import source as stream_source
    from watermill_kinesis_spark.streaming.stateful import key_accounting_ttl

    topic = str(tmp_path / "topic")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ttl_ms = 2000

    b0 = _event_messages(
        spark, sf_dir, (F.col("event_id") < 300) & (F.col("user_id") < 30)
    )
    stream_source.write_stream_files(b0, topic, file_label="b0")

    acct = key_accounting_ttl(stream_source.subscribe(spark, topic), ttl_ms)
    q = (
        acct.writeStream.format("json")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        schema = "partition_key string, n_messages long, n_bytes long, expired boolean"
        expired_rows = []
        while time.time() < deadline:
            time.sleep(1.0)
            try:
                expired_rows = (
                    spark.read.schema(schema).json(out).where("expired").collect()
                )
            except Exception:
                continue
            if expired_rows:
                break
    finally:
        q.stop()
        q.awaitTermination()

    assert expired_rows, "no keys expired within the deadline"
    b0_counts = {
        r["k"]: r["n"]
        for r in b0.select(
            F.col("metadata").getItem("partitionKey").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in expired_rows:
        assert r["partition_key"] in b0_counts
        # totals were intact right up to expiry
        assert r["n_messages"] == b0_counts[r["partition_key"]]


def test_sim_publisher_roundtrips_bytes_payloads(spark, tmp_path):
    """KPL-packed (bytes) entries must survive the simulator transport:
    base64 on the JSON line, latin1-mapped in the string column, exact
    bytes via encode(data, 'ISO-8859-1')."""
    from pyspark.sql import functions as F

    from watermill_kinesis_spark.sources import kinesis_sim
    from watermill_kinesis_spark.streaming.sink import (
        DirectoryPublisher,
        PutRecordsEntry,
    )

    topic = str(tmp_path / "topic")
    payload = bytes(range(256)) * 2  # every byte value, not UTF-8 safe
    pub = DirectoryPublisher(topic, n_shards=2)
    pub.put_records(
        [
            PutRecordsEntry(payload, "pk-bytes"),
            PutRecordsEntry('{"plain":"json"}', "pk-str"),
        ]
    )
    kinesis_sim.register(spark)
    back = (
        spark.read.format("kinesis_sim")
        .option("path", topic)
        .load()
        .select("partition_key", F.encode("data", "ISO-8859-1").alias("raw"))
        .collect()
    )
    by_key = {r.partition_key: bytes(r.raw) for r in back}
    assert by_key["pk-bytes"] == payload
    assert by_key["pk-str"] == b'{"plain":"json"}'


import pytest as _pytest


def _tws_available() -> bool:
    from watermill_kinesis_spark.operators.streaming_batch import has_tws_runtime

    return has_tws_runtime()


@_pytest.mark.skipif(
    not _tws_available(),
    reason="transformWithState needs google.protobuf (absent in container)",
)
def test_transform_with_state_restart_continuation(spark, sf_dir):
    """transformWithState per-key totals must equal the batch-computed
    ground truth after the two-run checkpointed restart — state
    CONTINUES, never resets (the engine analogue of the reference's
    checkpoint-resume, subscriber.go:65-75)."""
    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.streaming_batch import (
        _event_messages,
        stream_transform_with_state,
    )

    got = {
        r.partition_key: (r.total_messages, r.total_bytes)
        for r in stream_transform_with_state(spark, sf_dir).collect()
    }
    truth = {
        r.partition_key: (r.n, r.b)
        for r in _event_messages(spark, sf_dir, F.col("event_id") < 1200)
        .select(
            F.col("metadata").getItem("partitionKey").alias("partition_key"),
            F.octet_length("payload").alias("len"),
        )
        .groupBy("partition_key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("len").alias("b"))
        .collect()
    }
    assert got == truth


def test_update_mode_final_counts_match_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.streaming_batch import (
        _event_messages,
        stream_update_mode_counts,
    )

    got = {
        r.partition_key: r.n_messages
        for r in stream_update_mode_counts(spark, sf_dir).collect()
    }
    truth = {
        r.partition_key: r.n
        for r in _event_messages(spark, sf_dir, F.col("event_id") < 2000)
        .select(F.col("metadata").getItem("partitionKey").alias("partition_key"))
        .groupBy("partition_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == truth


def test_dlq_markers_through_hadoop_fs_uri(spark, tmp_path):
    """The retry-budget markers must work through the Hadoop FileSystem
    API with a scheme-qualified URI (the remote-dlq_dir contract:
    s3a://, hdfs://, …) — exercised here with file:// so the code path
    is the FS abstraction, not driver-local os.* calls."""
    from pyspark.sql import Row

    from watermill_kinesis_spark.streaming.sink import dead_letter_sink

    dlq = f"file://{tmp_path}/dlq"
    attempts = {"n": 0}

    def failing(batch_df, batch_id):
        attempts["n"] += 1
        raise RuntimeError("poison")

    sink = dead_letter_sink(failing, dlq, max_attempts=3)
    batch = spark.createDataFrame([Row(x=1), Row(x=2)])

    import pytest

    for _ in range(2):  # first two failures re-raise (nack/replay)
        with pytest.raises(RuntimeError, match="poison"):
            sink(batch, 7)
    sink(batch, 7)  # third: budget spent -> quarantined, swallowed
    assert attempts["n"] == 3
    q = spark.read.parquet(f"{dlq}/batch_id=7")
    assert sorted(r.x for r in q.collect()) == [1, 2]
    # marker cleared after quarantine: a fresh epoch-7 gets full budget
    import os as oslib

    assert not oslib.path.exists(str(tmp_path / "dlq" / "_attempts" / "epoch-7"))


def test_complete_mode_table_is_replaced_not_accumulated(spark, sf_dir):
    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.streaming_batch import (
        _event_messages,
        stream_complete_mode_topk,
    )

    got = {
        r.event_type: r.n for r in stream_complete_mode_topk(spark, sf_dir).collect()
    }
    truth = {
        r.event_type: r.n
        for r in _event_messages(spark, sf_dir, F.col("event_id") < 2000)
        .select(F.col("metadata").getItem("eventType").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == truth  # replaced table == ground truth, no accumulation


def test_statestore_reader_matches_live_query(spark, sf_dir):
    """Spark 4 state data source: every state row read back from the
    checkpoint files equals the live query's output, keys are
    complete, and exactly one stateful operator is present."""
    from watermill_kinesis_spark.operators.streaming_batch import (
        statestore_reader_audit,
    )

    rows = statestore_reader_audit(spark, sf_dir).collect()
    assert rows, "no state rows read back"
    assert all(r.state_matches_live for r in rows)
    assert all(r.n_state_operators == 1 for r in rows)
    assert all(r.n_state is not None and r.n_live is not None for r in rows)
