"""Tests for the ``kinesis_sim`` Python Data Source (Spark 4 custom
format): batch read/write round-trip, shard partition pruning, and a
checkpointed streaming read with replay-from-offset semantics."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from watermill_kinesis_spark import codec
from watermill_kinesis_spark.schema import MESSAGE_SCHEMA
from watermill_kinesis_spark.sources import kinesis_sim
from watermill_kinesis_spark.streaming.sink import (
    DirectoryPublisher,
    PutRecordsEntry,
)


def _messages(spark, n):
    rows = [
        (f"u-{i}", f"payload-{i}".encode(), {"partitionKey": f"k{i % 5}"})
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MESSAGE_SCHEMA)


def test_batch_write_then_read_roundtrip(spark, tmp_path):
    topic = str(tmp_path / "topic")
    kinesis_sim.register(spark)
    wire = codec.marshal(_messages(spark, 40))
    (
        wire.write.format("kinesis_sim")
        .option("path", topic)
        .option("n_shards", "3")
        .mode("append")
        .save()
    )
    back = spark.read.format("kinesis_sim").option("path", topic).load()
    assert back.schema == kinesis_sim.WIRE_RECORD_SCHEMA
    msgs = codec.unmarshal(back, drop_corrupt=True)
    assert msgs.count() == 40
    assert {r.uuid for r in msgs.collect()} == {f"u-{i}" for i in range(40)}


def test_reader_one_partition_per_shard_and_fifo(spark, tmp_path):
    topic = str(tmp_path / "topic")
    pub = DirectoryPublisher(topic, n_shards=2)
    # two put calls → two files per touched shard; same key stays FIFO
    pub.put_records([PutRecordsEntry(json.dumps({"i": i}), "kA") for i in range(3)])
    pub.put_records([PutRecordsEntry(json.dumps({"i": i}), "kA") for i in range(3, 6)])
    kinesis_sim.register(spark)
    df = spark.read.format("kinesis_sim").option("path", topic).load()
    # one Spark partition per shard present
    n_shards_present = df.select("shard_id").distinct().count()
    assert df.rdd.getNumPartitions() == n_shards_present
    # per-shard scan preserves publish order (file order, then line order)
    rows = df.withColumn("pid", F.spark_partition_id()).collect()
    by_pid: dict[int, list[int]] = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(json.loads(r.data)["i"])
    for seq in by_pid.values():
        assert seq == sorted(seq)


def test_shard_filter_prunes_partitions(spark, tmp_path):
    topic = str(tmp_path / "topic")
    pub = DirectoryPublisher(topic, n_shards=4)
    pub.put_records(
        [PutRecordsEntry(json.dumps({"i": i}), f"key-{i}") for i in range(40)]
    )
    kinesis_sim.register(spark)
    df = spark.read.format("kinesis_sim").option("path", topic).load()
    all_shards = {r.shard_id for r in df.select("shard_id").distinct().collect()}
    assert len(all_shards) > 1
    target = sorted(all_shards)[0]
    pruned = df.filter(F.col("shard_id") == target)
    # pushFilters consumed the predicate → only one shard partition scanned
    assert pruned.rdd.getNumPartitions() == 1
    assert {r.shard_id for r in pruned.collect()} == {target}


def test_stream_read_with_checkpoint_replay(spark, tmp_path):
    topic = str(tmp_path / "topic")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pub = DirectoryPublisher(topic, n_shards=2)
    kinesis_sim.register(spark)

    def run_once():
        q = (
            spark.readStream.format("kinesis_sim")
            .option("path", topic)
            .load()
            .writeStream.format("json")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    pub.put_records([PutRecordsEntry(json.dumps({"i": i}), f"k{i}") for i in range(10)])
    run_once()
    pub.put_records(
        [PutRecordsEntry(json.dumps({"i": i}), f"k{i}") for i in range(10, 25)]
    )
    run_once()  # restart from checkpoint: only the new files are read

    delivered = spark.read.json(out_dir)
    assert delivered.count() == 25
    assert delivered.select("partition_key").distinct().count() == 25


def test_writer_rejects_overwrite(spark, tmp_path):
    kinesis_sim.register(spark)
    wire = codec.marshal(_messages(spark, 1))
    try:
        (
            wire.write.format("kinesis_sim")
            .option("path", str(tmp_path / "t"))
            .mode("overwrite")
            .save()
        )
        raise AssertionError("overwrite must be rejected")
    except Exception as e:  # Py4J wraps the ValueError
        assert "append-only" in str(e)


def test_empty_topic_reads_zero_rows(spark, tmp_path):
    kinesis_sim.register(spark)
    df = (
        spark.read.format("kinesis_sim")
        .option("path", str(tmp_path / "nothing"))
        .load()
    )
    assert df.count() == 0


def test_stream_writer_stages_and_publishes_per_epoch(tmp_path):
    """Two-phase epoch visibility: write() stages (invisible to the
    reader's *.json listing), commit() publishes by rename, abort()
    deletes — so a failed micro-batch leaves no visible records, and
    orphans from a dead task are swept at next writer init."""
    import os
    from types import SimpleNamespace

    from watermill_kinesis_spark.sources.kinesis_sim import (
        KinesisSimStreamWriter,
        _list_files,
    )

    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    w = KinesisSimStreamWriter({"path": topic, "n_shards": "2"})

    rows = [SimpleNamespace(data=f"d{i}", partition_key=f"k{i % 2}") for i in range(6)]
    msg = w.write(iter(rows))
    assert msg.n == 6 and msg.staged
    assert _list_files(topic) == []  # staged epoch is invisible
    assert all(os.path.exists(p) for p in msg.staged)

    # abort: staged files vanish, topic stays empty
    w.abort([msg, None], batchId=0)
    assert _list_files(topic) == []
    assert not any(os.path.exists(p) for p in msg.staged)

    # fresh epoch: commit renames into the topic dir
    msg2 = w.write(iter(rows))
    w.commit([msg2], batchId=1)
    assert len(_list_files(topic)) == len(msg2.staged)
    assert not any(os.path.exists(p) for p in msg2.staged)

    # a dead task's orphaned staging stays invisible until swept
    msg3 = w.write(iter(rows))
    assert any(os.path.exists(p) for p in msg3.staged)
    assert len(_list_files(topic)) == len(msg2.staged)  # reader unaffected
    assert w.sweep() == len(msg3.staged)
    assert not any(os.path.exists(p) for p in msg3.staged)


def test_stream_write_quadrant_roundtrip(spark, sf_dir, tmp_path):
    """Fourth quadrant: writeStream.format('kinesis_sim') relays one
    topic into another through a streaming query; the relayed topic
    must batch-read back with identical counts and keys."""
    from pyspark.sql import functions as F

    from watermill_kinesis_spark import codec
    from watermill_kinesis_spark.operators.streaming_batch import _event_messages
    from watermill_kinesis_spark.sources import kinesis_sim
    from watermill_kinesis_spark.streaming import source as stream_source

    kinesis_sim.register(spark)
    src_topic = str(tmp_path / "src")
    dst_topic = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    msgs = _event_messages(spark, sf_dir, F.col("event_id") < 500)
    stream_source.write_stream_files(msgs, src_topic)
    n_in = msgs.count()

    relay = codec.marshal(
        stream_source.subscribe(spark, src_topic)
    )
    q = (
        relay.writeStream.format("kinesis_sim")
        .option("path", dst_topic)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    back = codec.unmarshal(
        spark.read.format("kinesis_sim").option("path", dst_topic).load(),
        drop_corrupt=True,
    )
    assert back.count() == n_in
    assert back.select("uuid").distinct().count() == n_in
    # per-key FIFO routing survived the relay: same key set
    src_keys = {r["partition_key"] for r in codec.marshal(msgs).select("partition_key").distinct().collect()}
    dst_keys = {
        r[0]
        for r in back.select(
            F.col("metadata").getItem("partitionKey")
        ).distinct().collect()
    }
    assert dst_keys == src_keys
