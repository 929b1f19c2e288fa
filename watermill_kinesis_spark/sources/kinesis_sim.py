"""``kinesis_sim`` — a PySpark-native custom data source (Python Data
Source API, Spark 4) for the Kinesis-like directory transport.

This is the engine's answer to the reference's pluggable transport
(reference subscriber.go:114-128 wires a KCL worker; publisher.go:64-86
wires PutRecords): a *registered Spark format* so users read/write the
simulated stream with plain ``spark.read`` / ``df.write`` /
``spark.readStream`` instead of bespoke helper functions.

    spark.dataSource.register(KinesisSimDataSource)
    df = spark.read.format("kinesis_sim").option("path", topic).load()
    wire.write.format("kinesis_sim").option("path", topic).mode("append").save()
    stream = spark.readStream.format("kinesis_sim").option("path", topic).load()

Scale design:

- **One input partition per shard** — each Spark task scans exactly one
  shard's files in (file, line) order, preserving the per-shard FIFO the
  reference's transport guarantees (SURVEY.md §2-A: per-shard ordering).
  Shard count = source parallelism, exactly like real Kinesis.
- **Partition pruning at the source**: ``pushFilters`` handles
  ``shard_id = ...`` / ``shard_id IN (...)`` by dropping whole shard
  partitions before any task launches — the Python-source analogue of
  parquet partition pruning.
- **Executor-side writes**: the batch writer publishes each partition
  through the same chunked/retrying ``put_chunked`` path as the
  ``foreachBatch`` sink (≤500 records per call, reference
  publisher.go:13), so per-key ordering is preserved when the caller
  pre-partitions by ``partition_key``.
- The streaming reader is a ``SimpleDataSourceStreamReader`` (offsets =
  the set of consumed files; replayable between checkpointed offsets ⇒
  at-least-once, reference subscriber.go:65-75). It reads on the
  driver, which is correct for the simulator's small control-plane
  volume; a production Kinesis source would implement
  ``DataSourceStreamReader`` with per-shard ``InputPartition`` so record
  fetch happens on executors.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from datetime import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from watermill_kinesis_spark.schema import WIRE_RECORD_SCHEMA

FORMAT_NAME = "kinesis_sim"

#: wire-record DDL, kept in lockstep with schema.WIRE_RECORD_SCHEMA
WIRE_DDL = (
    "data string, partition_key string, sequence_number string, "
    "shard_id string, approximate_arrival_timestamp timestamp"
)


def _shard_of(fname: str) -> str:
    # DirectoryPublisher / write_stream_files name files shard-<k>-...
    return "-".join(fname.split("-")[:2])


def _list_files(topic_dir: str) -> list[str]:
    if not os.path.isdir(topic_dir):
        return []
    return sorted(f for f in os.listdir(topic_dir) if f.endswith(".json"))


def _parse_line(line: str) -> tuple:
    rec = json.loads(line)
    ts = rec.get("approximate_arrival_timestamp")
    if isinstance(ts, str):
        ts = datetime.fromisoformat(ts)
    data = rec.get("data")
    if rec.get("data_encoding") == "base64":
        # bytes payload published through DirectoryPublisher (KPL
        # containers etc.): surface latin1-mapped in the string column;
        # consumers recover exact bytes with encode(data, 'ISO-8859-1')
        import base64 as _b64

        data = _b64.b64decode(data).decode("latin-1")
    return (
        data,
        rec.get("partition_key"),
        rec.get("sequence_number"),
        rec.get("shard_id"),
        ts,
    )


def _read_files(topic_dir: str, files: Sequence[str]) -> Iterator[tuple]:
    for fname in files:
        with open(os.path.join(topic_dir, fname)) as f:
            for line in f:
                if line.strip():
                    yield _parse_line(line)


class _ShardPartition(InputPartition):
    def __init__(self, shard: str, files: list[str]):
        self.shard = shard
        self.files = files


class KinesisSimBatchReader(DataSourceReader):
    """Batch scan: one partition per shard, files read in sorted order
    so each task yields its shard's records in publish order."""

    def __init__(self, options):
        self.topic_dir = options.get("path")
        if not self.topic_dir:
            raise ValueError("kinesis_sim requires option('path', <topic dir>)")
        self._shard_filter: set[str] | None = None

    def pushFilters(self, filters):
        """Consume shard_id equality/IN filters (source-level partition
        pruning); everything else stays in Spark's plan."""
        unsupported = []
        for flt in filters:
            if isinstance(flt, EqualTo) and flt.attribute == ("shard_id",):
                self._shard_filter = {flt.value}
            elif isinstance(flt, In) and flt.attribute == ("shard_id",):
                self._shard_filter = set(flt.values)
            else:
                unsupported.append(flt)
        return iter(unsupported)

    def partitions(self) -> Sequence[InputPartition]:
        by_shard: dict[str, list[str]] = {}
        for fname in _list_files(self.topic_dir):
            by_shard.setdefault(_shard_of(fname), []).append(fname)
        if self._shard_filter is not None:
            by_shard = {
                s: fs for s, fs in by_shard.items() if s in self._shard_filter
            }
        if not by_shard:
            return [_ShardPartition("shard-empty", [])]
        return [_ShardPartition(s, fs) for s, fs in sorted(by_shard.items())]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        return _read_files(self.topic_dir, partition.files)


class KinesisSimStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch offsets over the directory: an offset is the sorted
    list of files already consumed, so (start, end] replay is exact —
    restart-from-checkpoint re-reads precisely the uncommitted files
    (at-least-once, reference subscriber.go:61-75)."""

    def __init__(self, options):
        self.topic_dir = options.get("path")
        if not self.topic_dir:
            raise ValueError("kinesis_sim requires option('path', <topic dir>)")

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        seen = set(start.get("seen", []))
        now = _list_files(self.topic_dir)
        new = [f for f in now if f not in seen]
        end = {"seen": sorted(seen | set(new))}
        # materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the iterator for possible replay
        return list(_read_files(self.topic_dir, new)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        seen = set(start.get("seen", []))
        replay = [f for f in end.get("seen", []) if f not in seen]
        # MUST be an iterator (not a list): the replay path — a
        # restarted query re-reading an uncommitted epoch from the
        # offset log — type-checks the return strictly
        # (DATA_SOURCE_INVALID_RETURN_TYPE otherwise)
        return iter(list(_read_files(self.topic_dir, replay)))


class _PutCommit(WriterCommitMessage):
    def __init__(self, n: int, staged: list[str] | None = None):
        self.n = n
        #: staged file paths (stream writer only) — published by
        #: rename at epoch commit, deleted at abort
        self.staged = staged or []


class KinesisSimWriter(DataSourceWriter):
    """Executor-side publish of wire rows ``(data, partition_key)``
    through the chunked/retrying put path (≤500/call, reference
    publisher.go:13; fixes its unsplit-batch TODO and ignored partial
    failures)."""

    def __init__(self, options):
        self.topic_dir = options.get("path")
        if not self.topic_dir:
            raise ValueError("kinesis_sim requires option('path', <topic dir>)")
        self.n_shards = int(options.get("n_shards", "4"))

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        # imported here: runs on the executor
        from watermill_kinesis_spark.streaming.sink import (
            DirectoryPublisher,
            PutRecordsEntry,
            put_chunked,
        )

        entries = [
            PutRecordsEntry(row.data, row.partition_key) for row in iterator
        ]
        n = 0
        if entries:
            n = put_chunked(
                DirectoryPublisher(self.topic_dir, self.n_shards), entries
            )
        return _PutCommit(n)

    def commit(self, messages):
        return None

    def abort(self, messages):
        # appends are not transactional in the simulator, same as real
        # Kinesis: a retried task may re-publish (at-least-once)
        return None


class KinesisSimStreamWriter(DataSourceStreamWriter):
    """Streaming publish: every micro-batch's wire rows go through the
    same chunked/retrying put path as the batch writer — this is the
    continuous face of the reference's ``Publisher.Publish`` loop
    (publisher.go:64-86) with epoch tracking from the engine.

    Two-phase per-epoch visibility: tasks STAGE their put files into
    ``<topic>/_staging`` (invisible to readers — the source lists only
    ``*.json`` directly under the topic dir), and ``commit(messages,
    batchId)`` — which the engine calls only after every task of the
    micro-batch succeeded, the reference's after-the-batch checkpoint
    (subscriber.go:65-70) on the produce side — renames them into the
    topic dir. ``abort`` deletes the staged files, so a failed or
    aborted micro-batch leaves NO visible records: readers only ever
    see whole epochs. (Real Kinesis appends are not transactional —
    there a retried put duplicates, and consumers upgrade via uuid
    dedup or epoch-id idempotent sinks, streaming/sink.py. The
    simulator is deliberately stricter so tests can distinguish
    sink-side duplication from source-side replay.) A task that dies
    before returning its commit message may orphan files in
    ``_staging``; they are never visible to readers and ``sweep()``
    removes them when no query is running. (No automatic init-time
    sweep: the engine constructs writer instances per epoch phase, so
    an init sweep would race in-flight stagings.)"""

    def __init__(self, options):
        self.topic_dir = options.get("path")
        if not self.topic_dir:
            raise ValueError("kinesis_sim requires option('path', <topic dir>)")
        self.n_shards = int(options.get("n_shards", "4"))
        self.staging_dir = os.path.join(self.topic_dir, "_staging")

    def sweep(self) -> int:
        """Remove orphaned staging files (dead tasks of finished
        queries). Call between queries, never while one is running."""
        n = 0
        if os.path.isdir(self.staging_dir):
            for f in os.listdir(self.staging_dir):
                try:
                    os.remove(os.path.join(self.staging_dir, f))
                    n += 1
                except OSError:
                    pass
        return n

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        from watermill_kinesis_spark.streaming.sink import (
            DirectoryPublisher,
            PutRecordsEntry,
            put_chunked,
        )

        entries = [
            PutRecordsEntry(row.data, row.partition_key) for row in iterator
        ]
        n = 0
        pub = DirectoryPublisher(self.staging_dir, self.n_shards)
        if entries:
            n = put_chunked(pub, entries)
        return _PutCommit(n, staged=pub.written)

    def commit(self, messages, batchId) -> None:
        # all tasks succeeded: publish the epoch atomically-per-file by
        # renaming staged files into the readable topic dir (names keep
        # their time token, so per-shard FIFO order is preserved)
        for m in messages:
            for path in getattr(m, "staged", []):
                os.replace(
                    path,
                    os.path.join(self.topic_dir, os.path.basename(path)),
                )

    def abort(self, messages, batchId) -> None:
        # drop everything the failed epoch staged; messages may hold
        # None for tasks that never completed (their leftovers are
        # swept on next writer init)
        for m in messages:
            if m is None:
                continue
            for path in getattr(m, "staged", []):
                try:
                    os.remove(path)
                except FileNotFoundError:
                    pass


class KinesisSimDataSource(DataSource):
    """format("kinesis_sim") — batch read, batch write, streaming read,
    streaming write: all four quadrants of the Python Data Source API."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return WIRE_DDL

    def reader(self, schema: StructType) -> KinesisSimBatchReader:
        return KinesisSimBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> KinesisSimStreamReader:
        return KinesisSimStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> KinesisSimWriter:
        if overwrite:
            raise ValueError(
                "kinesis_sim is append-only (a stream has no overwrite); "
                "use mode('append')"
            )
        return KinesisSimWriter(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "KinesisSimStreamWriter":
        return KinesisSimStreamWriter(self.options)


def register(spark) -> None:
    """Idempotently register the format on a session (vanilla sessions
    included — the driver's SparkSession carries none of our configs).

    Also flips ``spark.sql.python.filterPushdown.enabled`` (runtime-
    settable, default false): a reader that implements ``pushFilters``
    hard-fails without it, and source-level shard pruning is the point.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KinesisSimDataSource)


__all__ = [
    "FORMAT_NAME",
    "KinesisSimDataSource",
    "register",
    "WIRE_DDL",
    "WIRE_RECORD_SCHEMA",
]
