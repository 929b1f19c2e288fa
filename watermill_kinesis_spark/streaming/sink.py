"""Kinesis-like publish sink.

Reference behavior reproduced and repaired (SURVEY.md §2-A #1, §3.1):
- ``Publish`` marshals messages and calls ``PutRecords``
  (reference publisher.go:64-86). The reference hard-errors above 500
  records (its batch split is a ``TODO``, reference publisher.go:65)
  and **discards** the ``PutRecords`` response, silently dropping
  partial failures (reference publisher.go:84). This sink chunks to
  ≤500 per call and retries failed entries with bounded attempts.
- The reference's builder bug — ``Build()`` never wires the marshaller
  (reference publisher.go:53-57) — has no analogue here: the codec is
  applied inline, there is no mutable builder state.

Scale design: the sink runs ``foreachPartition`` inside
``foreachBatch`` — every executor core publishes its own partition
concurrently; the service client is constructed per partition (never
serialized from the driver). Repartitioning by partition key before
publish preserves per-key ordering end-to-end.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, functions as F

from watermill_kinesis_spark import codec
from watermill_kinesis_spark.schema import MAX_RECORDS_PER_PUT


class PutRecordsEntry:
    """One wire record: (data, partition_key) — the shape of a Kinesis
    PutRecordsRequestEntry (reference marshaller.go:61-70)."""

    __slots__ = ("data", "partition_key")

    def __init__(self, data: str | bytes, partition_key: str | None):
        # str for the JSON envelope; bytes for pre-packed payloads
        # (KPL aggregate containers, custom binary codecs)
        self.data = data
        self.partition_key = partition_key


class PutRecordsResult:
    """Per-call result with per-record failures (the part of the
    PutRecords response the reference ignored)."""

    def __init__(self, failed_indexes: list[int] | None = None):
        self.failed_indexes = failed_indexes or []


class DirectoryPublisher:
    """File-backed stand-in for the Kinesis service: each put appends a
    JSON-lines file into the topic directory (readable by
    ``source.subscribe``). Used by tests and the local dev loop, same
    role as the reference's Localstack harness."""

    def __init__(self, topic_dir: str, n_shards: int = 4):
        self.topic_dir = topic_dir
        self.n_shards = n_shards
        #: absolute paths of every file this publisher wrote — lets a
        #: two-phase caller (kinesis_sim stream writer) stage puts in a
        #: side directory and publish them atomically on epoch commit
        self.written: list[str] = []

    def put_records(self, entries: list[PutRecordsEntry]) -> PutRecordsResult:
        import json
        import uuid as uuidlib
        import zlib

        os.makedirs(self.topic_dir, exist_ok=True)
        by_shard: dict[int, list[str]] = {}
        for seq, e in enumerate(entries):
            # bytes payloads (KPL aggregate containers, binary codecs)
            # round-trip through the JSON-lines transport as base64 +
            # a marker field; the kinesis_sim reader decodes them back
            # into the string `data` column latin1-mapped (one
            # codepoint per byte — recover exact bytes with
            # encode(data, 'ISO-8859-1')). json.dumps on raw bytes
            # would otherwise TypeError and crash the simulator.
            if isinstance(e.data, (bytes, bytearray)):
                import base64 as _b64

                data_repr: dict = {
                    "data": _b64.b64encode(bytes(e.data)).decode("ascii"),
                    "data_encoding": "base64",
                }
            else:
                data_repr = {"data": e.data}
            # deterministic hash: Python's builtin hash() is
            # PYTHONHASHSEED-randomized per process, which would route the
            # same key to different shards across executors/runs and break
            # the per-key FIFO contract (reference marshaller.go:65-69 —
            # Kinesis's MD5-of-partition-key routing is stable too)
            shard = (
                zlib.crc32(e.partition_key.encode("utf-8")) % self.n_shards
                if e.partition_key
                else 0
            )
            by_shard.setdefault(shard, []).append(
                json.dumps(
                    {
                        **data_repr,
                        "partition_key": e.partition_key,
                        "sequence_number": str(seq),
                        "shard_id": f"shard-{shard}",
                        "approximate_arrival_timestamp": None,
                    }
                )
            )
        # monotonic time prefix: lexicographic file order == publish
        # order within a producer, so shard-ordered readers (the
        # kinesis_sim source) replay each shard's records FIFO; the
        # random token breaks same-nanosecond collisions across
        # concurrent producers (cross-producer order is loose, exactly
        # like Kinesis sequence numbers across PutRecords calls)
        token = f"{time.time_ns():020d}-{uuidlib.uuid4().hex[:8]}"
        for shard, lines in by_shard.items():
            path = os.path.join(self.topic_dir, f"shard-{shard}-put-{token}.json")
            with open(path, "w") as f:
                f.write("\n".join(lines) + "\n")
            self.written.append(path)
        return PutRecordsResult()


class KinesisPublisher:
    """Real AWS Kinesis publisher behind the same ``put_records``
    protocol (reference publisher.go:79-85) — the deployable
    counterpart of ``DirectoryPublisher``.

    Differences from the reference, on purpose:
    - the ``PutRecords`` response is READ, not discarded (reference
      publisher.go:84): entries whose response row carries an
      ``ErrorCode`` (throttle, internal failure) surface as
      ``failed_indexes`` so ``put_chunked`` retries exactly those
      records with backoff;
    - >500-record requests never happen — ``put_chunked`` splits first
      (the reference hard-errors instead, publisher.go:65-68).

    ``boto3`` is imported lazily so the engine has no hard AWS
    dependency; pass ``endpoint_url`` for Localstack (the reference's
    own integration harness, example/docker-compose.yml:4-11). A
    pre-built ``client`` can be injected for tests. Construct this ON
    THE EXECUTOR (via a factory) — boto3 clients don't pickle."""

    def __init__(
        self,
        stream_name: str,
        region_name: str | None = None,
        endpoint_url: str | None = None,
        client: object | None = None,
    ):
        if client is None:
            try:
                import boto3  # noqa: PLC0415 — optional dependency
            except ImportError as e:  # pragma: no cover - env-dependent
                raise RuntimeError(
                    "KinesisPublisher requires boto3 (pip install boto3) "
                    "or an injected client"
                ) from e
            kwargs: dict = {}
            if region_name:
                kwargs["region_name"] = region_name
            if endpoint_url:
                # Localstack/custom-endpoint override, the reference's
                # WithEndpoint (publisher.go:28-34)
                kwargs["endpoint_url"] = endpoint_url
            client = boto3.client("kinesis", **kwargs)
        self._client = client
        self.stream_name = stream_name

    def put_records(self, entries: list[PutRecordsEntry]) -> PutRecordsResult:
        records = [
            {
                # bytes OR bytearray: PySpark materializes BinaryType
                # columns (e.g. the protobuf marshaller's wire) as
                # bytearray in foreachPartition rows
                "Data": bytes(e.data)
                if isinstance(e.data, (bytes, bytearray))
                else e.data.encode("utf-8"),
                # Kinesis requires a non-empty partition key; keyless
                # messages share one key = one shard, matching the
                # simulator's shard-0 routing for None keys
                "PartitionKey": e.partition_key or "0",
            }
            for e in entries
        ]
        resp = self._client.put_records(
            StreamName=self.stream_name, Records=records
        )
        failed = [
            i
            for i, r in enumerate(resp.get("Records", []))
            if r.get("ErrorCode")
        ]
        return PutRecordsResult(failed_indexes=failed)


def kinesis_publisher_factory(
    stream_name: str,
    region_name: str | None = None,
    endpoint_url: str | None = None,
) -> Callable[[], KinesisPublisher]:
    """Picklable zero-arg factory for ``publish_batch``/
    ``publish_stream``: ships only strings to the executor, builds the
    boto3 client there (clients are not serializable)."""

    def make() -> KinesisPublisher:
        return KinesisPublisher(
            stream_name, region_name=region_name, endpoint_url=endpoint_url
        )

    return make


class CollectingPublisher:
    """In-memory publisher for unit tests; optionally fails the first
    ``fail_first`` entries of each call once, to exercise the retry
    path the reference lacks."""

    def __init__(self, fail_first: int = 0):
        self.calls: list[list[PutRecordsEntry]] = []
        self.records: list[PutRecordsEntry] = []
        self._fail_budget = fail_first

    def put_records(self, entries: list[PutRecordsEntry]) -> PutRecordsResult:
        self.calls.append(entries)
        n_fail = min(self._fail_budget, len(entries))
        self._fail_budget -= n_fail
        self.records.extend(entries[n_fail:])
        return PutRecordsResult(failed_indexes=list(range(n_fail)))


def put_chunked(
    publisher,
    entries: list[PutRecordsEntry],
    max_per_call: int = MAX_RECORDS_PER_PUT,
    max_retries: int = 3,
    backoff_s: float = 0.05,
) -> int:
    """Publish entries in ≤``max_per_call`` chunks, retrying per-record
    failures (fixes reference publisher.go:65 TODO and the discarded
    response at publisher.go:84). Returns records published. Raises if
    records still fail after ``max_retries`` — the error must surface
    so Spark fails (and later retries) the batch: that is the nack
    path (SURVEY.md §2-A #7)."""
    published = 0
    for i in range(0, len(entries), max_per_call):
        chunk = entries[i : i + max_per_call]
        for attempt in range(max_retries + 1):
            result = publisher.put_records(chunk)
            failed = result.failed_indexes
            published += len(chunk) - len(failed)
            if not failed:
                break
            chunk = [chunk[j] for j in failed]
            if attempt == max_retries:
                raise RuntimeError(
                    f"{len(chunk)} records failed after {max_retries} retries"
                )
            time.sleep(backoff_s * (2**attempt))
    return published


def publish_batch(
    messages: DataFrame,
    publisher_factory: Callable[[], object],
    preserve_key_order: bool = True,
) -> None:
    """Batch publish: marshal + partition-parallel chunked put.

    ``publisher_factory`` is called once per partition ON THE EXECUTOR
    (a picklable zero-arg callable) — service clients never cross the
    driver/executor boundary."""
    wire = codec.marshal(messages)
    if preserve_key_order:
        # co-locate each key in one partition so chunked puts preserve
        # the per-key FIFO contract (reference marshaller.go:65-69)
        wire = wire.repartition(F.col("partition_key"))

    def run(rows: Iterator) -> None:
        entries = [PutRecordsEntry(r.data, r.partition_key) for r in rows]
        if entries:
            put_chunked(publisher_factory(), entries)

    wire.foreachPartition(run)


def publish_stream(
    messages: DataFrame,
    publisher_factory: Callable[[], object],
    checkpoint_dir: str,
    trigger_available_now: bool = False,
):
    """Streaming publish via ``foreachBatch``: each micro-batch goes
    through the same chunked/retrying path; the epoch commit after a
    successful batch is the reference's per-batch checkpoint
    (reference subscriber.go:65-70), and a raised error replays the
    batch from the checkpoint (at-least-once)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        publish_batch(batch_df, publisher_factory)

    writer = (
        messages.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def idempotent_batch_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Exactly-once file sink for ``foreachBatch``: each micro-batch
    lands in its own ``batch_id=<epoch>`` directory with
    ``mode("overwrite")``, so a replayed epoch (crash after the write
    but before the checkpoint commit — the at-least-once window the
    reference leaves open, subscriber.go:61-70) OVERWRITES its own
    previous output instead of appending duplicates. Epoch id +
    overwrite is the standard recipe for upgrading Spark's
    at-least-once ``foreachBatch`` contract to exactly-once on any
    atomically-replaceable target (files here; MERGE-on-epoch for
    tables, transactional produce for queues). Complements the
    consumer-side uuid dedup in semantics.dedup_by_uuid — either side
    alone suffices, together they survive non-idempotent readers AND
    non-replayable sinks."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return write


def dead_letter_sink(
    inner: Callable[[DataFrame, int], None],
    dlq_dir: str,
    max_attempts: int = 3,
) -> Callable[[DataFrame, int], None]:
    """Bounded-retry → dead-letter wrapper for any ``foreachBatch``
    sink — the engine's answer to the reference's UNBOUNDED nack loop
    (reference subscriber/subscriber.go:92-95, README.md:53: a nacked
    message redelivers immediately, forever, so one poison message
    wedges its shard permanently).

    Semantics: a failing epoch re-raises (→ Spark leaves the epoch
    uncommitted; the restarted query replays it from the checkpoint —
    the engine's nack), but only ``max_attempts`` times. On the last
    allowed failure the whole batch is quarantined as parquet under
    ``dlq_dir/batch_id=<epoch>`` (epoch-overwrite, so a replay of the
    quarantine itself stays idempotent) and the error is swallowed —
    the epoch commits and the stream PROGRESSES past the poison batch.
    Attempt counts persist as marker files under ``dlq_dir/_attempts``,
    so the budget survives driver restarts (which is exactly when it
    matters: each retry IS a restart).

    The quarantined parquet is a queryable DataFrame — replayable into
    the main sink after the bug is fixed, the operational contract a
    DLQ exists for. Complements the *record*-level corrupt-skip path
    (codec.unmarshal drop_corrupt, reference subscriber.go:54-59):
    that one handles undecodable records, this one handles decodable
    batches whose *processing* keeps failing.

    Marker I/O goes through the Hadoop FileSystem API resolved from the
    marker path itself — the SAME abstraction the parquet quarantine
    write uses — so a remote ``dlq_dir`` (s3a://, hdfs://, dbfs:/)
    works and the budget survives driver-host replacement (exactly when
    retries happen). Driver-local ``os`` calls would silently write a
    bogus local path in that case and the budget would never advance."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        marker = f"{dlq_dir}/_attempts/epoch-{batch_id}"
        fs, mpath = _hadoop_fs(spark, marker)
        try:
            inner(batch_df, batch_id)
        except Exception:
            prior = 0
            if fs.exists(mpath):
                prior = int(_fs_read_text(spark, fs, mpath).strip() or 0)
            attempts = prior + 1
            _fs_write_text(fs, mpath, str(attempts))
            if attempts < max_attempts:
                raise  # nack: uncommitted epoch replays on restart
            batch_df.write.mode("overwrite").parquet(
                f"{dlq_dir}/batch_id={batch_id}"
            )
            # budget spent and batch quarantined: clear the marker so a
            # FRESH checkpoint that happens to reuse this epoch id gets
            # a full budget. If this very epoch replays (crash between
            # quarantine and commit), the retries re-earn the same
            # quarantine — the overwrite keeps that idempotent.
            fs.delete(mpath, False)
            # swallow: the epoch commits; the stream moves on
            return
        # success: clear any stale budget so a later reuse of this
        # epoch id (fresh checkpoint) starts with a full budget
        if fs.exists(mpath):
            fs.delete(mpath, False)

    return write


def _hadoop_fs(spark, path_str: str):
    """(FileSystem, Path) for a URI via the session's Hadoop conf —
    resolves local paths, s3a://, hdfs://, etc. uniformly."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _fs_read_text(spark, fs, jpath) -> str:
    stream = fs.open(jpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _fs_write_text(fs, jpath, text: str) -> None:
    out = fs.create(jpath, True)  # overwrite; creates parent dirs
    try:
        out.write(bytearray(text, "utf-8"))
    finally:
        out.close()
