"""``kinesis_aws`` — the deployable AWS Kinesis streaming source
(Python Data Source API, Spark 4), the read-side counterpart of
``streaming.sink.KinesisPublisher``.

The reference consumes Kinesis through a KCL worker (reference
subscriber.go:114-128): the KCL discovers shards, leases them, pulls
``GetRecords`` batches, and checkpoints the last processed sequence
number to DynamoDB after each fully-handled batch (reference
subscriber.go:65-75). This source reproduces those semantics with
Spark's own machinery instead of the KCL's:

- **shard discovery** → ``list_shards`` on every micro-batch plan, so
  resharding (split/merge) is picked up mid-stream: new shards enter at
  the configured starting position, exhausted shards are tombstoned
  with a ``SHARD_END`` marker — the reference's TERMINATE checkpoint
  (reference subscriber.go:78-88).
- **checkpointing** → the offset is ``{shard_id: last sequence
  number}``, stored in Spark's checkpoint offset log (replacing
  DynamoDB). A crash between read and commit replays from the last
  committed sequence — the same at-least-once window the reference
  leaves open (reference subscriber.go:61-63).
- **replay** → ``readBetweenOffsets`` re-fetches exactly the
  (start, end] sequence range per shard with ``AT_SEQUENCE_NUMBER``
  iterators, which is what makes a checkpointed restart deterministic.
- **per-record enrichment** → every row carries ``shard_id``,
  ``sequence_number``, ``partition_key`` and the service arrival
  timestamp, the metadata the reference injects per message
  (reference subscriber.go:60, marshaller.go:39-40).

Rows come out in ``WIRE_RECORD_SCHEMA`` — identical to the simulator's
— so everything downstream (codec, corrupt-skip, semantics, sinks) is
transport-agnostic; ``codec.unmarshal`` turns them into messages.

This is a ``SimpleDataSourceStreamReader``: record fetch happens on
the driver, which matches the reference's own deployment shape (one
KCL worker owns ~10 shards, reference README.md:30-32) and is the
right v1 for control-plane-sized streams. The 100 TB path is the same
offset model behind a partition-planning ``DataSourceStreamReader``
(one ``InputPartition`` per shard, ``get_records`` on executors);
nothing downstream changes because the schema and offsets are shared.

``boto3`` is imported lazily. Tests (and Localstack-free CI) inject a
client via ``option("clientfactory", "module:callable")`` — mirroring
the reference's own test strategy of faking the producer
(subscriber/subscriber_test.go:14-25).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from watermill_kinesis_spark.sources.kinesis_sim import WIRE_DDL

FORMAT_NAME = "kinesis_aws"

#: tombstone offset for a fully-consumed shard (post split/merge) —
#: the reference checkpoints nil at SHARD_END (subscriber.go:78-88)
SHARD_END = "SHARD_END"
#: get_records polls per shard per micro-batch: bounds driver work per
#: trigger; records beyond this arrive in the next micro-batch
MAX_POLLS_PER_BATCH = 5


def _make_client(options) -> object:
    factory_path = options.get("clientfactory")
    if factory_path:
        mod_name, _, attr = factory_path.partition(":")
        import importlib

        return getattr(importlib.import_module(mod_name), attr)()
    try:
        import boto3  # noqa: PLC0415 — optional dependency
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "kinesis_aws requires boto3 (pip install boto3) or "
            "option('clientfactory', 'module:callable')"
        ) from e
    kwargs: dict = {}
    if options.get("regionname"):
        kwargs["region_name"] = options.get("regionname")
    if options.get("endpointurl"):
        # Localstack override (reference example/docker-compose.yml)
        kwargs["endpoint_url"] = options.get("endpointurl")
    return boto3.client("kinesis", **kwargs)


def _list_shard_ids(client, stream: str) -> list[str]:
    ids: list[str] = []
    kwargs = {"StreamName": stream}
    while True:
        resp = client.list_shards(**kwargs)
        ids.extend(s["ShardId"] for s in resp.get("Shards", []))
        token = resp.get("NextToken")
        if not token:
            return sorted(ids)
        kwargs = {"NextToken": token}


def _record_rows(rec: dict, shard_id: str) -> list[tuple]:
    """One Kinesis record → one or many wire rows. KPL aggregate
    containers (magic-prefixed, md5-sealed) unpack transparently —
    the de-aggregation the reference delegates to
    awslabs/kinesis-aggregation (reference go.mod:27); sub-records get
    ``<seq>:<i>`` sub-sequence numbers, KCL-style. A corrupt container
    falls through as a single undecodable row, which the downstream
    corrupt-skip drops (reference subscriber.go:54-59)."""
    from watermill_kinesis_spark.streaming import kpl

    data = rec["Data"]
    raw = bytes(data) if isinstance(data, (bytes, bytearray)) else str(data).encode()
    seq = rec.get("SequenceNumber")
    ts = rec.get("ApproximateArrivalTimestamp")
    if kpl.is_aggregated(raw):
        try:
            subs = kpl.deaggregate(raw)
        except ValueError:
            subs = None
        if subs is not None:
            return [
                (
                    payload.decode("utf-8", errors="replace"),
                    key,
                    f"{seq}:{i}",
                    shard_id,
                    ts,
                )
                for i, (key, payload) in enumerate(subs)
            ]
    return [
        (
            raw.decode("utf-8", errors="replace"),
            rec.get("PartitionKey"),
            seq,
            shard_id,
            ts,
        )
    ]


class KinesisAwsStreamReader(SimpleDataSourceStreamReader):
    """Driver-side GetRecords poller with per-shard sequence-number
    offsets (see module docstring for the semantics mapping)."""

    def __init__(self, options):
        self.options = options
        self.stream = options.get("streamname")
        if not self.stream:
            raise ValueError(
                "kinesis_aws requires option('streamName', <stream>)"
            )
        start = (options.get("startingposition") or "TRIM_HORIZON").upper()
        if start not in ("TRIM_HORIZON", "LATEST"):
            raise ValueError(
                f"startingPosition must be TRIM_HORIZON or LATEST, got {start!r}"
            )
        self.starting_position = start
        self.max_records = int(options.get("maxrecords", "1000"))
        self._client_obj = None

    def _client(self):
        if self._client_obj is None:
            self._client_obj = _make_client(self.options)
        return self._client_obj

    # -- offset protocol ---------------------------------------------

    def initialOffset(self) -> dict:
        client = self._client()
        shards = _list_shard_ids(client, self.stream)
        if self.starting_position == "TRIM_HORIZON":
            # None = "from the shard's oldest record"
            return {"shards": {s: None for s in shards}}
        # LATEST: resolve the current tip so the *offset* pins what
        # "latest" meant at start time (deterministic restart)
        state: dict[str, str | None] = {}
        for s in shards:
            state[s] = self._tip_sequence(client, s)
        return {"shards": state}

    def _tip_sequence(self, client, shard_id: str) -> str | None:
        """Newest sequence number currently in the shard (None if the
        shard is empty → behaves like TRIM_HORIZON)."""
        it = client.get_shard_iterator(
            StreamName=self.stream, ShardId=shard_id, ShardIteratorType="TRIM_HORIZON"
        )["ShardIterator"]
        last = None
        for _ in range(MAX_POLLS_PER_BATCH * 10):
            resp = client.get_records(ShardIterator=it, Limit=self.max_records)
            recs = resp.get("Records", [])
            if recs:
                last = recs[-1]["SequenceNumber"]
            it = resp.get("NextShardIterator")
            if not it or (not recs and not resp.get("MillisBehindLatest")):
                break
        return last

    def _iterator_after(self, client, shard_id: str, seq: str | None) -> str | None:
        if seq is None:
            resp = client.get_shard_iterator(
                StreamName=self.stream,
                ShardId=shard_id,
                ShardIteratorType="TRIM_HORIZON",
            )
        else:
            resp = client.get_shard_iterator(
                StreamName=self.stream,
                ShardId=shard_id,
                ShardIteratorType="AFTER_SEQUENCE_NUMBER",
                StartingSequenceNumber=seq,
            )
        return resp.get("ShardIterator")

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        client = self._client()
        state: dict[str, str | None] = dict(start.get("shards", {}))
        # reshard pickup: unseen shards enter at the starting position
        for shard_id in _list_shard_ids(client, self.stream):
            state.setdefault(shard_id, None)
        rows: list[tuple] = []
        for shard_id in sorted(state):
            seq = state[shard_id]
            if seq == SHARD_END:
                continue
            it = self._iterator_after(client, shard_id, seq)
            if not it:
                state[shard_id] = SHARD_END
                continue
            for _ in range(MAX_POLLS_PER_BATCH):
                resp = client.get_records(ShardIterator=it, Limit=self.max_records)
                recs = resp.get("Records", [])
                for rec in recs:
                    rows.extend(_record_rows(rec, shard_id))
                if recs:
                    state[shard_id] = recs[-1]["SequenceNumber"]
                it = resp.get("NextShardIterator")
                if not it:
                    # shard closed and drained: tombstone (TERMINATE
                    # checkpoint, reference subscriber.go:78-88)
                    state[shard_id] = SHARD_END
                    break
                if not recs and not resp.get("MillisBehindLatest"):
                    break  # caught up; next trigger continues
        # materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the iterator for possible replay
        return rows, {"shards": state}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        """Deterministic replay of the exact (start, end] range — the
        restarted-query path after a crash between read and commit."""
        client = self._client()
        start_shards = start.get("shards", {})
        rows: list[tuple] = []
        for shard_id, end_seq in sorted(end.get("shards", {}).items()):
            if end_seq is None:
                continue  # shard had produced nothing by `end`
            start_seq = start_shards.get(shard_id)
            if end_seq == SHARD_END and start_seq == SHARD_END:
                continue
            it = self._iterator_after(
                client, shard_id, None if start_seq == SHARD_END else start_seq
            )
            if not it:
                continue
            done = False
            while not done and it:
                resp = client.get_records(ShardIterator=it, Limit=self.max_records)
                recs = resp.get("Records", [])
                for rec in recs:
                    rows.extend(_record_rows(rec, shard_id))
                    if end_seq != SHARD_END and rec["SequenceNumber"] == end_seq:
                        done = True
                        break
                it = resp.get("NextShardIterator")
                if not recs and not resp.get("MillisBehindLatest"):
                    break
        # MUST be an iterator (not a list): the checkpointed-replay
        # path type-checks the return strictly
        return iter(rows)


class KinesisAwsDataSource(DataSource):
    """format("kinesis_aws") — streaming read from a real Kinesis
    stream. Writes go through ``PublisherBuilder.with_kinesis()`` /
    ``streaming.sink.KinesisPublisher`` (the produce side)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return WIRE_DDL

    def simpleStreamReader(self, schema: StructType) -> KinesisAwsStreamReader:
        return KinesisAwsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the format on a session."""
    spark.dataSource.register(KinesisAwsDataSource)
