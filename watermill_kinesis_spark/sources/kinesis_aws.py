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
  TRIM_HORIZON (their data is all post-start, KCL child-shard
  semantics), exhausted shards are tombstoned with a ``SHARD_END``
  marker — the reference's TERMINATE checkpoint (reference
  subscriber.go:78-88).
- **checkpointing** → the offset is ``{shard_id: position}``, stored in
  Spark's checkpoint offset log (replacing DynamoDB). A crash between
  read and commit replays from the last committed position — the same
  at-least-once window the reference leaves open (reference
  subscriber.go:61-63). Positions are ``None`` (TRIM_HORIZON), a
  sequence number, ``AT_TS:<epoch-seconds>`` (a LATEST start pinned by
  service timestamp — resolved O(1), never by scanning the shard from
  TRIM_HORIZON), or ``SHARD_END``.
- **per-record enrichment** → every row carries ``shard_id``,
  ``sequence_number``, ``partition_key`` and the service arrival
  timestamp, the metadata the reference injects per message
  (reference subscriber.go:60, marshaller.go:39-40).

Rows come out in ``WIRE_RECORD_SCHEMA`` — identical to the simulator's
— so everything downstream (codec, corrupt-skip, semantics, sinks) is
transport-agnostic; ``codec.unmarshal`` turns them into messages.

Two readers share the offset model; ``option("readerMode", ...)``
picks one:

- ``parallel`` (default) — a partition-planning
  ``DataSourceStreamReader``: one ``InputPartition`` per shard, every
  ``GetRecords`` call runs ON AN EXECUTOR. The driver does
  control-plane work only (one ``list_shards`` + merging tiny
  position-fence files per trigger), so read throughput scales with
  executors × shards — the 100 TB path. Executors report attained
  positions through fence files under ``positionDir`` (the engine's
  DynamoDB-checkpoint analogue). Fence I/O goes through pyarrow's
  filesystem layer (``fencestore.py``) so ``positionDir`` accepts the
  same URI schemes as ``checkpointLocation`` — file://, s3a://,
  hdfs://, gs:// — and works from executor Python workers, which have
  no JVM gateway for Hadoop's FileSystem API. It defaults to a
  DRIVER-LOCAL temp dir, valid only on local[n]; on a multi-node
  cluster point it at storage shared by driver and executors
  (NFS/EFS, s3a://, hdfs://) — a loud warning fires at start when the
  default is used, and the driver hard-fails (rather than silently
  re-reading the same window forever) if planned batches never
  surface a fence. The first attempt of a (epoch,
  shard) task records its attained position as the fence; task
  RETRIES replay deterministically up to that fence. Losing the
  fence dir costs nothing but replay width: positions live in
  Spark's offset log, so the contract degrades to the same
  at-least-once window the reference has.
- ``simple`` — a ``SimpleDataSourceStreamReader``: fetch on the
  driver with prefetch-cache replay (``readBetweenOffsets``
  re-fetches the exact (start, end] range). Right-sized for
  control-plane streams at the reference's own deployment shape
  (~10 shards/worker, reference README.md:30-32).

``boto3`` is imported lazily. Tests (and Localstack-free CI) inject a
client via ``option("clientfactory", "module:callable")`` — mirroring
the reference's own test strategy of faking the producer
(subscriber/subscriber_test.go:14-25). The factory is called with the
options dict when it accepts one argument (file-backed stubs need the
path), else with no arguments.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from watermill_kinesis_spark.sources.fencestore import FenceStore

from watermill_kinesis_spark.sources.kinesis_sim import WIRE_DDL

FORMAT_NAME = "kinesis_aws"

#: tombstone offset for a fully-consumed shard (post split/merge) —
#: the reference checkpoints nil at SHARD_END (subscriber.go:78-88)
SHARD_END = "SHARD_END"
#: a LATEST start pinned as a service-side timestamp (AT_TIMESTAMP
#: iterators re-resolve it identically across restarts, O(1) — no
#: TRIM_HORIZON scan, no poll cap)
AT_TS_PREFIX = "AT_TS:"
#: get_records polls per shard per micro-batch: bounds work per
#: trigger; records beyond this arrive in the next micro-batch
MAX_POLLS_PER_BATCH = 5


def _make_client(options) -> object:
    factory_path = options.get("clientfactory")
    if factory_path:
        mod_name, _, attr = factory_path.partition(":")
        import importlib

        factory = getattr(importlib.import_module(mod_name), attr)
        # Arity by signature, NOT try/except TypeError: catching would
        # also swallow TypeErrors raised INSIDE a one-arg factory body
        # and retry zero-arg, masking the real bug with a second error.
        import inspect

        try:
            takes_options = bool(inspect.signature(factory).parameters)
        except (TypeError, ValueError):  # builtins without signatures
            takes_options = True
        return factory(options) if takes_options else factory()
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


def _list_shards(client, stream: str) -> list[dict]:
    """Full shard descriptors (``ShardId`` + ``ParentShardId`` lineage),
    paginated."""
    shards: list[dict] = []
    kwargs = {"StreamName": stream}
    while True:
        resp = client.list_shards(**kwargs)
        shards.extend(resp.get("Shards", []))
        token = resp.get("NextToken")
        if not token:
            return sorted(shards, key=lambda s: s["ShardId"])
        kwargs = {"NextToken": token}


def _list_shard_ids(client, stream: str) -> list[str]:
    return [s["ShardId"] for s in _list_shards(client, stream)]


def _admit_new_shards(
    pos: dict, shards: list[dict], default_pos: str | None
) -> None:
    """Add unseen shards to the position map, honoring parent→child
    ordering across reshard: a child shard (one carrying a
    ``ParentShardId`` that is still listed) is DEFERRED until its
    parent's position is ``SHARD_END`` — the KCL drains a parent to its
    TERMINATE checkpoint before any worker leases the children
    (reference subscriber.go:78-88), which is what preserves per-key
    record order through a split. A MERGE child carries a second
    lineage edge, ``AdjacentParentShardId`` — the service sets both on
    the merged shard — and per-key order demands BOTH parents drain to
    SHARD_END before the child emits (a key that hashed into the
    adjacent parent continues in the child; admitting on the primary
    parent alone would let child records overtake the adjacent
    parent's tail). A parent that has aged out of the listing entirely
    gates nothing. New shards enter at ``default_pos`` — the query's
    pinned initial position (``AT_TS:`` behaves identically to
    TRIM_HORIZON on a post-start child, since all its records postdate
    the pin) — falling back to TRIM_HORIZON."""
    listed = {s["ShardId"] for s in shards}
    for s in shards:
        sid = s["ShardId"]
        if sid in pos:
            continue
        undrained = any(
            parent and parent in listed and pos.get(parent) != SHARD_END
            for parent in (s.get("ParentShardId"), s.get("AdjacentParentShardId"))
        )
        if undrained:
            continue  # a parent not drained yet: child waits a trigger
        pos[sid] = default_pos


#: rows per emitted Arrow batch — bounds executor/JVM memory per
#: transfer while amortizing the per-batch IPC cost; a fenced drain of
#: millions of rows streams as many batches, never one giant one
ARROW_BATCH_ROWS = 65536


def _rows_to_arrow_batches(rows: list[tuple]):
    """Pack decoded wire rows into ``pyarrow.RecordBatch``es (VERDICT
    r7 task 5): Spark 4's Python data source yields Arrow batches from
    ``read()`` directly, skipping the per-tuple, per-value bridge the
    worker otherwise runs (``records_to_arrow_batches``'s row loop —
    the measured ~10-11k rows/s/shard-task floor). Columns are built
    with C-speed ``pa.array`` calls; the timestamp column replicates
    the tuple path's ``LocalDataToArrowConversion`` semantics exactly
    (``astimezone(utc)`` — naive values are local time), so rows are
    bit-identical either way (pinned by the parallel-reader tests).

    Timezone contract (r8 ADVICE): arrival timestamps are assumed
    TZ-AWARE, which both botocore and the stub guarantee
    (``ApproximateArrivalTimestamp`` is always an aware UTC datetime).
    A NAIVE value would be localized via the OS zone here
    (``astimezone`` on a naive datetime) while the tuple path honors
    ``spark.sql.session.timeZone`` — if a future record source can
    emit naive arrivals, localize with the session timezone passed
    through reader options instead of relying on the OS zone."""
    import datetime as _dt

    import pyarrow as pa

    names = [
        "data",
        "partition_key",
        "sequence_number",
        "shard_id",
        "approximate_arrival_timestamp",
    ]
    for lo in range(0, len(rows), ARROW_BATCH_ROWS):
        chunk = rows[lo : lo + ARROW_BATCH_ROWS]
        cols = list(zip(*chunk))
        ts = [
            v.astimezone(_dt.timezone.utc) if v is not None else None
            for v in cols[4]
        ]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(cols[0], pa.string()),
                pa.array(cols[1], pa.string()),
                pa.array(cols[2], pa.string()),
                pa.array(cols[3], pa.string()),
                pa.array(ts, pa.timestamp("us", tz="UTC")),
            ],
            names=names,
        )


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


#: throttle retry budget for get_records: attempts and base backoff.
#: The KCL retries ProvisionedThroughputExceededException with backoff
#: (the service's documented contract: throttles are transient and
#: per-shard); failing the whole Spark task instead would tear down
#: and replay the entire batch for a routine rate blip.
THROTTLE_RETRIES = 5
THROTTLE_BACKOFF_S = 0.2

#: transient per-call error names worth a bounded in-task retry
_RETRYABLE = ("ProvisionedThroughputExceededException", "LimitExceededException")


def _get_records_throttled(client, **kwargs) -> dict:
    """``get_records`` with bounded exponential backoff on throttling.
    Any other failure (auth, network, iterator expiry) raises
    immediately — those are not resolved by waiting, and silently
    retrying them would hide real misconfiguration."""
    for attempt in range(THROTTLE_RETRIES):
        try:
            return client.get_records(**kwargs)
        except Exception as e:
            if (
                type(e).__name__ not in _RETRYABLE
                or attempt == THROTTLE_RETRIES - 1
            ):
                raise
            time.sleep(THROTTLE_BACKOFF_S * (2**attempt))
    raise AssertionError("unreachable")  # pragma: no cover


def _get_records_refreshing(
    client, stream: str, shard_id: str, it: str, last_pos: str | None, limit: int
) -> dict:
    """``get_records`` with throttle backoff AND a one-shot
    expired-iterator refresh: a shard iterator is only valid for ~5
    minutes, so any long stall between polls (GC pause, co-tenant
    freeze, slow task start, a big prior shard in the same task) ages
    it out. Because every consumed record's position is tracked in the
    offset alphabet, the consumer can mint a fresh iterator AT THE
    LAST POSITION and continue exactly where it stopped — losing
    nothing — instead of failing the task and replaying the whole
    batch (the KCL does the same refresh internally). Any second
    expiry inside one poll propagates: that is a stuck consumer, not
    a stale handle."""
    try:
        return _get_records_throttled(client, ShardIterator=it, Limit=limit)
    except Exception as e:
        if type(e).__name__ != "ExpiredIteratorException":
            raise
        fresh = _get_iterator(client, stream, shard_id, last_pos)
        if not fresh:
            return {"Records": [], "NextShardIterator": None}
        return _get_records_throttled(client, ShardIterator=fresh, Limit=limit)


def _get_iterator(client, stream: str, shard_id: str, pos: str | None) -> str | None:
    """Shard iterator for a stored position (see module docstring for
    the position alphabet)."""
    if pos is None:
        resp = client.get_shard_iterator(
            StreamName=stream, ShardId=shard_id, ShardIteratorType="TRIM_HORIZON"
        )
    elif isinstance(pos, str) and pos.startswith(AT_TS_PREFIX):
        from datetime import datetime, timezone

        t = float(pos[len(AT_TS_PREFIX) :])
        resp = client.get_shard_iterator(
            StreamName=stream,
            ShardId=shard_id,
            ShardIteratorType="AT_TIMESTAMP",
            Timestamp=datetime.fromtimestamp(t, tz=timezone.utc),
        )
    else:
        resp = client.get_shard_iterator(
            StreamName=stream,
            ShardId=shard_id,
            ShardIteratorType="AFTER_SEQUENCE_NUMBER",
            StartingSequenceNumber=pos,
        )
    return resp.get("ShardIterator")


def _pos_rank(pos: str | None) -> tuple:
    """Total order over stored positions: TRIM_HORIZON < AT_TS (by
    pinned time) < sequence numbers (numeric) < SHARD_END. Used to
    take the furthest-along of two offsets for the same shard."""
    if pos is None:
        return (0, 0)
    if isinstance(pos, str) and pos.startswith(AT_TS_PREFIX):
        return (1, float(pos[len(AT_TS_PREFIX) :]))
    if pos == SHARD_END:
        return (3, 0)
    return (2, int(pos))


def _max_pos(a: str | None, b: str | None) -> str | None:
    return a if _pos_rank(a) >= _pos_rank(b) else b


class KinesisAwsStreamReader(SimpleDataSourceStreamReader):
    """Driver-side GetRecords poller with per-shard position offsets
    (``readerMode=simple``; see module docstring)."""

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

    def _initial_pos(self) -> str | None:
        if self.starting_position == "TRIM_HORIZON":
            return None  # "from the shard's oldest record"
        # LATEST: pin "now" as a service-side timestamp. O(1) — the
        # previous design scanned from TRIM_HORIZON with a poll cap,
        # which cost O(shard retention) GetRecords at startup and, on
        # a shard holding more than the cap, silently REPLAYED a
        # mid-shard backlog. AT_TIMESTAMP re-resolves identically on
        # restart, so the offset stays deterministic.
        return f"{AT_TS_PREFIX}{time.time()}"

    def initialOffset(self) -> dict:
        client = self._client()
        pos = self._initial_pos()
        state: dict[str, str | None] = {}
        # parent-gated even at t0: a listing taken right after a split
        # still carries the drained-later parent; children wait for its
        # SHARD_END like any mid-stream pickup. "init" pins the start
        # position so deferred children later enter at the SAME pin
        # (AT_TS) instead of TRIM_HORIZON.
        _admit_new_shards(state, _list_shards(client, self.stream), pos)
        return {"shards": state, "init": pos}

    def _iterator_after(self, client, shard_id: str, seq: str | None) -> str | None:
        return _get_iterator(client, self.stream, shard_id, seq)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        client = self._client()
        state: dict[str, str | None] = dict(start.get("shards", {}))
        # reshard pickup, parent-gated (KCL TERMINATE ordering): a
        # child enters only after its parent drained to SHARD_END, at
        # the query's pinned initial position (≡ TRIM_HORIZON for
        # post-start children)
        _admit_new_shards(
            state, _list_shards(client, self.stream), start.get("init")
        )
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
                resp = _get_records_refreshing(
                    client, self.stream, shard_id, it,
                    state[shard_id], self.max_records,
                )
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
        return rows, {"shards": state, "init": start.get("init")}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        """Deterministic replay of the exact (start, end] range — the
        restarted-query path after a crash between read and commit.
        An ``AT_TS`` start replays from the same pinned timestamp, so
        the range is identical to the original read's."""
        client = self._client()
        start_shards = start.get("shards", {})
        rows: list[tuple] = []
        for shard_id, end_seq in sorted(end.get("shards", {}).items()):
            if end_seq is None:
                continue  # shard had produced nothing by `end`
            start_seq = start_shards.get(shard_id)
            if end_seq == SHARD_END and start_seq == SHARD_END:
                continue
            if isinstance(end_seq, str) and end_seq.startswith(AT_TS_PREFIX):
                continue  # LATEST pin unmoved ⇒ the range holds no records
            it = self._iterator_after(
                client, shard_id, None if start_seq == SHARD_END else start_seq
            )
            if not it:
                continue
            done = False
            last = None if start_seq == SHARD_END else start_seq
            while not done and it:
                resp = _get_records_refreshing(
                    client, self.stream, shard_id, it, last, self.max_records
                )
                recs = resp.get("Records", [])
                for rec in recs:
                    rows.extend(_record_rows(rec, shard_id))
                    last = rec["SequenceNumber"]
                    if end_seq != SHARD_END and rec["SequenceNumber"] == end_seq:
                        done = True
                        break
                it = resp.get("NextShardIterator")
                if not recs and not resp.get("MillisBehindLatest"):
                    break
        # MUST be an iterator (not a list): the checkpointed-replay
        # path type-checks the return strictly
        return iter(rows)


class _ShardPartition(InputPartition):
    """One Kinesis shard's work for one micro-batch. Carries everything
    the executor needs (client factory options included) so ``read``
    never depends on driver state."""

    def __init__(
        self,
        shard_id: str,
        start_pos: str | None,
        epoch: int,
        options: dict,
        stream: str,
        fence_dir: str,
        max_records: int,
        run: str,
    ):
        self.shard_id = shard_id
        self.start_pos = start_pos
        self.epoch = epoch
        self.options = options
        self.stream = stream
        self.fence_dir = fence_dir
        self.max_records = max_records
        self.run = run


class KinesisAwsParallelStreamReader(DataSourceStreamReader):
    """Partition-planning reader: one ``InputPartition`` per shard,
    ``GetRecords`` on executors (``readerMode=parallel``, the default —
    see module docstring for the fence/offset protocol)."""

    def __init__(self, options):
        # reuse the Simple reader's option validation + client cache
        self._base = KinesisAwsStreamReader(options)
        self.options = dict(options)
        self.stream = self._base.stream
        self.max_records = self._base.max_records
        self._epoch = 0
        #: furthest-known position per shard (offset-log authoritative;
        #: fence files only carry it between executors and driver)
        self._pos: dict[str, str | None] = {}
        #: the query's pinned initial position (None = TRIM_HORIZON,
        #: or AT_TS:<ts>); late shard pickups enter at this pin.
        #: Set by initialOffset, recovered from the offset log's
        #: "init" field in partitions() after a restart.
        self._init_pos: str | None = None
        import uuid as _uuid

        #: this run's token: fence FILENAMES are run-scoped so a
        #: restarted reader never mistakes an old run's fence for its
        #: own epoch-N replay target, while position MERGING reads all
        #: runs' fences (same positionDir = same logical query, so the
        #: positions are one monotone lineage)
        self._run = _uuid.uuid4().hex[:12]
        explicit = options.get("positiondir")
        self._explicit_dir = bool(explicit)
        if explicit:
            # stable across restarts → the last pre-crash batch's
            # attained positions are recovered from its fences and
            # nothing committed is re-read. The caller owns uniqueness:
            # one positionDir per query, like checkpointLocation.
            # Accepts the same URI schemes as checkpointLocation
            # (file://, s3a://, hdfs://, ...) — see fencestore.py.
            self._fence_dir = f"{explicit.rstrip('/')}/{self.stream}"
        else:
            # safe default: unique per run. A restart cannot see the
            # previous run's fences, so the last committed batch's
            # window is re-read (at-least-once — the same window the
            # reference leaves open); two unrelated queries can never
            # cross-contaminate positions. DRIVER-LOCAL, so only valid
            # when executors share the driver's filesystem (local[n]):
            # on a multi-node cluster executors would fence to their
            # own disks and the driver would never see progress — warn
            # loudly here, and _merge_fences hard-fails if it ever
            # observes that shape (planned batches, zero fences).
            self._fence_dir = os.path.join(
                __import__("tempfile").gettempdir(),
                "kinesis_aws_pos",
                f"{self.stream}-{self._run}",
            )
            import logging

            logging.getLogger(__name__).warning(
                "kinesis_aws readerMode=parallel is using a DRIVER-LOCAL "
                "positionDir default (%s). This only works when executors "
                "share the driver's filesystem (local[n]). On a multi-node "
                "cluster, set .option('positionDir', <shared URI>) to "
                "storage reachable by driver and executors (NFS/EFS, "
                "s3a://, hdfs://) — like checkpointLocation.",
                self._fence_dir,
            )
        self._store = FenceStore(self._fence_dir)
        #: livelock guard state: non-empty batches planned since a
        #: fence file was last observed (see latestOffset)
        self._planned_since_fence = 0

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_base"] = None  # client handles don't pickle
        return state

    def _client(self):
        if self._base is None:
            self._base = KinesisAwsStreamReader(self.options)
        return self._base._client()

    # -- offsets ------------------------------------------------------

    def initialOffset(self) -> dict:
        client = self._client()
        pos = self._base._initial_pos()
        self._init_pos = pos
        self._pos = {}
        # parent-gated admission even at t0 (see _admit_new_shards)
        _admit_new_shards(self._pos, _list_shards(client, self.stream), pos)
        return {"epoch": 0, "shards": dict(self._pos), "init": pos}

    def _merge_fences(self) -> None:
        names = self._store.list_names()
        saw_fence = False
        for name in names:
            if not name.endswith(".json"):
                continue
            fence = self._store.read_json(name)
            if fence is None:
                continue  # half-written fence: next trigger retries
            saw_fence = True
            shard = fence.get("shard")
            if shard:
                self._pos[shard] = _max_pos(self._pos.get(shard), fence.get("pos"))
        if saw_fence:
            self._planned_since_fence = 0

    def latestOffset(self) -> dict:
        client = self._client()
        self._merge_fences()
        if self._planned_since_fence >= 3:
            # Livelock guard: ≥3 consecutive non-empty batches planned
            # yet not ONE fence file ever became visible to the driver.
            # Tasks write a fence unconditionally on their first
            # attempt, so this shape means executors are fencing to a
            # filesystem the driver cannot see (driver-local default
            # positionDir on a multi-node cluster). Without this check
            # the query silently re-reads the same <=MAX_POLLS window
            # forever and never advances past it.
            listing_err = getattr(self._store, "last_list_error", None)
            cause = (
                f" The fence store's last listing attempt FAILED with: "
                f"{type(listing_err).__name__}: {listing_err} — fix that "
                "error (credentials/permissions/network) first."
                if listing_err is not None
                else ""
            )
            raise RuntimeError(
                "kinesis_aws parallel reader: executors' position fences "
                f"are not visible to the driver under {self._fence_dir!r} "
                "after 3 planned micro-batches — shard positions cannot "
                "advance (each trigger would re-read the same window). "
                "Set .option('positionDir', <URI>) to storage shared by "
                "driver and executors (NFS/EFS mount, s3a://, hdfs://), "
                "exactly like checkpointLocation." + cause
            )
        # reshard pickup, parent-gated: a child shard enters only after
        # its parent drained to SHARD_END (KCL TERMINATE ordering, so a
        # micro-batch can never hold child records that precede the
        # parent's tail in per-key order), at the query's pinned
        # initial position
        _admit_new_shards(
            self._pos, _list_shards(client, self.stream), self._init_pos
        )
        self._epoch += 1
        return {
            "epoch": self._epoch,
            "shards": dict(self._pos),
            "init": self._init_pos,
        }

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # Effective read start per shard = the FURTHEST of the two
        # offsets: `end` carries fence-merged positions (what the
        # previous batch actually consumed), `start` carries the
        # restored offset-log positions (authoritative after a restart,
        # when the fence dir is gone). Taking the max keeps both
        # replay-after-restart and steady-state correct.
        merged: dict[str, str | None] = {}
        for off in (start.get("shards", {}), end.get("shards", {})):
            for shard, pos in off.items():
                merged[shard] = _max_pos(merged.get(shard), pos)
        if self._init_pos is None:
            # restart path: recover the pinned initial position from
            # the logged offsets (initialOffset was not called)
            self._init_pos = end.get("init") or start.get("init")
        self._pos.update(
            {s: _max_pos(self._pos.get(s), p) for s, p in merged.items()}
        )
        # Seed the epoch counter from the offset log: after a restart
        # this instance starts at _epoch=0 while a replayed pending
        # batch plans under its LOGGED epoch N — without the seed, the
        # fresh counter would later reach N again and read() would
        # mistake the replay's stale fence for its own target (one
        # trigger of empty shards + an unfenced retry window).
        self._epoch = max(self._epoch, int(end.get("epoch", 0)))
        parts = [
            _ShardPartition(
                shard_id=shard,
                start_pos=pos,
                epoch=int(end.get("epoch", 0)),
                options=self.options,
                stream=self.stream,
                fence_dir=self._fence_dir,
                max_records=self.max_records,
                run=self._run,
            )
            for shard, pos in sorted(merged.items())
            if pos != SHARD_END
        ]
        if parts:
            self._planned_since_fence += 1
        return parts

    # -- executor side -------------------------------------------------

    def read(self, partition: _ShardPartition) -> Iterator:
        """Yields ``pyarrow.RecordBatch``es (see _rows_to_arrow_batches)."""
        client = _make_client(partition.options)
        # FenceStore, not POSIX: read() runs in executor Python workers
        # (no JVM gateway), and positionDir may be a remote URI
        store = FenceStore(partition.fence_dir)
        fence_name = f"{partition.run}.{partition.epoch}.{partition.shard_id}.json"
        fence = store.read_json(fence_name)
        target: str | None = fence.get("pos") if fence else None
        if target is not None and _pos_rank(target) <= _pos_rank(partition.start_pos):
            return iter(())  # fenced batch made no progress on this shard
        rows: list[tuple] = []
        try:
            it = _get_iterator(
                client, partition.stream, partition.shard_id, partition.start_pos
            )
        except Exception as e:
            # ONLY a vanished shard (aged past retention after close)
            # tombstones — any other failure (auth, throttle, network)
            # must fail the task loudly, never silently drop data
            if type(e).__name__ != "ResourceNotFoundException":
                raise
            it = None
        attained = partition.start_pos
        if not it:
            attained = SHARD_END
        else:
            polls = 0
            while it:
                # fenced replay drains to the fence, first attempts
                # respect the per-trigger poll budget
                if target is None and polls >= MAX_POLLS_PER_BATCH:
                    break
                polls += 1
                resp = _get_records_refreshing(
                    client, partition.stream, partition.shard_id, it,
                    attained, partition.max_records,
                )
                recs = resp.get("Records", [])
                done = False
                for rec in recs:
                    rows.extend(_record_rows(rec, partition.shard_id))
                    attained = rec["SequenceNumber"]
                    if target not in (None, SHARD_END) and attained == target:
                        done = True
                        break
                it = resp.get("NextShardIterator")
                if not it:
                    attained = SHARD_END  # closed shard fully drained
                    break
                if done or (not recs and not resp.get("MillisBehindLatest")):
                    break
        if target is None:
            # first attempt: record the fence so (a) the driver learns
            # the attained position at the next trigger and (b) task
            # retries replay exactly this range
            store.write_json(
                fence_name, {"shard": partition.shard_id, "pos": attained}
            )
        return _rows_to_arrow_batches(rows)

    def commit(self, end: dict) -> None:
        """Prune fences whose positions are durably in the offset log
        by now: other runs' fences entirely (merged at this run's first
        ``latestOffset``), and this run's fences two epochs behind the
        committed batch."""
        horizon = int(end.get("epoch", 0)) - 1
        for name in self._store.list_names():
            if ".tmp-" in name:
                # orphaned half-written fence from a crashed task: the
                # atomic rename never happened, so it holds nothing a
                # reader would consume — reap it
                self._store.delete(name)
                continue
            parts = name.split(".", 2)
            if len(parts) != 3:
                continue
            run, epoch_part = parts[0], parts[1]
            if run != self._run or (
                epoch_part.isdigit() and int(epoch_part) < horizon
            ):
                self._store.delete(name)

    def stop(self) -> None:
        # Only reap the DEFAULT (per-run) fence dir: an explicit
        # positionDir's fences are exactly what lets a restarted query
        # recover the final batch's attained positions — deleting them
        # on graceful stop would silently re-widen the replay window.
        if not self._explicit_dir:
            self._store.delete_all()


class _BatchShardPartition(InputPartition):
    def __init__(self, shard_id: str, start_pos: str | None, options: dict, stream: str):
        self.shard_id = shard_id
        self.start_pos = start_pos
        self.options = options
        self.stream = stream


class KinesisAwsBatchReader(DataSourceReader):
    """Batch read of a Kinesis stream — drain each shard from the
    starting position to its current tip, one ``InputPartition`` per
    shard with all ``GetRecords`` on executors (the backfill/bootstrap
    quadrant: load the retained stream history into the lake before
    switching to the streaming reader for the live tail). Polling
    stops at ``MillisBehindLatest == 0`` or shard close; records
    arriving mid-scan land in the streaming phase instead."""

    def __init__(self, options):
        self._base = KinesisAwsStreamReader(options)  # validation + start pos
        self.options = dict(options)
        self.stream = self._base.stream
        self._shard_filter: set[str] | None = None

    def pushFilters(self, filters):
        """Consume shard_id equality/IN filters: whole shard partitions
        are pruned before any task launches — the Python-source
        analogue of parquet partition pruning, same contract as the
        kinesis_sim batch reader. Everything else stays in Spark's
        plan."""
        from pyspark.sql.datasource import EqualTo, In

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
        client = self._base._client()
        pos = self._base._initial_pos()
        shards = _list_shard_ids(client, self.stream)
        if self._shard_filter is not None:
            shards = [s for s in shards if s in self._shard_filter]
        return [
            _BatchShardPartition(s, pos, self.options, self.stream)
            for s in shards
        ]

    def read(self, partition: _BatchShardPartition) -> Iterator:
        """Yields ``pyarrow.RecordBatch``es (see _rows_to_arrow_batches)."""
        client = _make_client(partition.options)
        it = _get_iterator(
            client, partition.stream, partition.shard_id, partition.start_pos
        )
        max_records = int(partition.options.get("maxrecords", "1000"))
        pending: list[tuple] = []
        while it:
            resp = _get_records_throttled(client, ShardIterator=it, Limit=max_records)
            recs = resp.get("Records", [])
            for rec in recs:
                pending.extend(_record_rows(rec, partition.shard_id))
            if len(pending) >= ARROW_BATCH_ROWS:
                yield from _rows_to_arrow_batches(pending)
                pending = []
            it = resp.get("NextShardIterator")
            if not recs and not resp.get("MillisBehindLatest"):
                break  # at the tip: the batch ends here
        yield from _rows_to_arrow_batches(pending)


class _AwsPutCommit(WriterCommitMessage):
    def __init__(self, n: int):
        self.n = n


class KinesisAwsWriter(DataSourceWriter):
    """Batch write quadrant: ``df.write.format("kinesis_aws")`` —
    every partition publishes its ``(data, partition_key)`` rows from
    its own executor through the chunked/retrying ``put_chunked`` path
    (≤500/call, per-record partial-failure retry — the two PutRecords
    behaviors the reference left as TODO/ignored, publisher.go:65,84).
    Kinesis appends are not transactional, so a retried task may
    re-publish — the same at-least-once produce contract the service
    itself gives every producer."""

    def __init__(self, options):
        self.options = dict(options)
        self.stream = options.get("streamname")
        if not self.stream:
            raise ValueError(
                "kinesis_aws write requires option('streamName', <stream>)"
            )

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        # imported here: runs on the executor
        from watermill_kinesis_spark.streaming.sink import (
            KinesisPublisher,
            PutRecordsEntry,
            put_chunked,
        )

        entries = [
            PutRecordsEntry(row.data, row.partition_key) for row in iterator
        ]
        n = 0
        if entries:
            pub = KinesisPublisher(
                self.stream, client=_make_client(self.options)
            )
            n = put_chunked(pub, entries)
        return _AwsPutCommit(n)

    def commit(self, messages):
        return None

    def abort(self, messages):
        return None  # appends are not transactional (at-least-once)


class KinesisAwsStreamWriter(DataSourceStreamWriter):
    """Streaming write quadrant: ``writeStream.format("kinesis_aws")``
    — every micro-batch publishes executor-side through the same
    chunked PutRecords path. Kinesis appends cannot be staged or
    rolled back, so epoch semantics are at-least-once: a replayed
    epoch re-publishes (consumers dedup by message uuid — the
    ``stream_dedup_uuid`` pattern), exactly the contract every real
    Kinesis producer lives with. A failed task raises → Spark leaves
    the epoch uncommitted and replays it from the checkpoint (the
    reference's nack, subscriber.go:61-63)."""

    def __init__(self, options):
        self._inner = KinesisAwsWriter(options)

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        return self._inner.write(iterator)

    def commit(self, messages, batchId) -> None:
        return None

    def abort(self, messages, batchId) -> None:
        return None  # appends are not transactional (at-least-once)


class KinesisAwsDataSource(DataSource):
    """format("kinesis_aws") — streaming read from a real Kinesis
    stream. Writes go through ``PublisherBuilder.with_kinesis()`` /
    ``streaming.sink.KinesisPublisher`` (the produce side)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return WIRE_DDL

    def reader(self, schema: StructType) -> KinesisAwsBatchReader:
        return KinesisAwsBatchReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> KinesisAwsWriter:
        if overwrite:
            raise ValueError(
                "kinesis_aws is append-only (a stream cannot be overwritten); "
                "use mode('append')"
            )
        return KinesisAwsWriter(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> KinesisAwsStreamWriter:
        return KinesisAwsStreamWriter(self.options)

    def streamReader(self, schema: StructType) -> KinesisAwsParallelStreamReader:
        mode = (self.options.get("readermode") or "parallel").lower()
        if mode == "simple":
            # raising NOT_IMPLEMENTED makes Spark fall back to
            # simpleStreamReader (the documented dispatch contract)
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader"},
            )
        if mode != "parallel":
            raise ValueError(
                f"readerMode must be 'parallel' or 'simple', got {mode!r}"
            )
        return KinesisAwsParallelStreamReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> KinesisAwsStreamReader:
        return KinesisAwsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the format on a session (vanilla sessions
    included — the driver's SparkSession carries none of our configs).

    Also flips ``spark.sql.python.filterPushdown.enabled`` (runtime-
    settable, default false): ``KinesisAwsBatchReader`` implements
    ``pushFilters`` and Spark hard-fails with
    ``DATA_SOURCE_PUSHDOWN_DISABLED`` when the flag is off — the same
    flip :func:`kinesis_sim.register` performs.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KinesisAwsDataSource)
