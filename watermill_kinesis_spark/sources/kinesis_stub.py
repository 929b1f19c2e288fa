"""In-memory boto3-Kinesis lookalike for tests and the dev loop.

Implements the three calls the ``kinesis_aws`` source uses
(``list_shards`` / ``get_shard_iterator`` / ``get_records``) with real
Kinesis semantics: per-shard monotonically-increasing sequence
numbers, iterator types TRIM_HORIZON / AT_SEQUENCE_NUMBER /
AFTER_SEQUENCE_NUMBER, ``MillisBehindLatest`` backlog signaling, and
closed shards that drain then return a null ``NextShardIterator``
(the SHARD_END condition, reference subscriber.go:78-88).

This is the consume-side counterpart of ``sink.CollectingPublisher``
and plays the same role as the reference's ``testProducer`` stub
(reference subscriber/subscriber_test.go:14-25): exercise the full
protocol without the service.
"""

from __future__ import annotations

import base64
import json
import os
from datetime import datetime, timezone


class StubKinesisClient:
    """Records live in per-shard lists; iterators are stateless JSON
    tokens ``{"shard": ..., "idx": ...}`` — like the real service,
    an iterator survives process boundaries."""

    def __init__(self):
        self._shards: dict[str, list[dict]] = {}
        self._closed: set[str] = set()
        self._parents: dict[str, str] = {}
        self._adj_parents: dict[str, str] = {}
        self._seq = 0
        #: call log for assertions
        self.calls: list[str] = []

    # -- producer/test controls --------------------------------------

    def copy_state_from(self, other: "StubKinesisClient") -> None:
        """Copy another stub's stream state (records, lineage, closed
        set, sequence counter) WITHOUT aliasing its mutable internals —
        the public seam for benches/tests that seed one client from
        another (an alias would let either client corrupt the other on
        mutation, and reaching into privates breaks if the layout
        changes; r6 ADVICE)."""
        self._shards = {
            s: [dict(r) for r in recs] for s, recs in other._shards.items()
        }
        self._closed = set(other._closed)
        self._parents = dict(other._parents)
        self._adj_parents = dict(other._adj_parents)
        self._seq = other._seq

    def put(self, shard_id: str, data: bytes | str, partition_key: str = "k"):
        import time
        from datetime import datetime, timezone

        if isinstance(data, str):
            data = data.encode("utf-8")
        self._seq += 1
        self._shards.setdefault(shard_id, []).append(
            {
                "Data": data,
                "PartitionKey": partition_key,
                "SequenceNumber": str(self._seq),
                "ApproximateArrivalTimestamp": datetime.fromtimestamp(
                    time.time(), tz=timezone.utc
                ),
            }
        )

    def add_shard(self, shard_id: str, parent: str | None = None) -> None:
        self._shards.setdefault(shard_id, [])
        if parent:
            self._parents[shard_id] = parent

    def close_shard(self, shard_id: str) -> None:
        """No more records will arrive; readers drain then see a null
        NextShardIterator (split/merge retirement)."""
        self._closed.add(shard_id)

    def split_shard(self, parent: str, *children: str) -> None:
        """Service-shaped split: children appear carrying
        ``ParentShardId``, the parent closes (drains then SHARD_END) —
        the lineage ``list_shards`` exposes on the real service."""
        for child in children:
            self.add_shard(child, parent=parent)
        self.close_shard(parent)

    def merge_shards(self, parent: str, adjacent: str, child: str) -> None:
        """Service-shaped merge: ONE child carrying BOTH lineage edges
        (``ParentShardId`` = parent, ``AdjacentParentShardId`` =
        adjacent, exactly as MergeShards reports them); both parents
        close and drain independently to SHARD_END."""
        self.add_shard(child, parent=parent)
        self.close_shard(parent)
        self.close_shard(adjacent)
        # set the adjacency edge LAST: in the file-backed subclass the
        # close_shard calls above each reload state from disk, which
        # would wipe an earlier in-memory-only assignment before the
        # wrapper's final save
        self._adj_parents[child] = adjacent

    # -- boto3-shaped API --------------------------------------------

    def list_shards(self, StreamName=None, NextToken=None):
        self.calls.append("list_shards")
        return {
            "Shards": [
                {"ShardId": s}
                | (
                    {"ParentShardId": self._parents[s]}
                    if s in self._parents
                    else {}
                )
                | (
                    {"AdjacentParentShardId": self._adj_parents[s]}
                    if s in self._adj_parents
                    else {}
                )
                for s in sorted(self._shards)
            ]
        }

    def get_shard_iterator(
        self,
        StreamName,
        ShardId,
        ShardIteratorType,
        StartingSequenceNumber=None,
        Timestamp=None,
    ):
        self.calls.append(f"get_shard_iterator:{ShardIteratorType}")
        recs = self._shards.get(ShardId, [])
        if ShardIteratorType == "TRIM_HORIZON":
            idx = 0
        elif ShardIteratorType == "LATEST":
            idx = len(recs)
        elif ShardIteratorType == "AT_TIMESTAMP":
            # first record whose arrival ts >= Timestamp (service
            # semantics); Timestamp arrives as datetime (boto3) or
            # epoch seconds
            t = Timestamp.timestamp() if hasattr(Timestamp, "timestamp") else float(
                Timestamp
            )
            idx = next(
                (
                    i
                    for i, (ts, _seq) in enumerate(_iter_ts_seq(recs))
                    if ts is not None and ts >= t
                ),
                len(recs),
            )
        elif ShardIteratorType in ("AT_SEQUENCE_NUMBER", "AFTER_SEQUENCE_NUMBER"):
            idx = next(
                (
                    i
                    for i, (_ts, seq) in enumerate(_iter_ts_seq(recs))
                    if seq == StartingSequenceNumber
                ),
                len(recs),
            )
            if ShardIteratorType == "AFTER_SEQUENCE_NUMBER":
                idx += 1
        else:  # pragma: no cover - guard
            raise ValueError(f"unsupported iterator type {ShardIteratorType}")
        return {"ShardIterator": json.dumps({"shard": ShardId, "idx": idx})}

    def get_records(self, ShardIterator, Limit=1000):
        self.calls.append("get_records")
        tok = json.loads(ShardIterator)
        shard, idx = tok["shard"], tok["idx"]
        recs = self._shards.get(shard, [])
        batch = recs[idx : idx + Limit]
        nxt = idx + len(batch)
        drained_closed = shard in self._closed and nxt >= len(recs)
        return {
            "Records": batch,
            "NextShardIterator": None
            if drained_closed
            else json.dumps({"shard": shard, "idx": nxt}),
            "MillisBehindLatest": 1000 if nxt < len(recs) else 0,
        }


def demo_client() -> StubKinesisClient:
    """clientfactory target for end-to-end readStream tests: a fixed
    two-shard stream of five valid wire envelopes and one corrupt
    record (exercising the poison-skip path end to end)."""
    import base64

    c = StubKinesisClient()
    for i in range(5):
        env = json.dumps(
            {
                "watermill_message_uuid": f"uuid-{i}",
                "data": base64.b64encode(f"payload-{i}".encode()).decode(),
                "headers": {"partitionKey": f"k{i % 2}"},
            }
        )
        c.put(f"shardId-{i % 2:012d}", env, partition_key=f"k{i % 2}")
    c.put("shardId-000000000000", b"{not json", partition_key="k0")
    return c


def _iter_ts_seq(recs):
    """Yield ``(arrival_epoch_or_None, sequence_number)`` per record
    WITHOUT materializing service-shaped dicts: iterator-position
    lookups (AT_TIMESTAMP / AT_SEQUENCE_NUMBER) only need these two
    fields, and enumerating a :class:`_LazyShardRecords` view converts
    (b64decode + datetime) every record up to the match — partially
    re-introducing the eager-conversion cost the lazy view exists to
    avoid (r8 ADVICE). Scans the raw entries directly instead; plain
    in-memory record lists read the already-built fields."""
    if isinstance(recs, _LazyShardRecords):
        for r in recs.raw:
            yield r["ts"], r["seq"]
    else:
        for r in recs:
            ts = r["ApproximateArrivalTimestamp"]
            yield (
                ts.timestamp() if ts is not None else None
            ), r["SequenceNumber"]


class _LazyShardRecords:
    """Sequence view over the RAW on-disk record entries of one shard:
    converts to service-shaped record dicts (``Data`` bytes, datetime
    arrival ts) only for the window actually served. Eager whole-state
    conversion was the dominant cost of the r7 sustained throughput
    measurement — every executor worker paid a full parse+convert of
    ALL shards' records before serving its one slice; lazily, a worker
    pays json.load once and converts just the ranges it returns."""

    __slots__ = ("_raw",)

    def __init__(self, raw: list[dict]):
        self._raw = raw

    @staticmethod
    def _conv(r: dict) -> dict:
        return {
            "Data": base64.b64decode(r["data"]),
            "PartitionKey": r["key"],
            "SequenceNumber": r["seq"],
            "ApproximateArrivalTimestamp": (
                datetime.fromtimestamp(r["ts"], tz=timezone.utc)
                if r["ts"] is not None
                else None
            ),
        }

    @staticmethod
    def to_raw(rec: dict) -> dict:
        return {
            "data": base64.b64encode(bytes(rec["Data"])).decode("ascii"),
            "key": rec["PartitionKey"],
            "seq": rec["SequenceNumber"],
            "ts": (
                rec["ApproximateArrivalTimestamp"].timestamp()
                if rec["ApproximateArrivalTimestamp"] is not None
                else None
            ),
        }

    def __len__(self) -> int:
        return len(self._raw)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self._conv(r) for r in self._raw[i]]
        return self._conv(self._raw[i])

    def __iter__(self):
        return (self._conv(r) for r in self._raw)

    def append(self, rec: dict) -> None:
        self._raw.append(self.to_raw(rec))

    @property
    def raw(self) -> list[dict]:
        return self._raw


class FileStubKinesisClient(StubKinesisClient):
    """Disk-backed stub: shard state lives in ``<dir>/state.json``, so
    a factory-constructed client in an EXECUTOR python worker sees the
    records the test's driver-side client put — required to exercise
    the parallel (``DataSourceStreamReader``) read path, where
    ``get_records`` runs in separate worker processes."""

    def __init__(self, state_dir: str):
        super().__init__()
        self._dir = state_dir
        self._path = os.path.join(state_dir, "state.json")
        self._stamp: tuple[int, int] | None = None
        self._load()

    def _load(self) -> None:
        # mtime+size guard: every API call reloads so concurrent
        # writers stay visible, but re-PARSING an unchanged multi-MB
        # state file per get_records would swamp any throughput
        # measurement that goes through this stub — a stat() is the
        # reload when nothing changed
        try:
            st = os.stat(self._path)
            stamp = (st.st_mtime_ns, st.st_size)
            if stamp == self._stamp:
                return
        except OSError:
            return
        try:
            with open(self._path) as f:
                raw = json.load(f)
        except (OSError, ValueError):
            return
        self._stamp = stamp
        self._seq = raw["seq"]
        self._closed = set(raw["closed"])
        self._parents = dict(raw.get("parents", {}))
        self._adj_parents = dict(raw.get("adj_parents", {}))
        self._shards = {
            shard: _LazyShardRecords(recs)
            for shard, recs in raw["shards"].items()
        }

    def _save(self) -> None:
        os.makedirs(self._dir, exist_ok=True)
        self._stamp = None  # set from the written file below
        raw = {
            "seq": self._seq,
            "closed": sorted(self._closed),
            "shards": {
                shard: (
                    recs.raw
                    if isinstance(recs, _LazyShardRecords)
                    else [_LazyShardRecords.to_raw(r) for r in recs]
                )
                for shard, recs in self._shards.items()
            },
            "parents": self._parents,
            "adj_parents": self._adj_parents,
        }
        tmp = f"{self._path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(raw, f)
        os.replace(tmp, self._path)
        # in-memory state IS the just-written file: stamping it keeps
        # the next _load() a pure stat — without this, a writing
        # client re-parses its own write on every subsequent call
        # (O(N²) across N puts — r7 review)
        try:
            st = os.stat(self._path)
            self._stamp = (st.st_mtime_ns, st.st_size)
        except OSError:
            pass

    # mutations persist; reads re-load (another process may have put)
    def put(self, *a, **kw):
        self._load()
        super().put(*a, **kw)
        self._save()

    def add_shard(self, shard_id: str, parent: str | None = None) -> None:
        self._load()
        super().add_shard(shard_id, parent=parent)
        self._save()

    def close_shard(self, shard_id: str) -> None:
        self._load()
        super().close_shard(shard_id)
        self._save()

    def split_shard(self, parent: str, *children: str) -> None:
        self._load()
        super().split_shard(parent, *children)
        self._save()

    def merge_shards(self, parent: str, adjacent: str, child: str) -> None:
        self._load()
        super().merge_shards(parent, adjacent, child)
        self._save()

    def list_shards(self, *a, **kw):
        self._load()
        return super().list_shards(*a, **kw)

    def get_shard_iterator(self, *a, **kw):
        self._load()
        return super().get_shard_iterator(*a, **kw)

    def get_records(self, *a, **kw):
        self._load()
        return super().get_records(*a, **kw)


_client_cache: dict[str, FileStubKinesisClient] = {}

#: LRU bound on cached stub clients: long pytest/bench sessions create
#: many unique temp state dirs, and each cached client pins a fully
#: parsed state in memory (r7 ADVICE). A handful covers every
#: concurrent-stream scenario the suite runs.
_CLIENT_CACHE_MAX = 4


def file_stub_client(options) -> FileStubKinesisClient:
    """clientfactory target for parallel-reader tests:
    ``option('stubdir', <dir>)`` points at the shared state dir.
    Cached per state dir within a process — real boto3 clients are
    long-lived too, and Spark reuses python worker processes across
    tasks, so a fresh multi-MB state parse per task would charge stub
    bookkeeping to every throughput measurement. Staleness is handled
    inside the client: every API call re-stats the state file and
    reparses only when it changed. The cache is LRU-bounded and drops
    entries whose state dir no longer exists (reaped temp dirs)."""
    sdir = options.get("stubdir")
    for k in [
        k
        for k, v in _client_cache.items()
        if k != sdir and not os.path.exists(v._path)
    ]:
        del _client_cache[k]
    c = _client_cache.pop(sdir, None)
    if c is None:
        c = FileStubKinesisClient(sdir)
    else:
        c._load()
    _client_cache[sdir] = c  # re-insert = most recently used
    while len(_client_cache) > _CLIENT_CACHE_MAX:
        del _client_cache[next(iter(_client_cache))]  # evict LRU
    return c


    # -- producer API (boto3-shaped) ---------------------------------


def _stub_put_records(self, StreamName=None, Records=None):
    """boto3-shaped PutRecords: routes each record to a shard by
    crc32(partition key) — stable like the service's MD5 routing —
    and appends with monotonically increasing sequence numbers."""
    import time as _time
    import zlib
    from datetime import datetime, timezone

    self.calls.append("put_records")
    if not self._shards:
        for i in range(2):
            self._shards[f"shardId-{i:012d}"] = []
    shard_ids = sorted(self._shards)
    out = []
    for rec in Records or []:
        data = rec["Data"]
        if isinstance(data, str):
            data = data.encode("utf-8")
        key = rec.get("PartitionKey") or "0"
        shard = shard_ids[zlib.crc32(key.encode("utf-8")) % len(shard_ids)]
        self._seq += 1
        self._shards[shard].append(
            {
                "Data": data,
                "PartitionKey": key,
                "SequenceNumber": str(self._seq),
                "ApproximateArrivalTimestamp": datetime.fromtimestamp(
                    _time.time(), tz=timezone.utc
                ),
            }
        )
        out.append({"SequenceNumber": str(self._seq), "ShardId": shard})
    return {"FailedRecordCount": 0, "Records": out}


StubKinesisClient.put_records = _stub_put_records


def _file_stub_put_records(self, StreamName=None, Records=None):
    # concurrent executor partitions all publish through one state
    # file: serialize the read-modify-write with an flock, like the
    # service serializes per-shard appends
    import fcntl

    os.makedirs(self._dir, exist_ok=True)
    with open(os.path.join(self._dir, ".lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        self._load()
        resp = _stub_put_records(self, StreamName=StreamName, Records=Records)
        self._save()
    return resp


FileStubKinesisClient.put_records = _file_stub_put_records
