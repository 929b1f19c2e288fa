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

import json


class StubKinesisClient:
    """Records live in per-shard lists; iterators are stateless JSON
    tokens ``{"shard": ..., "idx": ...}`` — like the real service,
    an iterator survives process boundaries."""

    def __init__(self):
        self._shards: dict[str, list[dict]] = {}
        self._closed: set[str] = set()
        self._seq = 0
        #: call log for assertions
        self.calls: list[str] = []

    # -- producer/test controls --------------------------------------

    def put(self, shard_id: str, data: bytes | str, partition_key: str = "k"):
        if isinstance(data, str):
            data = data.encode("utf-8")
        self._seq += 1
        self._shards.setdefault(shard_id, []).append(
            {
                "Data": data,
                "PartitionKey": partition_key,
                "SequenceNumber": str(self._seq),
                "ApproximateArrivalTimestamp": None,
            }
        )

    def add_shard(self, shard_id: str) -> None:
        self._shards.setdefault(shard_id, [])

    def close_shard(self, shard_id: str) -> None:
        """No more records will arrive; readers drain then see a null
        NextShardIterator (split/merge retirement)."""
        self._closed.add(shard_id)

    # -- boto3-shaped API --------------------------------------------

    def list_shards(self, StreamName=None, NextToken=None):
        self.calls.append("list_shards")
        return {"Shards": [{"ShardId": s} for s in sorted(self._shards)]}

    def get_shard_iterator(
        self,
        StreamName,
        ShardId,
        ShardIteratorType,
        StartingSequenceNumber=None,
    ):
        self.calls.append(f"get_shard_iterator:{ShardIteratorType}")
        recs = self._shards.get(ShardId, [])
        if ShardIteratorType == "TRIM_HORIZON":
            idx = 0
        elif ShardIteratorType == "LATEST":
            idx = len(recs)
        elif ShardIteratorType in ("AT_SEQUENCE_NUMBER", "AFTER_SEQUENCE_NUMBER"):
            idx = next(
                (
                    i
                    for i, r in enumerate(recs)
                    if r["SequenceNumber"] == StartingSequenceNumber
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
