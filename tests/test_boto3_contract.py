"""Contract tests for the REAL boto3 code path (r5 VERDICT "what's
missing #1"): every prior CI run injected the pure-python stub, so the
botocore machinery — request serialization against the Kinesis service
model, response parsing, the generated exception taxonomy — never
executed. ``botocore.stub.Stubber`` closes that gap without network:
it drives the actual client pipeline with recorded responses and
validates our request parameters against the service model, the
engine's analogue of the reference's Localstack harness
(reference example/docker-compose.yml:4-11, example/functions.sh:9-33).

Import-gated: skips cleanly where boto3/botocore are absent.
"""

from __future__ import annotations

import pytest

boto3 = pytest.importorskip("boto3")
from botocore.stub import ANY, Stubber  # noqa: E402

from watermill_kinesis_spark.sources.kinesis_aws import (  # noqa: E402
    SHARD_END,
    KinesisAwsStreamReader,
    _get_iterator,
    _get_records_throttled,
    _list_shards,
)


def _client():
    return boto3.client(
        "kinesis",
        region_name="us-east-1",
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
    )


def _shard(sid, parent=None, adjacent=None):
    d = {
        "ShardId": sid,
        "HashKeyRange": {"StartingHashKey": "0", "EndingHashKey": "340"},
        "SequenceNumberRange": {"StartingSequenceNumber": "1"},
    }
    if parent:
        d["ParentShardId"] = parent
    if adjacent:
        d["AdjacentParentShardId"] = adjacent
    return d


def test_list_shards_paginates_with_next_token():
    """_list_shards must follow NextToken pages — and per the API
    contract, a NextToken request must NOT repeat StreamName (the
    Stubber enforces our exact request params against the model)."""
    c = _client()
    with Stubber(c) as stub:
        stub.add_response(
            "list_shards",
            {"Shards": [_shard("shardId-000000000001")], "NextToken": "tok1"},
            {"StreamName": "s"},
        )
        stub.add_response(
            "list_shards",
            {"Shards": [_shard("shardId-000000000000", parent="shardId-x")]},
            {"NextToken": "tok1"},
        )
        shards = _list_shards(c, "s")
    assert [s["ShardId"] for s in shards] == [
        "shardId-000000000000",
        "shardId-000000000001",
    ]
    assert shards[0]["ParentShardId"] == "shardId-x"


def test_get_records_throttle_backoff_then_success(monkeypatch):
    """ProvisionedThroughputExceededException (the REAL generated
    botocore exception, raised through the client pipeline) is retried
    with backoff; the third attempt's records come through."""
    import watermill_kinesis_spark.sources.kinesis_aws as mod

    sleeps: list[float] = []
    monkeypatch.setattr(mod.time, "sleep", lambda s: sleeps.append(s))
    c = _client()
    with Stubber(c) as stub:
        for _ in range(2):
            stub.add_client_error(
                "get_records",
                service_error_code="ProvisionedThroughputExceededException",
                service_message="Rate exceeded",
                http_status_code=400,
            )
        stub.add_response(
            "get_records",
            {
                "Records": [
                    {"SequenceNumber": "7", "Data": b"d0", "PartitionKey": "k"}
                ],
                "NextShardIterator": "it2",
                "MillisBehindLatest": 0,
            },
            {"ShardIterator": "it1", "Limit": 5},
        )
        resp = _get_records_throttled(c, ShardIterator="it1", Limit=5)
    assert [r["Data"] for r in resp["Records"]] == [b"d0"]
    # bounded exponential backoff: 0.2, then 0.4
    assert sleeps == [mod.THROTTLE_BACKOFF_S, mod.THROTTLE_BACKOFF_S * 2]


def test_get_records_nonretryable_error_raises_immediately(monkeypatch):
    """Error taxonomy: ExpiredIteratorException is NOT a throttle —
    no sleep, no retry, the generated exception propagates."""
    import watermill_kinesis_spark.sources.kinesis_aws as mod

    monkeypatch.setattr(
        mod.time, "sleep", lambda s: pytest.fail("must not retry")
    )
    c = _client()
    with Stubber(c) as stub:
        stub.add_client_error(
            "get_records",
            service_error_code="ExpiredIteratorException",
            service_message="Iterator expired",
            http_status_code=400,
        )
        with pytest.raises(Exception) as ei:
            _get_records_throttled(c, ShardIterator="it1", Limit=5)
    assert type(ei.value).__name__ == "ExpiredIteratorException"


def test_get_iterator_request_shapes_validate_against_model():
    """Every stored-position alphabet entry maps to a model-valid
    GetShardIterator request: TRIM_HORIZON (pos None), AT_TIMESTAMP
    (AT_TS pin, datetime param), AFTER_SEQUENCE_NUMBER (sequence)."""
    c = _client()
    with Stubber(c) as stub:
        stub.add_response(
            "get_shard_iterator",
            {"ShardIterator": "i0"},
            {
                "StreamName": "s",
                "ShardId": "sh",
                "ShardIteratorType": "TRIM_HORIZON",
            },
        )
        stub.add_response(
            "get_shard_iterator",
            {"ShardIterator": "i1"},
            {
                "StreamName": "s",
                "ShardId": "sh",
                "ShardIteratorType": "AT_TIMESTAMP",
                "Timestamp": ANY,  # datetime; model-validated as timestamp
            },
        )
        stub.add_response(
            "get_shard_iterator",
            {"ShardIterator": "i2"},
            {
                "StreamName": "s",
                "ShardId": "sh",
                "ShardIteratorType": "AFTER_SEQUENCE_NUMBER",
                "StartingSequenceNumber": "41",
            },
        )
        assert _get_iterator(c, "s", "sh", None) == "i0"
        assert _get_iterator(c, "s", "sh", "AT_TS:1700000000.5") == "i1"
        assert _get_iterator(c, "s", "sh", "41") == "i2"
        stub.assert_no_pending_responses()


def test_simple_reader_end_to_end_on_real_botocore_pipeline():
    """The driver-side reader's full poll loop against the real client:
    list_shards → get_shard_iterator → get_records pages → a closed
    shard's final page (no NextShardIterator) fences SHARD_END."""
    c = _client()
    r = KinesisAwsStreamReader({"streamname": "s", "clientfactory": "x:y"})
    r._client_obj = c
    with Stubber(c) as stub:
        # initialOffset lists shards once; read() re-lists (mid-stream
        # shard pickup) before polling
        for _ in range(2):
            stub.add_response(
                "list_shards",
                {"Shards": [_shard("shardId-000000000000")]},
                {"StreamName": "s"},
            )
        stub.add_response(
            "get_shard_iterator",
            {"ShardIterator": "itA"},
            {
                "StreamName": "s",
                "ShardId": "shardId-000000000000",
                "ShardIteratorType": "TRIM_HORIZON",
            },
        )
        stub.add_response(
            "get_records",
            {
                "Records": [
                    {"SequenceNumber": "1", "Data": b"r1", "PartitionKey": "k"},
                    {"SequenceNumber": "2", "Data": b"r2", "PartitionKey": "k"},
                ],
                "NextShardIterator": "itB",
                "MillisBehindLatest": 10,
            },
            {"ShardIterator": "itA", "Limit": 1000},
        )
        # closed + drained: the service returns a null NextShardIterator
        # (botocore omits the key) → reader tombstones SHARD_END
        stub.add_response(
            "get_records",
            {"Records": [], "MillisBehindLatest": 0},
            {"ShardIterator": "itB", "Limit": 1000},
        )
        rows, off = r.read(r.initialOffset())
    assert [t[0] for t in rows] == ["r1", "r2"]
    assert off["shards"]["shardId-000000000000"] == SHARD_END


def test_publisher_partial_failure_retry_on_real_pipeline(monkeypatch):
    """KinesisPublisher + put_chunked against real PutRecords
    serialization: a response row carrying ErrorCode marks exactly
    that record failed; the retry resends ONLY the failed record."""
    from watermill_kinesis_spark.streaming import sink as sink_mod
    from watermill_kinesis_spark.streaming.sink import (
        KinesisPublisher,
        PutRecordsEntry,
        put_chunked,
    )

    monkeypatch.setattr(sink_mod.time, "sleep", lambda s: None)
    c = _client()
    pub = KinesisPublisher("s", client=c)
    with Stubber(c) as stub:
        stub.add_response(
            "put_records",
            {
                "FailedRecordCount": 1,
                "Records": [
                    {"SequenceNumber": "1", "ShardId": "shardId-000000000000"},
                    {
                        "ErrorCode": "ProvisionedThroughputExceededException",
                        "ErrorMessage": "Rate exceeded",
                    },
                ],
            },
            {
                "StreamName": "s",
                "Records": [
                    {"Data": b"a", "PartitionKey": "ka"},
                    {"Data": b"b", "PartitionKey": "kb"},
                ],
            },
        )
        stub.add_response(
            "put_records",
            {
                # FailedRecordCount omitted: the model floors it at 1,
                # and the publisher keys off per-record ErrorCode anyway
                "Records": [
                    {"SequenceNumber": "2", "ShardId": "shardId-000000000000"}
                ],
            },
            {
                "StreamName": "s",
                "Records": [{"Data": b"b", "PartitionKey": "kb"}],
            },
        )
        n = put_chunked(
            pub,
            [PutRecordsEntry(b"a", "ka"), PutRecordsEntry(b"b", "kb")],
        )
        stub.assert_no_pending_responses()
    assert n == 2


def test_expired_iterator_refreshes_at_last_position():
    """A stalled consumer's iterator ages out (~5 min validity); the
    poll path must mint a fresh iterator AT THE LAST CONSUMED
    POSITION and continue — losing nothing, replaying nothing —
    instead of failing the task (the KCL's internal refresh)."""
    from watermill_kinesis_spark.sources.kinesis_aws import (
        _get_records_refreshing,
    )

    c = _client()
    with Stubber(c) as stub:
        stub.add_client_error(
            "get_records",
            service_error_code="ExpiredIteratorException",
            service_message="Iterator expired",
            http_status_code=400,
        )
        # refresh: AFTER_SEQUENCE_NUMBER at the last consumed position
        stub.add_response(
            "get_shard_iterator",
            {"ShardIterator": "fresh"},
            {
                "StreamName": "s",
                "ShardId": "sh",
                "ShardIteratorType": "AFTER_SEQUENCE_NUMBER",
                "StartingSequenceNumber": "41",
            },
        )
        stub.add_response(
            "get_records",
            {
                "Records": [
                    {"SequenceNumber": "42", "Data": b"d", "PartitionKey": "k"}
                ],
                "NextShardIterator": "n1",
                "MillisBehindLatest": 0,
            },
            {"ShardIterator": "fresh", "Limit": 7},
        )
        resp = _get_records_refreshing(c, "s", "sh", "stale-it", "41", 7)
        stub.assert_no_pending_responses()
    assert [r["SequenceNumber"] for r in resp["Records"]] == ["42"]


def test_expired_iterator_double_expiry_propagates(monkeypatch):
    """A refresh that immediately expires again is a stuck consumer,
    not a stale handle — it must propagate, not loop."""
    import pytest as _pytest

    from watermill_kinesis_spark.sources.kinesis_aws import (
        _get_records_refreshing,
    )

    c = _client()
    with Stubber(c) as stub:
        stub.add_client_error(
            "get_records",
            service_error_code="ExpiredIteratorException",
            service_message="Iterator expired",
            http_status_code=400,
        )
        stub.add_response(
            "get_shard_iterator",
            {"ShardIterator": "fresh"},
            {
                "StreamName": "s",
                "ShardId": "sh",
                "ShardIteratorType": "TRIM_HORIZON",
            },
        )
        stub.add_client_error(
            "get_records",
            service_error_code="ExpiredIteratorException",
            service_message="Iterator expired",
            http_status_code=400,
        )
        with _pytest.raises(Exception) as ei:
            _get_records_refreshing(c, "s", "sh", "stale-it", None, 7)
    assert type(ei.value).__name__ == "ExpiredIteratorException"


def test_put_records_accepts_bytearray_data():
    """PySpark materializes a BinaryType wire column (the protobuf
    marshaller's output) as BYTEARRAY in foreachPartition rows — the
    kinesis transport must send it as bytes, not crash on
    bytearray.encode. The Stubber validates the request against the
    real service model (Data is a blob)."""
    from watermill_kinesis_spark.streaming.sink import (
        KinesisPublisher,
        PutRecordsEntry,
    )

    c = _client()
    with Stubber(c) as stub:
        # FailedRecordCount is omitted: the service model pins min=1
        # on it, and success is signaled by records without ErrorCode
        stub.add_response(
            "put_records",
            {"Records": [{"SequenceNumber": "1", "ShardId": "shardId-0"}]},
            {
                "StreamName": "s",
                "Records": [{"Data": b"\x0a\x01x", "PartitionKey": "pk"}],
            },
        )
        pub = KinesisPublisher("s", client=c)
        res = pub.put_records([PutRecordsEntry(bytearray(b"\x0a\x01x"), "pk")])
    assert res.failed_indexes == []
