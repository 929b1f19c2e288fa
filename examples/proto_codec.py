"""Protobuf wire-format example — swap the JSON envelope for the
protobuf codec (the reference's ``marshaller.go:24`` TODO, shipped as
``protocodec.py``) by plugging the DataFrame-shaped marshaller pair
into the builders. Everything else — transport, chunked puts,
corrupt-record skip, system-metadata enrichment — is the same code
path the JSON examples run.

    python examples/proto_codec.py [endpoint_dir] [topic]
"""

from __future__ import annotations

import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from watermill_kinesis_spark.api import PublisherBuilder, SubscriberBuilder
from watermill_kinesis_spark.protocodec import marshal_proto, unmarshal_proto

N_MESSAGES = 100


def main() -> None:
    endpoint = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wk_proto_endpoint"
    topic = sys.argv[2] if len(sys.argv) > 2 else "proto-topic"
    spark = (
        SparkSession.builder.master("local[4]").appName("proto-codec").getOrCreate()
    )

    rows = [
        (
            str(uuid.uuid4()),
            f"hello-protobuf-{i}".encode(),
            {"partitionKey": str(i % 5), "eventType": "greeting"},
        )
        for i in range(N_MESSAGES)
    ]
    messages = spark.createDataFrame(
        rows, "uuid string, payload binary, metadata map<string,string>"
    )

    pub = (
        PublisherBuilder()
        .with_endpoint(endpoint)
        .with_shards(4)
        .with_marshaller(marshal_proto)
        .build()
    )
    pub.publish(topic, messages)
    print(f"published {N_MESSAGES} protobuf envelopes to {endpoint}/{topic}")

    sub = (
        SubscriberBuilder()
        .with_endpoint(endpoint)
        .with_unmarshaller(lambda wire: unmarshal_proto(wire, drop_corrupt=True))
        .build()
    )
    back = sub.subscribe_batch(spark, topic)
    n = back.count()
    sample = back.select(
        "uuid", F.decode("payload", "UTF-8").alias("text"), "metadata"
    ).limit(3)
    print(f"read back {n} messages; sample:")
    for r in sample.collect():
        print(f"  {r.uuid[:8]}…  {r.text!r}  shard={r.metadata.get('shardID')}")
    assert n == N_MESSAGES, (n, N_MESSAGES)
    spark.stop()


if __name__ == "__main__":
    main()
