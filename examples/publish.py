"""Publish example — the engine's equivalent of the reference's
``example/cmd/publish/main.go``: build 100 messages with UUIDs,
payloads, and partition keys, and publish them to a topic.

    python examples/publish.py [endpoint_dir] [topic]

The endpoint directory plays Localstack's role (the reference's
``example/docker-compose.yml``): a local stand-in for the Kinesis
service that ``examples/subscribe.py`` can stream from.
"""

from __future__ import annotations

import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from watermill_kinesis_spark.api import PublisherBuilder

N_MESSAGES = 100  # the reference example publishes 100 (publish/main.go:24-30)


def main() -> None:
    endpoint = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wk_example_endpoint"
    topic = sys.argv[2] if len(sys.argv) > 2 else "example-topic"
    spark = SparkSession.builder.master("local[4]").appName("publish").getOrCreate()

    rows = [
        (str(uuid.uuid4()), f"hello-{i}".encode(), {"partitionKey": str(i % 5)})
        for i in range(N_MESSAGES)
    ]
    messages = spark.createDataFrame(
        rows, "uuid string, payload binary, metadata map<string,string>"
    )

    publisher = PublisherBuilder().with_endpoint(endpoint).with_shards(4).build()
    publisher.publish(topic, messages)
    print(f"published {N_MESSAGES} messages to {os.path.join(endpoint, topic)}")
    print(
        messages.select(
            F.col("metadata").getItem("partitionKey").alias("key")
        )
        .groupBy("key")
        .count()
        .orderBy("key")
        .toPandas()
        .to_string(index=False)
    )
    spark.stop()


if __name__ == "__main__":
    main()
