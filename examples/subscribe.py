"""Subscribe example — the engine's equivalent of the reference's
``example/cmd/subscribe/main.go``: stream messages from a topic,
printing per-batch counts, until the topic is drained (or forever with
``--follow``); Ctrl-C triggers the graceful-close path.

    python examples/subscribe.py [endpoint_dir] [topic] [--follow]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from watermill_kinesis_spark.api import SubscriberBuilder


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--follow"]
    follow = "--follow" in sys.argv
    endpoint = args[0] if args else "/tmp/wk_example_endpoint"
    topic = args[1] if len(args) > 1 else "example-topic"
    spark = SparkSession.builder.master("local[4]").appName("subscribe").getOrCreate()

    subscriber = SubscriberBuilder().with_endpoint(endpoint).build()
    messages = subscriber.subscribe(spark, topic)

    def on_batch(batch_df, epoch_id):
        n = batch_df.count()
        if n:
            keys = (
                batch_df.select(
                    F.col("metadata").getItem("partitionKey").alias("key")
                )
                .groupBy("key")
                .count()
                .orderBy("key")
                .collect()
            )
            summary = ", ".join(f"{r['key']}:{r['count']}" for r in keys)
            print(f"batch {epoch_id}: {n} messages ({summary})")

    ckpt = tempfile.mkdtemp(prefix="wk_example_ckpt_")
    writer = messages.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", ckpt
    )
    if not follow:
        writer = writer.trigger(availableNow=True)
    query = subscriber.track(writer.start())
    try:
        query.awaitTermination()
    except KeyboardInterrupt:
        pass
    finally:
        subscriber.close()  # stop + await: the reference's Closer path
    spark.stop()


if __name__ == "__main__":
    main()
