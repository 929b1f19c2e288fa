"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (codec round-trip → aggregate)
on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full operator
inventory from ``watermill_kinesis_spark.registry`` (SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from watermill_kinesis_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: marshal events into wire envelopes, unmarshal them back
    (reference marshaller.go round-trip), then aggregate per event type
    with exact-decimal sums — codec + scan + join + agg in one plan."""
    from pyspark.sql import functions as F

    from watermill_kinesis_spark import codec
    from watermill_kinesis_spark.functions.exact import dsum
    from watermill_kinesis_spark.operators.messages import messages_from_events
    from watermill_kinesis_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    msgs = messages_from_events(spark, sf_dir)
    wire = codec.marshal(msgs)
    decoded = codec.unmarshal(wire, partition_key_col=None, drop_corrupt=True)
    events = load_table(spark, sf_dir, "events")
    return (
        decoded.withColumn("event_id", F.col("uuid").cast("bigint"))
        .join(events, "event_id")
        .groupBy(F.col("metadata").getItem("eventType").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            dsum("value").alias("sum_value"),
            F.countDistinct(F.col("metadata").getItem("partitionKey")).alias(
                "n_partition_keys"
            ),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return registry.oracle_sql()
