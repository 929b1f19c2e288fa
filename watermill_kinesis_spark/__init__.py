"""watermill_kinesis_spark — a PySpark-native analytics engine with the
capabilities of the ``dvictor/watermill-kinesis`` Watermill↔Kinesis connector,
re-expressed Spark-first.

Layer A (reference-derived): the canonical message data model
(``schema``), the JSON+base64 wire envelope codec (``codec``), and
stream source/sink semantics (``streaming``) — see reference
``marshaller.go``, ``publisher.go``, ``subscriber.go``.

Layer B (engine surface): the relational / streaming / LLM-data-pipeline
operator inventory (``operators``), registered in ``registry`` and
verified against a DuckDB oracle by the driver.
"""

from watermill_kinesis_spark.schema import (
    ENVELOPE_SCHEMA,
    MESSAGE_SCHEMA,
    META_ARRIVAL_TS,
    META_PARTITION_KEY,
    META_SHARD_ID,
)

__all__ = [
    "ENVELOPE_SCHEMA",
    "MESSAGE_SCHEMA",
    "META_ARRIVAL_TS",
    "META_PARTITION_KEY",
    "META_SHARD_ID",
]

__version__ = "0.1.0"
