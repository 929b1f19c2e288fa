"""Query registry: the engine's public operator inventory.

Each operator from SURVEY.md §2 registers a named query callable
``(spark, sf_dir) -> DataFrame`` and, where the semantics are
ANSI-SQL-expressible, a DuckDB oracle SQL string computing the same
result. The driver hash-compares the two at sf0.01 — so every
computed column is aliased identically on both sides, and all float
aggregates are computed through exact decimal arithmetic (see
``functions/exact.py``) to keep values bit-identical across engines
and across partition orderings.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_OPERATOR_MODULES = (
    "watermill_kinesis_spark.operators.messages",
    "watermill_kinesis_spark.operators.custom_source",
    "watermill_kinesis_spark.operators.relational",
    "watermill_kinesis_spark.operators.relational2",
    "watermill_kinesis_spark.operators.relational3",
    "watermill_kinesis_spark.operators.relational4",
    "watermill_kinesis_spark.operators.windows",
    "watermill_kinesis_spark.operators.udf",
    "watermill_kinesis_spark.operators.formats",
    "watermill_kinesis_spark.operators.dedup",
    "watermill_kinesis_spark.operators.similarity",
    "watermill_kinesis_spark.operators.text",
    "watermill_kinesis_spark.operators.multimodal",
    "watermill_kinesis_spark.operators.pipeline",
    "watermill_kinesis_spark.operators.streaming_batch",
)


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register an operator query; ``oracle=None`` ⇒ rows-only check
    (genuinely non-SQL-expressible semantics)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "", tuple(tags))
        return fn

    return deco


def _load_all() -> None:
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            if e.name and e.name.startswith("watermill_kinesis_spark"):
                continue  # module not built yet
            raise


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
