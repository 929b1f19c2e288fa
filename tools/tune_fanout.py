"""Measure a query's wall time as a function of the pre-explode /
pre-kernel fan-out partition count (guide §1: measure first; VERDICT
r13 task 1 done-criterion is the c8/c32 ratio, this is its local
instrument). Monkeypatches ``tables.adaptive_partitions`` — the sites
resolve it at call time — to force each candidate count, timing
best-of-N noop-sink runs per point.

Usage:
    PYTHONPATH=/root/repo python tools/tune_fanout.py q1 [q2 ...]
    SPARK_GRAFT_TUNE_PARTS=2,4,8,16,32  (default; 'geo' = the rule)
    SPARK_GRAFT_TUNE_RUNS=3
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1:]
    runs = int(os.environ.get("SPARK_GRAFT_TUNE_RUNS", "3"))
    raw = os.environ.get("SPARK_GRAFT_TUNE_PARTS", "geo,2,4,8,16,32")
    points = [p if p == "geo" else int(p) for p in raw.split(",")]

    from watermill_kinesis_spark.registry import queries
    from watermill_kinesis_spark.session import get_spark
    from watermill_kinesis_spark.sources import tables

    spark = get_spark("tune_fanout", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = queries()
    spark.range(0, 10_000, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    geo = tables.adaptive_partitions
    for name in names:
        fn = qs[name]
        # warm the plan shape once per query
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        for p in points:
            tables.adaptive_partitions = (
                geo if p == "geo" else (lambda *a, _p=p, **k: _p)
            )
            try:
                best = float("inf")
                for _ in range(runs):
                    t0 = time.perf_counter()
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.perf_counter() - t0)
                label = p if p != "geo" else f"geo={geo(spark, SF_DIR, 'documents')}"
                print(f"{name:32s} parts={label!s:8} best={best:.3f}s", flush=True)
            finally:
                tables.adaptive_partitions = geo
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
