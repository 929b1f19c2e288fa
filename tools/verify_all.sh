#!/usr/bin/env bash
# One-shot verification: everything the driver and judge check, locally.
#   bash tools/verify_all.sh [sf_dir_correctness] [sf_dir_bench]
set -u
cd "$(dirname "$0")/.."
SF_CORRECT="${1:-/root/testdata/sf0.01}"
SF_BENCH="${2:-/root/testdata/sf0.1}"

echo "=== 1/4 pytest (unit + semantics + plan + property tests) ==="
python -m pytest tests/ -q || exit 1

echo "=== 2/4 oracle sweep at $SF_CORRECT (every registered query vs DuckDB) ==="
# Driver-accurate mode: vanilla SparkSession (no session.py tuning) +
# the gate's raw-row canonicalizer — catches hidden-config coupling and
# unhashable-cell outputs that a tuned/stringified sweep would miss.
SPARK_GRAFT_VANILLA=1 SPARK_GRAFT_DRIVER_CANON=1 \
    PYTHONPATH=. python tools/check_oracle.py "$SF_CORRECT" || exit 1

echo "=== 3/4 plan audit (PLANS.md regenerated; red flags fail the build) ==="
PYTHONPATH=. python tools/plan_audit.py || exit 1
grep -q "No red flags" PLANS.md || { echo "RED FLAGS in PLANS.md"; exit 1; }

echo "=== 4/4 bench at $SF_BENCH ==="
SPARK_GRAFT_SF_DIR="$SF_BENCH" python bench.py || exit 1

echo "ALL VERIFICATIONS PASSED"
