"""Driver-contract smoke tests."""

import importlib
import sys


def _entry_module():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"event_type", "n_messages", "sum_value", "n_partition_keys"} == set(
        df.columns
    )
    assert sum(r.n_messages for r in rows) == 1000


def test_queries_and_oracles_consistent(spark):
    mod = _entry_module()
    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)


def test_each_query_builds_a_dataframe(spark, sf_dir):
    mod = _entry_module()
    for name, fn in mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.schema is not None, name
