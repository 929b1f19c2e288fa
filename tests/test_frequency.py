"""Semantic tests for the frequency wave (operators/frequency.py) —
properties the DuckDB hash-compare can't express: sketch mergeability,
sampling proportionality, posting-list ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from watermill_kinesis_spark.operators.frequency import BIN_WIDTH, TOP_TOKENS, W_MAX
from watermill_kinesis_spark.registry import queries
from watermill_kinesis_spark.sources.tables import load_table


def test_heavy_hitters_counts_match_manual(spark, sf_dir):
    out = {r["token"]: (r["tf"], r["df"]) for r in
           queries()["heavy_hitters"](spark, sf_dir).collect()}
    assert len(out) == TOP_TOKENS
    docs = [r["text"] for r in load_table(spark, sf_dir, "documents").collect()]
    for token, (tf, df) in out.items():
        want_tf = sum(t.split(" ").count(token) for t in docs)
        want_df = sum(token in t.split(" ") for t in docs)
        assert (tf, df) == (want_tf, want_df)


def test_sample_weighted_is_subset_and_deterministic(spark, sf_dir):
    q = queries()["sample_weighted"]
    a = sorted(r["doc_id"] for r in q(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in q(spark, sf_dir).collect())
    assert a == b  # hash sampling is replay-stable (no RNG)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert 0 < len(a) < n_docs
    # acceptance bound: every kept row satisfies the integer predicate
    for r in q(spark, sf_dir).collect():
        assert r["draw"] * W_MAX < min(r["n_chars"], W_MAX) * (1 << 24)


def test_quantile_sketch_brackets_exact_percentiles(spark, sf_dir):
    """Bin-upper-bound estimates must sit within BIN_WIDTH above the
    exact per-day percentile (the sketch's error contract)."""
    est = {r["day"]: r for r in
           queries()["quantile_sketch_mergeable"](spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "value")
    import numpy as np
    rows = e.collect()
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r["day"], []).append(r["value"])
    for day, vals in by_day.items():
        v = np.sort(np.array(vals))
        for p, col in ((50, "p50_ub"), (90, "p90_ub"), (99, "p99_ub")):
            exact = v[min(len(v) - 1, int(np.ceil(p / 100 * len(v))) - 1)]
            ub = est[day][col]
            assert exact <= ub <= exact + BIN_WIDTH + 1e-9, (day, p, exact, ub)


def test_inverted_index_postings_sorted_and_complete(spark, sf_dir):
    out = queries()["inverted_index"](spark, sf_dir).collect()
    assert out, "threshold too high for this SF"
    docs = load_table(spark, sf_dir, "documents").collect()
    for r in out:
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(ids) and len(ids) == len(set(ids))
        assert r["doc_freq"] == len(ids)
        want = sorted(d["doc_id"] for d in docs
                      if r["token"] in d["text"].split(" "))
        assert ids == want


def test_bm25_components_recompute(spark, sf_dir):
    import math

    from watermill_kinesis_spark.operators.frequency import BM25_TERMS
    from watermill_kinesis_spark.registry import queries
    from watermill_kinesis_spark.sources.tables import load_table

    rows = queries()["bm25_components"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    n_docs = len(docs)
    total_dl = sum(len(t) for t in docs.values())
    avgdl = total_dl / n_docs
    df = {
        term: sum(1 for t in docs.values() if term in t) for term in BM25_TERMS
    }
    assert rows
    for r in rows:
        toks = docs[r["doc_id"]]
        tf = toks.count(r["term"])
        assert r["tf"] == tf and tf > 0
        assert r["dl"] == len(toks)
        assert r["df"] == df[r["term"]]
        expect_norm = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avgdl))
        assert math.isclose(r["tf_norm"], expect_norm, rel_tol=1e-9)
        expect_idf = (n_docs - df[r["term"]] + 0.5) / (df[r["term"]] + 0.5)
        assert math.isclose(r["idf_rational"], expect_idf, rel_tol=1e-12)


def test_misra_gries_merge_guarantee_property():
    """Property (no Spark needed): for ANY stream split into ANY
    partitioning, folding per-partition exact counts through _mg_merge
    keeps the two-sided MG bound for EVERY token — est ≤ true and
    true − est ≤ n/(k+1) — and the summary never exceeds k counters."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from watermill_kinesis_spark.operators.frequency import MG_K, _mg_merge

    @settings(max_examples=30, deadline=None)
    @given(
        stream=st.lists(
            st.sampled_from([f"t{i}" for i in range(40)]),
            min_size=1,
            max_size=500,
        ),
        n_parts=st.integers(min_value=1, max_value=7),
    )
    def check(stream, n_parts):
        true = Counter(stream)
        n = len(stream)
        merged: dict[str, int] = {}
        for p in range(n_parts):
            part = stream[p::n_parts]
            # partition summary: fold exact batch counts, as the
            # mapInPandas kernel does
            summ = _mg_merge({}, dict(Counter(part)), MG_K)
            assert len(summ) <= MG_K
            merged = _mg_merge(merged, summ, MG_K)
        assert len(merged) <= MG_K
        for tok, tf in true.items():
            est = merged.get(tok, 0)
            assert est <= tf
            assert (tf - est) * (MG_K + 1) <= n, (tok, tf, est, n)
        for tok, est in merged.items():
            assert est <= true[tok]

    check()


def test_heavy_hitters_audit_verdicts_and_branches(spark, sf_dir):
    """On the real corpus every verdict must be 1, and the k < |vocab|
    geometry must really exercise the sketch (more tokens than
    counters)."""
    from watermill_kinesis_spark.operators.frequency import (
        MG_K,
        heavy_hitters_audit,
    )

    rows = heavy_hitters_audit(spark, sf_dir).collect()
    assert len(rows) > MG_K  # vocabulary exceeds the counter budget
    assert all(r.mg_within_bound == 1 for r in rows)
    assert sum(r.tf for r in rows) > 0
