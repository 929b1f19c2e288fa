"""Invariant tests for the wave-5 pipeline operators (pipeline4.py)."""

import math

from pyspark.sql import functions as F

from watermill_kinesis_spark.operators.pipeline4 import BLOCK_TOKENS, BLOOM_N
from watermill_kinesis_spark.operators.pipeline4 import _grams
from watermill_kinesis_spark.registry import queries
from watermill_kinesis_spark.sources.tables import load_table


def test_bloom_decontaminate_equals_exact_join(spark, sf_dir):
    """The Bloom prefilter must be lossless: its output equals the plain
    exact-join decontamination (no FNs; FPs removed by the confirm)."""
    d = load_table(spark, sf_dir, "documents")
    eval_grams = (
        _grams(d.where(F.col("doc_id") < 50), BLOOM_N).select("gram").distinct()
    )
    truth = {
        (r["doc_id"], r["n"])
        for r in _grams(d.where(F.col("doc_id") >= 50), BLOOM_N)
        .join(eval_grams, "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n"))
        .collect()
    }
    got = {
        (r["doc_id"], r["n_shared_grams"])
        for r in queries()["decontaminate_bloom"](spark, sf_dir).collect()
    }
    assert got == truth


def test_paragraph_profile_counts_consistent(spark, sf_dir):
    out = queries()["dedup_paragraph"](spark, sf_dir).cache()
    try:
        rows = out.collect()
        assert rows
        d = load_table(spark, sf_dir, "documents")
        eligible = d.where(
            F.size(F.split("text", " ")) >= BLOCK_TOKENS
        ).count()
        assert len(rows) == eligible
        for r in rows:
            assert 0 <= r["n_dup_blocks"] <= r["n_blocks"]
            assert math.isclose(
                r["dup_block_ratio"], r["n_dup_blocks"] / r["n_blocks"]
            )
            # full blocks only: n_blocks == floor(tokens / BLOCK_TOKENS) is
            # not guaranteed (stride windows), but at least 1
            assert r["n_blocks"] >= 1
    finally:
        out.unpersist()


def test_temperature_weights_flatten_the_mixture(spark, sf_dir):
    rows = queries()["domain_mix_temperature"](spark, sf_dir).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert math.isclose(r["temp_weight"], math.sqrt(r["share"]), rel_tol=1e-12)
        assert math.isclose(
            r["upsample_factor"] * r["temp_weight"], 1.0, rel_tol=1e-12
        )
    # temperature flattens: rare domains get boosted ABOVE proportional,
    # and the boost is larger the rarer the domain
    by_share = sorted(rows, key=lambda r: r["share"])
    boosts = [r["upsample_factor"] for r in by_share]
    assert boosts == sorted(boosts, reverse=True)


def test_binaryfile_ingest_matches_direct_aggregate(spark, sf_dir):
    got = {
        r["source"]: (r["n_files"], r["total_bytes"])
        for r in queries()["binaryfile_ingest"](spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    truth = {
        r["source"]: (r["n"], r["b"])
        for r in d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("b"))
        .collect()
    }
    assert got == truth


def test_bloom_pack_probe_contract_property(spark):
    """Property: for ANY key set, every inserted key probes back as
    contained (no false negatives — the bloom contract's hard side),
    at every geometry the audit can derive."""
    from hypothesis import given, settings, strategies as st

    from watermill_kinesis_spark.operators.pipeline4 import (
        BLOOM_BITS,
        _bloom_hit,
        _bloom_words,
    )

    @settings(max_examples=5, deadline=None)
    @given(
        keys=st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1,
                max_size=12,
            ),
            min_size=1,
            max_size=30,
            unique=True,
        ),
        bits_shift=st.integers(min_value=0, max_value=2),
    )
    def check(keys, bits_shift):
        bits = BLOOM_BITS << bits_shift
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        words = _bloom_words(df, "key", bits)
        hits = _bloom_hit(words, df, "key", bits).select("hit").collect()
        assert all(r.hit for r in hits), "false negative: bloom contract broken"

    check()


def test_bloom_distributed_probe_matches_dense_literal(spark, monkeypatch):
    """The over-budget probe strategy (left join against the
    distributed words relation — VERDICT r7 #1's fix) must return
    bit-identical hits to the dense-literal path: per-key equality
    over members (all hit), a disjoint probe set (dense path decides),
    and a NULL key (both paths probe the constant empty-hash
    positions)."""
    import watermill_kinesis_spark.operators.pipeline4 as p4

    members = spark.createDataFrame(
        [(f"key-{i}",) for i in range(200)], "key string"
    )
    probes = spark.createDataFrame(
        [(f"key-{i}",) for i in range(200)]
        + [(f"other-{i}",) for i in range(200)]
        + [(None,)],
        "key string",
    )
    bits = p4.BLOOM_BITS
    words = p4._bloom_words(members, "key", bits)
    dense_df = p4._bloom_hit(words, probes, "key", bits)
    # schema contract (r8 ADVICE): both strategies return exactly
    # probed-columns + hit — no h{i}/w{i} scratch may leak
    assert dense_df.columns == probes.columns + ["hit"]
    dense = {
        r["key"]: r["hit"] for r in dense_df.select("key", "hit").collect()
    }
    monkeypatch.setattr(p4, "BLOOM_LITERAL_BUDGET_BYTES", 0)
    dist_df = p4._bloom_hit(words, probes, "key", bits)
    assert dist_df.columns == probes.columns + ["hit"]
    dist = {
        r["key"]: r["hit"] for r in dist_df.select("key", "hit").collect()
    }
    assert dense == dist
    assert all(dense[f"key-{i}"] for i in range(200))
    # the distributed plan must not carry the packed bloom literal
    plan = (
        p4._bloom_hit(words, probes, "key", bits)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "element_at" not in plan
