"""Round-8 pins: the matryoshka zero-norm guard regression test
(VERDICT r7 task 7) and the hll_sketch_native audit-twin contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from watermill_kinesis_spark.registry import queries


def _write_embeddings(spark, tmp_path, vecs):
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in vecs.items()], schema
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))


def test_matryoshka_zero_prefix_vector_never_tops_truncated_ranking(
    spark, tmp_path
):
    """Regression pin for the zero-norm guard (r6 ADVICE /
    similarity2.py): a candidate whose MRL_DIM prefix is all-zero must
    score −1.0 in the truncated variant (DuckDB's zero-vector
    convention) — NEVER 0/0 = NaN, which Spark's descending sort
    places ABOVE every finite score, silently promoting garbage into
    the truncated top-k. The pin compares the operator's per-query
    overlap against a brute force that applies the −1.0 convention
    explicitly, on data where the poisoned candidate would flip the
    overlap if it ever re-entered the truncated ranking."""
    from watermill_kinesis_spark.operators.similarity import (
        EMB_DIM,
        N_QUERIES,
        TOP_K,
    )
    from watermill_kinesis_spark.operators.similarity2 import MRL_DIM

    rng = np.random.default_rng(8)
    vecs: dict[int, np.ndarray] = {}
    for q in range(N_QUERIES):  # queries: random full-rank vectors
        vecs[q] = rng.normal(size=EMB_DIM)
    for c in range(20):  # ordinary candidates
        vecs[100 + c] = rng.normal(size=EMB_DIM)
    # poisoned candidate: zero MRL prefix, huge tail — a strong FULL
    # neighbor (big dot product via the tail) whose TRUNCATED cosine is
    # 0/0 without the guard
    poison = np.zeros(EMB_DIM)
    poison[MRL_DIM:] = 50.0 * np.sign(vecs[0][MRL_DIM:])
    vecs[200] = poison
    vecs[201] = np.zeros(EMB_DIM)  # zero FULL vector: −1.0 everywhere
    _write_embeddings(spark, tmp_path, vecs)

    got = {
        r.query_id: (r.n_overlap, r.overlap_permille)
        for r in queries()["embedding_matryoshka_audit"](
            spark, str(tmp_path)
        ).collect()
    }

    # brute force with the documented convention (float32 storage)
    ids = sorted(vecs)
    M = np.stack([np.asarray(vecs[i], dtype=np.float32) for i in ids]).astype(
        np.float64
    )

    def topk(q, dims):
        qv = M[ids.index(q)][:dims]
        qn = np.linalg.norm(qv)
        scores = []
        for j, i in enumerate(ids):
            if i == q:
                continue
            cv = M[j][:dims]
            cn = np.linalg.norm(cv)
            s = -1.0 if (qn == 0.0 or cn == 0.0) else float(
                (cv / cn) @ (qv / qn)
            )
            scores.append((-s, i))
        return {i for _, i in sorted(scores)[:TOP_K]}

    expect = {}
    for q in range(N_QUERIES):
        full, trunc = topk(q, EMB_DIM), topk(q, MRL_DIM)
        ov = len(full & trunc)
        expect[q] = (ov, ov * 1000 // TOP_K)
    assert got == expect
    # the crafted data must actually exercise the guard: the poisoned
    # candidate is a FULL top-k neighbor of query 0 (tail-aligned) yet
    # absent from its truncated top-k — so a NaN regression would
    # change the overlap, not just a hidden internal score
    assert 200 in topk(0, EMB_DIM)
    assert 200 not in topk(0, MRL_DIM)
    assert got[0] == expect[0]


def test_hll_sketch_native_audit_executes_sketch_path(spark, sf_dir):
    """The converted audit twin must carry exact counts AND a green
    union verdict per event type (non-vacuous: n_days > 1 somewhere,
    so hll_union_agg really merges)."""
    rows = queries()["hll_sketch_native"](spark, sf_dir).collect()
    assert rows and all(r.union_within_bound == 1 for r in rows)
    assert any(r.n_days > 1 for r in rows)
    assert all(r.n_users_exact > 0 for r in rows)
