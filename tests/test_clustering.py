"""Invariant tests for the iterative embedding operators
(operators/clustering.py) — these stand in for the DuckDB oracle on
the rows-only entries."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from watermill_kinesis_spark.operators.clustering import (
    KMEANS_K,
    kmeans_fit,
)
from watermill_kinesis_spark.registry import queries
from watermill_kinesis_spark.sources.tables import load_table


def _vectors(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    M = np.stack([r["emb"] for r in rows])
    return ids, M


def test_kmeans_assignments_are_nearest_centroid(spark, sf_dir):
    C, assigned = kmeans_fit(spark, sf_dir)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    ids, M = _vectors(spark, sf_dir)
    d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    want = d.argmin(axis=1)
    mismatch = sum(1 for i, v in zip(ids, want) if got[i] != v)
    assert mismatch == 0


def test_kmeans_iterations_reduce_inertia(spark, sf_dir):
    ids, M = _vectors(spark, sf_dir)

    def inertia(C):
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    C1, _ = kmeans_fit(spark, sf_dir, iters=1)
    C5, _ = kmeans_fit(spark, sf_dir, iters=5)
    assert inertia(C5) <= inertia(C1) + 1e-9  # Lloyd's is monotone


def test_kmeans_profile_covers_corpus(spark, sf_dir):
    rows = queries()["cluster_kmeans_embeddings"](spark, sf_dir).collect()
    assert len(rows) <= KMEANS_K
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == total
    for r in rows:
        assert -1.0 <= r["mean_cos_to_centroid"] <= 1.0 + 1e-12


def test_pca_components_capture_descending_variance(spark, sf_dir):
    out = queries()["embedding_pca_project"](spark, sf_dir)
    pdf = out.toPandas()
    assert len(pdf) == load_table(spark, sf_dir, "embeddings").count()
    v1, v2 = pdf["pc1"].var(ddof=0), pdf["pc2"].var(ddof=0)
    assert v1 >= v2 > 0
    # projections are centered and (near-)uncorrelated
    assert abs(pdf["pc1"].mean()) < 1e-6 * max(1.0, v1)
    corr = np.corrcoef(pdf["pc1"], pdf["pc2"])[0, 1]
    assert abs(corr) < 1e-6


def test_semdedup_invariants_and_counts(spark, sf_dir):
    """Greedy-leader invariants, recomputed exactly: kept vectors in a
    cluster are pairwise below τ; every dropped vector has an earlier
    KEPT neighbor at or above τ; and the operator's per-cluster counts
    equal the reference scan's."""
    import numpy as np

    from watermill_kinesis_spark.operators.clustering import (
        SEMDEDUP_TAU,
        kmeans_fit,
        semdedup_centroid_prune,
        semdedup_keep_ids,
    )

    got = {
        r.cluster: (r.n_vectors, r.n_kept, r.n_dropped)
        for r in semdedup_centroid_prune(spark, sf_dir).collect()
    }
    _, assigned = kmeans_fit(spark, sf_dir)
    pdf_all = assigned.toPandas()
    for cluster, cpdf in pdf_all.groupby("cluster"):
        kept_ids = semdedup_keep_ids(cpdf)
        n, k = len(cpdf), len(kept_ids)
        assert got[cluster] == (n, k, n - k), f"cluster {cluster}"
        # invariant 1: kept are pairwise < tau
        sub = cpdf[cpdf["vec_id"].isin(kept_ids)].sort_values("vec_id")
        M = np.stack(sub["emb"].to_numpy())
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = Mn @ Mn.T
        np.fill_diagonal(S, 0)
        assert S.max(initial=0) < SEMDEDUP_TAU
        # invariant 2: every dropped vector has an earlier kept
        # neighbor >= tau
        dropped = cpdf[~cpdf["vec_id"].isin(kept_ids)].sort_values("vec_id")
        for _, row in dropped.iterrows():
            earlier = sub[sub["vec_id"] < row.vec_id]
            if len(earlier) == 0:
                raise AssertionError("dropped vector with no earlier kept")
            E = np.stack(earlier["emb"].to_numpy())
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            v = np.asarray(row.emb)
            v = v / np.linalg.norm(v)
            assert float((En @ v).max()) >= SEMDEDUP_TAU
