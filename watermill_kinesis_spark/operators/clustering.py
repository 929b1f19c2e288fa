"""Iterative embedding-space algorithms: k-means clustering and PCA
projection — the "big data, small model" class (model state is KBs and
lives on the driver; every data pass is a distributed scan).

These are the driver contract's genuinely-non-SQL-expressible
operators (iterative algorithms): registered rows-only, with invariant
tests in tests/test_clustering.py standing in for the oracle
(assignment optimality, monotone inertia, component orthogonality,
variance ordering).

Scale posture shared by both: per-iteration state is O(k·dim) or
O(dim²) — broadcast in the kernel closure, never joined; each pass over
the data is one Arrow-vectorized scan with map-side partial reduction
to ≤ k (or dim²) rows. No row ever shuffles; at 100 TB the cost is
iterations × one-scan, the textbook distributed formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table

KMEANS_K = 8
KMEANS_ITERS = 5
PCA_COMPONENTS = 2


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    return e.repartition(e.sparkSession.sparkContext.defaultParallelism, "vec_id")


def _assign_kernel(C):
    """Returns a mapInPandas kernel assigning each vector to its
    nearest centroid in C (k × dim, captured in the closure) and
    emitting per-row (vec_id, cluster, emb) for downstream reduction.
    Distance via the ||x-c||² = ||x||² - 2x·c + ||c||² expansion — one
    BLAS matmul per Arrow batch."""
    import numpy as np
    import pandas as pd

    c2 = (C * C).sum(axis=1)  # k

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["emb"].to_numpy())  # n × dim
            d = c2[None, :] - 2.0 * (M @ C.T)  # n × k (|x|² const per row)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster": d.argmin(axis=1).astype("int32"),
                    "emb": pdf["emb"],
                }
            )

    return kernel


def kmeans_fit(spark: SparkSession, sf_dir: str, k: int = KMEANS_K,
               iters: int = KMEANS_ITERS):
    """Lloyd's algorithm. Init is deterministic (the k lowest vec_ids —
    k-means|| would replace this at scale without changing the loop).
    Each iteration: one distributed assign+reduce pass; only k partial
    sums per partition cross the wire; the k × dim model collects to
    the driver. Returns (centroids ndarray, assigned DataFrame)."""
    import numpy as np

    e = _emb(spark, sf_dir)
    C = np.stack(
        [
            r["emb"]
            for r in e.where(F.col("vec_id") < k).orderBy("vec_id").collect()
        ]
    )
    for _ in range(iters):
        assigned = e.mapInPandas(
            _assign_kernel(C), "vec_id long, cluster int, emb array<double>"
        )
        sums = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.array(
                    *[
                        F.sum(F.col("emb")[i]).alias(f"s{i}")
                        for i in range(C.shape[1])
                    ]
                ).alias("s"),
            )
            .collect()
        )
        for r in sums:  # empty clusters keep their previous centroid
            C[r["cluster"]] = np.asarray(r["s"]) / r["n"]
    # final assignment against the FINAL centroids (the loop's last
    # `assigned` predates the last centroid update)
    assigned = e.mapInPandas(
        _assign_kernel(C), "vec_id long, cluster int, emb array<double>"
    )
    return C, assigned


@query("cluster_kmeans_embeddings", tags=("clustering", "llm-pipeline"))
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster profile of the embedding corpus: size and
    within-cluster mean cosine-to-centroid per cluster (the semantic
    grouping step of centroid-based dedup / diversity sampling /
    DoReMi-style domain discovery)."""
    import numpy as np
    import pandas as pd

    C, assigned = kmeans_fit(spark, sf_dir)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    def cos_kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["emb"].to_numpy())
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            cl = pdf["cluster"].to_numpy()
            yield pd.DataFrame(
                {
                    "cluster": cl,
                    "cos": np.einsum("ij,ij->i", Mn, Cn[cl]),
                }
            )

    return (
        assigned.mapInPandas(cos_kernel, "cluster int, cos double")
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.avg("cos").alias("mean_cos_to_centroid"),
        )
    )


@query("embedding_pca_project", tags=("clustering", "llm-pipeline"))
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection to the top components: the mean vector and dim²
    covariance accumulate in ONE distributed pass (per-batch outer
    products, map-side summed), the eigendecomposition runs on the
    driver (64×64 — microseconds), and the projection is a second
    scan. The whitening/visualization/IVF-coarse-quantizer primitive;
    at 100 TB both passes stream, and nothing larger than dim² ever
    leaves an executor. Sign convention: each component's
    largest-magnitude coordinate is made positive (eigenvector sign is
    otherwise arbitrary)."""
    import numpy as np
    import pandas as pd

    e = _emb(spark, sf_dir)
    dim_row = e.select(F.size("emb").alias("d")).first()
    dim = dim_row["d"]

    def moments_kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["emb"].to_numpy())
            yield pd.DataFrame(
                {
                    "n": [len(M)],
                    "s": [M.sum(axis=0).tolist()],
                    "ss": [(M.T @ M).ravel().tolist()],
                }
            )

    parts = e.mapInPandas(
        moments_kernel, "n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(p["n"] for p in parts)
    s = np.sum([p["s"] for p in parts], axis=0)
    ss = np.sum([p["ss"] for p in parts], axis=0).reshape(dim, dim)
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = vecs[:, ::-1][:, :PCA_COMPONENTS].T  # top-k × dim
    for i in range(len(comps)):  # fix sign: dominant coordinate positive
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]

    def project_kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["emb"].to_numpy()) - mu
            P = M @ comps.T
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for i in range(P.shape[1]):
                out[f"pc{i + 1}"] = P[:, i]
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(
        f"pc{i + 1} double" for i in range(PCA_COMPONENTS)
    )
    return e.mapInPandas(project_kernel, schema)
