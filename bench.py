"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the `noop` sink (full plan runs on executors,
nothing is collected to the driver) so timings reflect the distributed
plan, not driver materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: the queries that define the engine's headline throughput — scan/agg,
#: multi-join, window, as-of, event-time window, and the LLM-pipeline ops
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "agg_hash",
    "join_inner",
    "window_rank",
    "topk_per_group",
    "join_asof_events",
    "stream_tumbling_window",
    "dedup_exact",
    "dedup_fuzzy_minhash",
    "similarity_topk",
    "text_stats",
    # LLM-pipeline heavies: regressions here must be visible
    # round-over-round, not just in ad-hoc audits
    "decontaminate_bloom",
    "dedup_levenshtein",
    "similarity_ann_pq",
    "dedup_cluster_canonical",
    # r4-added heavies (VERDICT r4 #8): tracked as their own subtotal
    "bpe_train_merges",
    "semdedup_centroid_prune",
    "cross_source_duplication",
    "multimodal_pixel_stats",
    # r5-added heavies: winnowing + novelty (the widest new scans),
    # the winnowing-accelerated exact-substring dedup, and the
    # multi-format pixel decode
    "winnowing_fingerprints",
    "ngram_novelty_score",
    "dedup_exact_substring",
    "multimodal_pixel_decode_formats",
    # r6-added heavies: the widest of the evaluation-metrics family
    # (group-partitioned rank windows, the KS pair matrix, md5 content
    # addressing) and the animated-GIF block walker
    "auc_roc_exact",
    "ks_drift_matrix",
    "content_addressed_ids",
    "multimodal_gif_animation_probe",
    # r7-added heavies: the widest round-7 scans — the Gopher rule
    # pass (full-doc regex/array work), ColBERT MaxSim (einsum
    # scoring), the iterative k-center selection, and the
    # build+double-probe bloom audit
    "gopher_quality_rules",
    "multivector_maxsim_topk",
    "simhash_recall_audit",
    "kcenter_diversity_audit",
    "bloom_fpp_audit",
    # r8-added heavies: the block-quadratic mutual-kNN graph, the
    # corpus-stat BM25 ranking (higher-order array tf per doc), and
    # the double-probe percentile-sketch audit
    "knn_mutual_label_blocked",
    "bm25_topk",
    "approx_percentile_rank_audit",
]

#: index where the r4-added heavies start in HEADLINE
_R4_START = HEADLINE.index("bpe_train_merges")
#: index where the r5-added heavies start
_R5_START = HEADLINE.index("winnowing_fingerprints")
#: index where the r6-added heavies start
_R6_START = HEADLINE.index("auc_roc_exact")
#: index where the r7-added heavies start
_R7_START = HEADLINE.index("gopher_quality_rules")
#: index where the r8-added heavies start
_R8_START = HEADLINE.index("knn_mutual_label_blocked")

#: Calibration anchor (r5 VERDICT "what's wrong #3"): the machine is
#: co-tenant, so round-over-round per-query numbers drift with load the
#: harness can't see. This FROZEN query — uncached full lineitem scan +
#: scalar hash agg, a plan no engine change touches — is timed with the
#: same 5-run-min protocol; its ratio to the pinned reference (measured
#: r6 on an idle window) separates machine drift from plan regressions:
#: judge a query regression only after dividing by `drift`.
CALIBRATION_REF_SEC = 0.229  # r6 reference, sf0.1, local[32]


def _calibration_seconds(spark) -> float:
    """Time the frozen scan-agg anchor (best of 5). NEVER EDIT the
    query or the protocol — its value lies in being identical across
    rounds."""
    import pyspark.sql.functions as F

    path = os.path.join(SF_DIR, "lineitem.parquet")
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        (
            spark.read.parquet(path)
            .select(
                F.sum("l_quantity"),
                F.sum("l_extendedprice"),
                F.count(F.lit(1)),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    from watermill_kinesis_spark.registry import queries
    from watermill_kinesis_spark.session import get_spark

    spark = get_spark("bench", cpus=int(CPUS))
    qs = queries()
    names = [n for n in HEADLINE if n in qs]

    # warm the JVM + Python/Arrow workers once so per-query numbers
    # measure the query, not session/worker startup
    warm = spark.range(0, 10_000, 1, int(CPUS))
    warm.mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    # pin the working set (buffer pool): every test table fits the
    # per-table budget at bench SF; at 100 TB only the dims would —
    # see sources/tables.cache_tables for the size policy
    from watermill_kinesis_spark.sources.tables import cache_tables

    cache_tables(spark, SF_DIR)

    # Five runs per query, keep the fastest: the first run of a plan
    # shape pays one-time JIT/codegen compilation (measured 3-6×
    # inflation on kernel-heavy queries), and co-tenant load spikes
    # inflate any single run (round-3 measurements saw the SAME query
    # swing 2.5–15 s run-to-run on an idle build); steady-state
    # throughput is what a resident engine delivers and what the
    # baseline comparison should see.
    calib = round(_calibration_seconds(spark), 3)
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # the r1/r2 headline set, unchanged, so round-over-round comparison
    # stays apples-to-apples after round 3 added the LLM heavies
    core14 = HEADLINE[:14]
    core_total = round(sum(timings.get(n, 0.0) for n in core14), 3)
    r4_heavies = HEADLINE[_R4_START:_R5_START]
    r4_total = round(sum(timings.get(n, 0.0) for n in r4_heavies), 3)
    r5_heavies = HEADLINE[_R5_START:_R6_START]
    r5_total = round(sum(timings.get(n, 0.0) for n in r5_heavies), 3)
    r6_heavies = HEADLINE[_R6_START:_R7_START]
    r6_total = round(sum(timings.get(n, 0.0) for n in r6_heavies), 3)
    r7_heavies = HEADLINE[_R7_START:_R8_START]
    r7_total = round(sum(timings.get(n, 0.0) for n in r7_heavies), 3)
    r8_heavies = HEADLINE[_R8_START:]
    r8_total = round(sum(timings.get(n, 0.0) for n in r8_heavies), 3)
    heavy_total = round(
        total
        - core_total
        - r4_total
        - r5_total
        - r6_total
        - r7_total
        - r8_total,
        3,
    )
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "subtotals": {
                    "core14_r1r2_comparable": core_total,
                    "llm_heavies_added_r3": heavy_total,
                    "heavies_added_r4": r4_total,
                    "heavies_added_r5": r5_total,
                    "heavies_added_r6": r6_total,
                    "heavies_added_r7": r7_total,
                    "heavies_added_r8": r8_total,
                },
                "calibration": {
                    "sec": calib,
                    "ref_sec": CALIBRATION_REF_SEC,
                    "drift": round(calib / CALIBRATION_REF_SEC, 3),
                    "core14_drift_normalized": round(
                        core_total / max(calib / CALIBRATION_REF_SEC, 1e-9), 3
                    ),
                },
                "sf": sf_val,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
