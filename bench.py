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
    # r9-added heavies: the substring-excision pair (corpus-wide gram
    # ranking + full text materialization — the widest new scans) and
    # the double-encode ANN model round-trip
    "dedup_substring_excise",
    "dedup_substring_excise_text",
    "ann_model_save_load_audit",
    # r9 wave 2: the skip-gram pair miner (corpus-wide higher-order
    # explode + one pair shuffle), the Welch/Simpson stat screens, the
    # t-closeness release gate, the Kneser-Ney continuation table, the
    # Wilson-bound ranking, the cross-source vocab Jaccard, and the
    # Chao1 / Good-Turing count-based estimators, token dispersion, cascade-model ERR, and the protobuf codec audit
    "skipgram_cooccurrence",
    "welch_ttest_lengths",
    "simpson_diversity_tokens",
    "t_closeness_audit",
    "kneser_ney_continuation",
    "wilson_lower_bound_rank",
    "vocab_jaccard_sources",
    "chao1_vocab_richness",
    "good_turing_discounts",
    "token_dispersion_stats",
    "expected_reciprocal_rank",
    "envelope_proto_roundtrip",
    # r10-added heavies: the richness/burstiness/TVD corpus statistics
    # (two corpus explodes + a vocabulary self-join), the Mann-Whitney
    # rank test, dedup token accounting, cadence screening, and the
    # Brier decomposition over grouped_scan NTILE bins
    "yule_sichel_richness",
    "token_burstiness_topk",
    "unigram_tvd_sources",
    "mann_whitney_u_lengths",
    "dedup_token_savings",
    "user_cadence_regularity",
    "brier_decomposition_exact",
    # r10 wave 2: the CvM integral drift statistic, Mood's k-group
    # median test, the referential-integrity star sweep, and the
    # incremental-ingest dedup delta (corpus hash probe + intra-batch
    # keep-first)
    "cramer_von_mises_lengths",
    "mood_median_test_langs",
    "referential_integrity_audit",
    "ingest_dedup_delta",
    "sql_named_window",
    "dow_uniformity_audit",
    # r10 wave 3: the heaviest of the round's additions — the full
    # Hamming retrieval pass (sign-pack projection ×2 scans +
    # candidate shuffle), the theta-sketch pair audit (bigram sketch
    # fold + the bounded exact set-algebra legs), NDCG over the shared
    # exact-top-k ranking, and the Cochran-Armitage lineitem⋈orders
    # trend scan
    "binary_quant_hamming_topk",
    "theta_sketch_pair_audit",
    "ndcg_at_k",
    "cochran_armitage_trend",
    # r11+ additions (r12 VERDICT task 4): the widest operators added
    # or RE-PLANNED in r11-r13 that previously had no round-over-round
    # bench row — the iterative BFS frontier loop, the survival-table
    # double window, the weekly PAA/SAX spine, the split-leg
    # approx_distinct (r12 re-plan), the container-packed binaryFile
    # ingest (r12 re-plan), and the DF-capped containment twin (r13)
    "graph_bfs_hops",
    "kaplan_meier_hazard",
    "sax_symbolic_daily",
    "approx_distinct",
    "binaryfile_ingest",
    "dedup_containment_capped",
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
#: index where the r9-added heavies start
_R9_START = HEADLINE.index("dedup_substring_excise")
#: index where the r10-added heavies start
_R10_START = HEADLINE.index("yule_sichel_richness")
#: index where the r11+ additions start (r12 VERDICT task 4)
_R11P_START = HEADLINE.index("graph_bfs_hops")

#: Calibration anchors (r5 VERDICT "what's wrong #3"; widened to a
#: 3-anchor median by r8 VERDICT task 4): the machine is co-tenant, so
#: round-over-round per-query numbers drift with load the harness can't
#: see. Three FROZEN queries — plans no engine change touches — are
#: timed with the same 5-run-min protocol; the MEDIAN of their ratios
#: to the pinned references separates machine drift from plan
#: regressions. r8 showed why one anchor is not enough: its 0.167 s
#: scan anchor swung the normalized core14 +17% while every core query
#: improved raw. The new anchors run ~0.5-1.1 s each, so per-anchor
#: jitter is proportionally smaller, and a co-tenant spike during one
#: anchor's window cannot move the median.
#:
#: References are all expressed in the ORIGINAL r6 epoch so the drift
#: series stays comparable across rounds: the scan ref is the r6
#: measurement itself; the join/window refs were derived in r9 as
#: 0.229 × (hot-cache anchor/scan time ratio), measured over
#: interleaved same-moment batches (ratios between queries timed at
#: the same instant cancel machine load, unlike absolute seconds).
#: NEVER EDIT the queries, the protocol, or these constants — their
#: value lies in being identical across rounds.
CALIBRATION_REFS_SEC = {
    "scan": 0.229,  # r6 reference, sf0.1, local[32]
    "join": 0.765,  # r9, ratio-derived to the r6 epoch
    "window": 1.131,  # r9, ratio-derived to the r6 epoch
}
#: kept for BENCH_r* readers of the old single-anchor field names
CALIBRATION_REF_SEC = CALIBRATION_REFS_SEC["scan"]

#: In-block anchor targets (r11 VERDICT task 2): the r11 round saw the
#: r7/r9 audit heavies rise 18-27% raw with UNCHANGED code while the
#: session-start anchors read the machine as fast — a co-tenant burst
#: DURING the heavies block that anchors timed minutes earlier cannot
#: see. For each query named here, the scan anchor is re-timed (best
#: of 3) immediately BEFORE its 5-run measurement; the same-moment
#: anchor/target ratio cancels whatever load both saw (the r9
#: ratio-derivation technique), so a regression that survives in
#: `queries[name] / (inblock_anchors[name] / scan_ref)` is a plan
#: change, not noise. An isolated r12 rerun already adjudicated the
#: r11 spike as co-tenant noise (simhash 3.99→3.31 s, ann_model
#: 3.07→2.49 s with no code change); this instrument makes that
#: adjudication automatic in every future round.
INBLOCK_ANCHOR_QUERIES = (
    "simhash_recall_audit",
    "kcenter_diversity_audit",
    "ann_model_save_load_audit",
    "bloom_fpp_audit",
    # r13: the two r11+ additions measuring over ~2 s get the same
    # same-moment adjudication (r12 VERDICT task 4 done-criterion)
    "graph_bfs_hops",
    "dedup_containment_capped",
)


def _calibration_seconds(spark) -> dict[str, float]:
    """Time the three frozen anchors (best of 5 each): scan-agg,
    shuffle join-agg, and a window top-n — one representative per
    dominant physical-plan family in the headline set."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    li = os.path.join(SF_DIR, "lineitem.parquet")
    od = os.path.join(SF_DIR, "orders.parquet")

    def scan_anchor():
        return (
            spark.read.parquet(li)
            .select(
                F.sum("l_quantity"),
                F.sum("l_extendedprice"),
                F.count(F.lit(1)),
            )
        )

    def join_anchor():
        return (
            spark.read.parquet(li)
            .join(
                spark.read.parquet(od),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice"), F.count(F.lit(1)))
        )

    def window_anchor():
        w = W.partitionBy("l_suppkey").orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber"
        )
        return (
            spark.read.parquet(li)
            .select(
                "l_suppkey",
                "l_shipdate",
                "l_orderkey",
                "l_linenumber",
                F.row_number().over(w).alias("rn"),
            )
            .where(F.col("rn") <= 3)
            .groupBy()
            .agg(F.count(F.lit(1)), F.sum("l_suppkey"))
        )

    out = {}
    for name, fn in (
        ("scan", scan_anchor),
        ("join", join_anchor),
        ("window", window_anchor),
    ):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = best
    return out


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
    # NOTE (optimization round 13, measurement fix): bench.py had pinned
    # every base table under a 256 MB budget with
    # sources/tables.cache_tables() here since round 2 — at bench SF
    # that persisted ALL ten inputs in executor memory before anything
    # was timed. Removed: every timed query now computes from the
    # parquet inputs (no .cache() of base tables outside the timed
    # region). r12-methodology numbers for comparison are recorded in
    # OPTIMIZATION_r13.md; round-over-round deltas across this change
    # must compare like with like.

    # Five runs per query, keep the fastest: the first run of a plan
    # shape pays one-time JIT/codegen compilation (measured 3-6×
    # inflation on kernel-heavy queries), and co-tenant load spikes
    # inflate any single run (round-3 measurements saw the SAME query
    # swing 2.5–15 s run-to-run on an idle build); steady-state
    # throughput is what a resident engine delivers and what the
    # baseline comparison should see.
    calib = {k: round(v, 3) for k, v in _calibration_seconds(spark).items()}

    import pyspark.sql.functions as F  # for the in-block scan anchor

    li_path = os.path.join(SF_DIR, "lineitem.parquet")

    def _scan_anchor_best(runs: int = 3) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            spark.read.parquet(li_path).select(
                F.sum("l_quantity"),
                F.sum("l_extendedprice"),
                F.count(F.lit(1)),
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    timings: dict[str, float] = {}
    inblock_anchors: dict[str, float] = {}
    for name in names:
        if name in INBLOCK_ANCHOR_QUERIES:
            # same-moment anchor: timed immediately before the target
            # so the anchor/target ratio cancels co-tenant load
            inblock_anchors[name] = round(_scan_anchor_best(), 3)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(json.dumps(build_payload(timings, calib, inblock_anchors)))
    return 0


def build_payload(
    timings: dict[str, float],
    calib: dict[str, float],
    inblock_anchors: dict[str, float],
    sf_dir: str | None = None,
) -> dict:
    """Assemble the ONE-JSON-LINE payload the driver parses — the
    harness contract (metric/value/unit/queries/subtotals/calibration/
    sf). Split out of ``main`` so tests/test_bench_contract.py can pin
    the emission path without running Spark (VERDICT r13 task 2: the
    driver's r12→r13 round-over-round comparison was lost to a payload
    parse failure; the contract must be breakable only visibly)."""
    sf_dir = SF_DIR if sf_dir is None else sf_dir
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
    r8_heavies = HEADLINE[_R8_START:_R9_START]
    r8_total = round(sum(timings.get(n, 0.0) for n in r8_heavies), 3)
    r9_heavies = HEADLINE[_R9_START:_R10_START]
    r9_total = round(sum(timings.get(n, 0.0) for n in r9_heavies), 3)
    r10_heavies = HEADLINE[_R10_START:_R11P_START]
    r10_total = round(sum(timings.get(n, 0.0) for n in r10_heavies), 3)
    r11p_heavies = HEADLINE[_R11P_START:]
    r11p_total = round(sum(timings.get(n, 0.0) for n in r11p_heavies), 3)
    heavy_total = round(
        total
        - core_total
        - r4_total
        - r5_total
        - r6_total
        - r7_total
        - r8_total
        - r9_total
        - r10_total
        - r11p_total,
        3,
    )
    import statistics

    drifts = {
        k: round(calib[k] / CALIBRATION_REFS_SEC[k], 3) for k in calib
    }
    drift = round(statistics.median(drifts.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    return {
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
                    "heavies_added_r9": r9_total,
                    "heavies_added_r10": r10_total,
                    "heavies_added_r10plus": r11p_total,
                },
                "calibration": {
                    # legacy single-anchor fields (scan) for continuity
                    # with BENCH_r1-r8 readers
                    "sec": calib["scan"],
                    "ref_sec": CALIBRATION_REF_SEC,
                    "anchors_sec": calib,
                    "anchor_refs_sec": CALIBRATION_REFS_SEC,
                    "anchor_drifts": drifts,
                    # same-moment scan anchors timed immediately
                    # before each audit heavy (r11 VERDICT task 2):
                    # query_sec / (inblock_anchor / scan_ref) is the
                    # load-cancelled normalization for that query
                    "inblock_anchors_sec": inblock_anchors,
                    "inblock_drifts": {
                        k: round(v / CALIBRATION_REFS_SEC["scan"], 3)
                        for k, v in inblock_anchors.items()
                    },
                    # the governing drift is the MEDIAN of the three
                    # per-anchor ratios (r8 VERDICT task 4)
                    "drift": drift,
                    "core14_drift_normalized": round(
                        core_total / max(drift, 1e-9), 3
                    ),
                },
                "sf": sf_val,
    }


if __name__ == "__main__":
    raise SystemExit(main())
