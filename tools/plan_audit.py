"""Generate PLANS.md: a physical-plan audit of the headline queries.

For each audited query this extracts the plan properties that decide
100 TB behavior — exchange count, broadcast usage, parquet pushdown,
whole-stage-codegen coverage, and the dangerous shapes (global sorts,
single-partition exchanges, nested-loop joins) — so plan regressions
are reviewable in diffs, not just caught by tests/test_plans.py.

    PYTHONPATH=/root/repo python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from watermill_kinesis_spark.registry import all_specs  # noqa: E402
from watermill_kinesis_spark.session import get_spark  # noqa: E402

AUDITED = [
    "project_filter",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "agg_hash",
    "join_inner",
    "join_broadcast",
    "window_rank",
    "topk_per_group",
    "sort_limit_topk",
    "join_asof_events",
    "stream_tumbling_window",
    "window_range_frame",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "decontaminate_ngram",
    "similarity_topk",
    "corpus_shuffle_hash",
    "text_stats",
    "quality_filter_pipeline",
    "rollup_incremental",
    "tfidf_top_terms",
    "profile_columns",
    "changelog_compact",
    "timeseries_gapfill",
    "anomaly_zscore",
    "repetition_ratio",
    "ngram_lm_counts",
    "domain_mix_weights",
    "merge_upsert_state",
    "interval_consolidate",
    "funnel_analysis",
    "retention_cohort",
    "sketch_distinct_mergeable",
    "histogram_fixed_width",
    "time_weighted_avg",
    "scd2_intervals",
    "agg_argmax",
    "window_percentile_dist",
    "dedup_prefix_containment",
    "dedup_containment_ngram",
    "unigram_freq_score",
    "sql_text_interface",
    "pack_concat_offsets",
    "dedup_exact_hashkey",
    "mode_agg",
    "agg_bitwise_bool",
    "agg_skew_kurt",
    "window_count_distinct",
    "ewma_halflife",
    "join_asof_tolerance",
    "decontaminate_bloom",
    "dedup_paragraph",
    "domain_mix_temperature",
    "graph_degree_histogram",
    "dedup_levenshtein",
    "variant_shred",
    "xml_shred",
    "collation_group",
    "forward_fill_locf",
    "period_over_period",
    "crosstab_expected",
    "corr_matrix_exact",
    "event_transition_matrix",
    "zorder_layout",
    "rtbf_cascade_delete",
    "kanonymity_audit",
    # round-3 additions
    "multimodal_image_decode",
    "graph_triangle_count",
    "interval_overlap_join",
    "lagged_cross_correlation",
    "bpe_pair_counts",
    "session_path_analysis",
    "dedup_embedding_cosine",
    "collocation_pmi",
    "token_budget_allocation",
    "vocab_induction",
    "bm25_components",
    "hll_sketch_native",
    "pareto_frontier",
    "udf_map_in_arrow",
    "multimodal_pixel_stats",
    "sql_pipe_interface",
    "domain_blocklist_filter",
    "minhash_signature_merge",
    "approx_quantile_audit",
    "ohlc_resample",
    "hll_accuracy_audit",
    "count_min_accuracy_audit",
    "weblog_parse_agg",
    "format_json_corrupt_modes",
    "mad_robust_stats",
    "benford_first_digit",
    "cross_source_duplication",
    "pandas_api_interface",
    "dataset_card_report",
    "boilerplate_ngrams",
    "session_window_dynamic_gap",
    "quantile_bucket_stats",
    "dup_cluster_size_histogram",
    "sliding_distinct_users",
    "peak_concurrency",
    "lsh_recall_audit",
    "seed_label_closure",
    "training_shard_manifest",
    "rfm_features",
    "ab_test_report",
    "vocab_growth_curve",
]


def _bad_single_partition(plan: str) -> bool:
    """A SinglePartition exchange is benign when it consumes the output
    of an upstream AGGREGATION — scalar-agg partial merges (one row per
    upstream partition) and global passes over group-bounded relations
    (e.g. pareto_frontier's suffix-max window over per-DATE maxima:
    |dates| rows at any corpus size). Those carry constant or
    group-bounded data volume at every scale. It is a red flag anywhere
    else — a global sort or global window over ROW-scale data."""
    for m in re.finditer(r"Exchange SinglePartition", plan):
        below = plan[m.end() : m.end() + 400]
        if "HashAggregate" not in below and "partial_" not in below:
            return True
    return False


def _bad_nested_loop(plan: str) -> bool:
    """BroadcastNestedLoopJoin is benign only as a scalar cross join —
    a 1-row broadcast build side (scalar subquery / global aggregate
    attached to every row). Any non-Cross nested loop is a red flag."""
    for m in re.finditer(r"BroadcastNestedLoopJoin (\w+), (\w+)", plan):
        if m.group(2) != "Cross":
            return True
    return False


def audit_plan(plan: str) -> dict:
    return {
        "shuffles": len(re.findall(r"Exchange hashpartitioning", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "bcast_joins": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "pushed": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan.replace("PushedFilters: [],", "X"),
        "codegen": len(re.findall(r"\*\(\d+\)", plan)) > 0,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "wgl": "WindowGroupLimit" in plan,
        "scalar_agg": "Exchange SinglePartition" in plan,
        "single_part": _bad_single_partition(plan),
        "bnlj": _bad_nested_loop(plan),
        "arrow": "ArrowEvalPython" in plan or "MapInPandas" in plan,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit", cpus=8)
    specs = all_specs()

    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Auto-generated by `tools/plan_audit.py` at `{sf_dir}`; regenerate",
        "after any operator change. Columns: shuffle exchange count,",
        "broadcast exchanges, join strategies, parquet pushdown, whole-stage",
        "codegen, top-k short-circuits, Arrow/Python stages. Red-flag",
        "columns (global single-partition exchange, nested-loop join)",
        "must stay empty — tests/test_plans.py enforces the critical ones.",
        "",
        "| query | shuffles | broadcasts | BHJ | SMJ | pushdown | codegen |"
        " TakeOrdered | WindowGroupLimit | Arrow | scalar-agg | BadSinglePart! | BadNestedLoop! |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    flags: list[str] = []
    for name in AUDITED:
        spec = specs.get(name)
        if spec is None:
            continue
        df = spec.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit_plan(plan)
        y = lambda b: "✓" if b else ""  # noqa: E731
        lines.append(
            f"| {name} | {a['shuffles']} | {a['broadcasts']} | "
            f"{a['bcast_joins']} | {a['smj']} | {y(a['pushed'])} | "
            f"{y(a['codegen'])} | {y(a['take_ordered'])} | {y(a['wgl'])} | "
            f"{y(a['arrow'])} | {y(a['scalar_agg'])} | {y(a['single_part'])} | "
            f"{y(a['bnlj'])} |"
        )
        if a["single_part"]:
            flags.append(f"{name}: single-partition exchange")
        if a["bnlj"]:
            flags.append(f"{name}: broadcast nested loop join")
    lines.append("")
    if flags:
        lines.append("## RED FLAGS")
        lines += [f"- {f}" for f in flags]
    else:
        lines.append(
            "No red flags: no single-partition exchanges, no nested-loop "
            "joins in any audited plan."
        )
    lines.append("")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote PLANS.md ({len(AUDITED)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
