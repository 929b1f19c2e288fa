"""Corpus + model quality report — the evaluation-metrics family
composed into the one-shot report a data team runs before signing off
a corpus snapshot or a classifier swap:

    balance    per-source document-size Gini (inequality audit)
    drift      worst event-type KS pair (distribution drift screen)
    dedup      content-addressing copy census (md5 CAS groups)
    folds      k-fold class balance (largest/smallest fold sizes)
    ranking    per-group AUC of the price→finished-status scorer
    classifier confusion counts + accuracy/precision/recall/F1
    agreement  Cohen's kappa between the two rater proxies
    alignment  quantile normalization spot check (rank-1 mean)

    python examples/corpus_quality_report.py [sf_dir]

Every number comes from the same registry operators the DuckDB oracle
hash-checks (CATALOG.md); this example only composes and prints them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from watermill_kinesis_spark.registry import queries
from watermill_kinesis_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-quality-report")
    qs = queries()

    print("== corpus balance (Gini of doc sizes per source) ==")
    gini = qs["gini_corpus_inequality"](spark, sf_dir)
    worst = gini.orderBy(F.col("gini_permille").desc()).limit(3).collect()
    for r in worst:
        print(f"  {r.source}: gini={r.gini_permille}‰ over {r.n_docs} docs")

    print("== distribution drift (max KS across event-type pairs) ==")
    ks = qs["ks_drift_matrix"](spark, sf_dir)
    top = ks.orderBy(F.col("ks_permille").desc()).limit(3).collect()
    for r in top:
        print(f"  {r.t1} vs {r.t2}: KS={r.ks_permille}‰ (n={r.n1}/{r.n2})")

    print("== exact-copy census (content addressing) ==")
    cas = qs["content_addressed_ids"](spark, sf_dir)
    dup_groups = cas.where(F.col("n_copies") > 1).select(
        "content_hash"
    ).distinct()
    print(f"  duplicate content groups: {dup_groups.count()}")

    print("== k-fold balance ==")
    folds = qs["kfold_assign_balance"](spark, sf_dir)
    sizes = (
        folds.groupBy("fold").agg(F.sum("n_docs").alias("n")).collect()
    )
    ns = sorted(r.n for r in sizes)
    print(f"  fold sizes min/max: {ns[0]}/{ns[-1]}")

    print("== ranking quality (AUC per priority group) ==")
    for r in qs["auc_roc_exact"](spark, sf_dir).collect():
        print(f"  {r.grp}: AUC={r.auc_permille}‰")

    print("== classifier report ==")
    cm = qs["confusion_matrix_exact"](spark, sf_dir).collect()[0]
    print(
        f"  tp={cm.tp} fp={cm.fp} fn={cm.fn} tn={cm.tn} | "
        f"acc={cm.accuracy_permille}‰ p={cm.precision_permille}‰ "
        f"r={cm.recall_permille}‰ f1={cm.f1_permille}‰"
    )

    print("== rater agreement ==")
    k = qs["cohens_kappa_exact"](spark, sf_dir).collect()[0]
    print(f"  kappa={k.kappa_permille}‰ (raw agreement {k.po_permille}‰)")

    print("== cross-source alignment (quantile normalization) ==")
    qn = qs["quantile_normalization"](spark, sf_dir)
    r1 = (
        qn.where(F.col("r") == 1)
        .select("normalized_milli")
        .distinct()
        .collect()
    )
    print(
        f"  rank-1 normalized value unique across sources: "
        f"{len(r1) == 1} ({r1[0].normalized_milli} milli)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
