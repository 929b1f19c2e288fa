"""Brute-force cross-checks for the evaluation-metrics family: the
oracle already pins Spark vs DuckDB value-exactly; these tests pin
both against straight-line Python over the same rows, so a shared
misreading of a formula (the one failure mode a twin-engine compare
cannot catch) is caught too."""

from __future__ import annotations

from fractions import Fraction

from watermill_kinesis_spark.registry import queries
from watermill_kinesis_spark.sources.tables import load_table


def test_auc_matches_bruteforce_mann_whitney(spark, sf_dir):
    out = {r.grp: r for r in queries()["auc_roc_exact"](spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderstatus"
    ).collect()
    by_grp: dict[str, list] = {}
    for r in rows:
        by_grp.setdefault(r.o_orderpriority, []).append(
            (r.o_totalprice, 1 if r.o_orderstatus == "F" else 0)
        )
    for grp, pts in by_grp.items():
        # pairwise AUC: wins + half-ties over pos×neg pairs
        pos = [s for s, p in pts if p]
        neg = [s for s, p in pts if not p]
        wins = sum(1 for a in pos for b in neg if a > b)
        ties = sum(1 for a in pos for b in neg if a == b)
        expect = Fraction(2 * wins + ties, 2 * len(pos) * len(neg))
        got = out[grp]
        assert got.n_pos == len(pos) and got.n_neg == len(neg)
        assert got.auc_permille == int(expect * 1000)  # floor of exact


def test_ks_matches_bruteforce(spark, sf_dir):
    """KS over the operator's contractual quantization grid: the
    brute force applies the SAME in-plan binning (floor(v·KS_SCALE)
    clamped to [0, KS_BINS)) before computing max|cum1·n2 − cum2·n1|."""
    import math

    from watermill_kinesis_spark.operators.evaluation import KS_BINS, KS_SCALE

    out = {
        (r.t1, r.t2): r
        for r in queries()["ks_drift_matrix"](spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    ).collect()
    samples: dict[str, list] = {}
    for r in rows:
        b = min(KS_BINS - 1, max(0, math.floor(r.value * KS_SCALE)))
        samples.setdefault(r.event_type, []).append(b)
    types = sorted(samples)
    assert set(out) == {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    for (a, b), r in out.items():
        s1, s2 = sorted(samples[a]), sorted(samples[b])
        n1, n2 = len(s1), len(s2)
        grid = sorted(set(s1) | set(s2))
        import bisect

        d = max(
            abs(bisect.bisect_right(s1, v) * n2 - bisect.bisect_right(s2, v) * n1)
            for v in grid
        )
        assert (r.n1, r.n2, r.d_scaled) == (n1, n2, d)
        assert r.ks_permille == d * 1000 // (n1 * n2)


def test_ks_cell_axis_bounded_by_grid(spark, sf_dir):
    """The What's-wrong-#2 fix pinned: the cumulative window's input
    is bounded by the quantization grid — per-pair cell count can
    never exceed KS_BINS regardless of score cardinality, because the
    binning happens IN-PLAN before cell formation."""
    from pyspark.sql import functions as F

    from watermill_kinesis_spark.operators.evaluation import KS_BINS, KS_SCALE
    from watermill_kinesis_spark.sources.tables import load_table as lt

    ev = lt(spark, sf_dir, "events")
    v_bin = F.least(
        F.lit(KS_BINS - 1),
        F.greatest(F.lit(0), F.floor(F.col("value") * KS_SCALE).cast("bigint")),
    )
    n_cells = (
        ev.select("event_type", v_bin.alias("v"))
        .groupBy("event_type", "v")
        .count()
        .groupBy("event_type")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert n_cells <= KS_BINS


def test_gini_matches_bruteforce(spark, sf_dir):
    out = {
        r.source: r
        for r in queries()["gini_corpus_inequality"](spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    ).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.n_chars)
    for src, xs in by_src.items():
        xs.sort()
        n, s = len(xs), sum(xs)
        si = sum((i + 1) * x for i, x in enumerate(xs))
        assert out[src].n_docs == n and out[src].total_chars == s
        assert out[src].gini_permille == (2 * si - (n + 1) * s) * 1000 // (n * s)
        assert 0 <= out[src].gini_permille < 1000


def test_chi2_cells_match_bruteforce(spark, sf_dir):
    out = queries()["chi2_statistic_exact"](spark, sf_dir).collect()
    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    ).collect()
    from collections import Counter

    obs = Counter((r.event_type, r.user_id % 3) for r in rows)
    n = sum(obs.values())
    rt = Counter()
    ct = Counter()
    for (a, b), o in obs.items():
        rt[a] += o
        ct[b] += o
    assert len(out) == len(obs)
    for row in out:
        o = obs[(row.a, row.b)]
        r, c = rt[row.a], ct[row.b]
        assert row.observed == o
        assert row.expected_permille == r * c * 1000 // n
        assert row.chi2_contrib_micro == (o * n - r * c) ** 2 * 10**6 // (n * r * c)


def test_calibration_bins_partition_each_group(spark, sf_dir):
    out = queries()["calibration_bins_exact"](spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").collect()
    from collections import Counter

    grp_sizes = Counter(r.o_orderpriority for r in orders)
    by_grp = Counter()
    for r in out:
        assert 1 <= r.bin <= 10
        assert 0 <= r.rate_permille <= 1000
        assert r.rate_permille == r.positives * 1000 // r.n
        by_grp[r.grp] += r.n
    assert dict(by_grp) == dict(grp_sizes)  # bins tile each group exactly


def test_kfold_assignment_total_and_determinism(spark, sf_dir):
    out = queries()["kfold_assign_balance"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in out) == n_docs
    assert {r.fold for r in out} <= {0, 1, 2, 3, 4}
    # determinism: a doc's fold is a pure function of its id
    again = queries()["kfold_assign_balance"](spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_content_addressing_canonical_invariants(spark, sf_dir):
    out = queries()["content_addressed_ids"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs  # one row per doc
    groups: dict[str, list] = {}
    for r in out:
        assert len(r.content_hash) == 32
        groups.setdefault(r.content_hash, []).append(r)
    for rows in groups.values():
        canon = min(r.doc_id for r in rows)
        assert all(r.canonical_id == canon for r in rows)
        assert all(r.n_copies == len(rows) for r in rows)


def test_linreg_matches_exact_fraction(spark, sf_dir):
    out = queries()["linreg_closed_form"](spark, sf_dir).collect()[0]
    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice"
    ).collect()
    xs = [int(r.l_quantity) for r in rows]
    ys = [int(r.l_extendedprice * 100 + 0.5) for r in rows]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = Fraction(n * sxy - sx * sy, n * sxx - sx * sx)
    assert out.n == n
    assert out.slope_micro_cents == int(slope * 10**6)
    assert out.mean_x_milli == sx * 1000 // n
    assert out.mean_y_milli == sy * 10 // n


def test_confusion_matrix_matches_bruteforce(spark, sf_dir):
    out = queries()["confusion_matrix_exact"](spark, sf_dir).collect()[0]
    rows = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderstatus"
    ).collect()
    from watermill_kinesis_spark.operators.evaluation import PRICE_CUTOFF

    tp = fp = fn = tn = 0
    for r in rows:
        pred = r.o_totalprice >= PRICE_CUTOFF
        lab = r.o_orderstatus == "F"
        tp += pred and lab
        fp += pred and not lab
        fn += (not pred) and lab
        tn += (not pred) and (not lab)
    assert (out.tp, out.fp, out.fn, out.tn) == (tp, fp, fn, tn)
    assert out.accuracy_permille == (tp + tn) * 1000 // (tp + fp + fn + tn)
    assert out.precision_permille == tp * 1000 // (tp + fp)
    assert out.recall_permille == tp * 1000 // (tp + fn)
    assert out.f1_permille == 2 * tp * 1000 // (2 * tp + fp + fn)


def test_cohens_kappa_matches_bruteforce(spark, sf_dir):
    out = queries()["cohens_kappa_exact"](spark, sf_dir).collect()[0]
    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    n = len(rows)
    r1 = [r.o_orderpriority in ("1-URGENT", "2-HIGH") for r in rows]
    r2 = [r.o_orderstatus == "F" for r in rows]
    agree = sum(a == b for a, b in zip(r1, r2))
    p1, p2 = sum(r1), sum(r2)
    chance = p1 * p2 + (n - p1) * (n - p2)
    assert out.n == n and out.agree == agree
    expect = Fraction((n * agree - chance) * 1000, n * n - chance)
    assert out.kappa_permille == int(expect)  # trunc of exact rational
    assert out.po_permille == agree * 1000 // n


def test_quantile_normalization_aligns_distributions(spark, sf_dir):
    """After normalization every source's multiset of normalized
    values at shared ranks is IDENTICAL — the defining property."""
    out = queries()["quantile_normalization"](spark, sf_dir).collect()
    by_src: dict[str, dict[int, int]] = {}
    for r in out:
        by_src.setdefault(r.source, {})[r.r] = r.normalized_milli
    min_depth = min(len(v) for v in by_src.values())
    ref = None
    for src, vals in by_src.items():
        shared = [vals[i] for i in range(1, min_depth + 1)]
        if ref is None:
            ref = shared
        assert shared == ref, f"{src} distribution not aligned"
    # and each normalized value is the exact mean-at-rank in milli
    from collections import defaultdict

    rank_vals = defaultdict(list)
    for r in out:
        rank_vals[r.r].append(r.n_chars)
    for r in out:
        xs = rank_vals[r.r]
        assert r.normalized_milli == sum(xs) * 1000 // len(xs)


def test_cumulative_gains_monotone_and_complete(spark, sf_dir):
    out = queries()["cumulative_gains_deciles"](spark, sf_dir).collect()
    by_grp: dict[str, list] = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r)
    for grp, rows in by_grp.items():
        rows.sort(key=lambda r: r.decile)
        assert [r.decile for r in rows] == list(range(1, 11))
        # gains curve is monotone nondecreasing and ends at 1000 permille
        caps = [r.capture_permille for r in rows]
        assert caps == sorted(caps)
        assert caps[-1] == 1000
        # cumulative counts are consistent
        for a, b in zip(rows, rows[1:]):
            assert b.cum_n > a.cum_n and b.cum_pos >= a.cum_pos


def test_spearman_matches_bruteforce(spark, sf_dir):
    out = {
        r.grp: r
        for r in queries()["spearman_rank_corr_exact"](spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "orders").collect()
    by_grp: dict[str, list] = {}
    for r in rows:
        by_grp.setdefault(r.o_orderpriority, []).append(r)
    for grp, rs in by_grp.items():
        # RANK() with (value, key) tie-break == 1-based sorted position
        bx = sorted(rs, key=lambda r: (r.o_totalprice, r.o_orderkey))
        by = sorted(rs, key=lambda r: (r.o_orderdate, r.o_orderkey))
        rx = {r.o_orderkey: i + 1 for i, r in enumerate(bx)}
        ry = {r.o_orderkey: i + 1 for i, r in enumerate(by)}
        n = len(rs)
        sd2 = sum((rx[r.o_orderkey] - ry[r.o_orderkey]) ** 2 for r in rs)
        assert out[grp].n == n and out[grp].sum_d2 == sd2
        expect = Fraction(1) - Fraction(6 * sd2, n * (n * n - 1))
        # engine form: 1000 − trunc(6000·sd2 / denom)
        assert out[grp].spearman_permille == 1000 - (6000 * sd2) // (
            n * (n * n - 1)
        )
        assert abs(out[grp].spearman_permille - float(expect) * 1000) <= 1


def test_hhi_matches_bruteforce(spark, sf_dir):
    out = queries()["hhi_concentration"](spark, sf_dir).collect()[0]
    rows = load_table(spark, sf_dir, "documents").select("source").collect()
    from collections import Counter

    c = Counter(r.source for r in rows)
    t = sum(c.values())
    assert out.n_sources == len(c) and out.n_docs == t
    assert out.hhi_ppm == sum(v * v for v in c.values()) * 10**6 // (t * t)
    assert out.uniform_hhi_ppm == 10**6 // len(c)
    assert out.hhi_ppm >= out.uniform_hhi_ppm  # uniform mix is the floor


def test_runs_test_matches_bruteforce(spark, sf_dir):
    out = {
        r.event_type: r
        for r in queries()["runs_test_shuffle_audit"](spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "ts", "event_id"
    ).collect()
    import statistics

    by_t: dict[str, list] = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(r)
    for t, rs in by_t.items():
        m = statistics.median(r.value for r in rs)
        seq = [
            1 if r.value > m else 0
            for r in sorted(rs, key=lambda r: (r.ts, r.event_id))
        ]
        n_runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
        n1, n2 = sum(seq), len(seq) - sum(seq)
        got = out[t]
        assert (got.n_runs, got.n1, got.n2) == (n_runs, n1, n2)
        assert got.expected_runs_milli == 1000 + (2000 * n1 * n2) // (n1 + n2)


def test_cusum_changepoint_matches_bruteforce(spark, sf_dir):
    out = {
        r.event_type: r
        for r in queries()["cusum_changepoint"](spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "ts", "event_id"
    ).collect()
    by_t: dict[str, list] = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(r)
    for t, rs in by_t.items():
        xs = [
            int(r.value * 100 + 0.5)
            for r in sorted(rs, key=lambda r: (r.ts, r.event_id))
        ]
        n, s = len(xs), sum(xs)
        c = 0
        best = (-1, None)
        for pos, x in enumerate(xs, start=1):
            c += n * x - s
            if abs(c) > best[0]:
                best = (abs(c), pos)
        got = out[t]
        assert got.n_events == n
        assert (got.max_abs_cusum_scaled, got.changepoint_pos) == best


def test_arrival_inversions_matches_bruteforce(spark, sf_dir):
    out = {
        r.user_id: r
        for r in queries()["arrival_inversions"](spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    ).collect()
    by_u: dict[int, list] = {}
    for r in rows:
        by_u.setdefault(r.user_id, []).append(r)
    for u, rs in by_u.items():
        rs.sort(key=lambda r: r.event_id)
        k = len(rs)
        if k < 2:
            assert u not in out
            continue
        inv = sum(
            1
            for i in range(k)
            for j in range(i + 1, k)
            if rs[i].ts > rs[j].ts
        )
        got = out[u]
        assert (got.n_events, got.n_inversions) == (k, inv)
        assert got.n_pairs == k * (k - 1) // 2
        assert got.disorder_permille == inv * 1000 // got.n_pairs


def test_waterfall_identity_closes_exactly(spark, sf_dir):
    """The decomposition identity Δ = volume + price + new − lost +
    residual must close EXACTLY, and the residual (pure truncation
    bits, one sub-cent per matched part) must be tiny relative to
    the delta it explains."""
    r = queries()["revenue_waterfall_decomposition"](spark, sf_dir).collect()[0]
    assert r.delta_cents == r.rev1_cents - r.rev0_cents
    assert (
        r.delta_cents
        == r.volume_eff_cents
        + r.price_eff_cents
        + r.new_parts_cents
        - r.lost_parts_cents
        + r.residual_cents
    )
    n_parts = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey"
    ).distinct().count()
    assert abs(r.residual_cents) <= n_parts  # ≤1 truncated cent per part


def test_auc_kernel_heavy_ties_and_degenerate_groups(spark, tmp_path):
    """The round-8 per-slice kernel on an adversarial shape the real
    table never shows: only three distinct scores (every tie cell is
    massive, and with 32 range slices over ~6 distinct (grp, score)
    keys most slices are empty while whole cells land in one slice),
    plus an all-positive group that must be DROPPED, not divided by
    zero. Brute-force Fraction pairwise AUC is the pin."""
    import itertools
    from decimal import Decimal

    from pyspark.sql.types import (
        DecimalType,
        StringType,
        StructField,
        StructType,
    )

    rows = []
    scores = [Decimal("1.00"), Decimal("2.00"), Decimal("3.00")]
    statuses = ["F", "O", "F", "F", "O"]
    i = 0
    for grp in ("A", "B"):
        for s, st in itertools.product(scores, statuses):
            for _ in range((i % 7) + 1):  # uneven cell sizes
                rows.append((grp, s, st if grp == "A" else statuses[i % 5]))
            i += 1
    rows += [("C", s, "F") for s in scores]  # degenerate: all positive
    schema = StructType(
        [
            StructField("o_orderpriority", StringType()),
            StructField("o_totalprice", DecimalType(12, 2)),
            StructField("o_orderstatus", StringType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {
        r.grp: r
        for r in queries()["auc_roc_exact"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {"A", "B"}
    by_grp: dict[str, list] = {}
    for grp, s, st in rows:
        by_grp.setdefault(grp, []).append((s, 1 if st == "F" else 0))
    for grp in ("A", "B"):
        pos = [s for s, p in by_grp[grp] if p]
        neg = [s for s, p in by_grp[grp] if not p]
        wins = sum(1 for a in pos for b in neg if a > b)
        ties = sum(1 for a in pos for b in neg if a == b)
        expect = Fraction(2 * wins + ties, 2 * len(pos) * len(neg))
        got = out[grp]
        assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
        assert got.auc_permille == int(expect * 1000)


def test_auc_kernel_rejects_null_group(spark, tmp_path):
    """Fail-loudly convention shared with grouped_scan: a NULL group
    key raises instead of silently dropping its rows."""
    from decimal import Decimal

    import pytest
    from pyspark.sql.types import (
        DecimalType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("o_orderpriority", StringType()),
            StructField("o_totalprice", DecimalType(12, 2)),
            StructField("o_orderstatus", StringType()),
        ]
    )
    spark.createDataFrame(
        [("A", Decimal("1.00"), "F"), (None, Decimal("2.00"), "O")], schema
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    with pytest.raises(ValueError, match="non-null group keys"):
        queries()["auc_roc_exact"](spark, str(tmp_path))


def test_auc_kernel_batch_carry_invariant(spark, sf_dir):
    """The slice kernel folds Arrow batch by batch with a carry cell
    (r8 review: pd.concat of a whole slice is O(N/n_slices) worker
    memory). Shrinking maxRecordsPerBatch forces tie cells and groups
    to straddle batch boundaries — results must be identical."""
    from watermill_kinesis_spark.registry import queries

    fn = queries()["auc_roc_exact"]
    baseline = sorted(map(tuple, fn(spark, sf_dir).collect()))
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        small = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set(key, prev)
    assert small == baseline
