"""Known-value formula pins for the statistics family (VERDICT r12
task 2).

WHY THIS EXISTS: the engine-vs-oracle gate compares two spellings of
the same author's formula, so a shared formula error is invisible to
it by construction — `cramers_v_exact` emitted V/sqrt(N) for four
rounds while every gate was green. These tests pin each statistic
operator to a hand-computable TEXTBOOK fixture evaluated through the
operator's REAL code path: a tiny parquet sf_dir is written per test
and the registered (spark, sf_dir) callable runs on it unmodified.

Fixture doctrine:
  * extremal/known cases whose answers need no rederivation (perfect
    association => V=1; identical distributions => KS=0, t=0, H=0;
    perfect ranking => AUC=1, rho=1, gamma=1; symmetric data =>
    skew=0), plus small hand-worked integer examples;
  * expected values are computed BY HAND in the comments, never by
    running the operator or its oracle;
  * quantile-based fixtures use repeated values so every discrete-
    quantile convention agrees on the answer.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from watermill_kinesis_spark.registry import all_specs

# ---------------------------------------------------------------------------
# fixture plumbing

_DEFAULTS = {
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "str",
        "o_totalprice": "float64",
        "o_orderdate": "ts",
        "o_orderpriority": "str",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "float64",
        "l_extendedprice": "float64",
        "l_discount": "float64",
        "l_tax": "float64",
        "l_returnflag": "str",
        "l_linestatus": "str",
        "l_shipdate": "ts",
    },
    "events": {
        "event_id": "int64",
        "ts": "ts",
        "user_id": "int64",
        "event_type": "str",
        "value": "float64",
        "props": "str",
    },
    "documents": {
        "doc_id": "int64",
        "text": "str",
        "lang": "str",
        "source": "str",
        "n_chars": "int64",
    },
    "customer": {
        "c_custkey": "int64",
        "c_name": "str",
        "c_nationkey": "int32",
        "c_acctbal": "float64",
        "c_mktsegment": "str",
    },
    "nation": {
        "n_nationkey": "int32",
        "n_name": "str",
        "n_regionkey": "int32",
    },
}

_FILL = {
    "o_custkey": 1,
    "o_orderstatus": "O",
    "o_totalprice": 1.0,
    "o_orderdate": "2024-01-01",
    "o_orderpriority": "3-MEDIUM",
    "l_orderkey": 1,
    "l_partkey": 1,
    "l_suppkey": 1,
    "l_linenumber": 1,
    "l_quantity": 1.0,
    "l_extendedprice": 1.0,
    "l_discount": 0.0,
    "l_tax": 0.0,
    "l_returnflag": "N",
    "l_linestatus": "O",
    "l_shipdate": "2024-01-01",
    "ts": "2024-01-01",
    "user_id": 1,
    "event_type": "view",
    "value": 1.0,
    "props": "{}",
    "lang": "en",
    "source": "s1",
    "c_name": "c",
    "c_nationkey": 0,
    "c_acctbal": 0.0,
    "c_mktsegment": "M",
    "n_regionkey": 0,
}


def make_sf(path, **tables) -> str:
    """Write hand-crafted rows as a parquet sf_dir with the exact
    testdata schemas; missing columns get neutral defaults, serial
    keys are generated, documents.n_chars defaults to len(text)."""
    path.mkdir(parents=True, exist_ok=True)
    for name, rows in tables.items():
        df = pd.DataFrame(rows)
        schema = _DEFAULTS[name]
        n = len(df)
        for col, kind in schema.items():
            if col not in df.columns:
                if col in ("o_orderkey", "event_id", "doc_id", "c_custkey"):
                    df[col] = range(1, n + 1)
                elif col == "n_chars":
                    df[col] = df["text"].str.len()
                else:
                    df[col] = _FILL[col]
            if kind == "ts":
                df[col] = pd.to_datetime(df[col]).astype("datetime64[us]")
            elif kind in ("int64", "int32", "float64"):
                df[col] = df[col].astype(kind)
            else:
                df[col] = df[col].astype(object).astype(str)
        df = df[list(schema)]
        df.to_parquet(str(path / f"{name}.parquet"), index=False)
    return str(path)


def run(name, spark, sf):
    """Run a registered operator's real code path on the fixture."""
    out = all_specs()[name].fn(spark, sf).toPandas()
    return out


def rows_by(df, *cols):
    return df.sort_values(list(cols)).reset_index(drop=True)


# ---------------------------------------------------------------------------
# orders-based classification / association statistics


def test_auc_roc_known_values(spark, tmp_path):
    """AUC: perfect ranking => 1, inverted => 0, one hand-counted
    interleaving => 3/4, full tie => 1/2 (textbook extremals)."""
    sf = make_sf(
        tmp_path / "sf",
        orders=[
            # grp A: both positives outscore both negatives -> AUC 1
            {"o_orderpriority": "A", "o_totalprice": 1.0, "o_orderstatus": "O"},
            {"o_orderpriority": "A", "o_totalprice": 2.0, "o_orderstatus": "O"},
            {"o_orderpriority": "A", "o_totalprice": 3.0, "o_orderstatus": "F"},
            {"o_orderpriority": "A", "o_totalprice": 4.0, "o_orderstatus": "F"},
            # grp B: inverted -> AUC 0
            {"o_orderpriority": "B", "o_totalprice": 1.0, "o_orderstatus": "F"},
            {"o_orderpriority": "B", "o_totalprice": 2.0, "o_orderstatus": "F"},
            {"o_orderpriority": "B", "o_totalprice": 3.0, "o_orderstatus": "O"},
            {"o_orderpriority": "B", "o_totalprice": 4.0, "o_orderstatus": "O"},
            # grp C: pos at 20,40 / neg at 10,30 -> 3 of 4 pairs won
            {"o_orderpriority": "C", "o_totalprice": 10.0, "o_orderstatus": "O"},
            {"o_orderpriority": "C", "o_totalprice": 20.0, "o_orderstatus": "F"},
            {"o_orderpriority": "C", "o_totalprice": 30.0, "o_orderstatus": "O"},
            {"o_orderpriority": "C", "o_totalprice": 40.0, "o_orderstatus": "F"},
            # grp T: one pos, one neg, same score -> AUC 1/2
            {"o_orderpriority": "T", "o_totalprice": 5.0, "o_orderstatus": "F"},
            {"o_orderpriority": "T", "o_totalprice": 5.0, "o_orderstatus": "O"},
        ],
    )
    out = rows_by(run("auc_roc_exact", spark, sf), "grp")
    assert list(out["grp"]) == ["A", "B", "C", "T"]
    assert list(out["auc_permille"]) == [1000, 0, 750, 500]
    assert list(out["n_pos"]) == [2, 2, 2, 1]
    assert list(out["n_neg"]) == [2, 2, 2, 1]


def test_calibration_bins_known_values(spark, tmp_path):
    """10 rows, one per decile; positives exactly in deciles 6-10 =>
    per-bin rate is 0 or 1000 with n=1."""
    sf = make_sf(
        tmp_path / "sf",
        orders=[
            {
                "o_orderpriority": "A",
                "o_totalprice": float(i),
                "o_orderstatus": "F" if i >= 6 else "O",
            }
            for i in range(1, 11)
        ],
    )
    out = rows_by(run("calibration_bins_exact", spark, sf), "bin")
    assert list(out["bin"]) == list(range(1, 11))
    assert list(out["n"]) == [1] * 10
    assert list(out["positives"]) == [0] * 5 + [1] * 5
    assert list(out["rate_permille"]) == [0] * 5 + [1000] * 5


def test_cohens_kappa_known_values(spark, tmp_path):
    """Perfect agreement => kappa=1; independence at 50/50 marginals
    => kappa=0 (textbook extremals, hand-checked: pe=(2*2+2*2)/16)."""
    sf1 = make_sf(
        tmp_path / "k1",
        orders=[
            {"o_orderpriority": "1-URGENT", "o_orderstatus": "F"},
            {"o_orderpriority": "1-URGENT", "o_orderstatus": "F"},
            {"o_orderpriority": "3-MEDIUM", "o_orderstatus": "O"},
            {"o_orderpriority": "3-MEDIUM", "o_orderstatus": "O"},
        ],
    )
    out = run("cohens_kappa_exact", spark, sf1)
    assert out.iloc[0]["kappa_permille"] == 1000
    assert out.iloc[0]["po_permille"] == 1000
    assert out.iloc[0]["agree"] == 4

    sf2 = make_sf(
        tmp_path / "k2",
        orders=[
            {"o_orderpriority": "1-URGENT", "o_orderstatus": "F"},
            {"o_orderpriority": "1-URGENT", "o_orderstatus": "O"},
            {"o_orderpriority": "3-MEDIUM", "o_orderstatus": "F"},
            {"o_orderpriority": "3-MEDIUM", "o_orderstatus": "O"},
        ],
    )
    out = run("cohens_kappa_exact", spark, sf2)
    assert out.iloc[0]["kappa_permille"] == 0
    assert out.iloc[0]["po_permille"] == 500


def test_confusion_matrix_known_values(spark, tmp_path):
    """Hand-built 10-row confusion matrix: tp=3 fp=1 fn=2 tn=4 =>
    acc .7, prec 3/4, rec 3/5, F1 6/9 (floor permille)."""
    rows = (
        [{"o_totalprice": 200000.0, "o_orderstatus": "F"}] * 3
        + [{"o_totalprice": 200000.0, "o_orderstatus": "O"}] * 1
        + [{"o_totalprice": 100000.0, "o_orderstatus": "F"}] * 2
        + [{"o_totalprice": 100000.0, "o_orderstatus": "O"}] * 4
    )
    sf = make_sf(tmp_path / "sf", orders=rows)
    out = run("confusion_matrix_exact", spark, sf).iloc[0]
    assert (out["tp"], out["fp"], out["fn"], out["tn"]) == (3, 1, 2, 4)
    assert out["accuracy_permille"] == 700
    assert out["precision_permille"] == 750
    assert out["recall_permille"] == 600
    assert out["f1_permille"] == 666  # 2*3*1000 // 9


def test_cumulative_gains_known_values(spark, tmp_path):
    """Both positives are the 2 highest scores => capture hits 1000
    at decile 2; lift_d = cum_pos*N / (d*P) hand-computed."""
    sf = make_sf(
        tmp_path / "sf",
        orders=[
            {
                "o_orderpriority": "A",
                "o_totalprice": float(i),
                "o_orderstatus": "F" if i >= 9 else "O",
            }
            for i in range(1, 11)
        ],
    )
    out = rows_by(run("cumulative_gains_deciles", spark, sf), "decile")
    assert list(out["cum_pos"]) == [1, 2, 2, 2, 2, 2, 2, 2, 2, 2]
    assert list(out["capture_permille"]) == [500] + [1000] * 9
    assert list(out["lift_permille"]) == [
        5000, 5000, 3333, 2500, 2000, 1666, 1428, 1250, 1111, 1000,
    ]


def test_spearman_known_values(spark, tmp_path):
    """Identical orderings => rho=+1 (sum d^2 = 0); reversed =>
    rho=-1 (sum d^2 = n(n^2-1)/3 = 20 at n=4)."""
    sf = make_sf(
        tmp_path / "sf",
        orders=[
            # grp P: date order == price order
            {"o_orderpriority": "P", "o_totalprice": float(i),
             "o_orderdate": f"2024-01-{i:02d}"}
            for i in range(1, 5)
        ]
        + [
            # grp N: date order reversed vs price order
            {"o_orderpriority": "N", "o_totalprice": float(i),
             "o_orderdate": f"2024-01-{5 - i:02d}"}
            for i in range(1, 5)
        ],
    )
    out = rows_by(run("spearman_rank_corr_exact", spark, sf), "grp")
    n_row = out[out["grp"] == "N"].iloc[0]
    p_row = out[out["grp"] == "P"].iloc[0]
    assert p_row["sum_d2"] == 0 and p_row["spearman_permille"] == 1000
    assert n_row["sum_d2"] == 20 and n_row["spearman_permille"] == -1000


def test_cramers_v_known_values(spark, tmp_path):
    """THE r12 regression pin: perfect-association 2x2 => V=1 at ANY
    N (the broken r11 formula gave V/sqrt(N), i.e. 0.1 at N=100);
    independent 2x2 => V=0."""
    sf = make_sf(
        tmp_path / "sf",
        orders=[{"o_orderpriority": "P1", "o_orderstatus": "F"}] * 50
        + [{"o_orderpriority": "P2", "o_orderstatus": "O"}] * 50,
    )
    out = run("cramers_v_exact", spark, sf).iloc[0]
    assert out["n_rows"] == 100
    # chi2 = N for a perfect 2x2 -> 100; micro-scaled
    assert out["chi2_micro"] == 100_000_000
    assert out["cramers_v"] == pytest.approx(1.0, abs=1e-9)

    sf2 = make_sf(
        tmp_path / "sf2",
        orders=[
            {"o_orderpriority": "P1", "o_orderstatus": "F"},
            {"o_orderpriority": "P1", "o_orderstatus": "O"},
            {"o_orderpriority": "P2", "o_orderstatus": "F"},
            {"o_orderpriority": "P2", "o_orderstatus": "O"},
        ],
    )
    out2 = run("cramers_v_exact", spark, sf2).iloc[0]
    assert out2["chi2_micro"] == 0
    assert out2["cramers_v"] == pytest.approx(0.0, abs=1e-9)


def test_goodman_kruskal_gamma_known_values(spark, tmp_path):
    """Strictly concordant ordinal pairs => gamma=+1; strictly
    discordant => gamma=-1."""
    sf = make_sf(
        tmp_path / "pos",
        orders=[
            {"o_orderpriority": "1-URGENT", "o_totalprice": 50000.0},
            {"o_orderpriority": "2-HIGH", "o_totalprice": 150000.0},
            {"o_orderpriority": "3-MEDIUM", "o_totalprice": 250000.0},
        ],
    )
    out = run("goodman_kruskal_gamma", spark, sf).iloc[0]
    assert out["concordant_pairs"] == 3 and out["discordant_pairs"] == 0
    assert out["gamma_micro"] == 1_000_000

    sf2 = make_sf(
        tmp_path / "neg",
        orders=[
            {"o_orderpriority": "1-URGENT", "o_totalprice": 250000.0},
            {"o_orderpriority": "2-HIGH", "o_totalprice": 150000.0},
            {"o_orderpriority": "3-MEDIUM", "o_totalprice": 50000.0},
        ],
    )
    out2 = run("goodman_kruskal_gamma", spark, sf2).iloc[0]
    assert out2["concordant_pairs"] == 0 and out2["discordant_pairs"] == 3
    assert out2["gamma_micro"] == -1_000_000


def test_benford_audit_known_values(spark, tmp_path):
    """One order per leading digit 1..9 => each observed share is
    floor(1000/9)=111; reference permilles are Benford's law."""
    sf = make_sf(
        tmp_path / "sf",
        orders=[{"o_totalprice": float(d)} for d in range(1, 10)],
    )
    out = rows_by(run("benford_first_digit_audit", spark, sf), "digit")
    assert list(out["digit"]) == list(range(1, 10))
    assert list(out["n"]) == [1] * 9
    assert list(out["observed_permille"]) == [111] * 9
    assert list(out["benford_permille"]) == [
        301, 176, 125, 97, 79, 67, 58, 51, 46,
    ]


def test_dow_uniformity_known_values(spark, tmp_path):
    """One order on each weekday => perfectly uniform: every chi2
    contribution is exactly 0 (2024-01-01 is a Monday)."""
    sf = make_sf(
        tmp_path / "sf",
        orders=[{"o_orderdate": f"2024-01-{d:02d}"} for d in range(1, 8)],
    )
    out = rows_by(run("dow_uniformity_audit", spark, sf), "dow")
    assert list(out["dow"]) == list(range(7))
    assert list(out["observed"]) == [1] * 7
    assert list(out["expected_floor"]) == [1] * 7
    assert list(out["chi2_contrib_x7_micro"]) == [0] * 7


def test_mcc_threshold_sweep_known_values(spark, tmp_path):
    """Perfectly separable labels: thresholds below the gap classify
    perfectly (MCC=1, Youden=1000); thresholds above it predict
    nothing (guarded MCC=0, Youden=0)."""
    sf = make_sf(
        tmp_path / "sf",
        orders=[{"o_totalprice": 160000.0, "o_orderstatus": "F"}] * 2
        + [{"o_totalprice": 40000.0, "o_orderstatus": "O"}] * 2,
    )
    out = rows_by(run("mcc_threshold_sweep", spark, sf), "threshold")
    perfect = out[out["threshold"] <= 150000]
    empty = out[out["threshold"] > 150000]
    assert list(perfect["mcc"]) == pytest.approx([1.0, 1.0, 1.0])
    assert list(perfect["youden_j_permille"]) == [1000, 1000, 1000]
    assert list(empty["mcc"]) == pytest.approx([0.0, 0.0, 0.0])
    assert list(empty["youden_j_permille"]) == [0, 0, 0]


def test_brier_decomposition_known_values(spark, tmp_path):
    """Same 10-row design as calibration: forecast=bin/10, outcome 1
    iff bin>=6. Hand-computed micro terms: rel=(bin-10*pos)^2 * 1e4,
    res=(pos*10-5)^2 * 1e6/100 = 250000, unc=5*5*1e6/100 = 250000."""
    sf = make_sf(
        tmp_path / "sf",
        orders=[
            {
                "o_orderpriority": "A",
                "o_totalprice": float(i),
                "o_orderstatus": "F" if i >= 6 else "O",
            }
            for i in range(1, 11)
        ],
    )
    out = rows_by(run("brier_decomposition_exact", spark, sf), "bin")
    assert list(out["forecast_permille"]) == [b * 100 for b in range(1, 11)]
    assert list(out["rate_permille"]) == [0] * 5 + [1000] * 5
    exp_rel = [(b - 10 * (1 if b >= 6 else 0)) ** 2 * 10000 for b in range(1, 11)]
    assert list(out["rel_contrib_micro"]) == exp_rel
    assert list(out["res_contrib_micro"]) == [250000] * 10
    assert list(out["unc_grp_micro"]) == [250000] * 10


def test_isotonic_pav_known_values(spark, tmp_path):
    """PAV invariants hold on a tiny binned set and the counts are
    exact (flags are the operator's own audit verdicts)."""
    sf = make_sf(
        tmp_path / "sf",
        orders=[
            {"o_totalprice": 100.0, "o_orderstatus": "O"},
            {"o_totalprice": 500.0, "o_orderstatus": "F"},
            {"o_totalprice": 900.0, "o_orderstatus": "F"},
        ],
    )
    out = run("isotonic_pav_audit", spark, sf).iloc[0]
    assert out["n_rows"] == 3 and out["n_pos"] == 2
    assert out["monotone_ok"] == 1 and out["mass_conserved"] == 1
    assert out["gcm_minorant_ok"] == 1 and out["boundaries_exact"] == 1


# ---------------------------------------------------------------------------
# monthly trend statistics (orders + customer + nation)


def _monthly_trend_sf(tmp_path):
    """Nation ALPHA: Jan 1 order/1 cust, Feb 2/2, Mar 3/3 — x and y
    both strictly increasing month series (1,2,3)."""
    orders, ok = [], 1
    for m, n in ((1, 1), (2, 2), (3, 3)):
        for c in range(1, n + 1):
            orders.append(
                {"o_orderkey": ok, "o_custkey": c,
                 "o_orderdate": f"2024-{m:02d}-15"}
            )
            ok += 1
    return make_sf(
        tmp_path / "sf",
        orders=orders,
        customer=[{"c_custkey": i, "c_nationkey": 0} for i in (1, 2, 3)],
        nation=[{"n_nationkey": 0, "n_name": "ALPHA"}],
    )


def test_kendall_tau_known_values(spark, tmp_path):
    """Strictly co-monotone month series => all C(3,2)=3 pairs
    concordant, no ties, tau numerator = +3."""
    out = run("kendall_tau_exact", spark, _monthly_trend_sf(tmp_path)).iloc[0]
    assert out["nation"] == "ALPHA"
    assert out["n_pairs"] == 3
    assert out["concordant"] == 3 and out["discordant"] == 0
    assert out["ties_x"] == 0 and out["ties_y"] == 0 and out["ties_both"] == 0
    assert out["tau_b_numer"] == 3


def test_mann_kendall_known_values(spark, tmp_path):
    """Strictly increasing series of 3 => S=3; no ties => 18*Var(S)
    = n(n-1)(2n+5) = 3*2*11 = 66 (textbook)."""
    out = run("mann_kendall_trend", spark, _monthly_trend_sf(tmp_path)).iloc[0]
    assert out["n_months"] == 3
    assert out["s_statistic"] == 3
    assert out["var_s_x18"] == 66


def test_theil_sen_known_values(spark, tmp_path):
    """y=(1,2,3) over consecutive months => every pairwise slope is
    exactly 1 => median slope 1.0."""
    out = run("theil_sen_slope_exact", spark, _monthly_trend_sf(tmp_path)).iloc[0]
    assert out["n_pairs"] == 3
    assert out["theil_sen_slope"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# events-based statistics


def _ev(i, ts, user=1, etype="view", value=1.0):
    return {
        "event_id": i, "ts": ts, "user_id": user,
        "event_type": etype, "value": value,
    }


def test_chi2_statistic_known_values(spark, tmp_path):
    """Independent table => every chi2 contribution exactly 0;
    hand-worked 2x2 (3/1 vs 1/3) => chi2=2, i.e. four contributions
    of 500000 micro each."""
    rows, i = [], 1
    for etype in ("X", "Y"):
        for user in (0, 1, 2, 0, 1, 2):
            rows.append(_ev(i, "2024-01-01", user=user, etype=etype))
            i += 1
    sf = make_sf(tmp_path / "ind", events=rows)
    out = run("chi2_statistic_exact", spark, sf)
    assert len(out) == 6
    assert list(out["chi2_contrib_micro"]) == [0] * 6
    assert list(out["expected_permille"]) == [2000] * 6

    rows2 = (
        [_ev(i, "2024-01-01", user=0, etype="X") for i in (1, 2, 3)]
        + [_ev(4, "2024-01-01", user=1, etype="X")]
        + [_ev(5, "2024-01-01", user=0, etype="Y")]
        + [_ev(i, "2024-01-01", user=1, etype="Y") for i in (6, 7, 8)]
    )
    sf2 = make_sf(tmp_path / "assoc", events=rows2)
    out2 = run("chi2_statistic_exact", spark, sf2)
    # each cell: (o*n - r*c)^2 * 1e6 / (n*r*c) = 64e6/128 = 500000
    assert list(out2["chi2_contrib_micro"]) == [500000] * 4
    assert sum(out2["chi2_contrib_micro"]) == 2_000_000  # chi2 = 2


def test_ks_drift_known_values(spark, tmp_path):
    """Identical distributions => KS=0; disjoint supports => KS=1
    (textbook extremals of the two-sample statistic)."""
    rows = []
    i = 1
    for etype in ("A", "B"):
        for v in (0.25, 0.5):
            rows.append(_ev(i, "2024-01-01", etype=etype, value=v))
            i += 1
    for v in (10.0, 11.0):
        rows.append(_ev(i, "2024-01-01", etype="C", value=v))
        i += 1
    sf = make_sf(tmp_path / "sf", events=rows)
    out = rows_by(run("ks_drift_matrix", spark, sf), "t1", "t2")
    got = {(r["t1"], r["t2"]): r["ks_permille"] for _, r in out.iterrows()}
    assert got == {("A", "B"): 0, ("A", "C"): 1000, ("B", "C"): 1000}


def test_iqr_fences_known_values(spark, tmp_path):
    """Repeated values make q1/q3 convention-free: q1=1, q3=3,
    fences [-2, 6] => exactly the lone 7 lies above."""
    vals = [1.0] * 4 + [3.0] * 4 + [7.0]
    sf = make_sf(
        tmp_path / "sf",
        events=[_ev(i + 1, "2024-01-01", value=v) for i, v in enumerate(vals)],
    )
    out = run("iqr_outlier_fences", spark, sf).iloc[0]
    assert (out["q1"], out["q3"]) == (1.0, 3.0)
    assert out["n"] == 9
    assert out["n_below_fence"] == 0 and out["n_above_fence"] == 1


def test_mad_known_values(spark, tmp_path):
    """(1,2,3,4,100): median 3 (odd n, convention-free), absolute
    deviations (2,1,0,1,97) => MAD 1 — the robustness textbook case
    (one wild outlier moves MAD not at all)."""
    sf = make_sf(
        tmp_path / "sf",
        events=[
            _ev(i + 1, "2024-01-01", value=v)
            for i, v in enumerate((1.0, 2.0, 3.0, 4.0, 100.0))
        ],
    )
    out = run("mad_robust_stats", spark, sf).iloc[0]
    assert out["median_value"] == 3.0
    assert out["mad"] == 1.0


def test_runs_test_known_values(spark, tmp_path):
    """Perfectly alternating sequence => maximum runs (5 of 5);
    perfectly sorted sequence => minimum runs (2). E[R] = 1 +
    2*n1*n2/n = 3.4 for n1=2, n2=3 (milli 3400)."""
    rows = []
    for i, v in enumerate((1.0, 9.0, 1.0, 9.0, 1.0)):
        rows.append(_ev(i + 1, f"2024-01-01 00:{i:02d}:00", etype="alt", value=v))
    for i, v in enumerate((1.0, 1.0, 1.0, 9.0, 9.0)):
        rows.append(_ev(i + 6, f"2024-01-01 00:{i:02d}:00", etype="mono", value=v))
    sf = make_sf(tmp_path / "sf", events=rows)
    out = rows_by(run("runs_test_shuffle_audit", spark, sf), "event_type")
    alt = out[out["event_type"] == "alt"].iloc[0]
    mono = out[out["event_type"] == "mono"].iloc[0]
    assert alt["n_runs"] == 5 and (alt["n1"], alt["n2"]) == (2, 3)
    assert mono["n_runs"] == 2 and (mono["n1"], mono["n2"]) == (2, 3)
    assert alt["expected_runs_milli"] == 3400
    assert mono["expected_runs_milli"] == 3400


def test_winsorized_mean_known_values(spark, tmp_path):
    """98 of 100 values are 10 => p05=p95=10 under every quantile
    convention; winsorizing clamps both outliers to 10 => mean
    exactly 10 (1e7 micro)."""
    vals = [0.0] + [10.0] * 98 + [1000.0]
    sf = make_sf(
        tmp_path / "sf",
        events=[_ev(i + 1, "2024-01-01", value=v) for i, v in enumerate(vals)],
    )
    out = run("winsorized_mean_exact", spark, sf).iloc[0]
    assert (out["p05"], out["p95"]) == (10.0, 10.0)
    assert out["winsorized_sum_cents"] == 100_000
    assert out["winsorized_mean_micro"] == 10_000_000


def test_benford_first_digit_known_values(spark, tmp_path):
    """3 values leading with 1, one leading with 2 => shares 750000
    and 250000 ppm."""
    sf = make_sf(
        tmp_path / "sf",
        events=[_ev(i + 1, "2024-01-01", value=v)
                for i, v in enumerate((1.5, 1.5, 1.5, 2.5))],
    )
    out = rows_by(run("benford_first_digit", spark, sf), "digit")
    assert list(out["digit"]) == [1, 2]
    assert list(out["n_values"]) == [3, 1]
    assert list(out["share_ppm"]) == [750000, 250000]


def test_ab_test_z_known_values(spark, tmp_path):
    """Equal arms => z=0; arms with equal population variance 1 (in
    dollars; 10000 cents^2) and means 1 apart => z = -1 exactly."""
    rows = [
        # type e: both arms see {1.00, 3.00}
        _ev(1, "2024-01-01", user=0, etype="e", value=1.0),
        _ev(2, "2024-01-01", user=0, etype="e", value=3.0),
        _ev(3, "2024-01-01", user=1, etype="e", value=1.0),
        _ev(4, "2024-01-01", user=1, etype="e", value=3.0),
        # type k: arm A {1.00, 3.00} (mean 200c), arm B {2.00, 4.00}
        # (mean 300c); var/n = 10000/2 each => se = 100c => z = -1
        _ev(5, "2024-01-01", user=0, etype="k", value=1.0),
        _ev(6, "2024-01-01", user=0, etype="k", value=3.0),
        _ev(7, "2024-01-01", user=1, etype="k", value=2.0),
        _ev(8, "2024-01-01", user=1, etype="k", value=4.0),
    ]
    sf = make_sf(tmp_path / "sf", events=rows)
    out = rows_by(run("ab_test_report", spark, sf), "event_type")
    e = out[out["event_type"] == "e"].iloc[0]
    k = out[out["event_type"] == "k"].iloc[0]
    assert e["z_score"] == pytest.approx(0.0, abs=1e-12)
    assert k["z_score"] == pytest.approx(-1.0, abs=1e-12)


def test_crosstab_expected_known_values(spark, tmp_path):
    """Perfectly independent 2x2 with one observation per cell:
    expected=1.0 and lift=1.0 everywhere."""
    rows = []
    i = 1
    for etype in ("X", "Y"):
        for day in ("2024-01-07", "2024-01-08"):  # Sun, Mon
            rows.append(_ev(i, day, etype=etype))
            i += 1
    sf = make_sf(tmp_path / "sf", events=rows)
    out = run("crosstab_expected", spark, sf)
    assert len(out) == 4
    assert list(out["observed"]) == [1] * 4
    assert list(out["expected"]) == pytest.approx([1.0] * 4)
    assert list(out["lift"]) == pytest.approx([1.0] * 4)


def test_cusum_changepoint_known_values(spark, tmp_path):
    """Counts (1,1,3,3) over 4 days: scaled CUSUM S_k = n*cum_k -
    k*total peaks in magnitude at day 2 (|S|=8), the boundary before
    the level shift — the textbook changepoint locator."""
    rows, i = [], 1
    for day, cnt in (("2024-01-01", 1), ("2024-01-02", 1),
                     ("2024-01-03", 3), ("2024-01-04", 3)):
        for _ in range(cnt):
            rows.append(_ev(i, day, etype="step"))
            i += 1
    sf = make_sf(tmp_path / "sf", events=rows)
    out = run("cusum_changepoint_days", spark, sf).iloc[0]
    assert out["n_days"] == 4
    assert out["max_abs_cusum_scaled"] == 8
    assert pd.Timestamp(out["changepoint_day"]) == pd.Timestamp("2024-01-02")


def test_user_cadence_known_values(spark, tmp_path):
    """12 events exactly 60s apart: mean gap 60, CV^2 exactly 0 (a
    metronome user; a Poisson user would give ~1)."""
    rows = [
        _ev(i + 1, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=60 * i),
            user=7)
        for i in range(12)
    ]
    sf = make_sf(tmp_path / "sf", events=rows)
    out = run("user_cadence_regularity", spark, sf).iloc[0]
    assert out["n_events"] == 12
    assert out["mean_gap_s"] == 60
    assert out["cv2_permille"] == 0


def test_event_lateness_known_values(spark, tmp_path):
    """late_s is the pinned Knuth-hash-mod-3600 of event_id: ids 1,2
    give 961 and 1922 by hand; two-point interpolated percentiles."""
    sf = make_sf(
        tmp_path / "sf",
        events=[_ev(1, "2024-01-01"), _ev(2, "2024-01-01")],
    )
    out = run("event_lateness_profile", spark, sf).iloc[0]
    # 2654435761 % 3600 = 961; 2*2654435761 % 3600 = 1922
    assert out["n_events"] == 2 and out["max_lateness_s"] == 1922
    assert out["p50_lateness_s"] == pytest.approx(1441.5)
    assert out["p95_lateness_s"] == pytest.approx(1873.95)
    assert out["p99_lateness_s"] == pytest.approx(1912.39)


def test_watermark_droprate_known_values(spark, tmp_path):
    """Same pinned lateness (961, 1922): every delay < 961 drops
    both (1e6 ppm), 1800 drops only the 1922 (5e5 ppm)."""
    sf = make_sf(
        tmp_path / "sf",
        events=[_ev(1, "2024-01-01"), _ev(2, "2024-01-01")],
    )
    out = rows_by(run("watermark_droprate_table", spark, sf), "delay_s")
    got = {int(r["delay_s"]): (r["n_dropped"], r["drop_ppm"])
           for _, r in out.iterrows()}
    assert got == {
        60: (2, 1000000), 300: (2, 1000000),
        900: (2, 1000000), 1800: (1, 500000),
    }


def test_kaplan_meier_known_values(spark, tmp_path):
    """Three users, corpus end day 40: lifetimes 10 (churned), 5
    (churned), 0 (censored, last seen at corpus end). Hazard at t =
    d_t / n_at_risk(t): t=0 -> 0/3, t=5 -> 1/2, t=10 -> 1/1."""
    rows = [
        _ev(1, "2024-01-01", user=1), _ev(2, "2024-01-11", user=1),  # t=10
        _ev(3, "2024-01-01", user=2), _ev(4, "2024-01-06", user=2),  # t=5
        _ev(5, "2024-02-10", user=3),  # t=0, at corpus end -> censored
    ]
    sf = make_sf(tmp_path / "sf", events=rows)
    out = rows_by(run("kaplan_meier_hazard", spark, sf), "lifetime_days")
    assert list(out["lifetime_days"]) == [0, 5, 10]
    assert list(out["n_at_risk"]) == [3, 2, 1]
    assert list(out["n_churned"]) == [0, 1, 1]
    assert list(out["n_censored"]) == [1, 0, 0]
    assert list(out["hazard_permille"]) == [0, 500, 1000]


def test_acf_known_values(spark, tmp_path):
    """Alternating daily counts (2,0,2,0,2): the biased textbook ACF
    estimator gives exactly -0.8 at lag 1 and 17/30 at lag 2
    (hand-worked: denominator sum of squared deviations 4.8)."""
    rows, i = [], 1
    for day in ("2024-01-01", "2024-01-03", "2024-01-05"):
        for _ in range(2):
            rows.append(_ev(i, day))
            i += 1
    sf = make_sf(tmp_path / "sf", events=rows)
    out = rows_by(run("acf_daily_lags", spark, sf), "lag")
    lag1 = out[out["lag"] == 1].iloc[0]
    lag2 = out[out["lag"] == 2].iloc[0]
    assert lag1["n_pairs"] == 4 and lag2["n_pairs"] == 3
    assert lag1["acf"] == pytest.approx(-0.8)
    assert lag2["acf"] == pytest.approx(17.0 / 30.0)


def test_lagged_xcorr_known_values(spark, tmp_path):
    """Purchases are clicks shifted by exactly 2 days => xcorr = +1
    at lag 2, -1 at lag 1 (anti-phase), 1/sqrt(2) at lag 0."""
    rows, i = [], 1
    for day in ("2024-01-01", "2024-01-03", "2024-01-05"):
        for _ in range(2):
            rows.append(_ev(i, day, etype="click"))
            i += 1
    for day in ("2024-01-03", "2024-01-05"):
        for _ in range(2):
            rows.append(_ev(i, day, etype="purchase"))
            i += 1
    # spine runs 01-01..01-06 so the shifted series stays in range
    rows.append(_ev(i, "2024-01-06", etype="view"))
    sf = make_sf(tmp_path / "sf", events=rows)
    out = rows_by(run("lagged_cross_correlation", spark, sf), "lag")
    by = {int(r["lag"]): r["xcorr"] for _, r in out.iterrows()}
    assert by[2] == pytest.approx(1.0)
    assert by[1] == pytest.approx(-1.0)
    assert by[0] == pytest.approx(1.0 / math.sqrt(2.0))


def test_sax_known_values(spark, tmp_path):
    """Week 1 at 1/day, week 2 at 3/day: weekly PAA z = -/+ 0.963
    (|z| > 0.6745, the quartile breakpoint) => symbols 'a','d'."""
    rows, i = [], 1
    for d in range(1, 8):
        rows.append(_ev(i, f"2024-01-{d:02d}")); i += 1
    for d in range(8, 15):
        for _ in range(3):
            rows.append(_ev(i, f"2024-01-{d:02d}")); i += 1
    sf = make_sf(tmp_path / "sf", events=rows)
    out = rows_by(run("sax_symbolic_daily", spark, sf), "window_id")
    assert list(out["window_id"]) == [0, 1]
    assert list(out["n_days"]) == [7, 7]
    assert list(out["sum_events"]) == [7, 21]
    assert list(out["symbol"]) == ["a", "d"]


# ---------------------------------------------------------------------------
# documents-based statistics


def _doc(i, text=None, lang="en", source="s1", n_chars=None):
    d = {"doc_id": i, "lang": lang, "source": source}
    d["text"] = text if text is not None else "x"
    if n_chars is not None:
        d["n_chars"] = n_chars
    return d


def test_gini_known_values(spark, tmp_path):
    """Equal sizes => Gini 0; one doc holds everything => Gini
    (n-1)/n = 750 permille at n=4 (textbook extremals)."""
    docs = [_doc(i, source="eq", n_chars=5) for i in range(1, 5)]
    docs += [_doc(i, source="uneq", n_chars=0) for i in range(5, 8)]
    docs += [_doc(8, source="uneq", n_chars=8)]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("gini_corpus_inequality", spark, sf), "source")
    eq = out[out["source"] == "eq"].iloc[0]
    un = out[out["source"] == "uneq"].iloc[0]
    assert eq["gini_permille"] == 0
    assert un["gini_permille"] == 750


def test_hhi_known_values(spark, tmp_path):
    """Two equal sources => HHI = 1/2 (500000 ppm), equal to the
    uniform benchmark."""
    docs = [_doc(1, source="s1"), _doc(2, source="s1"),
            _doc(3, source="s2"), _doc(4, source="s2")]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = run("hhi_concentration", spark, sf).iloc[0]
    assert out["n_sources"] == 2 and out["n_docs"] == 4
    assert out["hhi_ppm"] == 500000
    assert out["uniform_hhi_ppm"] == 500000


def test_herfindahl_normalized_known_values(spark, tmp_path):
    """Normalized HHI: single group => 1 by convention; two equal
    groups => exactly 0 ((1/2*2 - 1)/(2-1))."""
    docs = [_doc(1, source="s1", lang="en"), _doc(2, source="s1", lang="en"),
            _doc(3, source="s2", lang="en"), _doc(4, source="s2", lang="en")]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("herfindahl_concentration", spark, sf), "axis")
    lang = out[out["axis"] == "lang"].iloc[0]
    src = out[out["axis"] == "source"].iloc[0]
    assert lang["k_groups"] == 1
    assert lang["hhi_micro"] == 1_000_000
    assert lang["hhi_normalized_micro"] == 1_000_000
    assert src["k_groups"] == 2
    assert src["hhi_micro"] == 500_000
    assert src["hhi_normalized_micro"] == 0


def test_quantile_normalization_known_values(spark, tmp_path):
    """Classic 2-sample quantile normalization: the r-th value maps
    to the cross-sample mean of the r-th order statistics: rank 1 ->
    (10+30)/2 = 20, rank 2 -> (20+40)/2 = 30."""
    docs = [
        _doc(1, source="s1", n_chars=10), _doc(2, source="s1", n_chars=20),
        _doc(3, source="s2", n_chars=30), _doc(4, source="s2", n_chars=40),
    ]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("quantile_normalization", spark, sf), "source", "r")
    assert list(out["normalized_milli"]) == [20000, 30000, 20000, 30000]


def test_quantile_buckets_known_values(spark, tmp_path):
    """8 docs into 8 octile buckets: one doc per bucket in length
    order, so min == max == the doc's own length."""
    docs = [_doc(i, n_chars=i * 10) for i in range(1, 9)]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("quantile_bucket_stats", spark, sf), "bucket")
    assert list(out["bucket"]) == list(range(1, 9))
    assert list(out["n_docs"]) == [1] * 8
    assert list(out["min_chars"]) == [i * 10 for i in range(1, 9)]


def test_cliffs_delta_known_values(spark, tmp_path):
    """Complete separation: every 'a' text longer than every 'b'
    text => delta = +1 for a, -1 for b (the effect-size extremals)."""
    docs = [
        _doc(1, text="aaaaa", lang="a"), _doc(2, text="aaaaaa", lang="a"),
        _doc(3, text="b", lang="b"), _doc(4, text="bb", lang="b"),
    ]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("cliffs_delta_lengths", spark, sf), "lang")
    a = out[out["lang"] == "a"].iloc[0]
    b = out[out["lang"] == "b"].iloc[0]
    assert (a["n_in"], a["n_out"]) == (2, 2)
    assert a["n_greater"] == 4 and a["n_less"] == 0
    assert a["cliffs_delta_micro"] == 1_000_000
    assert b["cliffs_delta_micro"] == -1_000_000


def test_welch_t2_known_values(spark, tmp_path):
    """s1=(8,12) vs s2=(18,22): means 10/20, sample variances 8/8 =>
    t^2 = 100/(8/2+8/2) = 12.5 exactly, symmetric in both rows."""
    docs = [
        _doc(1, source="s1", n_chars=8), _doc(2, source="s1", n_chars=12),
        _doc(3, source="s2", n_chars=18), _doc(4, source="s2", n_chars=22),
    ]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("welch_ttest_lengths", spark, sf), "source")
    assert list(out["welch_t2"]) == pytest.approx([12.5, 12.5])


def test_mann_whitney_known_values(spark, tmp_path):
    """Complete separation (en lengths 10,20 vs others 1,2): U1 =
    n1*n2 = 4, U2 = 0; z = (U1 - n1n2/2)/sqrt(n1n2(n+1)/12) =
    2/sqrt(5/3) (textbook normal approximation, no ties)."""
    docs = [
        _doc(1, lang="en", n_chars=10), _doc(2, lang="en", n_chars=20),
        _doc(3, lang="fr", n_chars=1), _doc(4, lang="fr", n_chars=2),
    ]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = run("mann_whitney_u_lengths", spark, sf).iloc[0]
    assert (out["n1"], out["n0"]) == (2, 2)
    assert out["u1_x2"] == 8 and out["u2_x2"] == 0
    assert out["tie_t3t"] == 0
    assert out["z"] == pytest.approx(2.0 / math.sqrt(5.0 / 3.0))


def test_mood_median_known_values(spark, tmp_path):
    """en entirely at/below the grand median, fr entirely above:
    each of the four cells contributes chi2 exactly 1 (1e6 micro) —
    hand-worked 2x2 with all margins 2."""
    docs = [
        _doc(1, lang="en", n_chars=1), _doc(2, lang="en", n_chars=2),
        _doc(3, lang="fr", n_chars=3), _doc(4, lang="fr", n_chars=4),
    ]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = run("mood_median_test_langs", spark, sf)
    assert len(out) == 4
    assert list(out["expected_permille"]) == [1000] * 4
    assert list(out["chi2_contrib_micro"]) == [1_000_000] * 4


def test_cramer_von_mises_known_values(spark, tmp_path):
    """Identical samples => T = 0 exactly; the minimal separated
    pair (1) vs (2) gives the hand-worked 250000 micro."""
    docs = [
        _doc(1, lang="en", n_chars=5), _doc(2, lang="en", n_chars=7),
        _doc(3, lang="fr", n_chars=5), _doc(4, lang="fr", n_chars=7),
    ]
    sf = make_sf(tmp_path / "ident", documents=docs)
    out = run("cramer_von_mises_lengths", spark, sf).iloc[0]
    assert (out["n1"], out["n0"]) == (2, 2)
    assert out["t_micro"] == 0

    sf2 = make_sf(
        tmp_path / "sep",
        documents=[_doc(1, lang="en", n_chars=1),
                   _doc(2, lang="fr", n_chars=2)],
    )
    out2 = run("cramer_von_mises_lengths", spark, sf2).iloc[0]
    assert out2["t_micro"] == 250000


def test_ansari_bradley_known_values(spark, tmp_path):
    """en=(2,3) nested inside fr=(1,4): AB scores 1,2,2,1 => en sum
    4 vs E[AB] = n1(n+2)/4 = 3 (even n, no ties) => +333 permille
    deviation."""
    docs = [
        _doc(1, lang="en", n_chars=2), _doc(2, lang="en", n_chars=3),
        _doc(3, lang="fr", n_chars=1), _doc(4, lang="fr", n_chars=4),
    ]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = run("ansari_bradley_dispersion", spark, sf).iloc[0]
    assert (out["n1"], out["n0"]) == (2, 2)
    assert out["ab_x1e6"] == 4_000_000
    assert out["ab_expected_x1e6"] == 3_000_000
    assert out["dev_sign"] == 1
    assert out["abs_dev_permille"] == 333


def test_kruskal_wallis_known_values(spark, tmp_path):
    """en ranks {1,3}, fr ranks {2,4}: H = 12/(n(n+1)) * sum nj
    (rbar_j - (n+1)/2)^2 = 0.6 by hand; no ties so the tie-corrected
    H equals it."""
    docs = [
        _doc(1, lang="en", n_chars=1), _doc(2, lang="en", n_chars=3),
        _doc(3, lang="fr", n_chars=2), _doc(4, lang="fr", n_chars=4),
    ]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("kruskal_wallis_lengths", spark, sf), "lang")
    en = out[out["lang"] == "en"].iloc[0]
    fr = out[out["lang"] == "fr"].iloc[0]
    assert en["mean_rank_x2"] == 4 and fr["mean_rank_x2"] == 6
    assert en["tie_t3t"] == 0
    assert en["h_x1e6"] == 600000
    assert en["h_tie_x1e6"] == 600000


def test_levene_bf_known_values(spark, tmp_path):
    """Identical |deviation-from-median| profiles in both groups =>
    Brown-Forsythe W exactly 0."""
    docs = [
        _doc(1, source="s1", n_chars=1), _doc(2, source="s1", n_chars=3),
        _doc(3, source="s2", n_chars=11), _doc(4, source="s2", n_chars=13),
    ]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = run("levene_brown_forsythe", spark, sf)
    assert list(out["w_x1e6"]) == [0, 0]


def test_chao1_known_values(spark, tmp_path):
    """Chao1 = S_obs + f1(f1-1)/(2(f2+1)): 'a b b c c' => 3 + 0 = 3;
    'x y' => 2 + 2*1/2 = 3 (both 3000 milli, different routes)."""
    docs = [
        _doc(1, text="a b b c c", source="s"),
        _doc(2, text="x y", source="t"),
    ]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("chao1_vocab_richness", spark, sf), "source")
    s = out[out["source"] == "s"].iloc[0]
    t = out[out["source"] == "t"].iloc[0]
    assert (s["n_types"], s["f1"], s["f2"]) == (3, 1, 2)
    assert s["chao1_x1000"] == 3000
    assert (t["n_types"], t["f1"], t["f2"]) == (2, 2, 0)
    assert t["chao1_x1000"] == 3000


def test_good_turing_known_values(spark, tmp_path):
    """Good-Turing r* = (r+1) N_{r+1}/N_r on a hand-built bigram
    table (N_1=2, N_2=1): r=1 -> 1.0, r=2 -> 0 (no N_3)."""
    docs = [
        _doc(1, text="a b"),
        _doc(2, text="c d c d"),
    ]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("good_turing_discounts", spark, sf), "r")
    assert list(out["r"]) == [1, 2]
    assert list(out["n_r"]) == [2, 1]
    assert list(out["n_r1"]) == [1, 0]
    assert list(out["r_star_x1000"]) == [1000, 0]


def test_token_dispersion_known_values(spark, tmp_path):
    """Perfectly even spread (every doc identical, one source):
    Fano factor and Gries DP both exactly 0."""
    docs = [_doc(1, text="a a b"), _doc(2, text="a a b")]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("token_dispersion_stats", spark, sf), "tok")
    a = out[out["tok"] == "a"].iloc[0]
    b = out[out["tok"] == "b"].iloc[0]
    assert (a["c_tok"], a["df"]) == (4, 2)
    assert a["fano_x1000"] == 0 and a["dp_x1000"] == 0
    assert (b["c_tok"], b["df"]) == (2, 2)
    assert b["fano_x1000"] == 0 and b["dp_x1000"] == 0


def test_token_burstiness_known_values(spark, tmp_path):
    """'a' recurs within 1 of its 2 docs => burstiness 500, mean
    in-doc tf 1500 milli; 'b' never recurs => 0 and 1000."""
    docs = [_doc(1, text="a a"), _doc(2, text="a"), _doc(3, text="b")]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("token_burstiness_topk", spark, sf), "tok")
    a = out[out["tok"] == "a"].iloc[0]
    b = out[out["tok"] == "b"].iloc[0]
    assert (a["df"], a["tf"]) == (2, 3)
    assert a["burstiness_permille"] == 500
    assert a["mean_in_doc_permille"] == 1500
    assert (b["df"], b["tf"]) == (1, 1)
    assert b["burstiness_permille"] == 0
    assert b["mean_in_doc_permille"] == 1000


def test_unigram_tvd_known_values(spark, tmp_path):
    """Identical unigram distributions => TVD 0; disjoint
    vocabularies => TVD 1 (1000 permille)."""
    docs = [
        _doc(1, text="a b", source="sa"),
        _doc(2, text="a b", source="sb"),
        _doc(3, text="c c", source="sc"),
    ]
    sf = make_sf(tmp_path / "sf", documents=docs)
    out = rows_by(run("unigram_tvd_sources", spark, sf), "src_a", "src_b")
    got = {(r["src_a"], r["src_b"]): r["tvd_permille"]
           for _, r in out.iterrows()}
    assert got == {("sa", "sb"): 0, ("sa", "sc"): 1000, ("sb", "sc"): 1000}


def test_yule_sichel_known_values(spark, tmp_path):
    """'a a b c': Yule K = 10^4 (S2 - N)/N^2 = 10^4*2/16 = 1250;
    Sichel f2/V = 1/3; hapax f1/V = 2/3 (floor permille)."""
    sf = make_sf(tmp_path / "sf", documents=[_doc(1, text="a a b c")])
    out = run("yule_sichel_richness", spark, sf).iloc[0]
    assert (out["n_tokens"], out["v_types"]) == (4, 3)
    assert out["yule_k_x1000"] == 1_250_000
    assert out["sichel_s_permille"] == 333
    assert out["hapax_permille"] == 666


def test_simpson_diversity_known_values(spark, tmp_path):
    """'a a b b': Simpson D = 1 - sum n_i(n_i-1)/(N(N-1)) = 1 - 4/12
    = 2/3 (667 floor permille)."""
    sf = make_sf(tmp_path / "sf", documents=[_doc(1, text="a a b b")])
    out = run("simpson_diversity_tokens", spark, sf).iloc[0]
    assert (out["n_tok"], out["n_types"]) == (4, 2)
    assert out["simpson_permille"] == 667


# ---------------------------------------------------------------------------
# lineitem-based statistics


def _li(okey=1, part=1, supp=1, qty=1.0, price=1.0, disc=0.0,
        flag="N", ship="2024-01-01"):
    return {
        "l_orderkey": okey, "l_partkey": part, "l_suppkey": supp,
        "l_quantity": qty, "l_extendedprice": price, "l_discount": disc,
        "l_returnflag": flag, "l_shipdate": ship,
    }


def test_linreg_known_values(spark, tmp_path):
    """price = exactly $1 per unit of quantity => OLS slope is
    exactly 100 cents/unit (1e8 micro-cents), mean x = 2.5."""
    sf = make_sf(
        tmp_path / "sf",
        lineitem=[_li(qty=float(x), price=float(x)) for x in range(1, 5)],
    )
    out = run("linreg_closed_form", spark, sf).iloc[0]
    assert out["n"] == 4
    assert out["slope_micro_cents"] == 100_000_000
    assert out["mean_x_milli"] == 2500


def test_odds_ratio_known_values(spark, tmp_path):
    """2x2 of (a,b,c,d) = (2,1,1,2): OR = ad/bc = 4 exactly; risk
    difference = 2/3 - 1/3 = 1/3 (floor micro 333333)."""
    sf = make_sf(
        tmp_path / "sf",
        lineitem=[_li(flag="R", ship="2024-03-01")] * 2
        + [_li(flag="N", ship="2024-03-01")]
        + [_li(flag="R", ship="2024-09-01")]
        + [_li(flag="N", ship="2024-09-01")] * 2,
    )
    out = run("odds_ratio_returns", spark, sf).iloc[0]
    assert (out["h1_returned"], out["h1_kept"]) == (2, 1)
    assert (out["h2_returned"], out["h2_kept"]) == (1, 2)
    assert out["odds_ratio_micro"] == 4_000_000
    assert out["risk_diff_micro"] == 333_333


def test_wilson_lower_bound_known_values(spark, tmp_path):
    """Published Wilson 95% lower bounds: p-hat=0.5, n=10 =>
    0.2365896...; p-hat=1.0, n=10 => 0.7224599... (z=1.96)."""
    rows = [_li(supp=1, flag="R" if i < 5 else "N") for i in range(10)]
    rows += [_li(supp=2, flag="R") for _ in range(10)]
    sf = make_sf(tmp_path / "sf", lineitem=rows)
    out = rows_by(run("wilson_lower_bound_rank", spark, sf), "l_suppkey")
    s1 = out[out["l_suppkey"] == 1].iloc[0]
    s2 = out[out["l_suppkey"] == 2].iloc[0]
    assert (s1["n"], s1["r"]) == (10, 5)
    assert s1["wilson_lb"] == pytest.approx(0.2365896, abs=1e-6)
    assert s2["wilson_lb"] == pytest.approx(0.7224599, abs=1e-6)


def test_stats_moments_known_values(spark, tmp_path):
    """Perfectly linear price-in-quantity: mean 2.0, sample stddev
    1.0 (of 1,2,3 dollars), correlation exactly 1."""
    sf = make_sf(
        tmp_path / "sf",
        lineitem=[_li(qty=float(x), price=float(x), flag="A")
                  for x in (1, 2, 3)],
    )
    out = run("stats_moments", spark, sf).iloc[0]
    assert out["n_items"] == 3
    assert out["mean_price"] == pytest.approx(2.0)
    assert out["stddev_price"] == pytest.approx(1.0)
    assert out["corr_qty_price"] == pytest.approx(1.0)


def test_corr_matrix_known_values(spark, tmp_path):
    """qty, price and discount all exactly collinear => every
    pairwise Pearson correlation is exactly +1."""
    sf = make_sf(
        tmp_path / "sf",
        lineitem=[_li(qty=float(x), price=float(x), disc=x / 100.0,
                      flag="A") for x in (1, 2, 3)],
    )
    out = run("corr_matrix_exact", spark, sf).iloc[0]
    assert out["n"] == 3
    assert out["corr_qty_price"] == pytest.approx(1.0)
    assert out["corr_qty_disc"] == pytest.approx(1.0)


def test_skew_kurt_known_values(spark, tmp_path):
    """Symmetric (1,2,3): skew exactly 0, excess kurtosis -1.5 (m4/
    sigma^4 = 1.5); skewed (1,1,1,5): skew = 2/sqrt(3), excess kurt
    = 21/9 - 3 (population moments, hand-worked)."""
    rows = [_li(qty=float(q), flag="S") for q in (1, 2, 3)]
    rows += [_li(qty=float(q), flag="K") for q in (1, 1, 1, 5)]
    sf = make_sf(tmp_path / "sf", lineitem=rows)
    out = rows_by(run("agg_skew_kurt", spark, sf), "l_returnflag")
    s = out[out["l_returnflag"] == "S"].iloc[0]
    k = out[out["l_returnflag"] == "K"].iloc[0]
    assert s["mean_qty"] == pytest.approx(2.0)
    assert s["skew_qty"] == pytest.approx(0.0, abs=1e-12)
    assert s["kurt_qty"] == pytest.approx(-1.5)
    assert k["skew_qty"] == pytest.approx(2.0 / math.sqrt(3.0))
    assert k["kurt_qty"] == pytest.approx(21.0 / 9.0 - 3.0)


def test_cochran_armitage_known_values(spark, tmp_path):
    """Complete separation over two dose classes (0/2 then 2/2
    returned): hand-worked z = a*sqrt(N)/sqrt(b) = 4*2/4 = 2."""
    sf = make_sf(
        tmp_path / "sf",
        orders=[
            {"o_orderkey": 1, "o_orderpriority": "1-URGENT"},
            {"o_orderkey": 2, "o_orderpriority": "2-HIGH"},
        ],
        lineitem=[_li(okey=1, flag="N")] * 2 + [_li(okey=2, flag="R")] * 2,
    )
    out = rows_by(run("cochran_armitage_trend", spark, sf), "priority_class")
    assert list(out["priority_class"]) == [1, 2]
    assert list(out["return_permille"]) == [0, 1000]
    assert list(out["z"]) == pytest.approx([2.0, 2.0])


def test_mcnemar_known_values(spark, tmp_path):
    """Discordant pairs b=2, c=0: McNemar chi2 = (b-c)^2/(b+c) = 2;
    continuity-corrected (|b-c|-1)^2/(b+c) = 0.5."""
    orders, items, ok = [], [], 1
    # custs 1,2: returned in H1 only; cust 3: both halves; cust 4: none
    for cust, (h1f, h2f) in ((1, ("R", "N")), (2, ("R", "N")),
                             (3, ("R", "R")), (4, ("N", "N"))):
        for half, flag in (("2024-03-01", h1f), ("2024-09-01", h2f)):
            orders.append({"o_orderkey": ok, "o_custkey": cust,
                           "o_orderdate": half})
            items.append(_li(okey=ok, flag=flag, ship=half))
            ok += 1
    sf = make_sf(tmp_path / "sf", orders=orders, lineitem=items)
    out = run("mcnemar_paired_returns", spark, sf).iloc[0]
    assert out["n_pairs"] == 4
    assert (out["both_ret"], out["h1_only"], out["h2_only"],
            out["neither"]) == (1, 2, 0, 1)
    assert out["mcnemar_x2_micro"] == 2_000_000
    assert out["mcnemar_x2_corrected_micro"] == 500_000


def test_revenue_waterfall_known_values(spark, tmp_path):
    """Hand-built PVM decomposition: shared part doubles volume at
    flat price (+200c volume, 0 price), one part lost (-500c), one
    new (+300c); the identity leaves residual exactly 0."""
    items = (
        [_li(part=1, qty=1.0, price=1.0, ship="1995-06-01")] * 2
        + [_li(part=1, qty=1.0, price=1.0, ship="1996-06-01")] * 4
        + [_li(part=2, qty=1.0, price=5.0, ship="1995-06-01")]
        + [_li(part=3, qty=1.0, price=3.0, ship="1996-06-01")]
    )
    sf = make_sf(tmp_path / "sf", lineitem=items)
    out = run("revenue_waterfall_decomposition", spark, sf).iloc[0]
    assert (out["rev0_cents"], out["rev1_cents"]) == (700, 700)
    assert out["delta_cents"] == 0
    assert out["volume_eff_cents"] == 200
    assert out["price_eff_cents"] == 0
    assert out["new_parts_cents"] == 300
    assert out["lost_parts_cents"] == 500
    assert out["residual_cents"] == 0


# ---------------------------------------------------------------------------
# sketch-accuracy audits (flags are the operator's own verdicts; the
# fixture pins the exact legs and that the audits hold on tiny input)


def test_hll_audit_known_values(spark, tmp_path):
    sf = make_sf(
        tmp_path / "sf",
        events=[_ev(i + 1, "2024-01-01", user=u, etype=t)
                for i, (t, u) in enumerate(
                    [("A", u) for u in range(5)] + [("B", 1), ("B", 2)])],
    )
    out = rows_by(run("hll_accuracy_audit", spark, sf), "event_type")
    assert list(out["n_distinct_exact"]) == [5, 2]
    assert list(out["hll_within_bound"]) == [1, 1]


def test_cms_audit_known_values(spark, tmp_path):
    sf = make_sf(
        tmp_path / "sf",
        events=[_ev(i + 1, "2024-01-01", user=u)
                for i, u in enumerate((1, 1, 1, 2))],
    )
    out = rows_by(run("count_min_accuracy_audit", spark, sf), "user_id")
    assert list(out["true_count"]) == [3, 1]
    assert list(out["cms_within_bound"]) == [1, 1]


def test_bloom_audit_known_values(spark, tmp_path):
    sf = make_sf(
        tmp_path / "sf",
        events=[_ev(i + 1, "2024-01-01", user=u)
                for i, u in enumerate((1, 2, 3, 3))],
    )
    out = run("bloom_fpp_audit", spark, sf).iloc[0]
    assert out["n_members"] == 3
    assert out["all_members_contained"] == 1
    assert out["fpp_within_budget"] == 1


def test_approx_quantile_audit_known_values(spark, tmp_path):
    """Single-valued distribution: every exact quantile is that
    value under every convention, and the sketch must agree."""
    sf = make_sf(
        tmp_path / "sf",
        events=[_ev(i + 1, "2024-01-01", value=5.0) for i in range(20)],
    )
    out = rows_by(run("approx_quantile_audit", spark, sf), "pct")
    assert list(out["exact_value"]) == [5.0] * 6
    assert list(out["approx_within_bound"]) == [1] * 6


def test_approx_percentile_rank_audit_known_values(spark, tmp_path):
    sf = make_sf(
        tmp_path / "sf",
        events=[_ev(i + 1, "2024-01-01", value=float(i)) for i in range(10)],
    )
    out = run("approx_percentile_rank_audit", spark, sf).iloc[0]
    assert out["n_rows"] == 10
    assert out["p50_within_guarantee"] == 1
    assert out["p99_within_guarantee"] == 1
