"""Round-10 wave-2 operator invariants (pipeline9 + NDCG): brute-force
pins for the nonparametric-suite completions — Kruskal-Wallis H,
Brown-Forsythe/Levene W, Ansari-Bradley dispersion (its closed-form
span score re-derived by LITERAL per-rank summation), and NDCG@k
recomputed with exact Fractions against real log2 discounts.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from watermill_kinesis_spark.operators.pipeline9 import (
    STAT_CLAMP,
    ansari_bradley_dispersion,
    kruskal_wallis_lengths,
    levene_brown_forsythe,
)
from watermill_kinesis_spark.sources.tables import load_table


def _length_rows(spark, sf_dir, key):
    return [
        (r.n_chars, r[key])
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("n_chars").isNotNull() & F.col(key).isNotNull())
        .select("n_chars", key)
        .collect()
    ]


def test_kruskal_wallis_matches_bruteforce(spark, sf_dir):
    """Recompute H from literal sorted midranks (×2) and the engine's
    documented truncation points, then sanity-check the micro-unit H
    against the float formula."""
    rows = _length_rows(spark, sf_dir, "lang")
    vals = sorted(v for v, _ in rows)
    # 2*midrank per value: first+last 1-based position of the tie run
    first = {}
    for pos, v in enumerate(vals, start=1):
        first.setdefault(v, pos)
    count = Counter(vals)
    mid2 = {v: 2 * first[v] + count[v] - 1 for v in count}
    n_g: dict = defaultdict(int)
    r2_g: dict = defaultdict(int)
    for v, lang in rows:
        n_g[lang] += 1
        r2_g[lang] += mid2[v]
    n = len(rows)
    s = sum(r2_g[g] * r2_g[g] // (4 * n_g[g]) for g in n_g)
    t3t = sum(t * t * t - t for t in count.values())
    h_x1e6 = s * 12_000_000 // (n * (n + 1)) - 3 * (n + 1) * 1_000_000
    c_num = n * n * n - n
    if h_x1e6 <= 0 or c_num - t3t <= 0:
        h_tie = 0
    elif h_x1e6 * c_num > STAT_CLAMP * (c_num - t3t):
        h_tie = STAT_CLAMP
    else:
        h_tie = h_x1e6 * c_num // (c_num - t3t)

    got = {r.lang: r for r in kruskal_wallis_lengths(spark, sf_dir).collect()}
    assert set(got) == set(n_g)
    for lang, r in got.items():
        assert (r.n, r.rank_sum_x2) == (n_g[lang], r2_g[lang])
        assert r.mean_rank_x2 == r2_g[lang] // n_g[lang]
        assert (r.k_groups, r.n_total, r.tie_t3t) == (len(n_g), n, t3t)
        assert (r.h_x1e6, r.h_tie_x1e6) == (h_x1e6, h_tie)
    # rank-sum completeness: Σ 2R_g = 2·(1+…+N) = N(N+1)
    assert sum(r2_g.values()) == n * (n + 1)
    # the quantized H sits within k micro-scaled units of the float H
    h_float = (12.0 / (n * (n + 1))) * (s / 1.0) - 3 * (n + 1)
    assert abs(h_x1e6 / 1e6 - h_float) < 1e-3


def test_levene_brown_forsythe_matches_bruteforce(spark, sf_dir):
    """Recompute W from literal per-source medians and absolute
    deviations (all ×2 integers), mirroring the engine's micro-unit
    truncation points exactly."""
    rows = _length_rows(spark, sf_dir, "source")
    by_src: dict = defaultdict(list)
    for v, src in rows:
        by_src[src].append(v)
    stats = {}
    for src, xs in by_src.items():
        xs.sort()
        m = len(xs)
        m2 = xs[(m + 1) // 2 - 1] + xs[m // 2]  # v_lo + v_hi, 1-based
        zs = [abs(2 * x - m2) for x in xs]
        stats[src] = (m, sum(zs), sum(z * z for z in zs))
    n = sum(m for m, _, _ in stats.values())
    k = len(stats)
    stot = sum(s for _, s, _ in stats.values())
    qtot = sum(q for _, _, q in stats.values())
    a = sum(s * s * 1_000_000 // m for m, s, _ in stats.values())
    num = a - stot * stot * 1_000_000 // n
    den = qtot * 1_000_000 - a
    if num <= 0 or den <= 0 or k < 2:
        w = 0
    elif (n - k) * num * 1_000_000 > STAT_CLAMP * (k - 1) * den:
        w = STAT_CLAMP
    else:
        w = (n - k) * num * 1_000_000 // ((k - 1) * den)

    got = {r.source: r for r in levene_brown_forsythe(spark, sf_dir).collect()}
    assert set(got) == set(stats)
    for src, r in got.items():
        m, s, q = stats[src]
        assert (r.n, r.absdev_sum_x2, r.absdev_sumsq_x4) == (m, s, q)
        assert (r.k_groups, r.n_total, r.w_x1e6) == (k, n, w)
    # medians are genuine: at least one source has nonzero deviation
    assert any(s > 0 for _, s, _ in stats.values())


def test_ansari_bradley_matches_literal_rank_scores(spark, sf_dir):
    """Rebuild the AB statistic by LITERALLY scoring every 1-based
    rank with min(r, N+1−r) and averaging over tie runs — an
    independent derivation of the operator's closed-form span sums —
    then mirror the micro-unit truncation."""
    rows = _length_rows(spark, sf_dir, "lang")
    pairs = sorted((v, 1 if lang == "en" else 0) for v, lang in rows)
    n = len(pairs)
    score = lambda r: min(r, n + 1 - r)
    by_v: dict = defaultdict(list)
    for pos, (v, g) in enumerate(pairs, start=1):
        by_v[v].append((pos, g))
    ab = 0
    for v, entries in by_v.items():
        t = len(entries)
        rs2 = 2 * sum(score(pos) for pos, _ in entries)  # literal sum
        n1v = sum(g for _, g in entries)
        ab += n1v * rs2 * 1_000_000 // (2 * t)
    n1 = sum(g for _, g in pairs)
    n0 = n - n1
    if n % 2 == 0:
        e = n1 * (n + 2) * 1_000_000 // 4
    else:
        e = n1 * (n + 1) * (n + 1) * 1_000_000 // (4 * n)

    got = ansari_bradley_dispersion(spark, sf_dir).collect()[0]
    assert (got.n1, got.n0) == (n1, n0)
    assert got.ab_x1e6 == ab
    assert got.ab_expected_x1e6 == e
    assert got.dev_sign == (1 if ab >= e else -1)
    assert got.abs_dev_permille == 1000 * abs(ab - e) // max(e, 1)
    # total-score identity: Σ over ALL docs of the midscore equals the
    # exact closed form Σ_{r=1..N} min(r, N+1-r) (×1e6, integral since
    # every tie run's rs2 is even ⇒ Σ_g AB_g telescopes exactly when
    # run per-group; here check group-1 stat is bounded by the total)
    total = sum(score(r) for r in range(1, n + 1))
    assert 0 <= ab <= total * 1_000_000


def test_ndcg_matches_fraction_bruteforce(spark, sf_dir):
    """Recompute NDCG@k with exact integers straight from the shared
    ranked relation and the label table, and pin the discount
    constants against real math.log2 to 1 ulp of the scale."""
    from watermill_kinesis_spark.operators.retrieval import (
        NDCG_CUM,
        NDCG_SCALE,
        NDCG_W,
        _ranked_with_labels,
        ndcg_at_k,
    )
    from watermill_kinesis_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )

    # the constants really are the rounded log2 discounts
    for r, w in enumerate(NDCG_W, start=1):
        assert abs(w - NDCG_SCALE / math.log2(r + 1)) <= 0.5
    assert NDCG_CUM[0] == 0 and len(NDCG_CUM) == TOP_K + 1
    assert all(
        NDCG_CUM[m] - NDCG_CUM[m - 1] == NDCG_W[m - 1]
        for m in range(1, TOP_K + 1)
    )

    ranked = _ranked_with_labels(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    labels = {r.vec_id: r.label for r in e.collect()}
    per_q: dict = defaultdict(list)
    for r in ranked:
        if r.rank <= TOP_K:
            per_q[r.query_id].append((r.rank, int(r.n_label == r.q_label)))
    got = {r.query_id: r for r in ndcg_at_k(spark, sf_dir).collect()}
    assert set(got) == set(per_q) and len(got) == N_QUERIES
    for qid, rows in per_q.items():
        q_label = labels[qid]
        n_rel_corpus = sum(
            1 for vid, lab in labels.items() if lab == q_label and vid != qid
        )
        dcg = sum(NDCG_W[rank - 1] * rel for rank, rel in rows)
        idcg = NDCG_CUM[min(n_rel_corpus, TOP_K)]
        g = got[qid]
        assert g.n_relevant_topk == sum(rel for _, rel in rows)
        assert g.n_relevant_corpus == n_rel_corpus
        assert g.dcg_scaled == dcg
        assert g.idcg_scaled == idcg
        assert g.ndcg_permille == 1000 * dcg // max(idcg, 1)
        # NDCG ∈ [0, 1000]: the ideal ranking really is an upper bound
        assert 0 <= g.ndcg_permille <= 1000
