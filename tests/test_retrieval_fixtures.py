"""Known-value formula pins, batch 5: the retrieval-ranking scorecard
and the BFS traversal census (extending VERDICT r12 task 2 beyond the
statistics family).

Same doctrine as tests/test_stat_fixtures.py — the engine-vs-oracle
gate cannot see a formula error both spellings share, so each metric
is pinned to a HAND-COMPUTED fixture evaluated through the operator's
real registered code path.

Retrieval fixture geometry: the 8 queries (vec_id < N_QUERIES = 8)
all carry the IDENTICAL vector [1, 0], so every query's neighbors at
cosine 1.0 are exactly the other seven queries, ranked by the
family's (score DESC, vec_id ASC) tie order — i.e. each query's
top-5 is the five smallest OTHER query ids, a ranking that needs no
floating-point reasoning at all. Four distractor vectors (labels
never matching any query) sit at strictly smaller cosines so they can
never crack the top-5. Labels: queries 0-3 → label 1, queries 4-7 →
label 2, giving two hand-worked relevance patterns:

  label-1 queries: top-5 ids (four smallest others + next), relevance
      [1,1,1,0,0] — relevant at ranks 1,2,3
  label-2 queries: relevance [0,0,0,0,1] — relevant at rank 5 only

and n_relevant_corpus = 3 for every query (its label appears on 4
vectors, minus self).
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_stat_fixtures import make_sf, run, rows_by

# family constants, re-derived here by hand (NOT imported from the
# operator modules — the pin must fail if the module constants drift)
TOP_K = 5
N_QUERIES = 8
RR_SCALE = 60  # lcm(1..5)
ERR_SCALE = 60 * 2**5  # 1920


def write_embeddings(path, rows) -> None:
    """rows: (vec_id, [float components], label) with the testdata
    schema (embedding = list<float32>, label = int32)."""
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(t, str(path / "embeddings.parquet"))


@pytest.fixture(scope="module")
def retrieval_sf(tmp_path_factory):
    path = tmp_path_factory.mktemp("retrieval_fixture")
    rows = [(i, [1.0, 0.0], 1 if i < 4 else 2) for i in range(8)]
    rows += [
        (8, [1.0, 1.0], 3),  # cos = 0.7071…
        (9, [0.0, 1.0], 3),  # cos = 0
        (10, [-1.0, 0.0], 3),  # cos = -1
        (11, [0.5, 0.5], 3),  # cos = 0.7071…
    ]
    write_embeddings(path, rows)
    return str(path)


# per-query hand expectations shared by the tests below:
#   queries 0-3 (label 1): rel pattern [1,1,1,0,0]
#   queries 4-7 (label 2): rel pattern [0,0,0,0,1]
LABEL1_QUERIES = [0, 1, 2, 3]
LABEL2_QUERIES = [4, 5, 6, 7]


def test_precision_recall_at_k_known_values(spark, retrieval_sf):
    out = rows_by(run("precision_recall_at_k", spark, retrieval_sf), "query_id")
    assert list(out.query_id) == list(range(8))
    assert list(out.k) == [5] * 8
    # label-1: 3 of 5 retrieved relevant; all 3 corpus-relevant found
    # label-2: 1 of 5; 1 of 3 corpus-relevant found
    assert list(out.n_relevant_topk) == [3, 3, 3, 3, 1, 1, 1, 1]
    assert list(out.n_relevant_corpus) == [3] * 8
    # precision = 1000*3 div 5 = 600 / 1000*1 div 5 = 200
    assert list(out.precision_permille) == [600] * 4 + [200] * 4
    # recall = 1000*3 div 3 = 1000 / 1000*1 div 3 = 333
    assert list(out.recall_permille) == [1000] * 4 + [333] * 4


def test_mrr_at_k_known_values(spark, retrieval_sf):
    out = rows_by(run("mrr_at_k_exact", spark, retrieval_sf), "query_id")
    # label-1: first relevant at rank 1 -> 60/1; label-2: rank 5 -> 60/5
    assert list(out.first_relevant_rank) == [1] * 4 + [5] * 4
    assert list(out[f"rr_scaled_{RR_SCALE}"]) == [60] * 4 + [12] * 4


def test_expected_reciprocal_rank_known_values(spark, retrieval_sf):
    out = rows_by(run("expected_reciprocal_rank", spark, retrieval_sf), "query_id")
    assert list(out.n_relevant_topk) == [3, 3, 3, 3, 1, 1, 1, 1]
    # cascade terms rel·(60 div r)·2^(k-1-m), k=5:
    # label-1 (ranks 1,2,3 with m=0,1,2): 60·16 + 30·8 + 20·4 = 1280
    #   check: 1280/1920 = 2/3 = 1/1·1/2 + 1/2·1/4 + 1/3·1/8
    # label-2 (rank 5, m=0): 12·16 = 192; 192/1920 = 1/10 = 1/5·1/2
    assert list(out[f"err_scaled_{ERR_SCALE}"]) == [1280] * 4 + [192] * 4


def test_ndcg_at_k_known_values(spark, retrieval_sf):
    # discounts re-derived by hand from the textbook DCG definition:
    # W_r = round(10^12 / log2(r+1))
    W = [round(10**12 / math.log2(r + 1)) for r in range(1, 6)]
    out = rows_by(run("ndcg_at_k", spark, retrieval_sf), "query_id")
    assert list(out.n_relevant_topk) == [3, 3, 3, 3, 1, 1, 1, 1]
    assert list(out.n_relevant_corpus) == [3] * 8
    idcg = W[0] + W[1] + W[2]  # ideal: 3 relevant fill ranks 1-3
    # label-1: relevant at ranks 1,2,3 -> DCG == IDCG -> NDCG = 1
    # label-2: relevant at rank 5 only -> DCG = W_5
    assert list(out.dcg_scaled) == [idcg] * 4 + [W[4]] * 4
    assert list(out.idcg_scaled) == [idcg] * 8
    assert list(out.ndcg_permille) == [1000] * 4 + [1000 * W[4] // idcg] * 4


def test_map_at_k_known_values(spark, retrieval_sf):
    out = rows_by(run("map_at_k_exact", spark, retrieval_sf), "query_id")
    # AP terms rel·prefix_rel·(60 div r):
    # label-1: 1·1·60 + 2·30 + 3·20 = 180; AP = 1000·180 div (3·60) = 1000
    #   (P@1 = P@2 = P@3 = 1 -> perfect AP)
    # label-2: 1·1·12 = 12; AP = 1000·12 div 60 = 200 (P@5 = 1/5)
    assert list(out[f"ap_sum_scaled_{RR_SCALE}"]) == [180] * 4 + [12] * 4
    assert list(out.ap_permille) == [1000] * 4 + [200] * 4


# ---------------------------------------------------------------------------
# BFS hop census on a hand-drawn part<->supplier graph


def test_graph_bfs_hops_known_values(spark, tmp_path):
    # bipartite graph: s1-{p1,p2}, s2-{p1,p3}, s3-{p4} (s3/p4 are a
    # separate component, unreachable from the seed).  Seed = MIN
    # supplier = s1. Hand BFS:
    #   hop 0: {s1}            -> 1 supplier, key sum 1
    #   hop 1: parts of s1     -> {p1,p2}: 2 parts, key sum 3
    #   hop 2: new suppliers   -> p1:{s1,s2}, p2:{s1} -> {s2}: sum 2
    #   hop 3: new parts of s2 -> {p3}: 1 part, key sum 3
    #   hop 4: suppliers of p3 = {s2}, already seen -> NO hop-4 row
    sf = make_sf(
        tmp_path / "bfs",
        lineitem=[
            {"l_partkey": 1, "l_suppkey": 1},
            {"l_partkey": 2, "l_suppkey": 1},
            {"l_partkey": 1, "l_suppkey": 2},
            {"l_partkey": 3, "l_suppkey": 2},
            {"l_partkey": 4, "l_suppkey": 3},
            # duplicate sale of an existing edge: must not change BFS
            {"l_partkey": 1, "l_suppkey": 1},
        ],
    )
    out = rows_by(run("graph_bfs_hops", spark, sf), "hop")
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (0, 0, 1, 0, 1),
        (1, 2, 0, 3, 0),
        (2, 0, 1, 0, 2),
        (3, 1, 0, 3, 0),
    ]


# ---------------------------------------------------------------------------
# sparse retrieval: BM25 ranking, RBO ranking agreement


@pytest.fixture(scope="module")
def bm25_sf(tmp_path_factory):
    # dl=2 with one hit each of two query terms vs dl=4 with tf=3 of
    # one term: BM25's tf saturation + length normalization must rank
    # doc 1 ABOVE doc 2 even though doc 2 has more total query-term
    # hits (raw tf would rank doc 2 first — the discriminating case).
    # Hand scores (k1=1.2, b=0.75, rational idf (N-df+.5)/(df+.5)):
    #   idf(any term) = (3-1+0.5)/(1+0.5) = 5/3   [df=1 for each, N=3
    #   docs with text... plus doc 4 -> N=4: recomputed below]
    path = tmp_path_factory.mktemp("bm25_fixture")
    make_sf(
        path,
        documents=[
            {"doc_id": 1, "text": "hash merge"},
            {"doc_id": 2, "text": "stream stream stream x"},
            {"doc_id": 3, "text": "y z"},
            {"doc_id": 4, "text": "y z"},
        ],
    )
    return str(path)


def test_bm25_topk_known_values(spark, bm25_sf):
    # N=4, sumdl=2+4+2+2=10, df=1 per term, idf=(4-1+0.5)/1.5=7/3.
    # doc1: dl*N/sumdl=0.8, damp=0.25+0.6=0.85, denom=1+1.02=2.02,
    #       per-term (1*2.2)/2.02*7/3=2.5413..., two terms -> 5.0825
    # doc2: dl*N/sumdl=1.6, damp=0.25+1.2=1.45, denom=3+1.74=4.74,
    #       (3*2.2)/4.74*7/3=3.2489  -> doc1 > doc2 despite tf 2 vs 3
    # docs 3,4: score 0, tie broken by doc_id
    out = rows_by(run("bm25_topk", spark, bm25_sf), "rank")
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (1, 1),
        (2, 2),
        (3, 3),
        (4, 4),
    ]


def test_rank_biased_overlap_known_values(spark, bm25_sf):
    # suffix weights re-derived from the documented closed form:
    # w_d = 9^d * 10^(10-d) * (2520/d), suffix(m) = sum_{d=m..10} w_d
    w = [9**d * 10 ** (10 - d) * (2520 // d) for d in range(1, 11)]
    suffix = [sum(w[m:]) for m in range(10)]
    # BM25 top-10: [1,2,3,4] (test above); TF top-10 by total query tf
    # (doc1=2, doc2=3, doc3=doc4=0, ties by id): [2,1,3,4].
    # maxrank per matched doc (bm25 rank vs tf rank):
    #   doc1 max(1,2)=2; doc2 max(2,1)=2; doc3 max(3,3)=3; doc4 4
    expected = suffix[1] + suffix[1] + suffix[2] + suffix[3]
    out = run("rank_biased_overlap_exact", spark, bm25_sf)
    assert [tuple(r) for r in out.itertuples(index=False)] == [(4, expected)]


# ---------------------------------------------------------------------------
# collocation PMI and Kneser-Ney continuation counts


def test_collocation_pmi_known_values(spark, tmp_path):
    # doc1 = "a b" * 25 -> bigrams (a,b) x25, (b,a) x24; doc2 = "a c".
    # unigrams: a=26, b=25, c=1; N=52 tokens. min-count 20 keeps only
    # (a,b) and (b,a):
    #   lift(a,b) = 25*52/(26*25) = 2.0 exactly
    #   lift(b,a) = 24*52/(25*26) = 48/25 = 1.92 exactly
    sf = make_sf(
        tmp_path / "pmi",
        documents=[
            {"doc_id": 1, "text": " ".join(["a", "b"] * 25)},
            {"doc_id": 2, "text": "a c"},
        ],
    )
    out = run("collocation_pmi", spark, sf)
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        ("a", "b", 25, 26, 25, 2.0),
        ("b", "a", 24, 25, 26, 1.92),
    ]


def test_kneser_ney_continuation_known_values(spark, tmp_path):
    # docs: "a b", "b c", "a c", "a b" -> bigram TYPES {(a,b),(b,c),
    # (a,c)} (the repeat of "a b" must NOT count twice — type counts,
    # the heart of KN). unigram tokens: a=3, b=3, c=2.
    #   N1+(.w): b <- {a} = 1; c <- {b,a} = 2; a = 0
    #   N1+(w.): a -> {b,c} = 2; b -> {c} = 1; c = 0
    #   |bigram types| = 3; cont_permille = 1000*nl // 3
    sf = make_sf(
        tmp_path / "kn",
        documents=[
            {"doc_id": 1, "text": "a b"},
            {"doc_id": 2, "text": "b c"},
            {"doc_id": 3, "text": "a c"},
            {"doc_id": 4, "text": "a b"},
        ],
    )
    out = rows_by(run("kneser_ney_continuation", spark, sf), "tok")
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        ("a", 3, 0, 2, 0),
        ("b", 3, 1, 1, 333),
        ("c", 2, 2, 0, 666),
    ]


# ---------------------------------------------------------------------------
# dedup ratio formulas: word-5-gram Jaccard and containment


W10 = " ".join(f"w{i}" for i in range(1, 11))  # w1..w10: 6 shingles


@pytest.fixture(scope="module")
def shingle_sf(tmp_path_factory):
    path = tmp_path_factory.mktemp("shingle_fixture")
    make_sf(
        path,
        documents=[
            # doc1 and doc2 differ only in the last word: shingle sets
            # share positions 1-5 of 6 -> |A∩B|=5, |A∪B|=7
            {"doc_id": 1, "text": W10},
            {"doc_id": 2, "text": " ".join(W10.split()[:9]) + " x"},
            # doc3 shares exactly ONE shingle (w1..w5) with docs 1,2:
            # jaccard 1/11 — must be filtered by the 0.6 threshold
            {"doc_id": 3, "text": "w1 w2 w3 w4 w5 y1 y2 y3 y4 y5"},
            # doc4 disjoint vocabulary: no candidate pair at all
            {"doc_id": 4, "text": " ".join(f"z{i}" for i in range(1, 11))},
        ],
    )
    return str(path)


def test_dedup_ngram_jaccard_known_values(spark, shingle_sf):
    out = run("dedup_ngram_jaccard", spark, shingle_sf)
    # only (1,2) clears 0.6: jaccard = 5/7 exactly (int/int in double)
    assert [tuple(r) for r in out.itertuples(index=False)] == [(1, 2, 5.0 / 7.0)]


@pytest.fixture(scope="module")
def containment_sf(tmp_path_factory):
    # doc1 (6 words, 2 shingles) is FULLY contained in doc2 (10 words,
    # 6 shingles): C(1->2) = 2/2 = 1.0 but jaccard = 2/6 = 0.33 —
    # the asymmetric case containment exists to catch.  C(2->1) = 2/6
    # stays under the 0.8 threshold, so only one direction is emitted.
    path = tmp_path_factory.mktemp("containment_fixture")
    make_sf(
        path,
        documents=[
            {"doc_id": 1, "text": " ".join(W10.split()[:6])},
            {"doc_id": 2, "text": W10},
        ],
    )
    return str(path)


def test_dedup_containment_known_values(spark, containment_sf):
    out = run("dedup_containment_ngram", spark, containment_sf)
    assert [tuple(r) for r in out.itertuples(index=False)] == [(1, 2, 1.0)]
    # jaccard on the same corpus emits NOTHING (2/6 < 0.6): the
    # asymmetry claim in the containment docstring, pinned
    assert len(run("dedup_ngram_jaccard", spark, containment_sf)) == 0


def test_dedup_containment_capped_matches_exact_below_cap(spark, containment_sf):
    # every shingle here has df <= 2, far under the df cap: the capped
    # twin must agree with the exact face bit-for-bit
    out = run("dedup_containment_capped", spark, containment_sf)
    assert [tuple(r) for r in out.itertuples(index=False)] == [(1, 2, 1.0)]


# ---------------------------------------------------------------------------
# tf-idf scores and the integer-weight EWMA


def test_tfidf_top_terms_known_values(spark, tmp_path):
    # doc1 = "a a b", doc2 = "b c": n_docs=2, df(a)=1, df(b)=2, df(c)=1
    #   doc1: a -> 2*ln(2) = 1.386294 (6dp), b -> 1*ln(1) = 0
    #   doc2: c -> ln(2) = 0.693147, b -> 0
    sf = make_sf(
        tmp_path / "tfidf",
        documents=[
            {"doc_id": 1, "text": "a a b"},
            {"doc_id": 2, "text": "b c"},
        ],
    )
    out = rows_by(run("tfidf_top_terms", spark, sf), "doc_id", "token")
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (1, "a", round(2 * math.log(2), 6)),
        (1, "b", 0.0),
        (2, "b", 0.0),
        (2, "c", round(math.log(2), 6)),
    ]


def test_ewma_halflife_known_values(spark, tmp_path):
    # alpha=1/2 EWMA, truncated (not padded) at the partition head:
    #   e1: 1.0
    #   e2: (1/2*2 + 1/4*1) / (3/4)          = 5/3
    #   e3: (1/2*4 + 1/4*2 + 1/8*1) / (7/8)  = 2.625/0.875 = 3.0 exact
    # (integer form: num/den with num = sum(cents*2^(15-j)), den =
    # 100*(65536 - 2^(16-rn)) — both exact BIGINTs, one IEEE divide)
    sf = make_sf(
        tmp_path / "ewma",
        events=[
            {"event_id": 1, "user_id": 1, "ts": "2024-01-01", "value": 1.0},
            {"event_id": 2, "user_id": 1, "ts": "2024-01-02", "value": 2.0},
            {"event_id": 3, "user_id": 1, "ts": "2024-01-03", "value": 4.0},
        ],
    )
    out = rows_by(run("ewma_halflife", spark, sf), "event_id")
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (1, 1, 1.0),
        (2, 1, 5 / 3),
        (3, 1, 3.0),
    ]


# ---------------------------------------------------------------------------
# text quality: per-doc stats and the Gopher rule gate


def test_text_stats_known_values(spark, tmp_path):
    # "the cat sat": 11 chars, 3 tokens, avg token len (11-2)/3 = 3.0,
    # one stopword ("the") -> ratio 1/3
    # "to to be": 8 chars, 3 tokens (2 distinct), avg (8-2)/3 = 2.0,
    # two stopword TOKENS ("to" twice; "be" is not in STOPWORDS)
    sf = make_sf(
        tmp_path / "tstats",
        documents=[
            {"doc_id": 1, "text": "the cat sat"},
            {"doc_id": 2, "text": "to to be"},
        ],
    )
    out = rows_by(run("text_stats", spark, sf), "doc_id")
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (1, "en", 11, 3, 3, 3.0, 1, 1 / 3),
        (2, "en", 8, 3, 2, 2.0, 2, 2 / 3),
    ]


def test_gopher_quality_rules_known_values(spark, tmp_path):
    # six docs, each isolating one rule (constants: words in [50,1e5],
    # mean word length in [3,10] as 3n <= chars <= 10n, symbols/words
    # <= 10%, alpha words >= 80%, >= 2 distinct stopwords present):
    ok = "the and " + " ".join(["word"] * 48)  # 50 words AT the lower bound
    docs = [
        {"doc_id": 1, "text": ok},
        # 49 words: fails ONLY word count
        {"doc_id": 2, "text": "the and " + " ".join(["word"] * 47)},
        # 48 x 11-char words: chars 534 > 10*50 -> fails ONLY word len
        {"doc_id": 3, "text": "the and " + " ".join(["abcdefghijk"] * 48)},
        # 6 '#' symbols: 100*6 > 10*50 -> fails ONLY symbol ratio
        {"doc_id": 4, "text": "the and " + " ".join(["word#"] * 6 + ["word"] * 42)},
        # 11 digit-only words: alpha 39/50 = 78% < 80% -> fails ONLY alpha
        {"doc_id": 5, "text": "the and " + " ".join(["123"] * 11 + ["word"] * 37)},
        # no stopwords at all -> fails ONLY stopword presence
        {"doc_id": 6, "text": " ".join(["word"] * 50)},
    ]
    sf = make_sf(tmp_path / "gopher", documents=docs)
    out = rows_by(run("gopher_quality_rules", spark, sf), "doc_id")
    # (doc_id, n_words, n_chars_nospace, r_word_count, r_word_len,
    #  r_symbol_ratio, r_alpha_words, r_stopwords, gopher_pass)
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (1, 50, 3 + 3 + 48 * 4, 1, 1, 1, 1, 1, 1),
        (2, 49, 3 + 3 + 47 * 4, 0, 1, 1, 1, 1, 0),
        (3, 50, 3 + 3 + 48 * 11, 1, 0, 1, 1, 1, 0),
        (4, 50, 3 + 3 + 6 * 5 + 42 * 4, 1, 1, 0, 1, 1, 0),
        (5, 50, 3 + 3 + 11 * 3 + 37 * 4, 1, 1, 1, 0, 1, 0),
        (6, 50, 50 * 4, 1, 1, 1, 1, 0, 0),
    ]
