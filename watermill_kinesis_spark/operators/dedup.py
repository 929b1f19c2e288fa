"""Deduplication operators — exact and near-dup — over ``documents`` /
``embeddings`` (north-star LLM-pipeline layer).

Scale design (the whole point of these):
- NOTHING does an all-pairs O(n²) comparison except the oracle-verified
  exact-cosine variant, which is the *correctness baseline* for the LSH
  paths; candidate generation is always blocking/bucketing:
  shared-shingle join (`dedup_ngram_jaccard`), MinHash band buckets
  (`dedup_fuzzy_minhash`), SimHash chunk buckets (`dedup_simhash`).
  Bucket joins shuffle only (key, doc_id) pairs — bytes per row, not
  documents.
- Shingling/hashing is all JVM higher-order functions (transform/
  aggregate/xxhash64) — no Python in the hot path.
- Pair canonicalization (doc_a < doc_b) before the verify join halves
  the candidate set and makes results deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from watermill_kinesis_spark.registry import query
from watermill_kinesis_spark.sources.tables import load_table

#: shingle width for near-dup candidate generation
SHINGLE_N = 5
#: MinHash signature: B bands × R rows
MINHASH_B, MINHASH_R = 16, 8
#: Mersenne prime 2^31-1: constants and reduced hashes are < 2^31, so
#: a·h + b < 2^62 — modular arithmetic never overflows a Spark long
MH_PRIME = (1 << 31) - 1


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _shingles(col, n: int = SHINGLE_N):
    """Distinct word n-gram shingles of a text column, via sequence +
    transform (JVM-side; one pass, no explode until the caller asks)."""
    toks = F.split(col, " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


# ---------------------------------------------------------------------------
# exact


@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents)
    WHERE rn = 1
    """,
    tags=("dedup", "llm-pipeline"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the lowest doc_id per identical text. One
    hash shuffle on the content key; at 100 TB you'd key on
    ``xxhash64(text)`` instead of the full text to shrink shuffle bytes
    — semantics identical, collisions ~2^-64."""
    d = _docs(spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("text").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (oracle-verified near-dup baseline)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(0, greatest(len(string_split(text, ' ')) - {SHINGLE_N}, 0) + 1),
                   i -> array_to_string(list_slice(string_split(text, ' '),
                                                   CAST(i + 1 AS INT),
                                                   CAST(i + {SHINGLE_N} AS INT)), ' ')
               )) AS shingles
        FROM documents),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
    ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
    SELECT p.doc_a, p.doc_b,
           CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE CAST(p.n_common AS DOUBLE) / (sa.n + sb.n - p.n_common) >= 0.6
    """,
    tags=("dedup", "llm-pipeline"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-5-gram Jaccard ≥ 0.6, with
    candidate generation by shared-shingle inverted index join — the
    MapReduce dedup pattern: only docs sharing ≥1 shingle ever meet, so
    cost is Σ(posting-list²) not n². Jaccard is int/int in double —
    exact, order-independent, oracle-stable."""
    d = _docs(spark, sf_dir).select("doc_id", _shingles(F.col("text")).alias("shingles"))
    d = d.withColumn("n", F.size("shingles"))
    sizes = d.select("doc_id", "n")
    ex = d.select("doc_id", F.explode("shingles").alias("shingle"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.6)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the 100 TB near-dup path)


@query("dedup_fuzzy_minhash", tags=("dedup", "lsh", "llm-pipeline"))
def dedup_fuzzy_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128) + LSH banding near-dup, end-to-end in built-in
    expressions:

    shingle → xxhash64 → 128 universal hashes ``(aᵢ·h+bᵢ) mod p`` →
    per-doc min (the signature) → 16 bands × 8 rows → band-hash bucket
    join → candidate pairs → exact Jaccard verify ≥ 0.6.

    With B=16, R=8 the S-curve puts pair-catch probability at ~50% at
    J≈0.7 and ≥97% at J≈0.85 — tuned for "catch real near-dups, don't
    flood the verifier". Candidates shuffle as (bucket, doc_id) longs;
    signatures never leave their partition unexploded. Rows-only check:
    the signature depends on Spark's xxhash64, which a SQL oracle can't
    reproduce; the oracle-verified `dedup_ngram_jaccard` covers the
    same pairs exactly."""
    n_hashes = MINHASH_B * MINHASH_R
    # deterministic universal-hash family (seeded LCG constants)
    rnd = []
    state = 0x9E3779B97F4A7C15
    for _ in range(2 * n_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        rnd.append(1 + state % (MH_PRIME - 1))
    a_consts, b_consts = rnd[:n_hashes], rnd[n_hashes:]

    def minhash(i: int):
        a_i, b_i = F.lit(a_consts[i]), F.lit(b_consts[i])
        return F.array_min(
            F.transform(F.col("h"), lambda h: (a_i * h + b_i) % MH_PRIME)
        )

    d = _docs(spark, sf_dir).select(
        "doc_id", _shingles(F.col("text")).alias("shingles")
    )
    # xxhash64 reduced into [0, p): keeps every later product in range
    hashes = F.transform(
        F.col("shingles"), lambda s: F.pmod(F.xxhash64(s), F.lit(MH_PRIME))
    )
    sig = F.array(*[minhash(i) for i in range(n_hashes)])
    signed = (
        d.withColumn("h", hashes)
        .where(F.size("h") > 0)
        .select("doc_id", "shingles", sig.alias("sig"))
    )
    bands = signed.select(
        "doc_id",
        "shingles",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(band), F.slice("sig", band * MINHASH_R + 1, MINHASH_R)
                    )
                    for band in range(MINHASH_B)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = bands.select(
        F.col("band"),
        F.col("bucket"),
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
    )
    b = bands.select(
        F.col("band"),
        F.col("bucket"),
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.6)
    )


@query("dedup_simhash", tags=("dedup", "lsh", "llm-pipeline"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64) near-dup: per-token xxhash64 votes ±1 on each of 64
    bits; the sign vector is the fingerprint. Pairs are blocked on
    16-bit chunks (any pair within Hamming distance 3 shares ≥1 of 4
    chunks — pigeonhole), then verified by exact Hamming ≤ 3 via
    ``bit_count(xor)``. Fingerprints are 1 long per doc: the shuffle is
    16 bytes/row regardless of document size."""
    d = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("toks"))
    tok_hash = F.transform(F.array_distinct("toks"), lambda t: F.xxhash64(t))

    def bitmask(b: int) -> int:
        return (1 << b) if b < 63 else -(1 << 63)

    def vote(b: int):
        """sign of Σ_tokens (bit b set ? +1 : -1)"""
        mask = F.lit(bitmask(b))
        return F.aggregate(
            F.col("th"),
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    fp = F.aggregate(
        F.array(
            *[
                F.when(vote(b) > 0, F.lit(bitmask(b))).otherwise(F.lit(0).cast("bigint"))
                for b in range(64)
            ]
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    fps = d.withColumn("th", tok_hash).select("doc_id", fp.alias("fp"))
    chunks = fps.select(
        "doc_id",
        "fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("fp", 16 * c).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.select(
        "chunk_idx", "chunk", F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a")
    )
    b = chunks.select(
        "chunk_idx", "chunk", F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b")
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= 3)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (exact baseline; LSH path in similarity.py)


@query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
    tags=("dedup", "embedding", "llm-pipeline"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup: all pairs with cosine ≥ 0.4 (threshold
    sits in the testdata's top-0.1% of pair similarities). This is
    the *correctness baseline* (and the oracle anchor) for the LSH path
    in `similarity_ann_lsh`; at 100 TB you run the bucketed variant and
    sample-audit against this one. Pair ids only — cosine crosses the
    wire as a predicate, never as a float column, so the hash compare
    can't flake on 1-ulp differences."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    cos = dot / (norm(F.col("ea")) * norm(F.col("eb")))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .where(cos >= 0.4)
        .select("vec_a", "vec_b")
    )
