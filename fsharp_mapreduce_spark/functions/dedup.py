"""Deduplication operators over ``documents`` (north-star extension):
exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB):
- exact dedup is a hash-aggregate on a digest — one shuffle, AQE
  handles skew on pathological duplicate counts;
- n-gram Jaccard is exact but O(pairs sharing a shingle) — correct at
  any scale but quadratic in hot shingles; it is the *verifier*;
- MinHash+LSH is the scale path: candidate generation touches only
  documents sharing a (band, band-signature) bucket, then candidates
  are verified with exact Jaccard. Signatures/bands are pure
  expressions on xxhash64 — no Python, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fsharp_mapreduce_spark.registry import register, table

NGRAM = 3
JACCARD_THRESHOLD = 0.5
NUM_PERM = 32
BAND_ROWS = 4  # 32 perms / 4 rows = 8 bands; catches j >= ~0.5 w.h.p.


def shingle_sets(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """(doc_id, shingles: array<string>) — distinct word n-grams of the
    lowercased text. Expression-only."""
    toks = F.split(F.lower(F.col("text")), " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        )
    )
    # guard: texts shorter than n tokens get an empty shingle set
    shingles = F.when(F.size(toks) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )
    return docs.select("doc_id", shingles.alias("shingles"))


def exploded_shingles(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    return shingle_sets(docs, n).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )


@register(
    "t01_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    tags=("dedup", "exact"),
)
def t01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content digest, keep the smallest doc_id.
    The digest (not the raw text) is the shuffle key, so at 100 TB the
    exchange carries 32-byte keys instead of document bodies."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").cast("bigint").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


_NGRAM_ORACLE = f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(ws) >= {NGRAM} THEN
               [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                for i in generate_series(1, len(ws) - {NGRAM - 1})]
             ELSE [] END) AS shs
      FROM w
    ),
    e AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    sz AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
    FROM pairs
    JOIN sz sa ON doc_a = sa.doc_id
    JOIN sz sb ON doc_b = sb.doc_id
    WHERE shared * 1.0 / (sa.n + sb.n - shared) >= {JACCARD_THRESHOLD}
"""


@register("t02_ngram_jaccard_pairs", oracle=_NGRAM_ORACLE, tags=("dedup", "jaccard"))
def t02_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate pairs by word-{3}-gram Jaccard ≥ {0.5}:
    explode distinct shingles, self-join on shingle, count shared,
    Jaccard from set sizes. The exact (non-LSH) formulation — the
    ground truth the LSH variant is measured against."""
    docs = table(spark, sf_dir, "documents")
    e = exploded_shingles(docs)
    sz = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    # Pair generation WITHOUT a self-join: group each shingle's posting
    # list, expand ordered pairs with a nested array comprehension,
    # then count co-occurrences. Two shuffles total (shingle, pair) vs
    # the self-join's three; the posting-list expansion is the exact
    # same O(d²)-per-hot-shingle work the join would do, minus the
    # duplicated exchange of the probe side.
    postings = (
        e.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    pair_list = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    pairs = (
        postings.select(F.explode(pair_list).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    # sz is one row per document: small at bench SF (AQE switches these
    # joins to broadcast at runtime), shuffle-join at corpus scale — so
    # no forced broadcast hint here.
    ja = (
        pairs.join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard_raw", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")))
        .where(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
    )
    return ja.select("doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard"))


@register("t03_minhash_lsh_pairs", oracle=None, tags=("dedup", "minhash", "lsh"))
def t03_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup pairs, verified with exact Jaccard.

    shingle → 32 minhashes (min over xxhash64(perm, shingle)) → 8
    bands of 4 → band signature (xxhash64 of the band's minhash
    array) → bucket self-join → exact-Jaccard verification of the
    (tiny) candidate set. Non-SQL-expressible cross-engine (xxhash64
    is Spark-specific); correctness is pinned by
    tests/test_dedup.py::test_minhash_recall against t02's exact
    output."""
    docs = table(spark, sf_dir, "documents")

    # Whole signature as ONE expression fold per document: a running
    # elementwise-min of the 32 permutation hashes across the shingle
    # array. Zero shuffles and no 32× row blowup — the projection runs
    # inside the scan stage (contrast the naive explode(perm) →
    # groupBy(doc, perm) shape, which shuffles |shingles|×32 rows).
    max_long = (1 << 63) - 1
    sig = F.aggregate(
        F.col("shingles"),
        F.array_repeat(F.lit(max_long), NUM_PERM),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(NUM_PERM - 1)),
                lambda p: F.xxhash64(p, s),
            ),
            lambda a, b: F.least(a, b),
        ),
    )
    sigs = shingle_sets(docs).where(F.size("shingles") > 0).select(
        "doc_id", sig.alias("sig")
    )
    # 8 bands of 4 minhashes; band signature = hash of the slice.
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(NUM_PERM // BAND_ROWS - 1)),
        lambda b: F.xxhash64(b, F.slice(F.col("sig"), b * BAND_ROWS + 1, BAND_ROWS)),
    )
    bands = sigs.select(
        "doc_id",
        F.posexplode(band_arr).alias("band", "band_sig"),
    )
    ba = bands.alias("ba")
    bb = bands.alias("bb")
    candidates = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.band_sig") == F.col("bb.band_sig"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
        .distinct()
    )

    # Exact verification on the candidate set only.
    sets = shingle_sets(docs)
    verified = (
        candidates.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")),
            "doc_b",
        )
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard_raw",
            F.col("shared")
            / (F.size("sh_a") + F.size("sh_b") - F.col("shared")),
        )
        .where(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
    )
    return verified.select("doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard"))


# Calibrated to the synthetic fixture: its embeddings are random, so
# the max pairwise cosine is ~0.5-0.6 — 0.4 yields a real (non-empty)
# near-dup set to verify against. On a production corpus this is the
# usual 0.95-0.99.
COSINE_DUP_THRESHOLD = 0.4

# Oracle reuses the similarity module's sequential-fold cosine SQL so
# both engines execute the identical IEEE operation order (bit-equal
# scores, not merely close).
from fsharp_mapreduce_spark.functions.similarity import _cosine_sql  # noqa: E402

_NEARDUP_ORACLE = f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_cosine_sql('a.embedding', 'b.embedding')}, 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= {COSINE_DUP_THRESHOLD}
"""


@register(
    "t09_embedding_neardup",
    oracle=_NEARDUP_ORACLE,
    tags=("dedup", "embedding", "cosine"),
)
def t09_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every (a < b) pair with
    cosine ≥ threshold over the ``embeddings`` table — the exact verifier
    formulation (all-pairs within a range-partitioned self-join).

    Scale path at 100 TB: candidate generation moves to hyperplane-LSH
    bucketing (the s02_knn_lsh machinery) or t03-style banding, and
    THIS query becomes the verify stage over candidates only — exact
    cosine is always the last word. The self-join here shuffles both
    sides on a block key (vec_id ranges) so no executor ever holds the
    full corpus."""
    from fsharp_mapreduce_spark.functions.similarity import cosine

    emb = table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim_raw", cosine(F.col("ea"), F.col("eb")))
        .where(F.col("sim_raw") >= COSINE_DUP_THRESHOLD)
    )
    return pairs.select("vec_a", "vec_b", F.round("sim_raw", 6).alias("sim"))


@register("t04_simhash", oracle=None, tags=("dedup", "simhash"))
def t04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: each token votes ±1 on each bit of
    its xxhash64; the signature packs the sign of the per-bit sums.
    Near-duplicates land within small Hamming distance (pinned by
    tests/test_dedup.py::test_simhash_near_dups). Pure expression
    fold — no Python, no shuffle except none (it's a projection)."""
    docs = table(spark, sf_dir, "documents")
    # counts[j] = sum over tokens of (bit j of xxhash64(token) ? +1 : -1)
    counts = F.expr(
        """
        aggregate(
          split(lower(text), ' '),
          array_repeat(0L, 64),
          (acc, tok) -> zip_with(
            acc,
            transform(sequence(0, 63),
                      j -> IF((shiftright(xxhash64(tok), j) & 1) = 1, 1L, -1L)),
            (a, b) -> a + b)
        )
        """
    )
    sig = F.expr(
        """
        aggregate(
          sequence(0, 63),
          0L,
          (acc, j) -> acc + IF(element_at(counts, j + 1) > 0, shiftleft(1L, j), 0L)
        )
        """
    )
    return (
        docs.select("doc_id", counts.alias("counts"))
        .select("doc_id", sig.alias("simhash"))
    )
