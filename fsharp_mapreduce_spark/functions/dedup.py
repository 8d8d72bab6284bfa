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

from fsharp_mapreduce_spark.registry import fan_out, register, table

NGRAM = 3
JACCARD_THRESHOLD = 0.5
NUM_PERM = 32
BAND_ROWS = 4  # 32 perms / 4 rows = 8 bands; catches j >= ~0.5 w.h.p.


def shingle_sets(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """(doc_id, shingles: array<string>) — distinct word n-grams of the
    lowercased text. Expression-only.

    Two-step projection ON PURPOSE: ``toks`` must be a real column
    attribute before the shingle transform references it. Higher-order
    functions run on the interpreted (non-codegen) path, which has no
    common-subexpression elimination — if ``split(lower(text))`` were
    inlined, every per-shingle reference would re-tokenize the whole
    document (measured ~50× slowdown). CollapseProject keeps the
    projections separate because the alias is non-cheap and referenced
    more than once."""
    tokd = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    toks = F.col("toks")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )
    # guard: texts shorter than n tokens get an empty shingle set
    shingles = F.when(F.size(toks) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )
    return tokd.select("doc_id", shingles.alias("shingles"))


def exploded_shingles(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    return shingle_sets(docs, n).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )


def hashed_shingle_sets(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """(doc_id, hs: array<bigint>) — each distinct shingle collapsed to
    its xxhash64. One string hash per shingle; everything downstream
    (minhash perms, posting lists, intersections) operates on 8-byte
    ints instead of re-hashing ~25-char strings. Distinct strings map
    to distinct ints w.p. 1-2⁻⁶⁴, so set cardinalities — and therefore
    Jaccard — are preserved."""
    return shingle_sets(docs, n).select(
        "doc_id", F.transform("shingles", lambda s: F.xxhash64(s)).alias("hs")
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
    docs = fan_out(table(spark, sf_dir, "documents"))
    # persist BEFORE the explode: column pruning inlines the shingle
    # projection into Generate, and the generator's child expression is
    # re-evaluated per EMITTED row (measured ~8× the projection cost on
    # the fixture corpus — explode of the inline array 2.1s vs 0.12s
    # off the materialized one). Caching one slim (doc_id, array<long>)
    # row per document also serves the sz lookups for free.
    hsets = hashed_shingle_sets(docs).persist()
    e = hsets.select("doc_id", F.explode("hs").alias("shingle"))
    # per-doc set size straight off the cached array — no shuffle; it
    # feeds BOTH the na and nb lookup joins.
    sz = hsets.select("doc_id", F.size("hs").alias("n"))

    # Pair generation: self-equi-join on the shingle hash, count
    # co-occurrences per ordered pair. The exchange carries 8-byte int
    # keys and the whole join+agg stays inside whole-stage codegen —
    # measured 4-5× faster than a posting-list array expansion, whose
    # nested higher-order exprs run on the interpreted path. The
    # shuffle_hash hint matters twice over: the planner's size estimate
    # would otherwise BROADCAST the exploded corpus (never right for a
    # corpus-sized side, and it re-collects to the driver per run),
    # and the two join inputs are the identical subplan, so the single
    # shuffle is computed once and reused for both sides. Hot shingles
    # are the skew risk at corpus scale; AQE skew-join splitting covers
    # the join, and a stop-shingle cap (drop shingles with >N postings)
    # is the standard upstream guard.
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
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


def minhash_signatures(hsets: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """(doc_id, sig: array<bigint>) — ``num_perm`` multiply-shift
    minhashes per document, vectorized in numpy over Arrow batches.
    Hash family: sig[p] = min_h ((a_p·h + b_p) mod 2⁶⁴) >> 1 with
    fixed odd constants (golden-ratio multiples) — deterministic
    across runs/partitions, positive int64 range. Embarrassingly
    parallel: one dense (num_perm × |shingles|) broadcast per
    document, no shuffle, scales with partition count."""
    from fsharp_mapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(hsets.sparkSession)

    def run(batches):
        import numpy as np
        import pandas as pd

        mask = (1 << 64) - 1
        a = np.array(
            [((0x9E3779B97F4A7C15 * (p + 1)) & mask) | 1 for p in range(num_perm)],
            dtype=np.uint64,
        )
        b = np.array(
            [((0xBF58476D1CE4E5B9 * (p + 7)) & mask) | 1 for p in range(num_perm)],
            dtype=np.uint64,
        )
        for pdf in batches:
            ids, sigs = [], []
            for did, hs in zip(pdf["doc_id"], pdf["hs"]):
                h = np.asarray(hs, dtype=np.int64).view(np.uint64)
                m = a[:, None] * h[None, :] + b[:, None]  # uint64 wraparound
                sig = (m >> np.uint64(1)).min(axis=1).astype(np.int64)
                ids.append(did)
                sigs.append(sig.tolist())
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    return hsets.mapInPandas(run, "doc_id long, sig array<bigint>")


@register("t03_minhash_lsh_pairs", oracle=None, tags=("dedup", "minhash", "lsh"))
def t03_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup pairs, verified with exact Jaccard.

    shingle → 32 minhashes (min of a multiply-shift hash family over
    the hashed-shingle set, numpy-vectorized per Arrow batch) → 8
    bands of 4 → band signature (xxhash64 of the band's minhash
    array) → bucket self-join → exact-Jaccard verification of the
    (tiny) candidate set. Non-SQL-expressible cross-engine (the hash
    families are engine-specific); correctness is pinned by
    tests/test_dedup.py::test_minhash_recall against t02's exact
    output."""
    # fan_out: the corpus arrives as one split at fixture scale; the
    # signature computation is pure CPU and must run partition-parallel.
    docs = fan_out(table(spark, sf_dir, "documents"))

    # Signatures as ONE vectorized Arrow pass (mapInPandas): per
    # document, sig[p] = min over shingles of the multiply-shift hash
    # (a_p·h + b_p) over uint64 wraparound — a (32 × |shingles|) numpy
    # broadcast + min per row, deterministic constants, no shuffle and
    # no 32× row blowup. Replaces an expression fold whose 32-way
    # nested higher-order functions ran on the interpreted path
    # (measured ~10× slower than the Arrow batch on this corpus; the
    # naive explode(perm) → groupBy(doc, perm) shape is worse still —
    # it shuffles |shingles|×32 rows).
    # persist: the band posexplode below would otherwise inline the
    # whole signature stage into its Generate and re-run it once per
    # emitted band (8×), on each side of the self-join.
    sigs = minhash_signatures(
        hashed_shingle_sets(docs).where(F.size("hs") > 0)
    ).persist()
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
        # cached: feeds the cand_ids semi-join AND the verification
        # join — without it the whole signature+banding pipeline runs
        # three times. The pair list is tiny by LSH design.
        .persist()
    )

    # Exact verification on the candidate set only: re-shingle JUST the
    # candidate documents (semi-join before the shingle projection), so
    # the expensive text processing is proportional to |candidates|,
    # not |corpus|. Intersection on hashed shingles ≡ strings.
    cand_ids = (
        candidates.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
        .distinct()
    )
    sets = hashed_shingle_sets(docs.join(cand_ids, "doc_id", "semi"))
    verified = (
        candidates.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("sh_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("sh_b")),
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
    cosine ≥ threshold over the ``embeddings`` table — exact, via
    blocked matrix multiplication (one float64 GEMM per block pair in
    an Arrow batch).

    Scale path at 100 TB: candidate generation first moves to
    hyperplane-LSH bucketing (the s02_knn_lsh machinery) or t03-style
    banding, and the blocked-GEMM stage runs over candidate buckets
    only — exact cosine is always the last word. Block replication is
    the classic O(n·B) blocked-matmul bound; each block pair is an
    independent few-MB dense problem, so the fan-out is embarrassingly
    parallel and no executor ever holds the corpus."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # Blocked all-pairs: split the corpus into √-scale blocks, ship
    # each block PAIR to one Arrow batch, and do the pairwise cosine
    # as one numpy float64 GEMM per pair. Every row is replicated
    # B times (the blocked-matmul replication bound), each block pair
    # is a few-MB dense problem, and no executor ever sees the whole
    # corpus. This beats the per-pair expression fold by >10× — higher-
    # order exprs are interpreted per element; GEMM is vectorized.
    block = 1024
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    n_blocks = max(1, -(-n // block))

    # row in block i serves side A of pairs (i, q>=i) and side B of
    # pairs (p<i, i); pair (i, i) gets one copy handled in-UDF.
    def pair_targets(i_col):
        a_side = F.transform(
            F.sequence(i_col, F.lit(n_blocks - 1)),
            lambda q: F.struct(i_col.alias("p"), q.alias("q")),
        )
        b_side = F.when(
            i_col > 0,
            F.transform(
                F.sequence(F.lit(0), i_col - 1),
                lambda p: F.struct(p.alias("p"), i_col.alias("q")),
            ),
        ).otherwise(F.array().cast("array<struct<p:int,q:int>>"))
        return F.concat(a_side, b_side)

    blk = F.floor(F.col("vec_id") / block).cast("int")
    routed = emb.select(
        "vec_id", "embedding", F.explode(pair_targets(blk)).alias("pq")
    ).select("vec_id", "embedding", F.col("pq.p").alias("p"), F.col("pq.q").alias("q"))

    threshold, bs = COSINE_DUP_THRESHOLD, block

    def block_pair_cosine(pdf):
        import numpy as np
        import pandas as pd

        p, q = int(pdf["p"].iloc[0]), int(pdf["q"].iloc[0])
        ids = pdf["vec_id"].to_numpy()
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        if p == q:
            sims = unit @ unit.T
            ia, ib = np.triu_indices(len(ids), k=1)
        else:
            a_mask = (ids // bs) == p
            ua, ub = unit[a_mask], unit[~a_mask]
            ids_a, ids_b = ids[a_mask], ids[~a_mask]
            sims = ua @ ub.T
            ia, ib = np.nonzero(sims >= threshold)
        if p == q:
            keep = sims[ia, ib] >= threshold
            ia, ib = ia[keep], ib[keep]
            va, vb, s = ids[ia], ids[ib], sims[ia, ib]
        else:
            va, vb, s = ids_a[ia], ids_b[ib], sims[ia, ib]
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "sim_raw": s})

    pairs = routed.groupBy("p", "q").applyInPandas(
        block_pair_cosine, "vec_a long, vec_b long, sim_raw double"
    )
    return pairs.select("vec_a", "vec_b", F.round("sim_raw", 6).alias("sim"))


@register("t04_simhash", oracle=None, tags=("dedup", "simhash"))
def t04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: each token votes ±1 on each bit of
    its xxhash64; the signature packs the sign of the per-bit sums.
    Near-duplicates land within small Hamming distance (pinned by
    tests/test_dedup.py::test_simhash_near_dups). Pure expression
    fold — no Python, no shuffle except none (it's a projection)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
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
