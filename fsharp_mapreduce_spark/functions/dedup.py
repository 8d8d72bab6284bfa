"""Deduplication operators over ``documents`` (north-star extension):
exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB):
- exact dedup is a hash-aggregate on a digest — one shuffle, AQE
  handles skew on pathological duplicate counts;
- n-gram Jaccard is exact but O(pairs sharing a shingle) — correct at
  any scale but quadratic in hot shingles; it is the *verifier*;
- MinHash+LSH is the scale path: candidate generation touches only
  documents sharing a (band, band-signature) bucket, then candidates
  are verified with exact Jaccard. Signatures/bands use a
  cross-engine hash family (md5-sliced shingle ints + multiply-mod
  perms — int64-safe in Spark, numpy and DuckDB alike), so the DuckDB
  oracle replays them value-for-value — no Python driver state, no
  engine-specific hashing;
- hot shingles (boilerplate in >cap documents) are dropped from
  candidate generation (STOP_SHINGLE_MAX_POSTINGS) — verification
  still scores full sets, so emitted Jaccards stay exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fsharp_mapreduce_spark.registry import (
    fan_out,
    register,
    scoped_broadcast,
    scoped_persist,
    table,
)

NGRAM = 3
JACCARD_THRESHOLD = 0.5
NUM_PERM = 32
# 32 perms / 2 rows = 16 bands: the (r, L) S-curve knee sits at
# (1/L)^(1/r) = 0.25, comfortably below the 0.5 Jaccard threshold —
# recall ≥ 0.99 at j = 0.5 and ~1.0 at j ≥ 0.7. (8 bands of 4 put the
# knee at 0.59: only ~0.40 recall AT the threshold.) The extra
# candidates wider bands admit are cheap: they're exactly verified and
# dissimilar pairs match a 2-row band with probability j², negligible
# for the j ≈ 0 bulk of a real corpus.
BAND_ROWS = 2
# Stop-shingle cap: a shingle appearing in more than this many
# documents is dropped from CANDIDATE GENERATION (its postings alone
# would emit O(cap²) pairs — boilerplate headers/footers are the
# classic 100 TB skew killer). Verification still uses the FULL
# shingle sets, so the Jaccard of every emitted pair stays exact; the
# only effect is that a pair connected solely through stop-shingles is
# not surfaced — the standard web-dedup trade. Inert on the fixture
# (max document frequency ≪ 1024); the skew-corpus test pins the
# bounded-pairs behavior.
STOP_SHINGLE_MAX_POSTINGS = 1024


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


PARA_TOKENS = 16  # tokens per "paragraph" block (fixture docs are
# single-line token streams — no newline boundaries — so the exact
# substring-dedup unit is a fixed disjoint token block; a production
# corpus would pass a newline/blank-line segmenter instead)


def paragraph_blocks(docs: DataFrame, para_tokens: int = PARA_TOKENS) -> DataFrame:
    """(doc_id, bh): one md5 digest per disjoint {PARA_TOKENS}-token
    block of the lowercased text, one row per block POSITION (a block
    repeated inside a doc emits multiple rows). Expression-only map
    work — the Generate is the only per-row cost."""
    ws = F.split(F.lower(F.col("text")), " ")
    n_blocks = F.ceil(F.size("ws") / F.lit(para_tokens)).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.array_join(F.slice("ws", i * para_tokens + 1, para_tokens), " "),
    )
    return docs.select("doc_id", ws.alias("ws")).select(
        "doc_id", F.explode(blocks).alias("block")
    ).select("doc_id", F.md5("block").alias("bh"))


def paragraph_dedup(docs: DataFrame, para_tokens: int = PARA_TOKENS) -> DataFrame:
    """Exact substring-level dedup (the Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" class, at paragraph
    granularity): per document, the fraction of its text blocks that
    appear verbatim in at least one OTHER document. t01 only catches
    whole-document copies; this catches the far more common partial
    copy — syndicated passages, quoted chunks, licensing boilerplate.

    Plan at 100 TB (t01's digest-exchange shape throughout): the
    shuffle keys are 32-byte md5 digests, never block text. One
    exchange keyed (doc_id, bh) collapses within-doc repeats with
    map-side combine; a second keyed on bh computes each block's
    document frequency (partial agg — the hot-block combiner); the
    join back to per-doc rows re-uses the bh key; the final per-doc
    roll-up is a keyed aggregate. No self-join, no pair explosion —
    cost is linear in corpus blocks regardless of duplication skew."""
    b = paragraph_blocks(docs, para_tokens)
    per_doc_block = b.groupBy("doc_id", "bh").agg(
        F.count(F.lit(1)).alias("pos_cnt")
    )
    per_hash = per_doc_block.groupBy("bh").agg(F.count(F.lit(1)).alias("n_docs"))
    dup_pos = F.when(F.col("n_docs") >= 2, F.col("pos_cnt")).otherwise(F.lit(0))
    return (
        per_doc_block.join(per_hash, "bh")
        .groupBy("doc_id")
        .agg(
            F.sum("pos_cnt").cast("bigint").alias("n_blocks"),
            F.sum(dup_pos).cast("bigint").alias("n_dup_blocks"),
            F.round(F.sum(dup_pos) / F.sum("pos_cnt"), 6).alias("dup_fraction"),
        )
    )


@register(
    "t26_paragraph_dedup",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    b AS (
      SELECT doc_id,
             [list_aggregate(ws[i * {PARA_TOKENS} + 1 : i * {PARA_TOKENS} + {PARA_TOKENS}], 'string_agg', ' ')
              for i in generate_series(0, CAST(ceil(len(ws) * 1.0 / {PARA_TOKENS}) AS BIGINT) - 1)] AS blocks
      FROM w
    ),
    e AS (SELECT doc_id, md5(unnest(blocks)) AS bh FROM b),
    pdb AS (SELECT doc_id, bh, COUNT(*) AS pos_cnt FROM e GROUP BY 1, 2),
    ph AS (SELECT bh, COUNT(*) AS n_docs FROM pdb GROUP BY 1)
    SELECT doc_id,
           CAST(SUM(pos_cnt) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN n_docs >= 2 THEN pos_cnt ELSE 0 END) AS BIGINT) AS n_dup_blocks,
           ROUND(SUM(CASE WHEN n_docs >= 2 THEN pos_cnt ELSE 0 END) * 1.0
                 / SUM(pos_cnt), 6) AS dup_fraction
    FROM pdb JOIN ph USING (bh)
    GROUP BY 1
    """,
    tags=("dedup", "exact", "paragraph"),
)
def t26_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact paragraph-level dedup — the canonical training-set
    substring operator between t01 (whole-doc exact) and t22
    (approximate containment): disjoint {PARA_TOKENS}-token blocks,
    md5 digests, per-doc duplicated-block fraction. See
    `paragraph_dedup` for the 100 TB plan analysis. Full value-hash
    oracle (both engines hash identical block strings)."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    return paragraph_dedup(docs)


# Verification (VERDICT r6 #3 — the interpreted per-candidate
# list_intersect fold exceeded a 10-minute budget at sf0.5): shared
# count = kept co-occurrence count (`ks`, the group-by of the same
# self-join that defines candidacy) + hot-shingle remainder (`hr`,
# candidates × the tiny hot postings) — exactly how the engine patches
# the cap, and identical to len(list_intersect(…)) on the distinct
# per-doc lists since e = kept ∪ hot postings disjointly. The naive
# alternative (candidates × FULL posting lists) is Σ|shs| over
# candidates ≈ billions of join rows at sf0.5; this form caps the
# expansion at the pair-expansion bound the engine already obeys.
# MATERIALIZED pins shared CTEs: DuckDB inlines plain CTEs per
# consumer.
def _t02_oracle(slice_mod: int | None = None, residue: int = 0) -> str:
    """t02's oracle SQL, optionally restricted to a doc_a residue
    slice (the t22 sampled-slice protocol, VERDICT r8 #4): with
    ``slice_mod`` the ks self-join keeps only doc_a % mod = residue
    LEFT endpoints while every upstream stage (postings, hot set,
    sizes) still covers the FULL corpus — so a hash match against the
    engine's full run filtered to the same slice is exact value
    evidence under the full-scale candidate structure. The slice also
    divides the join mass Σdf² by ~mod, which is what makes the
    sf2.0 replay (~982M pair rows unsliced) tractable."""
    ks_slice = (
        f"AND a.doc_id % {slice_mod} = {residue}" if slice_mod else ""
    )
    return f"""
    WITH w AS MATERIALIZED (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(CASE WHEN len(ws) >= {NGRAM} THEN
               [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                for i in generate_series(1, len(ws) - {NGRAM - 1})]
             ELSE [] END) AS shs
      FROM w
    ),
    e AS MATERIALIZED (SELECT doc_id, unnest(shs) AS s FROM sh),
    hot AS MATERIALIZED (
      SELECT s FROM e GROUP BY s
      HAVING count(*) > {STOP_SHINGLE_MAX_POSTINGS}
    ),
    kept AS MATERIALIZED (SELECT e.doc_id, e.s FROM e ANTI JOIN hot USING (s)),
    ks AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS kept_shared
      FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
           {ks_slice}
      GROUP BY 1, 2
    ),
    he AS MATERIALIZED (SELECT e.doc_id, e.s FROM e SEMI JOIN hot USING (s)),
    hr AS (
      SELECT k.doc_a, k.doc_b, CAST(COUNT(*) AS BIGINT) AS hot_shared
      FROM ks k
      JOIN he ha ON ha.doc_id = k.doc_a
      JOIN he hb ON hb.doc_id = k.doc_b AND hb.s = ha.s
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, len(shs) AS n FROM sh),
    v AS (
      SELECT k.doc_a, k.doc_b,
             k.kept_shared + COALESCE(h.hot_shared, 0) AS shared
      FROM ks k LEFT JOIN hr h ON k.doc_a = h.doc_a AND k.doc_b = h.doc_b
    )
    SELECT doc_a, doc_b,
           ROUND(shared * 1.0 / (za.n + zb.n - shared), 6) AS jaccard
    FROM v
    JOIN sz za ON doc_a = za.doc_id
    JOIN sz zb ON doc_b = zb.doc_id
    WHERE shared * 1.0 / (za.n + zb.n - shared) >= {JACCARD_THRESHOLD}
"""


_NGRAM_ORACLE = _t02_oracle()


def shingle_candidate_pairs(hsets: DataFrame, cap: int) -> DataFrame:
    """(doc_a, doc_b) distinct pairs sharing ≥1 non-hot shingle.

    Stop-shingle guard: document frequency per shingle (one partial-
    aggregated exchange on 8-byte keys), then anti-join the hot set
    out of the postings. The hot set is tiny by construction (only
    shingles in >cap docs), so the anti-join broadcasts.

    Candidate generation: self-equi-join on the shingle hash. The
    exchange carries 8-byte int keys and the join stays inside
    whole-stage codegen — measured 4-5× faster than a posting-list
    array expansion, whose nested higher-order exprs run on the
    interpreted path. The shuffle_hash hint matters twice over: the
    planner's size estimate would otherwise BROADCAST the exploded
    corpus (never right for a corpus-sized side), and the two join
    inputs are the identical subplan, so the single shuffle is
    computed once and reused for both sides. Residual in-bucket skew
    (shingles just under the cap) is AQE skew-join territory."""
    e = hsets.select("doc_id", F.explode("hs").alias("shingle"))
    hot = _hot_shingles(e, cap)
    return _kept_pair_counts(e, hot).select("doc_a", "doc_b")


def _hot_shingles(e: DataFrame, cap: int) -> DataFrame:
    """Shingles whose document frequency exceeds the cap — one
    partial-aggregated exchange on 8-byte keys."""
    return (
        e.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > cap)
        .select("shingle")
    )


def _kept_pair_counts(e: DataFrame, hot: DataFrame | None) -> DataFrame:
    """(doc_a, doc_b, kept_shared): co-occurrence counts over non-hot
    postings — candidate generation and most of the shared-count in
    one codegen join+agg (the hot remainder is patched separately).
    ``hot=None`` skips the anti-join (corpus proven hot-free)."""
    kept = e if hot is None else e.join(F.broadcast(hot), "shingle", "left_anti")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("kept_shared"))
    )


T02_BLOCK_DOCS = 8192


def _block_boundaries(hsets: DataFrame, block_docs: int) -> list[tuple[int, int]]:
    """Disjoint [lo, hi] doc-id intervals covering the distinct doc-id
    set in chunks of ≤ block_docs, derived DISTRIBUTIVELY (VERDICT r10
    #3): floor((row_number-1)/block_docs) over the sorted id set
    assigns block membership executor-side and only the
    ceil(n / block_docs) (lo, hi) boundary rows reach the driver —
    O(n_docs / block_docs) driver memory instead of the pre-r11
    O(n_docs) full-id collect. Tiles of a sorted sequence are disjoint
    id intervals, each holding exactly block_docs ids (the last one
    fewer), so every pass downstream stays a pushdown-friendly BETWEEN
    within the broadcast bound. The global-order window sorts ids on
    one partition, but it carries ONLY the bigint id column and this
    is the declared exact-verification path (t03/t34 are the 100 TB
    dedup path); the driver-side structure is what had to go."""
    from pyspark.sql import Window

    # ONE job, not count-then-ntile (r11: each driver-synchronous job
    # in this chain pays a scheduling floor — the count existed only
    # to size ntile's k, but floor((row_number-1)/block_docs) cuts the
    # same ceil(n/block_docs) tiles without knowing n upfront, and its
    # tiles are exactly block_docs (all but the last) instead of
    # ntile's floor/ceil split, so the broadcast bound is unchanged).
    rows = (
        hsets.select("doc_id")
        .withColumn(
            "blk",
            F.floor(
                (F.row_number().over(Window.orderBy("doc_id")) - 1) / block_docs
            ),
        )
        .groupBy("blk")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .orderBy("blk")
        .collect()
    )
    return [(r.lo, r.hi) for r in rows]


def _kept_pair_counts_blocked(
    hsets: DataFrame, hot: DataFrame | None, block_docs: int = T02_BLOCK_DOCS
) -> DataFrame:
    """(doc_a, doc_b, kept_shared) for every pair whose exact Jaccard
    can still reach {0.5} — the co-occurrence mass computed WITHOUT
    any pair row ever crossing an exchange.

    Why this exists (round-8 sf2.0 decade probe): the fixture's
    3-gram vocabulary SATURATES (31-word grammar → all 29,791
    possible shingles present by sf1.0), after which every posting
    list grows ∝ corpus and the pair-join mass Σ df² grows ∝ n² while
    every shingle stays far below the hot cap — measured 2.8M (sf0.1)
    → 247M (sf1.0) → 982M (sf2.0) with max df 238 vs cap 1024. The
    join+agg formulation shuffles that mass as ~1B narrow rows
    (101 s at sf2.0, per-row 1.44×); here it never leaves numpy.

    Shape — s06's blocked decomposition applied to SPARSE postings:
    the corpus is cut into doc-id blocks of ≤{8192}; each pass
    broadcasts ONE block's kept postings (shingle-sorted arrays, a
    few MB) and a mapInPandas over the cached shingle-set table
    counts, per Arrow batch, each batch-doc's shared-shingle counts
    against the whole block via grouped-cartesian expansion +
    sort-based unique — C-speed work proportional to exactly the
    same Σ df_batch·df_block mass the join paid, with zero pair
    shuffle. A pair (u < v) is emitted by exactly one (batch-doc=u,
    block∋v) combination. Only pairs passing the OPTIMISTIC threshold
    bound (kept_shared + min(nh_a, nh_b) — shared is at most that,
    and Jaccard is increasing in shared) survive to the exchange, so
    the emitted stream is output-sized, not mass-sized; the exact
    hot-patch + final threshold downstream are unchanged.

    Driver/broadcast bound: one block's postings must fit a broadcast
    (the s06 contract — this is the EXACT family member, a
    verification-scale path; t03/t34's banded candidates are the
    100 TB dedup path). Passes = ceil(n_docs / block_docs) — blocks
    chunk the sorted distinct doc-id SET, so sparse/hashed id spaces
    cost the same pass count as dense ones. Per-block broadcasts are
    scoped_broadcast-registered: total residency is O(corpus postings)
    until the consuming query materializes, then the next registered
    build destroy()s them (ADVICE r8)."""
    import numpy as np

    from fsharp_mapreduce_spark.session import ensure_package_shipped

    spark = hsets.sparkSession
    ensure_package_shipped(spark)
    sc = spark.sparkContext

    hot_ids = (
        np.sort(np.array([r.shingle for r in hot.collect()], dtype=np.int64))
        if hot is not None
        else np.array([], dtype=np.int64)
    )

    def _hot_mask(x: np.ndarray) -> np.ndarray:
        if len(hot_ids) == 0:
            return np.zeros(len(x), dtype=bool)
        ix = np.searchsorted(hot_ids, x)
        ix[ix == len(hot_ids)] = 0
        return hot_ids[ix] == x

    t = JACCARD_THRESHOLD
    # Blocks are tiles of the SORTED DISTINCT doc-id set, not strides
    # over the raw id range (VERDICT r8 #5 / ADVICE r8): a sparse or
    # hashed id space (e.g. 63-bit md5-derived ids) under range
    # striding would launch ~range/block_docs filter+collect jobs,
    # almost all empty. Tiling the sorted id set guarantees exactly
    # ceil(n_docs / block_docs) passes while each pass stays a
    # pushdown-friendly BETWEEN on the tile's [lo, hi] ids. Boundary
    # derivation is distributed (_block_boundaries) — the driver holds
    # O(n_blocks) boundary rows, never the full id list (VERDICT r10
    # #3; block membership doesn't affect the output — a pair (u < v)
    # is emitted by exactly one (batch-doc, block) combination and
    # kept_shared is blocking-independent).
    bounds = _block_boundaries(hsets, block_docs)
    if not bounds:
        return spark.createDataFrame([], "doc_a long, doc_b long, kept_shared long")

    branches = []
    for lo_id, hi_id in bounds:
        rows = hsets.where(
            F.col("doc_id").between(lo_id, hi_id)
        ).collect()
        rows.sort(key=lambda r: r.doc_id)
        bdoc = np.array([r.doc_id for r in rows], dtype=np.int64)
        arrs = [np.asarray(r.hs, dtype=np.int64) for r in rows]
        bn = np.array([len(a) for a in arrs], dtype=np.int64)
        flat = (
            np.concatenate(arrs) if arrs else np.array([], dtype=np.int64)
        )
        bidx_all = np.repeat(np.arange(len(bdoc)), bn)
        hm = _hot_mask(flat)
        bnh = np.bincount(bidx_all[hm], minlength=len(bdoc)).astype(np.int64)
        kept_s, kept_i = flat[~hm], bidx_all[~hm]
        order = np.argsort(kept_s, kind="stable")
        bc = scoped_broadcast(
            sc.broadcast(
                {
                    "bdoc": bdoc,
                    "bn": bn,
                    "bnh": bnh,
                    "bs": kept_s[order],
                    "bi": kept_i[order],
                }
            )
        )

        def make_gen(bcast):
            def gen(batches):
                import numpy as _np
                import pandas as _pd

                blk = bcast.value
                bs, bi = blk["bs"], blk["bi"]
                bdoc_, bn_, bnh_ = blk["bdoc"], blk["bn"], blk["bnh"]
                nblk = len(bdoc_)
                for pdf in batches:
                    docs = pdf["doc_id"].to_numpy()
                    hs_col = [
                        _np.asarray(a, dtype=_np.int64) for a in pdf["hs"]
                    ]
                    out_a, out_b, out_k = [], [], []
                    chunk = 512  # caps the per-chunk key space
                    for s0 in range(0, len(docs), chunk):
                        cd = docs[s0 : s0 + chunk]
                        ca = hs_col[s0 : s0 + chunk]
                        lens = _np.array([len(a) for a in ca], dtype=_np.int64)
                        if lens.sum() == 0 or len(bs) == 0:
                            continue
                        shin = _np.concatenate(ca)
                        pidx = _np.repeat(_np.arange(len(cd)), lens)
                        hm_ = _hot_mask(shin)
                        nh_p = _np.bincount(
                            pidx[hm_], minlength=len(cd)
                        ).astype(_np.int64)
                        shin_k, pidx_k = shin[~hm_], pidx[~hm_]
                        # grouped-cartesian expansion: every (batch
                        # posting, equal-shingle block posting) pair
                        left = _np.searchsorted(bs, shin_k, "left")
                        right = _np.searchsorted(bs, shin_k, "right")
                        cnt = right - left
                        total = int(cnt.sum())
                        if total == 0:
                            continue
                        rep_p = _np.repeat(pidx_k, cnt)
                        offs = _np.repeat(_np.cumsum(cnt) - cnt, cnt)
                        bpos = _np.repeat(left, cnt) + (
                            _np.arange(total) - offs
                        )
                        rep_b = bi[bpos]
                        keys = rep_p * nblk + rep_b
                        uk, ks = _np.unique(keys, return_counts=True)
                        pi, bix = uk // nblk, uk % nblk
                        da, db = cd[pi], bdoc_[bix]
                        na = lens[pi]
                        nb = bn_[bix]
                        shared_hi = ks + _np.minimum(nh_p[pi], bnh_[bix])
                        shared_min = t * (na + nb) / (1.0 + t)
                        keep = (da < db) & (shared_hi >= shared_min - 1e-9)
                        out_a.append(da[keep])
                        out_b.append(db[keep])
                        out_k.append(ks[keep])
                    if out_a:
                        yield _pd.DataFrame(
                            {
                                "doc_a": _np.concatenate(out_a),
                                "doc_b": _np.concatenate(out_b),
                                "kept_shared": _np.concatenate(out_k),
                            }
                        )

            return gen

        branches.append(
            hsets.mapInPandas(
                make_gen(bc), "doc_a long, doc_b long, kept_shared long"
            )
        )
    if not branches:
        return spark.createDataFrame([], "doc_a long, doc_b long, kept_shared long")
    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out


def ngram_jaccard_pairs(
    docs: DataFrame, cap: int = STOP_SHINGLE_MAX_POSTINGS
) -> DataFrame:
    """Exact near-dup pairs by word-n-gram Jaccard: capped-postings
    candidate generation with exact shared counts. The cap never
    biases an emitted Jaccard — the co-occurrence count over non-hot
    postings is patched with the hot-shingle remainder, computed from
    tiny per-doc hot-shingle arrays (≤ a handful of boilerplate
    shingles per document by construction). Parameterized on the cap
    so the skew-corpus test can exercise a small one directly."""
    # persist BEFORE the explode: column pruning inlines the shingle
    # projection into Generate, and the generator's child expression is
    # re-evaluated per EMITTED row (measured ~8× the projection cost on
    # the fixture corpus — explode of the inline array 2.1s vs 0.12s
    # off the materialized one). The cached slim (doc_id, array<long>)
    # rows also serve the size lookups for free.
    hsets = scoped_persist(hashed_shingle_sets(docs))
    e = hsets.select("doc_id", F.explode("hs").alias("shingle"))
    # persist: hot feeds the emptiness probe, the anti-join (candidate
    # gen) and the per-doc hot-array build; without the cache the df
    # aggregation would scan the exploded corpus once per consumer.
    hot = scoped_persist(_hot_shingles(e, cap))
    # Adaptive guard (AQE-style runtime decision, one cached scalar
    # probe — not a data collect): a clean corpus pays only the df
    # aggregation; the anti-join and the hot-remainder patch joins
    # enter the plan only when hot shingles actually exist. Measured
    # 3.0s → 2.2s at sf0.1 (the fixture has no hot shingles).
    has_hot = bool(hot.head(1))
    # Blocked sparse counting (round 8): the join+agg formulation
    # (_kept_pair_counts) shuffles the full Σ df² co-occurrence mass
    # as pair rows — ∝ n² once the fixture's finite shingle vocabulary
    # saturates (measured 982M at sf2.0, 101 s). The blocked path
    # computes identical kept counts inside numpy per broadcast block
    # and only output-bound pairs reach an exchange.
    pairs = _kept_pair_counts_blocked(hsets, hot if has_hot else None)

    sz = hsets.select("doc_id", F.size("hs").alias("n"))
    ja = pairs.join(
        sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a"
    ).join(sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")

    if has_hot:
        # Hot remainder: per-doc arrays of hot shingles (short arrays —
        # only shingles in >cap docs — but potentially one row per doc
        # if boilerplate is corpus-wide, so NOT force-broadcast; AQE
        # picks broadcast at bench SF, shuffle-join at scale); exact
        # shared count = kept_shared + |hot_a ∩ hot_b|. This keeps the
        # shared count inside the codegen join+agg instead of
        # re-scoring every candidate against full shingle arrays
        # (measured 4.3s → 2.0s at sf0.1).
        hot_arr = (
            e.join(F.broadcast(hot), "shingle")
            .groupBy("doc_id")
            .agg(F.collect_list("shingle").alias("ha"))
        )
        ja = (
            ja.join(
                hot_arr.select(F.col("doc_id").alias("doc_a"), F.col("ha").alias("h_a")),
                "doc_a",
                "left",
            )
            .join(
                hot_arr.select(F.col("doc_id").alias("doc_b"), F.col("ha").alias("h_b")),
                "doc_b",
                "left",
            )
            .withColumn(
                "shared",
                F.col("kept_shared")
                + F.when(
                    F.col("h_a").isNotNull() & F.col("h_b").isNotNull(),
                    F.size(F.array_intersect("h_a", "h_b")),
                ).otherwise(F.lit(0)),
            )
        )
    else:
        ja = ja.withColumn("shared", F.col("kept_shared"))

    ja = ja.withColumn(
        "jaccard_raw", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    ).where(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
    return ja.select("doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard"))


@register("t02_ngram_jaccard_pairs", oracle=_NGRAM_ORACLE, tags=("dedup", "jaccard"))
def t02_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate pairs by word-{3}-gram Jaccard ≥ {0.5}:
    capped-postings self-join for candidates, exact full-set
    verification for the score. The exact (non-LSH) formulation — the
    ground truth the LSH variant is measured against."""
    return ngram_jaccard_pairs(fan_out(table(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# Cross-engine polynomial hash family (t03/t04): every constant fits the
# "products stay under 2⁶³" budget, so Spark expressions, numpy int64 and
# DuckDB BIGINT all compute the identical values — which is what lets
# MinHash+LSH and SimHash carry full DuckDB value-hash oracles (the t08
# fingerprint pattern, generalized). 31-bit token/shingle hashes keep
# a_p·h ≤ 2⁶² for the multiply-mod minhash perms.
M31 = 2_147_483_647  # 2³¹ − 1 (Mersenne prime)
POLY_P = 1_000_000_007
SHINGLE_BASE = 1_000_003


def _minhash_consts(num_perm: int = NUM_PERM) -> tuple[list[int], list[int]]:
    """Deterministic (a_p, b_p) for the multiply-mod family
    h ↦ (a_p·h + b_p) mod M31, a_p ∈ [1, M31), derived from fixed
    golden-ratio/Murmur constants — no RNG state, every engine and
    executor derives the same permutations."""
    a = [(0x9E3779B9 * (p + 1)) % (M31 - 1) + 1 for p in range(num_perm)]
    b = [(0x85EBCA6B * (p + 1)) % M31 for p in range(num_perm)]
    return a, b


def md5_int_hash(col: Column, hex_from: int = 1, hex_len: int = 12) -> Column:
    """Cross-engine string→int hash: a hex slice of md5, read as an
    integer, reduced mod M31. md5 is native (and bit-identical) in
    Spark AND DuckDB, so one native hash call per string replaces a
    per-character expression fold (measured 14.8s → 2.6s for the
    sf0.1 shingle stage — higher-order folds run on Catalyst's
    interpreted path, one lambda eval per character).
    DuckDB twin: ``('0x' || substr(md5(s), f, n))::BIGINT % M31``.
    12 hex digits = 48 bits, safely inside BIGINT before the mod;
    mod M31 keeps minhash products a·h < 2⁶² for int64 numpy."""
    return (
        F.conv(F.substring(F.md5(col), hex_from, hex_len), 16, 10).cast("long") % M31
    )


def ce_hashed_shingle_sets(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """(doc_id, hs: array<bigint>) — distinct word-n-gram hashes in the
    cross-engine md5 family (`md5_int_hash` per shingle string).
    Semantically a drop-in for `hashed_shingle_sets` (distinct
    shingles → distinct ints w.h.p., Jaccard preserved) but
    reproducible in DuckDB, which is what upgrades t03 from rows-only
    to a full value-hash oracle.

    Scale note: the M31 (2³¹) hash domain exists for oracle parity;
    at a 10¹⁰-shingle corpus the birthday collisions would start to
    blur Jaccard, and the production path is the 64-bit
    `hashed_shingle_sets` twin (identical pipeline shape, xxhash64
    domain) — only the verification gate prefers this family."""
    return shingle_sets(docs, n).select(
        "doc_id",
        F.array_distinct(
            F.transform("shingles", lambda s: md5_int_hash(s))
        ).alias("hs"),
    )


def minhash_band_signatures(
    hsets: DataFrame,
    num_perm: int = NUM_PERM,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """(doc_id, hs, bands: array<bigint>) — ``num_perm`` multiply-mod
    minhashes folded into ``num_perm // band_rows`` band signatures per
    document, vectorized in numpy over Arrow batches. Hash family:
    sig[p] = min_h ((a_p·h + b_p) mod M31); band signature = polynomial
    fold of the band's minhash slice seeded with the band index — the
    fixed `_minhash_consts` make both deterministic across runs,
    partitions AND engines (pure int64 arithmetic; the DuckDB oracle
    recomputes identical values). Embarrassingly parallel: one dense
    (num_perm × |shingles|) broadcast per document, no shuffle.

    Three things live INSIDE this Arrow stage on purpose — each was a
    measured single-thread serialization when expressed as Catalyst
    expressions around it:
    - the empty-set filter: a `where(size(hs) > 0)` above the stage is
      substituted through the shingle projections and PUSHED BELOW the
      fan_out repartition into the (single-split at small SF) parquet
      scan, evaluating the whole shingle+md5 pipeline one-threaded in
      the scan stage (measured as a 1-task, 18s-CPU Exchange map stage
      in the event log; the distributed projection then computes it all
      again). Input-split sizing is byte-based and cannot see
      expression CPU — at 100 TB the same pushdown serializes per-split
      instead, still paying the pipeline twice;
    - the band fold: `F.transform(…, F.aggregate(…))` runs on the
      interpreted non-codegen path, ~0.1 ms per lambda eval — 16 bands
      × 5k docs ≈ seconds, single-threaded wherever the plan lands it.
      The numpy reshape-fold is free by comparison;
    - the passthrough `hs`: downstream exact verification joins the
      cached sets instead of re-shingling candidate documents (the
      second 1-task 28s stage in the same event log)."""
    from fsharp_mapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(hsets.sparkSession)
    n_bands = num_perm // band_rows

    def run(batches):
        import numpy as np
        import pandas as pd

        ca, cb = _minhash_consts(num_perm)
        a = np.array(ca, dtype=np.int64)
        b = np.array(cb, dtype=np.int64)
        seeds = np.arange(n_bands, dtype=np.int64)
        for pdf in batches:
            ids, hss, bandss = [], [], []
            for did, hs in zip(pdf["doc_id"], pdf["hs"]):
                h = np.asarray(hs, dtype=np.int64)
                if h.size == 0:
                    continue
                m = (a[:, None] * h[None, :] + b[:, None]) % M31  # ≤ 2⁶² pre-mod
                sig = m.min(axis=1).reshape(n_bands, band_rows)
                acc = seeds  # band-index seed, then fold rows in order
                for j in range(band_rows):
                    acc = (acc * SHINGLE_BASE + sig[:, j]) % POLY_P
                ids.append(did)
                hss.append(hs)
                bandss.append(acc.tolist())
            yield pd.DataFrame({"doc_id": ids, "hs": hss, "bands": bandss})

    return hsets.mapInPandas(
        run, "doc_id long, hs array<bigint>, bands array<bigint>"
    )


def _minhash_common_ctes() -> str:
    """Shared DuckDB CTE chain for every MinHash+LSH oracle (t03 and
    its composers t12/t23/t33, plus t30's batch variant): documents →
    cross-engine shingle hashes → minhash signatures → band signatures,
    ending with the exploded postings (``eh``) and per-doc set sizes
    (``sz``) the verification stages join against.

    Vectorized form (VERDICT r6 #3 — these oracles exceeded a 10-min
    budget at sf0.5): the per-doc nested comprehension
    ``[list_min(list_transform(hs, …)) for p in …]`` is O(docs × perms
    × shingles) interpreted lambda evals; here the same signature is a
    columnar MIN over exploded (doc, shingle-hash) × perm rows —
    identical int64 arithmetic, native execution. The remaining
    comprehensions (gram strings, the band fold) are O(total words) and
    O(docs × bands) — negligible. MATERIALIZED throughout because
    DuckDB inlines plain CTEs per consumer."""
    ca, cb = _minhash_consts()
    a_sql = "[" + ", ".join(str(x) for x in ca) + "]"
    b_sql = "[" + ", ".join(str(x) for x in cb) + "]"
    band_window = "[" + ", ".join(
        f"sig[b*{BAND_ROWS}+{j + 1}]" for j in range(BAND_ROWS)
    ) + "]"
    return f"""
    w AS MATERIALIZED (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN len(ws) >= {NGRAM} THEN
               list_distinct(list_transform(
                 list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                for i in generate_series(1, len(ws) - {NGRAM - 1})]),
                 s -> ('0x' || substr(md5(s), 1, 12))::BIGINT % {M31}))
             ELSE CAST([] AS BIGINT[]) END AS hs
      FROM w
    ),
    eh AS MATERIALIZED (SELECT doc_id, unnest(hs) AS h FROM sh),
    perms AS MATERIALIZED (
      SELECT p, list_extract({a_sql}, p) AS ap, list_extract({b_sql}, p) AS bp
      FROM generate_series(1, {NUM_PERM}) t(p)
    ),
    mh AS MATERIALIZED (
      SELECT e.doc_id, pr.p, MIN((pr.ap * e.h + pr.bp) % {M31}) AS m
      FROM eh e CROSS JOIN perms pr
      GROUP BY 1, 2
    ),
    sg AS MATERIALIZED (
      SELECT doc_id, list(m ORDER BY p) AS sig FROM mh GROUP BY doc_id
    ),
    bd AS MATERIALIZED (
      SELECT doc_id, b AS band,
             list_reduce(list_prepend(CAST(b AS BIGINT), {band_window}),
                         (acc, v) -> (acc * {SHINGLE_BASE} + v) % {POLY_P})
               AS band_sig
      FROM sg, generate_series(0, {NUM_PERM // BAND_ROWS - 1}) t(b)
    ),
    sz AS MATERIALIZED (SELECT doc_id, len(hs) AS n FROM sh WHERE len(hs) > 0)"""


def _t03_oracle(slice_mod: int | None = None, residue: int = 0) -> str:
    """DuckDB replica of the full MinHash+LSH pipeline in the
    cross-engine family — md5-sliced shingle hashes, multiply-mod
    minhash signatures, polynomial band signatures, bucket join,
    exact-Jaccard verification — so the driver checks t03
    value-for-value, not rows-only. Verification is the join+group-by
    shared count over ``eh`` (identical to len(list_intersect(…)) on
    the distinct per-doc lists; a candidate sharing zero shingles
    drops out of the count, and out of the ≥threshold result either
    way).

    ``slice_mod`` (the t02/t22 sampled-slice protocol, VERDICT r10
    #5): restricts the CANDIDATE join to doc_a % mod = residue LEFT
    endpoints while every upstream stage (shingle hashes, minhash
    signatures, band table) still covers the FULL corpus — a hash
    match against the engine's full run filtered to the same slice is
    exact value evidence under the full-scale banding structure, at
    ~1/mod of the bucket-join + verification mass."""
    cand_slice = (
        f"AND x.doc_id % {slice_mod} = {residue}" if slice_mod else ""
    )
    return f"""
    WITH {_minhash_common_ctes()},
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bd x JOIN bd y
        ON x.band = y.band AND x.band_sig = y.band_sig
       AND x.doc_id < y.doc_id
       {cand_slice}
    ),
    shr AS MATERIALIZED (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS shared
      FROM cand c
      JOIN eh ea ON ea.doc_id = c.doc_a
      JOIN eh eb ON eb.doc_id = c.doc_b AND eb.h = ea.h
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(shared * 1.0 / (za.n + zb.n - shared), 6) AS jaccard
    FROM shr
    JOIN sz za ON doc_a = za.doc_id
    JOIN sz zb ON doc_b = zb.doc_id
    WHERE shared * 1.0 / (za.n + zb.n - shared) >= {JACCARD_THRESHOLD}
"""


@register(
    "t03_minhash_lsh_pairs", oracle=_t03_oracle(), tags=("dedup", "minhash", "lsh")
)
def t03_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup pairs, verified with exact Jaccard.

    shingle → 32 minhashes (min of a multiply-mod hash family over
    the polynomial-hashed shingle set, numpy-vectorized per Arrow
    batch) → 16 bands of 2 → band signature (polynomial fold of the
    band's minhash slice) → bucket self-join → exact-Jaccard
    verification of the (tiny) candidate set. The whole pipeline uses
    the cross-engine polynomial hash family, so the DuckDB oracle
    replays it value-for-value; recall is additionally pinned by
    tests/test_dedup.py::test_minhash_recall against t02's exact
    output."""
    # fan_out: the corpus arrives as one split at fixture scale; the
    # signature computation is pure CPU and must run partition-parallel.
    docs = fan_out(table(spark, sf_dir, "documents"))

    # Shingle-hash + minhash + band signatures as ONE vectorized Arrow
    # pass — empty-set filtering and the band fold live inside the
    # stage (see minhash_band_signatures: every Catalyst formulation of
    # those two leaked single-threaded work via filter pushdown /
    # interpreted lambdas). The JVM side upstream stays expression-only
    # (split/slice/md5), riding the fan_out partitioning.
    # persist: feeds the band posexplode (both sides of the self-join)
    # AND the verification hs-lookup joins — one materialization, four
    # consumers, slim (doc_id, hs, bands) rows.
    # NOTE (r11 optimization round, measured and deliberately NOT
    # "fixed"): the final plan's four independent subtrees (two
    # exchange map stages of the band self-join + two broadcast builds
    # of the hs lookups) launch as CONCURRENT jobs against the
    # still-empty cache, each recomputing the Arrow signature pass —
    # profiled as 4 overlapping 64-task ~700 ms jobs at sf0.1. Adding
    # a count() barrier (the t46 pattern) makes t03 2× SLOWER
    # (2.0 s → 4.1 s): the barrier serializes AQE's stage scheduling
    # into count → sequential broadcast builds, and reading the fat
    # array<bigint> hs column back out of the columnar cache costs as
    # much as recomputing it (776 ms broadcast build off the cache vs
    # ~700 ms compute). The racy overlap is the wall-clock optimum
    # here; the duplicated CPU is bounded by the 4 fixed consumers.
    sigs = scoped_persist(minhash_band_signatures(ce_hashed_shingle_sets(docs)))
    bands = sigs.select(
        "doc_id",
        F.posexplode("bands").alias("band", "band_sig"),
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

    # Exact verification on the candidate set only, joining the CACHED
    # hashed shingle sets — no re-shingling of candidate documents (a
    # re-shingle subtree re-reads the raw text and pays the md5
    # pipeline again, single-threaded below the repartition; the cache
    # lookup is a hash join on doc_id). Intersection on hashed
    # shingles ≡ strings.
    sets = sigs.select("doc_id", "hs")
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

# Pair scoring off a precomputed-norm CTE: sim = dot/(nrm_a·nrm_b)
# with nrm = sqrt(dot(a,a)) is the identical float expression tree to
# the inline cosine (dot/(sqrt(dot_aa)·sqrt(dot_bb))) — but 1 native
# dot per pair instead of 3, which is what keeps the all-pairs
# verifier (50M pairs at sf0.5, 200M at sf1.0) inside the replay
# budget. list_dot_product ≡ the sequential fold bit-exactly
# (similarity._DOT_SQL note).
_NV_CTE = """
    nv AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS a,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    )"""

_NEARDUP_ORACLE = f"""
    WITH {_NV_CTE},
    s AS (
      SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
             list_dot_product(x.a, y.a) / (x.nrm * y.nrm) AS sim
      FROM nv x JOIN nv y ON x.vec_id < y.vec_id
    )
    SELECT vec_a, vec_b, ROUND(sim, 6) AS sim
    FROM s WHERE sim >= {COSINE_DUP_THRESHOLD}
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
    #
    # Float contract: the GEMM is CANDIDATE GENERATION only, run at a
    # threshold loosened by a summation-order slop margin; survivors
    # are re-scored with the sequential-fold `cosine` expression — the
    # identical IEEE operation order the DuckDB oracle executes — so
    # the emitted scores are bit-exact cross-engine (same candidate-
    # gen/exact-rescore split s02_knn_lsh uses). GEMM and the fold
    # differ only by ~1e-12 relative rounding; 1e-6 slop means no pair
    # the fold accepts can be lost at candidate gen.
    block = 1024
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    if max_id is None:
        raise ValueError("embeddings table is empty: nothing to near-dup scan")
    n = max_id + 1
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

    loose, bs = COSINE_DUP_THRESHOLD - 1e-6, block

    def block_pair_candidates(pdf):
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
            keep = sims[ia, ib] >= loose
            va, vb = ids[ia[keep]], ids[ib[keep]]
        else:
            a_mask = (ids // bs) == p
            ua, ub = unit[a_mask], unit[~a_mask]
            ids_a, ids_b = ids[a_mask], ids[~a_mask]
            sims = ua @ ub.T
            ia, ib = np.nonzero(sims >= loose)
            va, vb = ids_a[ia], ids_b[ib]
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi})

    cands = routed.groupBy("p", "q").applyInPandas(
        block_pair_candidates, "vec_a long, vec_b long"
    )
    # Exact re-score of the (tiny) candidate set with the sequential
    # fold — the authoritative, oracle-matching score. The two lookup
    # joins carry only candidate pairs; AQE broadcasts them at small SF
    # and they stay proportional to |candidates| at scale.
    from fsharp_mapreduce_spark.functions.similarity import cosine

    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    rescored = (
        cands.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("sim_raw", cosine(F.col("ea"), F.col("eb")))
        .where(F.col("sim_raw") >= COSINE_DUP_THRESHOLD)
    )
    return rescored.select("vec_a", "vec_b", F.round("sim_raw", 6).alias("sim"))


# ---------------------------------------------------------------------------
# t10: the composed 100-TB embedding-dedup path that t09's docstring
# promises — hyperplane-LSH bucketing (s02's machinery) for candidate
# generation, a vectorized numpy cosine prefilter at a loosened
# threshold, and the sequential-fold cosine as the authoritative final
# score. Work is proportional to |bucket collisions|, never all-pairs.
#
# (L, k) tuning is regime-dependent. Per-plane agreement for a pair at
# cosine s is p = 1 − arccos(s)/π; a pair collides in one k-bit table
# w.p. p^k and survives candidate gen w.p. 1 − (1 − p^k)^L. The
# fixture's near-dups sit at s ≈ 0.4–0.5 (p ≈ 0.63–0.67 — random
# vectors, an adversarially LOW dup threshold), so the registered
# query uses wide-OR tuning (k=2, L=8): recall ≈ 0.98 at s = 0.4.
# A production corpus dedups at s ≥ 0.95 (p ≥ 0.90), where k=8, L=8
# prunes ~97% of background pairs at recall ≥ 0.999 — pinned by
# tests/test_dedup.py::test_lsh_neardup_production_pruning.
T10_TABLES = 8
T10_PLANES_PER_TABLE = 2  # the floor; corpora above the capacity
# target adapt upward via similarity.adaptive_planes_per_table
# (VERDICT r7 #2 — fixed k lets bucket occupancy grow ∝ n and the
# in-bucket GEMM trend quadratic at decade scale)


def _lsh_candidate_pairs(emb: DataFrame, n_tables: int, planes_per_table: int) -> DataFrame:
    """Distinct (vec_a < vec_b) pairs sharing an LSH bucket in ≥1 of
    the ``n_tables`` hyperplane tables. One GEMM pandas_udf assigns
    all table buckets per vector (s02's `_lsh_bucket_udf`); the
    posexplode + self-equi-join on (tbl, bucket) is the bucketed
    candidate join — the exchange carries (id, tbl, bucket) triples,
    not embeddings, and shuffle_hash stops the planner broadcasting a
    corpus-sized side.

    Diagnostic/test formulation: materializes the candidate set as
    rows (tests count it to pin pruning ratios). The production path
    (`embedding_neardup_lsh`) computes the SAME candidate set but
    consumes it inside per-bucket GEMM tasks without ever emitting
    unfiltered pairs — use this only when the pair list itself is the
    thing you want."""
    from fsharp_mapreduce_spark.functions.similarity import _lsh_bucket_udf

    bucket_ids = _lsh_bucket_udf(n_tables, planes_per_table)
    tagged = emb.select(
        "vec_id", F.posexplode(bucket_ids(F.col("embedding"))).alias("tbl", "bucket")
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    return (
        a.hint("shuffle_hash")
        .join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )


def embedding_neardup_lsh(
    emb: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    n_tables: int = T10_TABLES,
    planes_per_table: int | None = None,
) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs with exact final scores.

    Candidate pairs are NEVER materialized as rows: vectors are grouped
    by (table, bucket) and each bucket runs a dense in-bucket GEMM
    prefilter at (threshold − 1e-6) inside one `applyInPandas` task,
    emitting only surviving (vec_a, vec_b) pairs. A wide-OR regime like
    the fixture's (k=2 → 4 buckets/table, collision prob ~L·2⁻ᵏ) would
    otherwise make the materialized pair list ~|corpus|²-sized: the
    pair-join formulation measured 25 s at sf0.1 (1.78 M joined rows ×
    two embedding lookups) vs <2 s for in-bucket GEMM doing the same
    dot products as dense matmul. Work is Σ bucket² FLOPs; shuffle is
    L copies of the corpus (L fixed) — both sub-quadratic whenever the
    tuning actually buckets, and never worse than GEMM-speed otherwise.
    Within a bucket the GEMM is row-chunked, so one hot bucket costs
    bounded memory (chunk × bucket), not bucket² at once.

    The sequential-fold `cosine` re-score of the (tiny) survivor set is
    the only arbiter of the emitted pairs and scores, so results are
    bit-comparable with t09/the DuckDB oracle; the GEMM stage only ever
    discards pairs the fold would also discard (1e-6 slop ≫ the ~1e-12
    summation-order divergence)."""
    from fsharp_mapreduce_spark.functions.similarity import (
        _lsh_bucket_udf,
        adaptive_planes_per_table,
        cosine,
    )
    from fsharp_mapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(emb.sparkSession)

    if planes_per_table is None:
        # density-adaptive k: same capacity rule as s07, same floor —
        # every standard fixture stays at the k=2 wide-OR tuning point
        planes_per_table = adaptive_planes_per_table(
            emb.count(), min_planes=T10_PLANES_PER_TABLE
        )
    bucket_ids = _lsh_bucket_udf(n_tables, planes_per_table)
    tagged = emb.select(
        "vec_id",
        "embedding",
        F.posexplode(bucket_ids(F.col("embedding"))).alias("tbl", "bucket"),
    )

    loose = threshold - 1e-6

    def bucket_gemm(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(
                {"vec_a": np.array([], dtype=np.int64), "vec_b": np.array([], dtype=np.int64)}
            )
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        out_a, out_b = [], []
        chunk = 2048  # caps the dense block at chunk×|bucket| floats
        for s in range(0, len(ids), chunk):
            sims = unit[s : s + chunk] @ unit.T
            ia, ib = np.nonzero(sims >= loose)
            ia = ia + s
            keep = ia < ib  # strict upper triangle: each in-bucket pair once
            out_a.append(ids[ia[keep]])
            out_b.append(ids[ib[keep]])
        va, vb = np.concatenate(out_a), np.concatenate(out_b)
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi})

    cands = (
        tagged.groupBy("tbl", "bucket")
        .applyInPandas(bucket_gemm, "vec_a long, vec_b long")
        # a pair colliding in several tables surfaces once per table
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    rescored = (
        cands.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("sim_raw", cosine(F.col("ea"), F.col("eb")))
        .where(F.col("sim_raw") >= threshold)
    )
    return rescored.select("vec_a", "vec_b", F.round("sim_raw", 6).alias("sim"))


def _t10_oracle(planes_per_table: int = T10_PLANES_PER_TABLE) -> str:
    """DuckDB replica of the LSH-bucketed near-dup pipeline: shared
    bucket-assignment CTE (`lsh_tagged_sql` — deterministic planes as
    SQL literals, sign-for-sign with the GEMM), bucket self-join,
    exact-cosine final filter. The plane count is data-derived, so
    the registered oracle is a per-SF factory replaying the same
    capacity rule from the fixture's parquet footer row count."""
    from fsharp_mapreduce_spark.functions.similarity import lsh_tagged_sql

    return f"""
    WITH {lsh_tagged_sql(T10_TABLES, planes_per_table)},
    {_NV_CTE},
    cand AS (
      SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      FROM tagged x JOIN tagged y
        ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
    ),
    s AS (
      SELECT c.vec_a, c.vec_b,
             list_dot_product(a.a, b.a) / (a.nrm * b.nrm) AS sim
      FROM cand c
      JOIN nv a ON c.vec_a = a.vec_id
      JOIN nv b ON c.vec_b = b.vec_id
    )
    SELECT vec_a, vec_b, ROUND(sim, 6) AS sim
    FROM s WHERE sim >= {COSINE_DUP_THRESHOLD}
"""


def _t10_oracle_for(sf_dir: str) -> str:
    from fsharp_mapreduce_spark.functions.similarity import (
        adaptive_planes_per_table,
        parquet_num_rows,
    )

    n = parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    return _t10_oracle(
        adaptive_planes_per_table(n, min_planes=T10_PLANES_PER_TABLE)
    )


@register(
    "t10_embedding_neardup_lsh",
    oracle_factory=_t10_oracle_for,
    tags=("dedup", "embedding", "lsh", "cosine"),
)
def t10_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalable embedding-dedup pipeline t09's docstring routes
    100 TB through: hyperplane-LSH candidate generation ({8} tables ×
    {2} sign bits, fixture-tuned — see the module comment for the
    (L, k) S-curve math) composed with t09's exact fold-cosine
    re-score. Unlike t09's blocked all-pairs GEMM, no stage here is
    quadratic in the corpus: cost is Σ bucket² GEMM FLOPs + survivor
    re-scores, and candidate pairs are never materialized as rows.
    Recall vs t09's exact output is pinned by
    tests/test_dedup.py::test_lsh_neardup_recall_vs_exact."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return embedding_neardup_lsh(emb)


# ---------------------------------------------------------------------------
# t12: dedup CLUSTERS. Pair queries (t02/t03/t09..t11) surface edges;
# a training pipeline needs the transitive closure — one keeper per
# connected component — because near-duplication chains (A≈B, B≈C
# with A≉C must still collapse to one cluster).


def _cc_round(e: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label-propagation round as an UNMATERIALIZED plan:
    neighbor-min join + agg, then the label update carrying the
    convergence flag. Factored out of connected_components so the
    plan test can pin the round's exchange shape on the REAL code
    (tests/test_plans.py::test_cc_round_never_reshuffles_edges):
    with broadcast off (labels is all vertices — never broadcastable
    on a real corpus), the cached symmetrized edge set's hash
    partitioning on `u` must be REUSED, so no `Exchange
    hashpartitioning(u...)` appears — E shuffles once at build,
    not once per round."""
    nbr = (
        e.join(labels, e.u == labels.v)
        .select(F.col("w").alias("v2"), "label")
        .groupBy("v2")
        .agg(F.min("label").alias("nl"))
    )
    return labels.join(nbr, labels.v == nbr.v2, "left").select(
        "v",
        F.least(F.col("label"), F.coalesce("nl", "label")).alias("label"),
        # strict decrease — the convergence signal, carried on the
        # round's own materialization so no second label-vs-label
        # join is needed
        (F.coalesce("nl", "label") < F.col("label")).cast("long").alias("chg"),
    )


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iter: int = 25
) -> DataFrame:
    """(v, component) for every vertex, component = min vertex id in
    its connected component. Deterministic distributed min-label
    propagation: each round every vertex takes the minimum of its own
    label and its neighbors' labels (one hash join + partial-agg min
    per round), until a round changes nothing.

    Scale analysis: rounds = graph diameter; every round is
    shuffle-bounded by |E| with map-side combine on the min. Dedup
    graphs are short-diameter by construction (near-dup clusters are
    dense blobs, not paths), so this settles in a handful of rounds at
    any corpus size; for adversarially long chains the
    large-star/small-star variant (Kiveris et al., "Connected
    Components in MapReduce and Beyond") halves path lengths per round
    — same join/agg building blocks, O(log n) rounds, worth swapping
    in only if diameter is genuinely unbounded.

    Two per-round costs are paid ONCE instead of once per round
    (r11 — the iterative-floor analogue of the r10 streaming
    state-partition fix):
    - the symmetrized edge set is hash-partitioned on its join key
      before caching, so when labels outgrow the broadcast threshold
      (any real corpus — labels is ALL vertices) the per-round join
      reuses E's partitioning and only the label side exchanges:
      E shuffles once, not diameter times;
    - the convergence probe rides the round's own checkpoint as a
      changed-flag column reduced by a map-only scalar agg, instead
      of a second join of new labels against old (which re-shuffled
      both label sets every round).
    Labels persist across rounds; superseded cache entries are
    released eagerly."""
    # persist + eagerly materialize the EDGE INPUT before symmetrizing:
    # the union below expands `edges` into both branches, and if edges
    # is an expensive pipeline (t12 feeds the whole t03 MinHash+LSH
    # pair query in here) the first job would otherwise execute that
    # subtree twice. After the count, both union branches are
    # InMemoryTableScans over one cached copy — one upstream execution
    # total (pinned by tests/test_dedup.py::
    # test_connected_components_single_edge_expansion).
    edges = edges.persist()
    edges.count()
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        .union(edges.select(F.col("dst").alias("u"), F.col("src").alias("w")))
        .repartition("u")
        .persist()
    )
    labels = vertices.select("v", F.col("v").alias("label")).persist()
    changed = 0
    for _ in range(max_iter):
        # localCheckpoint (eager), not persist: each round's plan embeds
        # the previous round's, so persist alone grows the lineage (and
        # the driver's plan/AQE bookkeeping) linearly in rounds — a
        # 25-round run OOM'd an 8 GB driver before this. The checkpoint
        # materializes the round AND truncates lineage to the stored
        # blocks; on a real cluster with executor churn, swap for
        # reliable checkpointing to a cluster store.
        new = _cc_round(e, labels).localCheckpoint()
        changed = int(new.agg(F.sum("chg")).collect()[0][0] or 0)
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    e.unpersist()
    edges.unpersist()
    if changed != 0:
        # Never return silently-wrong (partially propagated) labels:
        # min-label propagation needs `diameter` rounds, so exhausting
        # the budget means the graph has a path longer than max_iter —
        # the caller should raise max_iter or switch to the
        # O(log n)-round large-star/small-star variant (Kiveris et
        # al.) that the docstring names.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); graph diameter exceeds "
            "max_iter — raise it or use a star-contraction variant"
        )
    return labels.select("v", "label")


def _star_checksum(e: DataFrame) -> tuple:
    """Order-free edge-set fingerprint (row count + XOR of xxhash64):
    one scalar aggregate per round instead of a full exceptAll
    comparison. bit_xor, not sum — summing 64-bit hashes overflows
    BIGINT under ANSI mode. A missed change needs a 64-bit hash-xor
    collision between consecutive DISTINCT edge sets — negligible, and
    one extra round is the worst consequence."""
    row = e.select(
        F.count(F.lit(1)).alias("c"),
        F.expr("bit_xor(xxhash64(a, b))").alias("s"),
    ).collect()[0]
    return (row.c, row.s)


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star step (Kiveris et al., "Connected Components in
    MapReduce and Beyond", Algorithm 2): every node attaches its
    STRICTLY LARGER neighbors to the minimum of its closed
    neighborhood. One symmetrize + min-aggregate + join — all keyed
    shuffles, |E|-bounded."""
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("w")).union(
        e.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    m = (
        adj.groupBy("u")
        .agg(F.min("w").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        adj.join(m, "u")
        .where(F.col("w") > F.col("u"))
        .select(F.col("w").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star step: direct each edge larger→smaller; every node
    attaches its smaller neighbors AND itself to the minimum of that
    in-neighborhood."""
    d = e.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("w")
    ).where(F.col("a") != F.col("b"))
    m = d.groupBy("u").agg(F.min("w").alias("m"))
    out = (
        d.join(m, "u")
        .select(F.col("w").alias("a"), F.col("m").alias("b"))
        .union(m.select(F.col("u").alias("a"), F.col("m").alias("b")))
    )
    return out.where(F.col("a") != F.col("b")).distinct()


def connected_components_star(
    edges: DataFrame, vertices: DataFrame, max_iter: int = 50
) -> DataFrame:
    """(v, component) via alternating large-star/small-star contraction
    (Kiveris et al.) — the UNBOUNDED-DIAMETER variant the min-label
    `connected_components` docstring names: path lengths at least halve
    per round, so convergence is O(log n)-ish rounds regardless of
    diameter, where min-label needs `diameter` rounds. Same building
    blocks (keyed joins + min aggregates, everything |E|-bounded with
    map-side combine); the per-round cost is ~2× a min-label round, so
    min-label stays the default for dedup graphs (dense short-diameter
    blobs) and this is the escape hatch for chain-shaped graphs.
    Equivalence with min-label on short-diameter graphs and
    convergence on a diameter-63 chain (where min-label's default
    budget raises) are pinned in tests/test_dedup.py."""
    e = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()  # truncate lineage per round (see min-label)
    )
    cs = _star_checksum(e)
    converged = False
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        cs2 = _star_checksum(e2)
        e.unpersist()
        e = e2
        if cs2 == cs:
            converged = True
            break
        cs = cs2
    if not converged:
        e.unpersist()
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # Converged edge set is a star forest: every non-root points at its
    # component minimum (min-agg is belt and braces against a transient
    # double edge). Roots and isolated vertices label themselves.
    roots = (
        e.groupBy(F.col("a").alias("v")).agg(F.min("b").alias("label"))
    )
    out = vertices.join(roots, "v", "left").select(
        "v", F.coalesce("label", "v").alias("label")
    )
    # materialize before releasing the star edges the plan reads;
    # scoped so the next registry query releases the label cache
    out = scoped_persist(out)
    out.count()
    e.unpersist()
    return out


def _t12_oracle() -> str:
    """DuckDB replica: t03's pair pipeline as the edge set, transitive
    closure via a recursive CTE (fixture graphs are tiny), min
    reachable id per vertex, singletons labeled with themselves."""
    return f"""
    WITH RECURSIVE
    p AS MATERIALIZED (SELECT doc_a, doc_b FROM ({_t03_oracle()}) t),
    e(u, v) AS MATERIALIZED (
      SELECT doc_a, doc_b FROM p UNION SELECT doc_b, doc_a FROM p
    ),
    reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM e) s
      UNION
      SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u
    ),
    comp AS (SELECT u, MIN(r) AS c FROM reach GROUP BY u)
    SELECT d.doc_id,
           CAST(COALESCE(comp.c, d.doc_id) AS BIGINT) AS cluster_id
    FROM documents d LEFT JOIN comp ON d.doc_id = comp.u
"""


@register(
    "t12_dedup_clusters", oracle=_t12_oracle(), tags=("dedup", "clusters")
)
def t12_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document dedup clusters: connected components over the
    MinHash+LSH near-dup pair graph (t03, exact-Jaccard-verified
    edges), every document labeled with the minimum doc_id of its
    component — the canonical keeper. Singletons label themselves, so
    the output is a total keeper assignment: ``WHERE doc_id =
    cluster_id`` is the deduplicated corpus. Chain-closure semantics
    pinned by tests/test_dedup.py::test_connected_components_chain."""
    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("v")
    )
    pairs = t03_minhash_lsh_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(pairs, docs)
    return comp.select(
        F.col("v").alias("doc_id"), F.col("label").cast("bigint").alias("cluster_id")
    )


M32 = 1 << 32
SIMHASH_BASE_LO = 31
SIMHASH_BASE_HI = 131


def _t04_oracle() -> str:
    """DuckDB replica of the polynomial SimHash: two independent
    32-bit token hashes (char folds mod 2³², bases 31/131) vote ±1 on
    their 32 bits; the per-half signs pack into simhash_lo/simhash_hi.
    count[j] = 2·(#tokens with bit j set) − #tokens."""

    def tok_hashes(base: int) -> str:
        return (
            "list_transform(ws, t -> list_reduce("
            "list_prepend(CAST(0 AS BIGINT), "
            "list_transform(list_filter(string_split(t, ''), c -> c <> ''), "
            "c -> CAST(ascii(c) AS BIGINT))), "
            f"(acc, c) -> (acc * {base} + c) % {M32}))"
        )

    def counts(col: str) -> str:
        return (
            f"[ 2 * len(list_filter({col}, x -> ((x >> j) & 1) = 1)) - len({col}) "
            "for j in generate_series(0, 31) ]"
        )

    def pack(col: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"[ CASE WHEN {col}[j+1] > 0 THEN (CAST(1 AS BIGINT) << j) "
            "ELSE CAST(0 AS BIGINT) END for j in generate_series(0, 31) ]), "
            "(a, b) -> a + b)"
        )

    return f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    h AS (
      SELECT doc_id,
             {tok_hashes(SIMHASH_BASE_LO)} AS h1,
             {tok_hashes(SIMHASH_BASE_HI)} AS h2
      FROM w
    ),
    c AS (
      SELECT doc_id, {counts('h1')} AS c1, {counts('h2')} AS c2 FROM h
    )
    SELECT doc_id, {pack('c2')} AS simhash_hi, {pack('c1')} AS simhash_lo
    FROM c
"""


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash_hi, simhash_lo) — one vectorized Arrow pass
    (the `minhash_band_signatures` pattern): tokenize, char-fold two
    32-bit polynomial hashes per DISTINCT token (vocabulary dedup —
    the fixture has ~30× more token occurrences than distinct tokens,
    so hashing the vocabulary once replaces per-occurrence interpreted
    lambda folds), expand each distinct hash to its 32-bit vote row
    once, then per-document signature = numpy gather + column sum.
    Integer semantics are identical to the expression formulation the
    DuckDB oracle replays (same char codepoints, same mod-2³² folds),
    so the oracle is untouched. Replaced the pure-expression pipeline
    measured at 2.1s/sf0.1 (≈24M interpreted lambda evals: per-char
    fold + 64 per-bit filter passes per doc) with ~0.4s.
    Embarrassingly parallel, no shuffle."""
    from fsharp_mapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(docs.sparkSession)

    def run(batches):
        import numpy as np
        import pandas as pd

        def build(pdf):
            vocab: dict[str, int] = {}
            doc_tok_ix = []
            for text in pdf["text"]:
                ixs = []
                for t in (text or "").lower().split(" "):
                    ix = vocab.get(t)
                    if ix is None:
                        ix = len(vocab)
                        vocab[t] = ix
                    ixs.append(ix)
                doc_tok_ix.append(np.array(ixs, dtype=np.int64))
            h1 = np.zeros(len(vocab), dtype=np.int64)
            h2 = np.zeros(len(vocab), dtype=np.int64)
            for t, ix in vocab.items():
                a = b = 0
                for ch in t:
                    o = ord(ch)
                    a = (a * SIMHASH_BASE_LO + o) % M32
                    b = (b * SIMHASH_BASE_HI + o) % M32
                h1[ix], h2[ix] = a, b
            js = np.arange(32, dtype=np.int64)
            bits1 = (h1[:, None] >> js) & 1  # (vocab, 32) of 0/1
            bits2 = (h2[:, None] >> js) & 1
            weights = (np.int64(1) << js)
            his, los = [], []
            for ixs in doc_tok_ix:
                n = len(ixs)
                c1 = 2 * bits1[ixs].sum(axis=0) - n  # per-bit vote sums
                c2 = 2 * bits2[ixs].sum(axis=0) - n
                los.append(int(weights[c1 > 0].sum()))
                his.append(int(weights[c2 > 0].sum()))
            return pd.DataFrame(
                {"doc_id": pdf["doc_id"], "simhash_hi": his, "simhash_lo": los}
            )

        for pdf in batches:
            yield build(pdf)

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, simhash_hi long, simhash_lo long"
    )


def _expression_simhash_signatures(docs: DataFrame) -> DataFrame:
    """The pure-Catalyst-expression formulation of the identical
    signature (kept as the differential twin —
    tests/test_dedup.py::test_simhash_vectorized_matches_expression
    pins vectorized == expression == oracle semantics)."""
    toks = F.split(F.lower(F.col("text")), " ")

    def tok_hashes(base: int) -> Column:
        return F.transform(
            toks,
            lambda t: F.aggregate(
                F.filter(F.split(t, ""), lambda c: c != F.lit("")),
                F.lit(0).cast("long"),
                lambda acc, c: (acc * base + F.ascii(c)) % M32,
            ),
        )

    # Three-step projection ON PURPOSE (see shingle_sets): the token-
    # hash arrays and the count arrays must be materialized attributes,
    # or the interpreted higher-order path recomputes them per bit.
    hashed = docs.select(
        "doc_id",
        tok_hashes(SIMHASH_BASE_LO).alias("h1"),
        tok_hashes(SIMHASH_BASE_HI).alias("h2"),
    )

    def bit_test(mask: int):
        # NB: a plain `lambda x, j=j` would be read by PySpark as the
        # two-arg (element, index) higher-order form — bind via closure.
        return lambda x: x.bitwiseAND(F.lit(mask)) != 0

    def counts(col: str) -> Column:
        total = F.size(F.col(col))
        return F.array(
            *[
                (F.size(F.filter(F.col(col), bit_test(1 << j))) * 2 - total).cast(
                    "long"
                )
                for j in range(32)
            ]
        )

    counted = hashed.select(
        "doc_id", counts("h1").alias("c1"), counts("h2").alias("c2")
    )

    def pack(col: str) -> Column:
        bits = [
            F.when(F.element_at(F.col(col), j + 1) > 0, F.lit(1 << j).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            for j in range(32)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    return counted.select(
        "doc_id", pack("c2").alias("simhash_hi"), pack("c1").alias("simhash_lo")
    )


@register("t04_simhash", oracle=_t04_oracle(), tags=("dedup", "simhash"))
def t04_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document in the cross-engine polynomial
    family: each token carries two independent 32-bit polynomial
    hashes (char folds mod 2³², bases 31 and 131) and votes ±1 on
    each of their bits; the signature packs the per-bit sign sums
    into two 32-bit halves (simhash_hi ∥ simhash_lo — both
    non-negative bigints, no sign-bit edge case in either engine).
    Near-duplicates land within small Hamming distance (pinned by
    tests/test_dedup.py::test_simhash_near_dups); the DuckDB oracle
    replays the identical integer pipeline. Computed in one
    vocabulary-deduped numpy pass per Arrow batch (see
    `simhash_signatures`); an expression-only twin is kept and
    equality-pinned. No shuffle (it's a projection)."""
    return simhash_signatures(fan_out(table(spark, sf_dir, "documents")))


# t11: Hamming threshold + band count. 4 disjoint 16-bit bands give
# the exact pigeonhole guarantee for ham ≤ 3: flipping ≤3 of 64 bits
# leaves ≥1 band untouched, so every qualifying pair collides in at
# least one band — recall is 1.0 BY CONSTRUCTION (not probabilistic
# like MinHash banding). Fixture calibration: ~half the jaccard≥0.5
# pairs sit at ham ≤ 3 while the background pair minimum is 4 — the
# band join admits almost nothing it then discards.
SIMHASH_HAM_MAX = 3


def _t11_oracle() -> str:
    """DuckDB replica: t04's signature CTE, 16-bit band equi-join,
    exact Hamming verification (bit_count of the xor-ed halves)."""
    ham = (
        "CAST(bit_count(xor(sa.simhash_hi, sb.simhash_hi))"
        " + bit_count(xor(sa.simhash_lo, sb.simhash_lo)) AS BIGINT)"
    )
    return f"""
    WITH sig AS ({_t04_oracle()}),
    bands AS (
      SELECT doc_id, b,
             CASE WHEN b < 2 THEN (simhash_lo >> (16 * b)) & 65535
                  ELSE (simhash_hi >> (16 * (b - 2))) & 65535 END AS bv
      FROM sig, generate_series(0, 3) t(b)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b, {ham} AS hamming
    FROM cand
    JOIN sig sa ON doc_a = sa.doc_id
    JOIN sig sb ON doc_b = sb.doc_id
    WHERE {ham} <= {SIMHASH_HAM_MAX}
"""


@register(
    "t11_simhash_neardup_pairs",
    oracle=_t11_oracle(),
    tags=("dedup", "simhash", "banding"),
)
def t11_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming ≤ {3}: t04's 64-bit
    signatures split into 4 disjoint 16-bit bands; candidate pairs
    share ≥1 exact band (pigeonhole ⇒ recall 1.0 at the threshold —
    SimHash's standard sub-quadratic search structure); candidates are
    verified with the exact Hamming distance (two bit_counts over
    xor-ed halves — pure codegen).

    100 TB shape: signatures are a zero-shuffle projection (8 bytes of
    state per doc); the band exchange carries (doc_id, band, band
    value, signature) rows — never text — and the signatures RIDE THE
    EXPLODE, so collision pairs are Hamming-verified inside the join's
    output projection with no signature-lookup joins and the distinct
    runs on the ~|results| survivors, not the |collisions| candidate
    stream (the fixture corpus's skewed band buckets make collisions
    ~30 000× the result count — 2.86M pairs vs 97 rows at sf0.1;
    deduping after the codegen bit_count filter cut the query 6.5s →
    1.2s). Hot band buckets remain the boilerplate-corpus hazard; cap
    economics are the same as t02's stop-shingles."""
    sigs = simhash_signatures(fan_out(table(spark, sf_dir, "documents")))
    band_vals = F.array(
        *[
            F.shiftright("simhash_lo", 16 * b).bitwiseAND(F.lit(0xFFFF))
            for b in range(2)
        ],
        *[
            F.shiftright("simhash_hi", 16 * b).bitwiseAND(F.lit(0xFFFF))
            for b in range(2)
        ],
    )
    bands = sigs.select(
        "doc_id",
        F.col("simhash_hi").alias("h"),
        F.col("simhash_lo").alias("l"),
        F.posexplode(band_vals).alias("b", "bv"),
    )
    x, y = bands.alias("x"), bands.alias("y")
    ham = (
        F.bit_count(F.col("x.h").bitwiseXOR(F.col("y.h")))
        + F.bit_count(F.col("x.l").bitwiseXOR(F.col("y.l")))
    ).cast("bigint")
    return (
        x.hint("shuffle_hash")
        .join(
            y,
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_HAM_MAX)
        # a pair may collide in several bands — dedup the survivors
        # (a ~|results|-sized distinct, not a |collisions|-sized one)
        .distinct()
    )


@register(
    "t23_dedup_clusters_star",
    oracle=_t12_oracle(),
    tags=("dedup", "clusters", "star-contraction"),
)
def t23_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t12's keeper assignment computed by the large-star/small-star
    contraction engine instead of min-label propagation (pytest-only
    family member; t12 holds the gate slot). Same t03 edge set, same
    oracle, same answer — the engines differ only in round complexity:
    min-label needs diameter rounds (fine for shallow dedup graphs),
    star contraction halves path lengths every round (O(log n) — the
    variant for adversarial/unbounded-diameter graphs). Registering
    both keeps the equivalence continuously verified on the live
    fixture, not just the synthetic chain test."""
    docs = table(spark, sf_dir, "documents").select(F.col("doc_id").alias("v"))
    pairs = t03_minhash_lsh_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components_star(pairs, docs)
    return comp.select(
        F.col("v").alias("doc_id"), F.col("label").cast("bigint").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# t30: incremental (batch-vs-corpus) dedup — the ingestion-time shape.
# t01/t03 dedup WITHIN one corpus; a production pipeline's daily runs
# instead ask "which of today's N new documents already exist in the
# 100 TB corpus?" — a cross-corpus membership problem whose two sides
# are wildly asymmetric (batch ≪ corpus). The fixture has one
# documents table, so the batch is carved out deterministically:
# doc_id % 10 = 7 (≈10%) is "today's batch", the rest is "the corpus".
BATCH_MOD = 10
BATCH_REMAINDER = 7


def _is_batch(col: Column) -> Column:
    return col % BATCH_MOD == BATCH_REMAINDER


def incremental_dedup(docs: DataFrame) -> DataFrame:
    """Per new-batch document: exact-duplicate flag (content digest
    seen in the corpus) + near-duplicate audit (count of corpus docs
    with shingle-Jaccard ≥ {JACCARD_THRESHOLD} via the t03 MinHash
    bands, and the max such Jaccard).

    Plan at 100 TB (the asymmetry IS the plan):
    - ONE scan of the full table computes digests + minhash band
      signatures for every document (the corpus side would already
      have these materialized, s12-style; here they're computed and
      scoped-persisted so batch and corpus splits read the same
      cached pass);
    - every join broadcasts a BATCH-derived table (band signatures,
      digest list, candidate pairs, batch shingle sets — all
      ingest-sized): the corpus side is only ever scanned, never
      shuffled and never collected. Plan-pinned: no SortMergeJoin,
      no Exchange on the corpus-sized stream
      (tests/test_dedup.py::test_t30_corpus_side_never_shuffles);
    - candidate verification is exact Jaccard on the cached hashed
      shingle sets, so emitted scores are exact (the t03 contract);
      candidates are bounded by band collisions — the batch probes
      the same banding a within-corpus dedup would use.
    """
    tagged = docs.withColumn("is_batch", _is_batch(F.col("doc_id")))
    # scoped-persisted like sigs: the slim (doc_id, is_batch, 32-byte
    # digest) projection feeds the corpus membership stream, the
    # broadcast batch digest list AND the final batch-doc spine — one
    # digest scan, three consumers (code-review r5)
    digests = scoped_persist(
        tagged.select("doc_id", "is_batch", F.md5("text").alias("text_hash"))
    )

    # one signature pass over the full table, split read twice from
    # the scoped cache (slim rows: doc_id, hs, bands, is_batch)
    sigs = scoped_persist(
        minhash_band_signatures(ce_hashed_shingle_sets(fan_out(docs))).withColumn(
            "is_batch", _is_batch(F.col("doc_id"))
        )
    )
    # Materialize both scoped persists BEFORE the consumers fan out
    # (VERDICT r6 #6 — t30's wide bench spread on unchanged code):
    # the plan below broadcasts several batch-derived subtrees, and
    # Spark builds broadcast exchanges on concurrent driver threads —
    # racing threads each recompute not-yet-cached partitions of the
    # same InMemoryRelation and discard the duplicates ("Block rdd_N_i
    # already exists" warnings; measured 1-3 redundant rebuilds of the
    # minhash mapInPandas stage per run, scheduling-dependent). Two
    # small count() jobs populate the caches once, deterministically;
    # every downstream consumer then reads blocks instead of racing.
    digests.count()
    sigs.count()
    bands = sigs.select(
        "doc_id", "is_batch", F.posexplode("bands").alias("band", "band_sig")
    )
    corpus_bands = bands.where(~F.col("is_batch"))
    batch_bands = bands.where(F.col("is_batch")).select(
        F.col("doc_id").alias("batch_doc"), "band", "band_sig"
    )

    # exact membership: corpus digests stream past the broadcast batch
    # digest list; output is batch-sized
    exact = (
        digests.where(~F.col("is_batch"))
        .join(
            F.broadcast(
                digests.where(F.col("is_batch")).select(
                    F.col("doc_id").alias("batch_doc"), "text_hash"
                )
            ),
            "text_hash",
        )
        .select("batch_doc")
        .distinct()
        .withColumn("is_exact_dup", F.lit(True))
    )

    # near-dup candidates: corpus bands stream past the broadcast
    # batch bands; (batch_doc, corpus_doc) distinct is candidate-sized
    candidates = (
        corpus_bands.join(F.broadcast(batch_bands), ["band", "band_sig"])
        .select("batch_doc", F.col("doc_id").alias("corpus_doc"))
        .distinct()
    )

    # exact-Jaccard verification on cached sets: corpus sets stream
    # past broadcast candidates, then broadcast batch sets attach
    sets = sigs.select("doc_id", "hs")
    verified = (
        sets.join(
            F.broadcast(candidates), sets.doc_id == candidates.corpus_doc
        )
        .select("batch_doc", F.col("hs").alias("sh_c"))
        .join(
            F.broadcast(
                sigs.where(F.col("is_batch")).select(
                    F.col("doc_id").alias("batch_doc"), F.col("hs").alias("sh_b")
                )
            ),
            "batch_doc",
        )
        .withColumn("shared", F.size(F.array_intersect("sh_b", "sh_c")))
        .withColumn(
            "jaccard",
            F.col("shared") / (F.size("sh_b") + F.size("sh_c") - F.col("shared")),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    near = verified.groupBy("batch_doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_near_dups"),
        F.round(F.max("jaccard"), 6).alias("max_jaccard"),
    )

    batch_docs = digests.where(F.col("is_batch")).select(
        F.col("doc_id").alias("batch_doc")
    )
    return (
        batch_docs.join(F.broadcast(exact), "batch_doc", "left")
        .join(F.broadcast(near), "batch_doc", "left")
        .select(
            F.col("batch_doc").alias("doc_id"),
            F.coalesce("is_exact_dup", F.lit(False)).alias("is_exact_dup"),
            F.coalesce("n_near_dups", F.lit(0).cast("bigint")).alias("n_near_dups"),
            F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
        )
    )


def _t30_oracle() -> str:
    """DuckDB replica: the t03 cross-engine MinHash pipeline restricted
    to batch×corpus candidate pairs, plus digest membership — the
    driver checks t30 value-for-value. Shares `_minhash_common_ctes`
    (the vectorized signature chain); the batch flag is re-derived from
    doc_id in the candidate join rather than carried through the
    pipeline."""
    return f"""
    WITH {_minhash_common_ctes()},
    cand AS (
      SELECT DISTINCT x.doc_id AS batch_doc, y.doc_id AS corpus_doc
      FROM bd x JOIN bd y
        ON x.band = y.band AND x.band_sig = y.band_sig
      WHERE x.doc_id % {BATCH_MOD} = {BATCH_REMAINDER}
        AND y.doc_id % {BATCH_MOD} <> {BATCH_REMAINDER}
    ),
    shr AS MATERIALIZED (
      SELECT c.batch_doc, c.corpus_doc, CAST(COUNT(*) AS BIGINT) AS shared
      FROM cand c
      JOIN eh ea ON ea.doc_id = c.batch_doc
      JOIN eh eb ON eb.doc_id = c.corpus_doc AND eb.h = ea.h
      GROUP BY 1, 2
    ),
    v AS (
      SELECT batch_doc,
             shared * 1.0 / (zb.n + zc.n - shared) AS jaccard
      FROM shr
      JOIN sz zb ON batch_doc = zb.doc_id
      JOIN sz zc ON corpus_doc = zc.doc_id
    ),
    near AS (
      SELECT batch_doc, CAST(COUNT(*) AS BIGINT) AS n_near_dups,
             ROUND(MAX(jaccard), 6) AS max_jaccard
      FROM v WHERE jaccard >= {JACCARD_THRESHOLD}
      GROUP BY batch_doc
    ),
    exact AS (
      SELECT DISTINCT b.doc_id AS batch_doc
      FROM documents b JOIN documents c
        ON md5(b.text) = md5(c.text)
      WHERE b.doc_id % {BATCH_MOD} = {BATCH_REMAINDER}
        AND c.doc_id % {BATCH_MOD} <> {BATCH_REMAINDER}
    )
    SELECT d.doc_id,
           e.batch_doc IS NOT NULL AS is_exact_dup,
           COALESCE(n.n_near_dups, 0) AS n_near_dups,
           COALESCE(n.max_jaccard, 0.0) AS max_jaccard
    FROM documents d
    LEFT JOIN exact e ON d.doc_id = e.batch_doc
    LEFT JOIN near n ON d.doc_id = n.batch_doc
    WHERE d.doc_id % {BATCH_MOD} = {BATCH_REMAINDER}
"""


@register(
    "t30_incremental_dedup",
    oracle=_t30_oracle(),
    tags=("dedup", "incremental", "minhash"),
)
def t30_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: which of the new batch's documents
    (doc_id % {BATCH_MOD} = {BATCH_REMAINDER}, ≈10% of the fixture)
    already exist in the corpus (the other 90%) — exactly (content
    digest) or nearly (MinHash-band candidates verified with exact
    shingle Jaccard ≥ {JACCARD_THRESHOLD}). The cross-corpus sibling
    of t01 (within-corpus exact) and t03 (within-corpus near): one
    full-table signature scan, then every join broadcasts a
    batch-derived table — the corpus is never shuffled. See
    `incremental_dedup` for the 100 TB plan notes."""
    return incremental_dedup(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# t33: leakage-safe train/val/test split — split by near-dup CLUSTER,
# not by document, so a near-duplicate of a training document can never
# land in the eval split (the contamination that makes eval numbers
# lie). 80/10/10 by the house md5-slice hash of the cluster id.
SPLIT_MOD = 10
SPLIT_TRAIN_BELOW = 8  # hash 0-7 → train, 8 → val, 9 → test


def _split_of(cluster_id: Column) -> Column:
    h = md5_int_hash(cluster_id.cast("string")) % SPLIT_MOD
    return (
        F.when(h < SPLIT_TRAIN_BELOW, F.lit("train"))
        .when(h == SPLIT_TRAIN_BELOW, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def _t33_oracle() -> str:
    """DuckDB replica: t12's cluster closure (t03 edges + recursive
    CTE) → cluster-hash split → per-split audit, INCLUDING the
    leakage count (near-dup pairs with endpoints in different splits
    — zero by construction, and the oracle proves the Spark side
    didn't get that zero by accident)."""
    return f"""
    WITH RECURSIVE
    p AS MATERIALIZED (SELECT doc_a, doc_b FROM ({_t03_oracle()}) t),
    e(u, v) AS MATERIALIZED (
      SELECT doc_a, doc_b FROM p UNION SELECT doc_b, doc_a FROM p
    ),
    reach(u, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM e) s
      UNION
      SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.u
    ),
    comp AS (SELECT u, MIN(r) AS c FROM reach GROUP BY u),
    hashed AS (
      SELECT d.doc_id, COALESCE(comp.c, d.doc_id) AS cluster_id,
             ('0x' || substr(md5(CAST(COALESCE(comp.c, d.doc_id) AS VARCHAR)), 1, 12))::BIGINT
               % 2147483647 % {SPLIT_MOD} AS h
      FROM documents d LEFT JOIN comp ON d.doc_id = comp.u
    ),
    assign AS (
      SELECT doc_id, cluster_id,
             CASE WHEN h < {SPLIT_TRAIN_BELOW} THEN 'train'
                  WHEN h = {SPLIT_TRAIN_BELOW} THEN 'val'
                  ELSE 'test' END AS split
      FROM hashed
    ),
    xp AS (
      SELECT sa.split AS split_a, sb.split AS split_b FROM p
      JOIN assign sa ON p.doc_a = sa.doc_id
      JOIN assign sb ON p.doc_b = sb.doc_id
      WHERE sa.split <> sb.split
    ),
    cross_ends AS (
      SELECT split_a AS split FROM xp
      UNION ALL
      SELECT split_b AS split FROM xp
    ),
    leak AS (SELECT split, COUNT(*) AS n FROM cross_ends GROUP BY split)
    SELECT a.split,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT a.cluster_id) AS BIGINT) AS n_clusters,
           CAST(COALESCE(MAX(leak.n), 0) AS BIGINT) AS n_cross_split_pairs
    FROM assign a LEFT JOIN leak ON a.split = leak.split
    GROUP BY a.split
"""


@register(
    "t33_leakage_safe_split",
    oracle=_t33_oracle(),
    tags=("dedup", "split", "leakage", "clusters"),
)
def t33_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: assign each document to a
    split by the hash of its NEAR-DUP CLUSTER (t12's connected
    components over the t03 edge set), not of the document — so a
    near-duplicate of a training document can NEVER land in val/test.
    A doc-hash split silently leaks: every near-dup pair has a
    2·p·(1-p) chance of straddling train/eval, and eval numbers lie
    exactly on the examples that matter. The emitted audit makes the
    guarantee measurable: n_cross_split_pairs counts near-dup pairs
    whose endpoints fall in different splits — ZERO by construction
    here, and the oracle recomputes it independently so the zero is
    verified, not assumed.

    Plan: the pair pipeline and cluster propagation are t03/t12's
    audited shapes (computed ONCE — the pair DataFrame feeds both the
    clustering and the leakage audit); the split assignment is one
    map-only expression on the cluster labels; the audit joins the
    (candidate-sized) pair list against the assignment on doc_id.
    Deterministic end-to-end: hash splits, no RNG."""
    docs = table(spark, sf_dir, "documents").select(F.col("doc_id").alias("v"))
    pairs = scoped_persist(
        t03_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    )
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")), docs
    )
    assign = comp.select(
        F.col("v").alias("doc_id"),
        F.col("label").cast("bigint").alias("cluster_id"),
        _split_of(F.col("label")).alias("split"),
    )
    per_split = assign.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
    )
    sa = assign.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = assign.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    x = pairs.join(sa, "doc_a").join(sb, "doc_b").where(
        F.col("split_a") != F.col("split_b")
    )
    ends = x.select(F.col("split_a").alias("split")).union(
        x.select(F.col("split_b").alias("split"))
    )
    leak = ends.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_split.join(leak, "split", "left")
        .select(
            "split",
            "n_docs",
            "n_clusters",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_cross_split_pairs"),
        )
    )


# ---------------------------------------------------------------------------
# t44: boilerplate heavy-hitters — the top-duplicated-passage report
# ---------------------------------------------------------------------------

BOILERPLATE_TOP_K = 20


def boilerplate_blocks(
    docs: DataFrame, para_tokens: int = PARA_TOKENS, k: int = BOILERPLATE_TOP_K
) -> DataFrame:
    """The corpus-cleaning report run BEFORE t26's per-doc dedup: the
    top-{k} most-duplicated {para_tokens}-token blocks across the
    corpus — occurrence count, document spread, SOURCE spread (a block
    hot in many sources is syndication/licensing boilerplate; hot in
    one source is a template) and a representative block text. This is
    the heavy-hitter view a pipeline operator reads to decide removal
    rules; t26 then measures per-document contamination.

    Plan at 100 TB (t01's digest-exchange discipline):
    - the fact exchange carries 32-byte digests, never block text: one
      keyed aggregate at (bh, doc) grain (map-side combine collapses
      within-doc repeats), a bh-grain roll-up, and a distinct-source
      projection at (bh, source) grain — no countDistinct Expand;
    - top-k is TakeOrderedAndProject (n_occurrences DESC, bh — total
      order, deterministic at the limit boundary);
    - the representative TEXT is recovered only for the k winners: a
      second map-only pass over the corpus semi-joins the broadcast
      k-row digest list and min()-aggregates the block string — the
      standard top-k-then-fetch-details shape, so block bodies never
      shuffle at corpus scale."""
    ws = F.split(F.lower(F.col("text")), " ")
    n_blocks = F.ceil(F.size("ws") / F.lit(para_tokens)).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.array_join(F.slice("ws", i * para_tokens + 1, para_tokens), " "),
    )
    b = (
        docs.select("doc_id", "source", ws.alias("ws"))
        .select("doc_id", "source", F.explode(blocks).alias("block"))
        .select("doc_id", "source", F.md5("block").alias("bh"), "block")
    )
    pd_ = b.groupBy("bh", "doc_id", "source").agg(
        F.count(F.lit(1)).alias("pos_cnt")
    )
    per_hash = pd_.groupBy("bh").agg(
        F.sum("pos_cnt").cast("bigint").alias("n_occurrences"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    n_src = (
        pd_.select("bh", "source")
        .distinct()
        .groupBy("bh")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sources"))
    )
    top = (
        per_hash.join(n_src, "bh")
        .where(F.col("n_docs") >= 2)
        .orderBy(F.col("n_occurrences").desc(), "bh")
        .limit(k)
    )
    sample = (
        b.join(F.broadcast(top.select("bh")), "bh")
        .groupBy("bh")
        .agg(F.min("block").alias("sample_block"))
    )
    return top.join(F.broadcast(sample), "bh").select(
        "bh", "n_occurrences", "n_docs", "n_sources", "sample_block"
    )


@register(
    "t44_boilerplate_blocks",
    oracle=f"""
    WITH w AS MATERIALIZED (
      SELECT doc_id, source, string_split(lower(text), ' ') AS ws FROM documents
    ),
    b AS MATERIALIZED (
      SELECT doc_id, source, unnest(
               [list_aggregate(ws[i * {PARA_TOKENS} + 1 : i * {PARA_TOKENS} + {PARA_TOKENS}], 'string_agg', ' ')
                for i in generate_series(0, CAST(ceil(len(ws) * 1.0 / {PARA_TOKENS}) AS BIGINT) - 1)]
             ) AS block
      FROM w
    ),
    e AS MATERIALIZED (SELECT doc_id, source, md5(block) AS bh, block FROM b),
    ph AS (
      SELECT bh,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             MIN(block) AS sample_block
      FROM e GROUP BY bh
    )
    SELECT bh, n_occurrences, n_docs, n_sources, sample_block
    FROM ph WHERE n_docs >= 2
    ORDER BY n_occurrences DESC, bh LIMIT {BOILERPLATE_TOP_K}
    """,
    tags=("dedup", "exact", "paragraph", "heavy-hitter"),
)
def t44_boilerplate_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`boilerplate_blocks` over the documents corpus: the top-{20}
    most-duplicated {16}-token blocks with occurrence/document/source
    spreads and a deterministic representative text (min over the
    digest's block strings — positions sharing a bh share bytes
    anyway, md5-collision-free w.h.p.). Block algebra identical to
    t26's (hash-green there), so the oracle pins the heavy-hitter
    ranking, the spread counts AND the k-boundary tiebreak."""
    return boilerplate_blocks(fan_out(table(spark, sf_dir, "documents")))


# t46 band math, derived from JACCARD_THRESHOLD (ADVICE r9 #3: the
# bucket origin was hard-coded 0.5 in BOTH the Spark expression and
# the oracle, so a threshold move would shift bands on both sides
# simultaneously and the value hash would stay green while the audit
# silently drifted). Width 0.05 → integer scale 20; both engines use
# the SAME (j - origin) * scale multiplication so boundary doubles
# land in the same bucket bit-for-bit. Low side clamped to 0: the
# ground truth only emits j >= threshold, but an FP hair below the
# origin must not produce bucket -1.
_T46_BUCKET_W = 0.05
_T46_BUCKET_SCALE = round(1 / _T46_BUCKET_W)  # 20
_T46_N_BUCKETS = round((1.0 - JACCARD_THRESHOLD) / _T46_BUCKET_W)  # 10


def _t46_oracle() -> str:
    """Audit replica: the t02 exact-Jaccard replica and the t03
    MinHash-LSH replica as CTEs — the SAME strings those oracles run,
    so the audit cannot drift from the pipelines it audits (the s23
    pattern) — left-joined and bucketed into 0.05-wide Jaccard bands.
    Both engines bucket the identical 6-dp-rounded double with the
    identical FP expression, so boundary values land in the same
    bucket bit-for-bit."""
    return f"""
    WITH tru AS ({_t02_oracle()}),
    fnd AS ({_t03_oracle()}),
    j AS (
      SELECT t.jaccard,
             CASE WHEN f.doc_a IS NOT NULL THEN 1 ELSE 0 END AS found
      FROM tru t
      LEFT JOIN fnd f ON f.doc_a = t.doc_a AND f.doc_b = t.doc_b
    ),
    b AS (
      SELECT LEAST(GREATEST(CAST(FLOOR(
               (jaccard - {JACCARD_THRESHOLD}) * {_T46_BUCKET_SCALE}
             ) AS INTEGER), 0), {_T46_N_BUCKETS - 1}) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_true,
             CAST(SUM(found) AS BIGINT) AS n_found
      FROM j GROUP BY 1
    )
    SELECT bucket,
           CAST(ROUND({JACCARD_THRESHOLD} + bucket * {_T46_BUCKET_W}, 2)
                AS DOUBLE) AS jaccard_lo,
           n_true, n_found,
           ROUND(n_found * 1.0 / n_true, 6) AS recall
    FROM b
"""


@register(
    "t46_lsh_recall_audit",
    oracle=_t46_oracle(),
    tags=("dedup", "audit", "lsh", "minhash"),
)
def t46_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded-LSH S-curve, MEASURED: per 0.05-wide Jaccard band,
    how many of the exact near-dup pairs (t02's ground truth) did the
    MinHash+LSH pipeline (t03) surface? This is the dedup twin of
    s23's ANN recall audit — the acceptance number a production dedup
    deployment watches when retuning (bands x rows) or shingle size:
    banding theory says recall follows 1-(1-j^r)^b, so misses
    concentrate in the lowest band and the top band must read 1.0
    (identical docs share every band signature). Composes the two
    REGISTERED pipelines unchanged; precision is structurally 1
    (t03 exact-verifies its candidates), so the audit reports the
    recall axis only.

    Scale shape: both inputs are output-bound pair sets (capped
    postings / bucket-bounded candidates), the audit join is on those
    pairs — O(|true pairs|), trivially small next to either input
    pipeline — and the rollup is a 10-row partial agg. At 100 TB
    you'd sample doc_a residues (the t22/t02 slice protocol) rather
    than replay the full ground truth; the per-band algebra is
    unchanged.

    Each input pipeline is MATERIALIZED (scoped persist + count()
    barrier) before the audit join fans out — VERDICT r9 #1: both
    pipelines carry scoped persists whose partitions the join's two
    subtrees would otherwise race to compute concurrently before
    either populates the cache (the t30 r7 broadcast-race disease;
    the driver's r9 bench run read t46 bimodal at 3.8-10.4s for
    exactly this reason). The pair sets are output-bound and tiny, so
    the barrier costs ~nothing and t46 prices at t02+t03+ε, every
    run."""
    tru = scoped_persist(t02_ngram_jaccard_pairs(spark, sf_dir))
    tru.count()  # barrier: t02's staging computed by ONE consumer
    fnd = scoped_persist(
        t03_minhash_lsh_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("found", F.lit(1))
    )
    fnd.count()  # barrier: t03's staging computed by ONE consumer
    joined = tru.join(fnd, ["doc_a", "doc_b"], "left")
    bucket = F.least(
        F.greatest(
            F.floor(
                (F.col("jaccard") - F.lit(JACCARD_THRESHOLD))
                * _T46_BUCKET_SCALE
            ).cast("int"),
            F.lit(0),
        ),
        F.lit(_T46_N_BUCKETS - 1),
    )
    return (
        joined.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true"),
            F.sum(F.coalesce(F.col("found"), F.lit(0))).cast("bigint").alias("n_found"),
        )
        .select(
            "bucket",
            F.round(
                F.lit(JACCARD_THRESHOLD) + F.col("bucket") * _T46_BUCKET_W, 2
            ).alias("jaccard_lo"),
            "n_true",
            "n_found",
            F.round(F.col("n_found") / F.col("n_true"), 6).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# t47: semantic dedup — cluster-then-prune (SemDeDup), the production
# embedding-dedup path at corpus scale
# ---------------------------------------------------------------------------


def semantic_dedup(
    emb: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    n_cells: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    corpus embeddings with the shared spherical k-means quantizer,
    then find semantic duplicates WITHIN each cluster only and keep
    the lowest-id member of every duplicate relation. This is the
    third member of the embedding-dedup ladder and the one production
    corpora run: t09 is the exact all-pairs verifier (quadratic), t10
    prunes candidates by hyperplane-LSH bucket, t47 prunes by
    semantic CELL — which is the grouping a curated-corpus pipeline
    already maintains (the SemDeDup insight: k-means cells are where
    semantic near-dups live, so the all-pairs problem factors into
    K independent (n/K)^2 problems; cross-cell pairs are forgone BY
    DESIGN — the paper's recall/cost trade).

    Per cell, candidates come from ONE float64 GEMM in an Arrow batch
    (t09's candidate/rescore split: GEMM at a 1e-6-loosened threshold
    for vectorized decisions, survivors re-scored with the
    sequential-fold `cosine` — the identical IEEE operation order the
    DuckDB oracle executes, so emitted scores are bit-exact
    cross-engine). Drop rule: vector v is dropped iff some same-cell
    u < v has cosine(u, v) >= threshold; the emitted row carries the
    smallest such u (`dup_of`), the duplicate count and the best
    similarity — the audit columns a pruning run reports.

    100 TB shape: the fit is sample-bounded (`_kmeans_centroids` —
    md5-ordered per-partition top-N, a few MB to the driver);
    assignment is the map-only Arrow-GEMM projection shared with the
    whole IVF family (`_assign_cells` — zero corpus-keyed exchanges
    before the single cell-keyed exchange that co-locates each cell);
    per-cell work is an independent dense problem sized by n/K, and K
    scales WITH the corpus (SemDeDup runs 50k+ clusters at
    billion-doc scale, keeping cells roughly constant-sized; a hot
    cell is the same skew hazard as an IVF cell and takes the same
    remedy — s22's rebalance/split). Reference parity: composes the
    reference's shuffle-group + per-key-reduce mechanism
    (Worker.fs:39-43, 89-96) with the cell id as the key."""
    import numpy as np
    import pandas as pd

    from fsharp_mapreduce_spark.functions.similarity import (
        _assign_cells,
        _kmeans_centroids,
        cosine,
        semdedup_cells_for,
    )

    # K scales with the corpus (semdedup_cells_for — one footer-cheap
    # count): per-cell work is a dense (n/K)^2 GEMM, so a fixed K
    # makes the curve quadratic (measured per-row 0.99x at sf10 with
    # K=16; 0.16x at sf5.0 once K follows the capacity rule).
    cents = _kmeans_centroids(emb, n_cells or semdedup_cells_for(emb.count()))
    assigned = scoped_persist(
        _assign_cells(emb.select("vec_id", "embedding"), cents)
    )
    loose = threshold - 1e-6

    def cell_candidates(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf["cell_id"].iloc[0])
        ids = pdf["vec_id"].to_numpy()
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= loose
        va, vb = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame(
            {"cell_id": np.full(len(lo), cell, dtype=np.int32), "vec_a": lo, "vec_b": hi}
        )

    cands = assigned.groupBy("cell_id").applyInPandas(
        cell_candidates, "cell_id int, vec_a long, vec_b long"
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    scored = (
        cands.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("sim", cosine(F.col("ea"), F.col("eb")))
        .where(F.col("sim") >= F.lit(threshold))
    )
    return (
        scored.groupBy("vec_b", "cell_id")
        .agg(
            F.min("vec_a").alias("dup_of"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.round(F.max("sim"), 6).alias("max_sim"),
        )
        .select(
            F.col("vec_b").alias("vec_id"),
            F.col("cell_id").cast("int").alias("cell_id"),
            "dup_of",
            "n_dups",
            "max_sim",
        )
        .orderBy("vec_id")
    )


def _t47_oracle_for(sf_dir: str) -> str | None:
    """Data-derived oracle: replay the deterministic centroid fit from
    parquet (`_replay_centroid_fit` — the s04 pattern), inline the
    centroids as literals, replay assignment (argmax cosine, tie ->
    lower cell) and the within-cell pair scan with the shared native
    dot, and aggregate the identical drop rule. Valid only for the
    sf_dir it was generated from (oracle_factory; the differential
    suite regenerates per SF)."""
    from fsharp_mapreduce_spark.functions.similarity import (
        _DOT_SQL,
        _replay_centroid_fit,
        _seq_norm,
        parquet_num_rows,
        semdedup_cells_for,
    )

    cents = _replay_centroid_fit(
        sf_dir,
        k=semdedup_cells_for(parquet_num_rows(f"{sf_dir}/embeddings.parquet")),
    )
    cent_rows = ", ".join(
        "({}, [{}], {})".format(
            i, ", ".join(repr(float(v)) for v in c), repr(_seq_norm(c))
        )
        for i, c in enumerate(cents)
    )
    return f"""
    WITH cents(cell_id, ce, cn) AS (VALUES {cent_rows}),
    en AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS a,
             sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS nrm
      FROM embeddings
    ),
    scored_cells AS (
      SELECT e.vec_id, e.a, e.nrm, c.cell_id,
             (list_dot_product(e.a, CAST(c.ce AS DOUBLE[])) / (e.nrm * c.cn)) AS csim
      FROM en e CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, a, nrm, cell_id FROM (
        SELECT vec_id, a, nrm, cell_id,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id ORDER BY csim DESC, cell_id
               ) AS r
        FROM scored_cells) WHERE r = 1
    ),
    pairs AS (
      SELECT x.cell_id, x.vec_id AS vec_a, y.vec_id AS vec_b,
             list_dot_product(x.a, y.a) / (x.nrm * y.nrm) AS sim
      FROM assigned x
      JOIN assigned y ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
    )
    SELECT vec_b AS vec_id,
           CAST(cell_id AS INTEGER) AS cell_id,
           MIN(vec_a) AS dup_of,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           ROUND(MAX(sim), 6) AS max_sim
    FROM pairs WHERE sim >= {COSINE_DUP_THRESHOLD}
    GROUP BY vec_b, cell_id
"""


@register(
    "t47_semantic_dedup",
    oracle_factory=_t47_oracle_for,
    tags=("dedup", "embedding", "semantic", "kmeans"),
)
def t47_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`semantic_dedup` over the embeddings table: spherical-k-means
    cells, within-cell cosine >= {COSINE_DUP_THRESHOLD} duplicate
    relations, keep-lowest-id — each dropped vector reported with its
    representative, duplicate count and best similarity. The
    cluster-then-prune member of the embedding-dedup family (exact
    t09 / LSH t10), oracle-checked value-for-value via the replayed
    centroid fit."""
    return semantic_dedup(table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# t48: duplicated-span extraction — exact SUBSTRING dedup at k-gram
# granularity (the Lee et al. 2022 operation, hash-factored)
# ---------------------------------------------------------------------------

# Tokens per gram: duplicated text shorter than SPAN_GRAM tokens is
# below the reporting floor (Lee et al. use 50 BPE tokens at web
# scale; 8 fits the fixture's ~dozens-of-tokens documents while
# keeping chance 8-gram collisions over the 31-word vocabulary
# negligible — 31^8 ≈ 8.5e11 possible grams).
SPAN_GRAM = 8


T48_GRAM_SCHEMA = (
    "doc_id long, pos int, h1 long, h2 long"
)


def _gram_digests(docs: DataFrame, k: int) -> DataFrame:
    """Map-only Arrow pass: (doc_id, text) -> one row per k-token
    window carrying the window's 128-bit md5 digest as two int64s.
    A 64-bit key would collide at real corpus scale (~10^13 grams ->
    millions of birthday collisions, each a false duplicated gram);
    128 bits keeps the false-dup probability negligible at any
    conceivable corpus size while shuffling 16 bytes/row. Python-side
    hashing on purpose: the declarative formulation needs either a
    higher-order-function lambda (interpreted, NOT whole-stage
    codegen — measured 222s vs 22s at sf5.0 for the same output) or
    window leads over posexploded tokens (codegen-fast but costs a
    full-corpus exchange on doc_id before any duplication evidence
    exists — wrong at 100 TB); the Arrow pass is both map-only and
    C-speed (hashlib.md5)."""
    from fsharp_mapreduce_spark.session import ensure_package_shipped

    ensure_package_shipped(docs.sparkSession)

    def run(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            d_out, p_out, h1_out, h2_out = [], [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                ts = (text or "").lower().split(" ")
                n = len(ts) - k + 1
                for p in range(max(n, 0)):
                    dg = hashlib.md5(" ".join(ts[p : p + k]).encode()).digest()
                    d_out.append(did)
                    p_out.append(p)
                    h1_out.append(int.from_bytes(dg[:8], "little", signed=True))
                    h2_out.append(int.from_bytes(dg[8:], "little", signed=True))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(d_out, dtype="int64"),
                    "pos": pd.array(p_out, dtype="int32"),
                    "h1": pd.array(h1_out, dtype="int64"),
                    "h2": pd.array(h2_out, dtype="int64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(run, T48_GRAM_SCHEMA)


def duplicate_spans(docs: DataFrame, k: int = SPAN_GRAM) -> DataFrame:
    """Maximal duplicated token spans per document — the exact-
    substring member of the dedup family (Lee et al. 2022,
    arXiv:2107.06499: "deduplicating training data makes language
    models better" removes repeated SUBSTRINGS, not just repeated
    documents). Completes the granularity ladder: t01 dedups whole
    documents, t26 paragraphs, t44 heavy-hitter blocks, t02/t03
    score document PAIRS — t48 reports the duplicated CHARACTER of a
    document itself: every maximal token interval all of whose
    k-grams occur >= 2 times corpus-wide (within-doc repeats count,
    as in the paper). The suffix-array step of the paper is factored
    into hash algebra: a token interval is duplicated iff each of its
    k-grams is, so (1) emit (doc, pos, digest(gram)) for every
    k-window — one map-only Arrow pass (`_gram_digests`); (2) keep
    grams whose corpus occurrence count >= 2 — one digest-keyed
    exchange with map-side partial aggregation, then a co-partitioned
    semi-join (NOT a count-over-window: a boilerplate gram hot in
    millions of documents would make WindowExec buffer the whole
    partition; hash-agg + streamed join has no per-key residency);
    (3) merge surviving positions into maximal spans with the
    gaps-and-islands window per document — two fixed-length
    intervals merge iff their starts differ by <= k, so one lag()
    suffices. 100 TB shape: the only corpus-mass exchange is the
    digest one (16-byte keys, the t03 argument); span assembly
    shuffles only the duplicated residue, keyed by doc_id.

    Reference parity: the shuffle-group + per-key-reduce mechanism
    (Worker.fs:39-43, 89-96) with the gram digest as the key, then
    doc_id as the key — two chained MapReduce rounds, which is
    exactly how the reference would express it."""
    from pyspark.sql import Window

    # Both semi-join sides read the gram table; without the persist
    # the scan + Arrow hashing pass runs once per side. At real scale
    # this staging is written out as the gram index (bucketed by
    # digest — the m14 signature-table argument), not cached.
    grams = scoped_persist(_gram_digests(docs, k))
    dup_hashes = (
        grams.groupBy("h1", "h2")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
    )
    dup = grams.join(
        dup_hashes.select("h1", "h2"), ["h1", "h2"], "left_semi"
    ).select("doc_id", "pos")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        dup.withColumn("prev", F.lag("pos").over(wd))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > k), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(wd))
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_grams",
        )
        .orderBy("doc_id", "span_start")
    )


def _t48_oracle() -> str:
    """Analytic replica: gram occurrence counting on the RAW
    space-joined k-window string (the digest never reaches the
    output, so equality of gram STRINGS is the exact semantics the
    engine's 128-bit digest grouping implements — and the string
    side is collision-free by construction), then the identical
    island merge. Window-count here (the oracle runs at verification
    scale); the engine side uses the skew-safe agg + semi-join."""
    k = SPAN_GRAM
    return f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(generate_series(0, len(ws) - {k})) AS pos,
             unnest([list_aggregate(ws[i + 1 : i + {k}], 'string_agg', ' ')
                     for i in generate_series(0, len(ws) - {k})]) AS h
      FROM w WHERE len(ws) >= {k}
    ),
    occ AS (
      SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS c FROM g
    ),
    dup AS (SELECT doc_id, pos FROM occ WHERE c >= 2),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN LAG(pos) OVER w2 IS NULL
                    OR pos - LAG(pos) OVER w2 > {k}
                  THEN 1 ELSE 0 END AS brk
      FROM dup WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
    ),
    isl2 AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {k - 1} AS BIGINT) AS span_end,
           CAST(MAX(pos) - MIN(pos) + {k} AS BIGINT) AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_grams
    FROM isl2 GROUP BY doc_id, island
"""


@register(
    "t48_duplicate_spans",
    oracle=_t48_oracle(),
    tags=("dedup", "substring", "spans", "ngram"),
)
def t48_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`duplicate_spans` over the documents table: every maximal
    token interval whose {SPAN_GRAM}-grams all occur at least twice
    corpus-wide, with its token extent and merged gram count — the
    per-document duplicated-substring report an exact-substring
    dedup pass consumes."""
    return duplicate_spans(fan_out(table(spark, sf_dir, "documents")))
