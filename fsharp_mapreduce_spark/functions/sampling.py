"""Deterministic sampling operators (north-star extension): the
reproducibility primitive every training-data pipeline needs — a
sample defined by a pure function of the ROW KEY, not an RNG state,
so it is stable across engines, runs, partitionings and retries, and
any row's membership can be audited after the fact.

All three operators ride the cross-engine md5 hash family
(`md5_int_hash`, functions/dedup.py): Spark, numpy and DuckDB compute
identical hash values, which is what lets the driver value-hash-check
a *sample* — with `rand()`-based sampling the oracle could never
agree. Reference parity note: the reference has no sampling operator
(its only source is the synthetic dice stream, Example-Job.fs:37-49);
these follow SURVEY.md §2c's pattern of expressing the additive
surface with pure Catalyst expressions.

Scale design (100 TB):
- hash-bernoulli (t13/t14) is a pure filter — predicate-pushdown
  friendly, zero shuffle, embarrassingly parallel, and composable
  (the same key always lands in the same split: train/eval splits
  stay disjoint forever);
- fixed-size (t15) is hash-order top-k — TakeOrderedAndProject:
  per-partition heaps of k + a driver merge, no global sort, no
  single-partition stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fsharp_mapreduce_spark.functions.dedup import M31, md5_int_hash
from fsharp_mapreduce_spark.registry import register, table

SAMPLE_PCT = 5  # t13: keep ~5% of lineitem
STRATA_PCT = {"click": 50, "view": 20}  # t14: per-type rates
STRATA_DEFAULT_PCT = 5
FIXED_SAMPLE_K = 1000  # t15


def hash_bucket(key, buckets: int = 100):
    """Deterministic [0, buckets) bucket for a string key — the md5
    slice family, so membership is identical in Spark and DuckDB."""
    return md5_int_hash(key) % buckets


def _sql_bucket(key_sql: str, buckets: int = 100) -> str:
    return f"(('0x' || substr(md5({key_sql}), 1, 12))::BIGINT % {M31}) % {buckets}"


@register(
    "t13_hash_sample",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice AS price
    FROM lineitem
    WHERE {_sql_bucket("l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR")}
          < {SAMPLE_PCT}
    """,
    tags=("sampling", "bernoulli"),
)
def t13_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {5}% Bernoulli sample of lineitem, keyed on the
    composite row key. A pure filter expression: no shuffle, no RNG
    state, rerun/engine/partitioning-invariant — the property that
    keeps training and eval splits disjoint across pipeline runs. At
    100 TB this is a map-only scan; the hash cannot be pushed to
    parquet, but row-group pruning on other predicates composes
    freely."""
    li = table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "_", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return li.where(hash_bucket(key) < SAMPLE_PCT).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.col("l_extendedprice").alias("price"),
    )


def _t14_oracle() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(STRATA_PCT.items())
    )
    return f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sampled,
           CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id
    FROM events
    WHERE {_sql_bucket("event_id::VARCHAR")}
          < CASE event_type {cases} ELSE {STRATA_DEFAULT_PCT} END
    GROUP BY event_type
"""


@register("t14_stratified_sample", oracle=_t14_oracle(), tags=("sampling", "stratified"))
def t14_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum keep-rates
    (CASE on the stratum column) over the same key-hash — upsample
    rare event types, downsample the bulk, one scan, zero shuffle
    before the audit aggregate. The registered output is the
    per-stratum sample audit (count + id range) so the oracle check
    pins both membership and stratification."""
    ev = table(spark, sf_dir, "events")
    rate = F.lit(STRATA_DEFAULT_PCT)
    for k, v in sorted(STRATA_PCT.items()):
        rate = F.when(F.col("event_type") == k, v).otherwise(rate)
    sampled = ev.where(hash_bucket(F.col("event_id").cast("string")) < rate)
    return sampled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("sampled"),
        F.min("event_id").cast("bigint").alias("min_id"),
        F.max("event_id").cast("bigint").alias("max_id"),
    )


@register(
    "t15_fixed_size_sample",
    oracle=f"""
    SELECT doc_id, {_sql_bucket("doc_id::VARCHAR", 1000000007)} AS h
    FROM documents
    ORDER BY h, doc_id
    LIMIT {FIXED_SAMPLE_K}
    """,
    tags=("sampling", "topk"),
)
def t15_fixed_size_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k uniform sample: order by the key hash (a deterministic
    uniform permutation) and take the first k. Spark plans
    TakeOrderedAndProject — per-partition size-k heaps merged on the
    driver, no global sort, no single-partition exchange; the idiom
    scales to any corpus size with k-bounded memory. Ties cannot occur
    (hash collisions are broken by doc_id)."""
    docs = table(spark, sf_dir, "documents")
    h = hash_bucket(F.col("doc_id").cast("string"), 1000000007)
    return (
        docs.select("doc_id", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(FIXED_SAMPLE_K)
    )


# t27: mixture rebalancing. B controls rate granularity; kept small
# enough that h * n_docs stays in BIGINT range even at 100 TB row
# counts (1e6 * 1e12 < 2^63) — the membership test is EXACT integer
# arithmetic on both engines, no float rate thresholds.
MIX_BUCKETS = 1_000_000


@register(
    "t27_mixture_rebalance",
    oracle=f"""
    WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY 1),
    m AS (SELECT MIN(n_docs) AS min_docs FROM c),
    k AS (
      SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM documents d JOIN c USING (source) CROSS JOIN m
      WHERE {_sql_bucket("d.doc_id::VARCHAR", MIX_BUCKETS)} * c.n_docs
            < m.min_docs * {MIX_BUCKETS}
      GROUP BY 1
    )
    SELECT c.source, c.n_docs,
           COALESCE(k.n_kept, 0) AS n_kept,
           ROUND(m.min_docs * 1.0 / c.n_docs, 6) AS target_rate,
           ROUND(COALESCE(k.n_kept, 0) * 1.0 / c.n_docs, 6) AS achieved_rate
    FROM c LEFT JOIN k USING (source) CROSS JOIN m
    """,
    tags=("sampling", "mixture"),
)
def t27_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture rebalancing — the step that turns a skewed crawl
    into the target training mixture: compute per-source document
    counts, derive the per-source keep-rate that equalizes every
    source to the smallest one (uniform target mixture at the maximum
    feasible total), and take a deterministic hash sample at exactly
    that rate. Output is the per-source audit (counts, target and
    achieved rate).

    Determinism at 100 TB: the keep decision is
    ``hash(doc_id) % {MIX_BUCKETS} * n_source < min_docs * {MIX_BUCKETS}``
    — pure BIGINT arithmetic, so membership is bit-identical across
    engines, reruns, and partitionings (no float thresholds, no RNG).
    Plan: one vocabulary-of-sources aggregate (broadcast back), the
    membership test is a map-only filter over the corpus, the audit a
    keyed aggregate. The source-count table and min-count scalar
    broadcast; the corpus never shuffles to be sampled."""
    docs = table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    m = c.agg(F.min("n_docs").alias("min_docs"))
    h = hash_bucket(F.col("doc_id").cast("string"), MIX_BUCKETS)
    kept = (
        docs.select("doc_id", "source")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(m))
        .where(h * F.col("n_docs") < F.col("min_docs") * F.lit(MIX_BUCKETS))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    return (
        c.join(kept, "source", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.round(F.col("min_docs") / F.col("n_docs"), 6).alias("target_rate"),
            F.round(F.coalesce("n_kept", F.lit(0)) / F.col("n_docs"), 6).alias(
                "achieved_rate"
            ),
        )
    )


SHUFFLE_SEED = 20260814  # epoch seed — change it, get a fresh permutation


def deterministic_shuffle(
    docs: DataFrame, key: str = "doc_id", seed: int = SHUFFLE_SEED
) -> DataFrame:
    """Reproducible corpus permutation — the epoch shuffle a training
    run needs to survive retries, partial re-runs, and cluster-shape
    changes WITHOUT an RNG: shuffle_pos = global rank in
    md5(seed ‖ key) order (cross-engine hash family, key tiebreak).
    Same seed ⇒ byte-identical order on any cluster; next epoch is
    seed+1, not a mutable RNG state. The ranking is q31's two-pass
    range-partitioned `global_row_numbers` — no single-partition
    stage, so the permutation of a 100 TB corpus parallelizes like
    any other sort."""
    from fsharp_mapreduce_spark.operators.windows import global_row_numbers

    hashed = docs.select(
        F.col(key),
        md5_int_hash(F.concat_ws("|", F.lit(str(seed)), F.col(key).cast("string"))).alias(
            "_h"
        ),
    )
    ranked = global_row_numbers(hashed, ["_h", key])
    return ranked.select(
        key, F.col("_h").cast("bigint").alias("h"), F.col("rn").cast("bigint").alias("shuffle_pos")
    )


@register(
    "t38_deterministic_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5('{SHUFFLE_SEED}' || '|' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
               % 2147483647 AS h
      FROM documents
    )
    SELECT doc_id, CAST(h AS BIGINT) AS h,
           CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS shuffle_pos
    FROM h
    """,
    tags=("sampling", "shuffle", "ordering", "training"),
)
def t38_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`deterministic_shuffle` over the document corpus: every doc
    gets a reproducible epoch position (md5-hash order, q31's
    range-partitioned two-pass ranks — plan has no Exchange
    SinglePartition, pinned). The oracle ranks the identical hashes
    with a plain window: the value-hash match proves the distributed
    two-pass permutation equals the single-node sort."""
    docs = table(spark, sf_dir, "documents")
    return deterministic_shuffle(docs)


# t39: deterministic WEIGHTED sampling (Efraimidis-Spirakis A-ES) —
# the quality-weighted complement to t13/t14's uniform hash-bernoulli:
# row i gets key u_i^(1/w_i) (equivalently ln(u_i)/w_i, monotone) with
# u_i a pure hash-uniform in (0,1], and the sample is the top-k keys.
# Inclusion probability is proportional to weight WITHOUT replacement
# (the A-ES guarantee) yet the sample stays a pure function of the row
# key — rerun/engine/partitioning-invariant like every sampler here.
WEIGHTED_SAMPLE_K = 200
WEIGHTED_SEED = 7


def weighted_sample(
    df: DataFrame, key, weight, k: int = WEIGHTED_SAMPLE_K, seed: int = WEIGHTED_SEED
) -> DataFrame:
    """Efraimidis-Spirakis weighted reservoir sampling as a DataFrame
    op: score = ln(u)/w with u = (md5_hash(seed‖key)+1)/M31 ∈ (0,1],
    take the k largest scores. Deterministic (no RNG state) and
    distributed as TakeOrderedAndProject — per-partition heaps of k,
    driver merge, no global sort. Scores are ranked ROUNDED to 12 dp
    (house membership-stability rule: Spark's Math.log and DuckDB's
    libm ln may differ in the last ulp — ~1e-15 relative — so ranking
    raw doubles could flip the k-boundary across engines; the 1e-12
    grain is far above ulp noise and far below score spacing), with
    the key as tiebreak. At 100 TB this is the quality-weighted
    corpus-selection primitive: weights come from a scoring pass
    (t06/t20/t21) and the sample is auditable row by row."""
    h = md5_int_hash(F.concat_ws("|", F.lit(str(seed)), key.cast("string")))
    u = (h + F.lit(1)).cast("double") / F.lit(float(M31))
    w = F.greatest(weight.cast("double"), F.lit(1.0))
    # + 0.0 normalizes IEEE negative zero (a tiny negative score
    # rounds to -0.0 in DuckDB but 0.0 in Spark — the %.9g canonical
    # form renders them differently, and a total-order sort could
    # even rank them apart); -0.0 + 0.0 == +0.0 exactly
    score = F.round(F.log(u) / w, 12) + F.lit(0.0)
    return (
        df.withColumn("_ws_score", score)
        .orderBy(F.col("_ws_score").desc(), key)
        .limit(k)
    )


@register(
    "t39_weighted_sample",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, GREATEST(n_chars, 1) AS w,
             ROUND(
               ln((('0x' || substr(md5('{WEIGHTED_SEED}' || '|' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                    % {M31} + 1) / {M31}.0)
               / GREATEST(n_chars, 1), 12) + 0 AS s
      FROM documents
    ),
    top AS (
      SELECT doc_id, lang, w, s FROM scored
      ORDER BY s DESC, doc_id LIMIT {WEIGHTED_SAMPLE_K}
    )
    SELECT doc_id, lang,
           CAST(w AS BIGINT) AS weight,
           ROUND(s, 6) + 0 AS score
    FROM top
    """,
    tags=("sampling", "weighted", "training"),
)
def t39_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`weighted_sample` over documents with n_chars as the weight —
    longer (higher-value) documents are proportionally likelier to be
    selected, without replacement, yet membership is a pure hash
    function of doc_id. The oracle replays u, ln(u)/w and the rounded
    ranking value-for-value, so the hash match pins the exact sample
    MEMBERSHIP, not just its size. Emitted score is display-rounded
    to 6 dp on both engines."""
    docs = table(spark, sf_dir, "documents")
    top = weighted_sample(docs, F.col("doc_id"), F.col("n_chars"))
    return top.select(
        "doc_id",
        "lang",
        F.greatest(F.col("n_chars"), F.lit(1)).cast("bigint").alias("weight"),
        (F.round("_ws_score", 6) + F.lit(0.0)).alias("score"),
    )


STRATUM_K = 5  # t43: exactly-k per stratum


@register(
    "t43_stratified_exact_k",
    oracle=f"""
    SELECT source, doc_id, h FROM (
      SELECT source, doc_id,
             {_sql_bucket("doc_id::VARCHAR", 1000000007)} AS h,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_sql_bucket("doc_id::VARCHAR", 1000000007)}, doc_id
             ) AS r
      FROM documents
    ) WHERE r <= {STRATUM_K}
    """,
    tags=("sampling", "stratified", "topk"),
)
def t43_stratified_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k PER STRATUM — the balanced-subset op the sampling
    matrix lacked (t14 is per-stratum RATES, t15 is global exactly-k):
    every source contributes exactly {STRATUM_K} documents, selected
    by hash order — the "build a balanced eval slice, k docs from
    each feed" operation. Per-source hash-rank is a KEYED window
    (partition keys scale with the source catalog, no global sort, no
    SinglePartition — the q31 rule; one keyed exchange, plan-pinned),
    and membership is a pure function of doc_id, so the subset is
    identical under retries, repartitioning, and engine choice —
    cross-engine hash-verified including the selection hashes. Ties
    impossible (hash collisions broken by doc_id)."""
    docs = table(spark, sf_dir, "documents")
    h = hash_bucket(F.col("doc_id").cast("string"), 1000000007)
    w = W.partitionBy("source").orderBy("h", "doc_id")
    return (
        docs.select("source", "doc_id", h.alias("h"))
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= STRATUM_K)
        .select("source", "doc_id", "h")
    )
