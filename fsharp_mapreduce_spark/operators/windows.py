"""Window functions and sorts/top-k (SURVEY.md §2c) — not expressible
in the reference without a second MR pass.

Determinism note: every ORDER BY inside a window or LIMIT carries a
unique tiebreak key so Spark and the DuckDB oracle select identical
rows — the driver's value-hash is order-insensitive but not
selection-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fsharp_mapreduce_spark.registry import register, scoped_persist, table


@register(
    "q13_window_topk_per_group",
    oracle="""
    SELECT nation, c_custkey, c_acctbal AS acctbal, rk
    FROM (
      SELECT n_name AS nation, c_custkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey
             ) AS BIGINT) AS rk
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    WHERE rk <= 3
    """,
    tags=("window", "topk"),
)
def q13_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation: Window.partitionBy +
    row_number ≤ k — the scalable top-k-per-group idiom (never a
    global sort)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 3)
        .select(
            F.col("n_name").alias("nation"),
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            "rk",
        )
    )


@register(
    "q14_window_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 4) AS running_qty
    FROM lineitem
    WHERE l_suppkey < 10
    """,
    tags=("window", "running"),
)
def q14_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per supplier in ship order. Unique frame order
    (shipdate, orderkey, linenumber) → both engines fold the same
    sequence → identical prefix sums."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") < 10)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 4).alias("running_qty"),
    )


@register(
    "q15_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice AS price,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           o_totalprice - LAG(o_totalprice) OVER w AS delta_prev
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "lag"),
)
def q15_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD over each customer's order history (prev/next order
    value and delta)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    lag = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        lag.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - lag).alias("delta_prev"),
    )


@register(
    "q16_window_ranks",
    oracle="""
    SELECT s_suppkey, s_name,
           CAST(RANK()       OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS dense_rnk,
           ROUND(PERCENT_RANK() OVER w, 6)     AS pct_rnk,
           CAST(NTILE(4)     OVER w AS BIGINT) AS quartile
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    """,
    tags=("window", "rank"),
)
def q16_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile over one global window.

    SCALE CAVEAT: a global (unpartitioned) window plans an Exchange
    SinglePartition — every row through one task. Deliberate here
    because supplier is a bounded dimension table (100 rows at
    sf0.01); it is NOT the at-scale pattern and is excluded from any
    100× claim. The scalable formulation of the same four functions is
    q31_global_ranks_scalable (two-pass range-partitioned ranks, no
    single-partition stage) — pinned by
    tests/test_plans.py::test_q31_no_single_partition_exchange."""
    s = table(spark, sf_dir, "supplier")
    w = W.orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_name",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("dense_rnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


def global_row_numbers(
    df: DataFrame,
    sort_cols: list,
    n_partitions: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Append a global ``rn`` (1-based row number in ``sort_cols``
    order) WITHOUT a single-partition window — the two-pass
    distributed-rank idiom:

    1. ``repartitionByRange`` on the sort key: partition i holds a
       contiguous, disjoint key range strictly before partition i+1
       (the range partitioner's sampling balances row counts);
    2. local ``row_number`` per physical partition (window keyed on
       ``spark_partition_id()`` — each partition sorts only its own
       slice, in parallel);
    3. per-partition row counts (|partitions| rows — metadata-sized)
       → prefix-sum offsets, broadcast-joined back: rn = offset + local
       row number.

    ``sort_cols`` must be a total order (include a unique tiebreak) or
    rn is nondeterministic at range boundaries. Every stage is
    parallel in |partitions|; the only sub-linear piece is the prefix
    sum over the partition-count table, which is bounded by cluster
    width, not data."""
    n_partitions = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Local row numbers WITHOUT a window (a Window.partitionBy(pid)
    # would hash-exchange the whole table a second time): after the
    # range exchange + in-partition sort, monotonically_increasing_id
    # encodes exactly (partition id << 33) + in-partition offset, so
    # one projection yields both the partition id and the local row
    # number in sorted order.
    ranged = df.repartitionByRange(n_partitions, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    # localCheckpoint (eager), NOT a releasable cache: the numbered
    # table feeds the row output AND the partition-count/offset
    # pipeline (plus a second global_row_numbers pass in q31), and it
    # is a CORRECTNESS barrier, not a perf cache — re-expanded copies
    # would each re-run range-boundary sampling and
    # monotonically_increasing_id with different RDD ids, so the
    # offset table from one copy would join against local numbers from
    # another and produce silently wrong ranks (code-review r4). The
    # checkpoint materializes ONE set of ids that every consumer reads
    # even if built/materialized across other registry invocations;
    # blocks are reclaimed by the ContextCleaner when the plan is
    # garbage. (Without any materialization: measured 20 parquet scans
    # and 25 exchanges in one q31 plan.)
    local = ranged.select(
        "*", F.monotonically_increasing_id().alias("_mid")
    ).select(
        "*",
        F.shiftright("_mid", 33).cast("int").alias("_pid"),
        (F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1).alias("_lrn"),
    )
    if checkpoint:  # checkpoint=False is for plan audits ONLY — the
        # un-checkpointed plan is NOT safe to materialize if its
        # subtree gets re-expanded (see above)
        local = local.localCheckpoint(eager=True)
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    # Prefix sum over the counts table via triangular self-join — NOT a
    # global window, which would itself plan an Exchange
    # SinglePartition. O(P²) pairs where P = partition count: bounded
    # by cluster width squared, independent of data volume.
    ca, cb = counts.alias("ca"), counts.alias("cb")
    offsets = (
        ca.join(cb, F.col("cb._pid") < F.col("ca._pid"), "left")
        .groupBy(F.col("ca._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("cb._c"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("rn", (F.col("_off") + F.col("_lrn")).cast("bigint"))
        .drop("_pid", "_lrn", "_off", "_mid")
    )


@register(
    "q31_global_ranks_scalable",
    oracle="""
    SELECT o_orderkey, o_totalprice AS price,
           CAST(ROW_NUMBER() OVER u AS BIGINT) AS rn,
           CAST(RANK()       OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS dense_rnk,
           ROUND(PERCENT_RANK() OVER w, 6)     AS pct_rnk,
           CAST(NTILE(4)     OVER u AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice DESC),
           u AS (ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window", "rank", "scale"),
)
def q31_global_ranks_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four global rank functions of q16 over the full ``orders``
    table with NO single-partition stage — the 100 TB formulation:

    - ``rn``: two-pass range-partitioned row number
      (`global_row_numbers`);
    - ``rnk``: min rn within each tie group (one shuffle on the rank
      value; map-side partial min);
    - ``dense_rnk``: the same two-pass row number applied to the
      DISTINCT rank values (a second, much smaller ranking problem);
    - ``pct_rnk`` = (rnk − 1)/(n − 1) and ``quartile`` = SQL NTILE
      derived arithmetically from rn and the total count n (one
      single-row aggregate, broadcast).

    Every exchange is keyed (range or hash) — the plan test pins the
    absence of Exchange SinglePartition. DuckDB replays the classic
    window formulation; values hash-match exactly."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    sort_cols = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    rn = global_row_numbers(o, sort_cols)

    # rank: ties (equal price) share the minimum rn of the group — a
    # price-partitioned window (ONE keyed exchange, no join-back; the
    # partition key is the tie group, so this scales like any
    # hash-partitioned window).
    # persist: rnked feeds the distinct-price dense pass AND the final
    # join — same subtree-duplication economics as in
    # global_row_numbers.
    rnked = scoped_persist(
        rn.withColumn("rnk", F.min("rn").over(W.partitionBy("o_totalprice")))
    )
    # dense rank: rank the distinct prices themselves — the same
    # two-pass machinery on the distinct-value table. dropDuplicates
    # on the price reuses the window's hash(price) partitioning (no
    # extra exchange on the big table).
    dense = global_row_numbers(
        rnked.select("o_totalprice").dropDuplicates(["o_totalprice"]),
        [F.col("o_totalprice").desc()],
    ).withColumnRenamed("rn", "dense_rnk")

    total = o.agg(F.count(F.lit(1)).alias("_n"))  # single row, broadcast
    q, r = F.floor(F.col("_n") / 4), F.col("_n") % 4
    # SQL NTILE(4): the first (n mod 4) tiles get ceil(n/4) rows.
    # Small-n guards: when n < 4, q = 0 and every row belongs to the
    # first r tiles (rn <= small_start = n), so the otherwise-branch is
    # never TAKEN — but greatest(q, 1) keeps its divisor non-zero so no
    # null/ANSI-error can leak out of the untaken branch either.
    small_start = r * (q + 1)
    quartile = F.when(
        F.col("rn") <= small_start, (F.col("rn") - 1) / (q + 1)
    ).otherwise(r + (F.col("rn") - 1 - small_start) / F.greatest(q, F.lit(1)))

    return (
        # dense is |distinct prices|-sized: let AQE pick the strategy
        # (broadcast at fixture scale, shuffle join at 100 TB); rnked
        # is already hash(price)-partitioned, so only the small side
        # moves.
        rnked.join(dense, "o_totalprice")
        .crossJoin(F.broadcast(total))
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            "rn",
            F.col("rnk").cast("bigint").alias("rnk"),
            F.col("dense_rnk").cast("bigint").alias("dense_rnk"),
            # PERCENT_RANK of a single-row input is defined as 0, not
            # 0/0 — mirror SQL's convention before dividing by n − 1.
            F.when(F.col("_n") == 1, F.lit(0.0))
            .otherwise(F.round((F.col("rnk") - 1) / (F.col("_n") - 1), 6))
            .alias("pct_rnk"),
            (F.floor(quartile) + 1).cast("bigint").alias("quartile"),
        )
    )


@register(
    "q17_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def q17_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by value. Spark plans orderBy+limit as
    TakeOrderedAndProject — per-partition heaps + driver merge, no
    full sort. Unique tiebreak (o_orderkey) pins row selection."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("price"))
    )


@register(
    "q39_time_range_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window,
           ROUND(AVG(value) OVER w, 4) AS avg_value_10m
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL '10 minutes' PRECEDING AND CURRENT ROW
    )
    """,
    tags=("window", "range-frame", "temporal"),
)
def q39_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE window frame — per user, the count and mean
    of event values in the trailing 10 minutes of each event (the
    rolling-rate shape behind abuse detection and per-user traffic
    smoothing). Completes the frame-type surface: q14 covers ROWS
    frames, this covers value-RANGE frames over time.

    Spark has no interval literal in rangeBetween, so the frame orders
    by microsecond-exact `unix_micros(ts)` with a −6e8 µs lower bound
    — identical inclusive boundary semantics to the oracle's INTERVAL
    frame (q26 uses the same µs-exact idiom for its session gap).
    Partitioned by user_id: state per window is one user's trailing
    10 minutes, bounded regardless of corpus size; ties on ts are
    frame-peers in both engines (RANGE semantics), so no tiebreak
    column is needed."""
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-10 * 60 * 1_000_000, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_in_window"),
        F.round(F.avg("value").over(w), 4).alias("avg_value_10m"),
    )


# q44 dropout simulation: a reading is "missing" when the house
# md5-slice hash of its event_id lands in 1-of-4 — deterministic in
# both engines, ~25% nulls to fill.
FFILL_DROP_MOD = 4


@register(
    "q44_forward_fill",
    oracle=f"""
    WITH r AS (
      SELECT event_id, user_id, ts,
             CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT
                       % 2147483647 % {FFILL_DROP_MOD} = 0
                  THEN NULL ELSE value END AS reading
      FROM events WHERE user_id < 200
    )
    SELECT event_id, user_id, ts, ROUND(reading, 4) AS reading,
           ROUND(LAST_VALUE(reading IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 4) AS filled
    FROM r
    """,
    tags=("window", "forward_fill", "timeseries", "ignore_nulls"),
)
def q44_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF — last observation carried forward), the
    gap-filling operator every sensor/metrics pipeline needs: per
    user, each missing reading takes the most recent non-null value
    in (ts, event_id) order via the IGNORE NULLS window frame — the
    one window semantics the q13–q16 family didn't cover. Missing
    readings are simulated deterministically (house md5-slice hash of
    event_id, ~25% dropout) so both engines fill the identical holes;
    leading nulls (no prior observation) stay null in both. The
    window partitions by user_id — keys scale with data, no global
    window (the q31 rule)."""
    from fsharp_mapreduce_spark.functions.dedup import md5_int_hash

    ev = table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    dropped = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            md5_int_hash(F.col("event_id").cast("string")) % FFILL_DROP_MOD == 0,
            F.lit(None),
        )
        .otherwise(F.col("value"))
        .alias("reading"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return dropped.select(
        "event_id",
        "user_id",
        "ts",
        F.round("reading", 4).alias("reading"),
        F.round(F.last("reading", ignorenulls=True).over(w), 4).alias("filled"),
    )


@register(
    "q63_running_distinct",
    oracle="""
    SELECT user_id, n_types, MIN(ts) AS first_reached
    FROM (
      SELECT user_id, ts,
             CAST(COUNT(DISTINCT event_type)
                  OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS n_types
      FROM events
    )
    GROUP BY user_id, n_types
    """,
    tags=("window", "distinct", "rewrite"),
)
def q63_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT cardinality per key — the window-DISTINCT
    aggregate Spark does not support (`COUNT(DISTINCT ...) OVER`
    raises ANALYSIS error "Distinct window functions are not
    supported"), expressed as the standard first-occurrence rewrite:
    mark each (user, event_type)'s earliest row with a
    row_number()==1 flag, then a RANGE-framed running SUM of flags is
    exactly the running distinct count (ties in ts get equal totals —
    the same RANGE semantics the textbook form has). The timeline is
    compacted to one row per (user, count) with the moment the count
    was first reached — the "when did this user's behavioral
    repertoire widen" question session analytics asks. The DuckDB
    oracle deliberately keeps the NATIVE DISTINCT window aggregate,
    so the hash match proves the rewrite ≡ the textbook operator.
    Scale: both windows key on user_id (keys grow with data — the
    q31 rule, no SinglePartition); exactly TWO keyed exchanges —
    (user, event_type) for the flag window, then user_id, which the
    running window AND the final aggregate both ride (user_id
    partitioning co-locates every (user, count) group) — plan-pinned
    in tests/test_plans.py."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    first_w = W.partitionBy("user_id", "event_type").orderBy("ts")
    run_w = W.partitionBy("user_id").orderBy("ts")  # default RANGE frame
    flagged = ev.withColumn(
        "is_first", (F.row_number().over(first_w) == 1).cast("long")
    )
    running = flagged.withColumn(
        "n_types", F.sum("is_first").over(run_w).cast("bigint")
    )
    return running.groupBy("user_id", "n_types").agg(
        F.min("ts").alias("first_reached")
    )
