"""Temporal operators: as-of join, time-bucketed aggregation, gap
sessionization, and JSON extraction over the events stream table.

Spark has no native ASOF JOIN; ``q08_asof_join`` implements the
scalable union-and-last-value pattern (one shuffle, no per-key Python)
and is checked against DuckDB's native ASOF JOIN as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fsharp_mapreduce_spark.registry import register, table


@register(
    "q08_asof_join",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(ev_value, 4) AS last_event_value
    FROM (
      SELECT o.o_orderkey, o.o_custkey, e.ev_value
      FROM orders o
      ASOF LEFT JOIN (
        SELECT user_id, ts, ROUND(MAX(value), 6) AS ev_value
        FROM events WHERE user_id < 150 GROUP BY user_id, ts
      ) e
      ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
    )
    WHERE o_custkey < 150
    """,
    tags=("join", "asof"),
)
def q08_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for each order, the value of that user's most recent
    event at or before the order date.

    Implementation is the union trick: tag both sides, sort-by-time
    within each key via a window, carry the last non-null event value
    forward, keep the probe rows. One shuffle on the key — scales to
    arbitrarily large fact tables (contrast per-group merge_asof which
    needs the whole group in pandas memory).

    Events are pre-deduplicated to one row per (user_id, ts) —
    otherwise "the" as-of row is ambiguous in any engine.
    """
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") < 150)
    # mirror the probe filter on the build side: only user_id < 150
    # rows can survive the final probe selection, so everything else
    # would ride the dedup exchange + window for nothing — the filter
    # pushes to the parquet scan (code-review r4)
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id") < 150)
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("ev_value"))
    )

    probe = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_probe"),
        "o_orderkey",
        F.lit(None).cast("double").alias("ev_value"),
    )
    build = ev.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "ev_value",
    )
    # Events sort before probes at equal t (is_probe asc) so ts ==
    # orderdate counts as "at or before".
    w = (
        W.partitionBy("k")
        .orderBy("t", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = probe.unionByName(build).withColumn(
        "last_ev", F.last("ev_value", ignorenulls=True).over(w)
    )
    return merged.where(F.col("is_probe") == 1).select(
        "o_orderkey",
        F.col("k").alias("o_custkey"),
        F.round("last_ev", 4).alias("last_event_value"),
    )


@register(
    "q25_time_bucket",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("temporal", "window_agg"),
)
def q25_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling aggregation — the batch shape of the streaming
    windowed agg (same F.window expression works under readStream)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").getField("start").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


@register(
    "q26_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
                   OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id
    """,
    tags=("temporal", "session"),
)
def q26_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative
    sum of session-start flags — the classic batch sessionizer (the
    streaming twin uses session_window, tests/test_streaming.py)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap (second-truncation would disagree with the
    # oracle's interval arithmetic on sub-second boundaries).
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = marked.withColumn("session_id", F.sum("new_session").over(cum))
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q24_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_high,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
    tags=("json", "scalar"),
)
def q24_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the props string column, filter on
    the extracted value, aggregate (get_json_object — JVM-side, no
    Python in the loop)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .where(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_high"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


@register(
    "q38_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT * FROM (
      SELECT 1 AS stage, 'view' AS event_type,
             (SELECT COUNT(*) FROM v) AS users
      UNION ALL
      SELECT 2, 'click', (SELECT COUNT(*) FROM c)
      UNION ALL
      SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
    )
    """,
    tags=("temporal", "funnel"),
)
def q38_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click → purchase): a user
    advances a stage only with an event strictly AFTER their previous
    stage's first event — the product-analytics sibling of q26's
    sessionizer, and a sequence pattern the reference could only
    express as three chained MR passes. Each stage is one aggregate +
    one time-bounded join on user_id; all three stages shuffle on the
    same key, so on a cluster the exchanges line up and AQE reuses the
    partitioning. Stage counts are tiny single-row aggregates unioned
    into a 3-row report."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(prev: DataFrame, etype: str, tcol: str, out: str) -> DataFrame:
        e = ev.where(F.col("event_type") == etype)
        return (
            e.join(prev, "user_id")
            .where(F.col("ts") > F.col(tcol))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after(v, "click", "t1", "t2")
    p = first_after(c, "purchase", "t2", "t3")

    def stage(n: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(n).cast("int").alias("stage"),
            F.lit(name).alias("event_type"),
            F.count(F.lit(1)).alias("users"),
        )

    return stage(1, "view", v).union(stage(2, "click", c)).union(
        stage(3, "purchase", p)
    )


@register(
    "q52_asof_tolerance_join",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(CASE WHEN e.ts >= o.o_orderdate - INTERVAL 7 DAY
                      THEN e.ev_value END, 4) AS last_event_value
    FROM (SELECT * FROM orders WHERE o_custkey < 150) o
    ASOF LEFT JOIN (
      SELECT user_id, ts, ROUND(MAX(value), 6) AS ev_value
      FROM events WHERE user_id < 150 GROUP BY user_id, ts
    ) e
    ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
    """,
    tags=("join", "asof", "tolerance"),
)
def q52_asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with a TOLERANCE bound (pandas `merge_asof
    (tolerance=...)`): the most recent event at or before each order,
    but only if it fell within the trailing 7 days — staler matches
    resolve to NULL. Same one-shuffle union-and-last-value plan as
    q08; the carried state is a (ts, value) STRUCT instead of the
    bare value, so the tolerance predicate is applied AFTER the
    window from the matched event's own timestamp — no second join,
    no re-scan. The forward direction (`first event at-or-after`) is
    the same plan with the comparisons and window order reversed.
    Oracle: DuckDB's native ASOF JOIN exposing the matched ts, with
    the identical CASE bound."""
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") < 150)
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id") < 150)
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("ev_value"))
    )
    probe = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_probe"),
        "o_orderkey",
        F.lit(None).cast("struct<ts:timestamp,v:double>").alias("ev"),
    )
    build = ev.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.struct(F.col("ts"), F.col("ev_value").alias("v")).alias("ev"),
    )
    w = (
        W.partitionBy("k")
        .orderBy("t", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = probe.unionByName(build).withColumn(
        "last_ev", F.last("ev", ignorenulls=True).over(w)
    )
    in_tol = F.col("last_ev.ts") >= F.col("t") - F.expr("INTERVAL 7 DAYS")
    return merged.where(F.col("is_probe") == 1).select(
        "o_orderkey",
        F.col("k").alias("o_custkey"),
        F.round(
            F.when(in_tol, F.col("last_ev.v")), 4
        ).alias("last_event_value"),
    )


@register(
    "q55_time_weighted_avg",
    oracle="""
    WITH d AS (
      SELECT user_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS nxt
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(nxt - t) AS BIGINT) AS span_us,
           ROUND(SUM(value * (nxt - t)) / SUM(nxt - t), 6) AS twap
    FROM d WHERE nxt IS NOT NULL
    GROUP BY 1
    """,
    tags=("temporal", "window", "twap"),
)
def q55_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user — the aggregate irregularly
    sampled telemetry actually needs (a plain AVG over-weights bursts:
    a sensor that reports 100× during one hot minute dominates the
    mean; TWAP weights each reading by how long it HELD):
    twap = Σ value·Δt / Σ Δt with Δt to the next reading, last
    reading open-ended and excluded. One keyed exchange: the lead()
    window and the per-user aggregate share the user_id partitioning,
    so Catalyst plans a single shuffle for both (plan-pinned).
    Interval weights are exact BIGINT microseconds on both engines;
    ties at equal ts get Δt = 0 (event_id tiebreak makes the pairing
    deterministic)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        "value",
        F.unix_micros(F.col("ts")).alias("t"),
        F.lead(F.unix_micros(F.col("ts"))).over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    dt = F.col("nxt") - F.col("t")
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(dt).cast("bigint").alias("span_us"),
        F.round(F.sum(F.col("value") * dt) / F.sum(dt), 6).alias("twap"),
    )


# ---------------------------------------------------------------------------
# q68: interval-OVERLAP join via the bucketed equi-join rewrite
# ---------------------------------------------------------------------------

OVERLAP_BUCKET_US = 30 * 60 * 1_000_000  # 30-minute epoch buckets
CLICK_WINDOW_US = 30 * 60 * 1_000_000  # click attribution interval
PURCHASE_WINDOW_US = 20 * 60 * 1_000_000  # purchase validity interval


@register(
    "q68_interval_overlap_join",
    oracle=f"""
    WITH a AS (
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + {CLICK_WINDOW_US} AS e
      FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + {PURCHASE_WINDOW_US} AS e
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(LEAST(a.e, b.e) - GREATEST(a.s, b.s)) AS BIGINT)
             AS total_overlap_us
    FROM a JOIN b ON b.user_id = a.user_id
     AND a.s < b.e AND b.s < a.e
    GROUP BY 1
    """,
    tags=("join", "interval", "range_join", "temporal"),
)
def q68_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join — both sides carry intervals (q07 is
    point-in-band, q08/q52 are as-of): click attribution windows
    [ts, ts+30m) against purchase validity windows [ts, ts+20m),
    positive-measure overlap, per-user pair counts + exact total
    overlap microseconds. The naive plan is the hazard: Spark turns
    `ON user AND overlap` into an equi-join whose matched groups get
    the non-equi as a post-filter — fine until one hot user makes a
    group quadratic. The rewrite here is the published range-join
    bucketing (the optimization Databricks ships natively as
    RangeJoin): each interval EXPLODES into the 30-minute epoch
    buckets it spans, the join runs equi on (user_id, bucket) — so
    candidate pairs are confined to co-bucketed intervals and a hot
    user's cost drops from |A|·|B| to Σ per-bucket products — and
    each overlapping pair is counted EXACTLY ONCE with no distinct
    pass: only in bucket max(⌊a.s/W⌋, ⌊b.s/W⌋), which any overlapping
    pair provably co-covers (max of starts ≤ min of ends). The plan
    is pinned join-keyed: no BroadcastNestedLoopJoin, no cartesian.
    The ORACLE is the textbook overlap join — the hash match proves
    the bucket rewrite emits precisely the overlap relation. All
    arithmetic is exact BIGINT microseconds (unix_micros/epoch_us on
    both engines)."""
    W_US = OVERLAP_BUCKET_US
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")

    def intervals(etype: str, width_us: int) -> DataFrame:
        s = F.unix_micros(F.col("ts"))
        return ev.where(F.col("event_type") == etype).select(
            "user_id", s.alias("s"), (s + F.lit(width_us)).alias("e")
        )

    def burst(df: DataFrame, side: str) -> DataFrame:
        bk = F.explode(
            F.sequence(
                (F.col("s") / W_US).cast("bigint"),
                (F.col("e") / W_US).cast("bigint"),
            )
        )
        return df.select(
            F.col("user_id").alias(f"{side}_user"),
            F.col("s").alias(f"{side}_s"),
            F.col("e").alias(f"{side}_e"),
            bk.alias("bk"),
        )

    a = burst(intervals("click", CLICK_WINDOW_US), "a")
    b = burst(intervals("purchase", PURCHASE_WINDOW_US), "b")
    first_shared = F.greatest(
        (F.col("a_s") / W_US).cast("bigint"), (F.col("b_s") / W_US).cast("bigint")
    )
    pairs = a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (a.bk == b.bk)
        & (F.col("a_s") < F.col("b_e"))
        & (F.col("b_s") < F.col("a_e"))
        & (a.bk == first_shared),
    )
    return pairs.groupBy(F.col("a_user").alias("user_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlaps"),
        F.sum(
            F.least(F.col("a_e"), F.col("b_e"))
            - F.greatest(F.col("a_s"), F.col("b_s"))
        )
        .cast("bigint")
        .alias("total_overlap_us"),
    )
