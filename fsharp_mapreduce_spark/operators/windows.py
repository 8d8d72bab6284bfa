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

from fsharp_mapreduce_spark.registry import register, table


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
    """rank / dense_rank / percent_rank / ntile over one global window
    (supplier is small; a global window is fine — for big tables the
    partitioned variants above are the pattern)."""
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
