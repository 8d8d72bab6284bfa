"""Distributed-ranking semantics tests: global_row_numbers must equal
the single-partition window row_number on arbitrary data — including
tie runs that straddle range-partition boundaries, partition counts
that don't divide the data, and more partitions than rows."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from fsharp_mapreduce_spark.operators.windows import global_row_numbers


@pytest.mark.parametrize("n_parts", [1, 7, 32, 100])
def test_global_row_numbers_matches_window(spark, n_parts):
    rng = random.Random(7)
    # 21 distinct values over 5000 rows: every range boundary lands
    # inside a tie run, the case the unique-tiebreak contract covers.
    rows = [(i, rng.randint(0, 20)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, v long")
    sort_cols = [F.col("v").desc(), F.col("id")]
    got = {
        (r.id, r.rn)
        for r in global_row_numbers(df, sort_cols, n_partitions=n_parts).collect()
    }
    want = {
        (r.id, r.rn)
        for r in df.withColumn(
            "rn", F.row_number().over(W.orderBy(*sort_cols)).cast("bigint")
        ).collect()
    }
    assert got == want


def test_global_row_numbers_empty(spark):
    df = spark.createDataFrame([], "id long, v long")
    assert global_row_numbers(df, [F.col("v")], n_partitions=8).count() == 0


def test_q31_ranks_survive_cache_release_between_build_and_action(spark):
    """Code-review r4: global_row_numbers' staging is a CORRECTNESS
    barrier, not a perf cache — monotonically_increasing_id and range-
    boundary sampling are not stable across re-expanded plan copies.
    Build q31, let ANOTHER registry query trigger the scoped-cache
    release, then materialize: ranks must still be exactly right."""
    from fsharp_mapreduce_spark.registry import (
        QUERIES,
        load_all_query_modules,
        release_scoped_caches,
    )
    from tests.conftest import SF_SMOKE

    load_all_query_modules()

    df = QUERIES["q31_global_ranks_scalable"].fn(spark, SF_SMOKE)
    # simulate the interleaving: a second query build releases caches
    QUERIES["q01_pricing_summary"].fn(spark, SF_SMOKE)
    release_scoped_caches()
    spark.catalog.clearCache()
    got = {r.o_orderkey: (r.rn, r.rnk, r.dense_rnk) for r in df.collect()}
    # straight single-pass reference via a plain global window
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    u = W.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    w = W.orderBy(F.col("o_totalprice").desc())
    want = {
        r.o_orderkey: (r.rn, r.rnk, r.dense_rnk)
        for r in o.select(
            "o_orderkey",
            F.row_number().over(u).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("dense_rnk"),
        ).collect()
    }
    assert got == want
