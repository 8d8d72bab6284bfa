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
