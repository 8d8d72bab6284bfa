"""Differential gate, run locally: every registered query executes on
Spark AND its DuckDB oracle on the same parquet; results must match on
row count, column names, and order-insensitive values — the same
comparison the driver's CORRECTNESS gate performs (SURVEY.md §5.2).
Queries without an oracle get a schema/rows sanity check.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules
from tests.conftest import SF_SMOKE

load_all_query_modules()

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, then
    sort rows; floats canonicalized to repr at 9 sig digits."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        return repr(v)

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if s.oracle)
NO_ORACLE_QUERIES = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb_oracle(spark, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_SMOKE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    # data-derived oracles (s04's centroid literals) are SF-specific:
    # the registered string targets the driver's sf0.01 gate, so
    # regenerate for the SF this suite runs at
    oracle = spec.oracle_factory(SF_SMOKE) if spec.oracle_factory else spec.oracle

    con = duck_connection(SF_SMOKE)
    rel = con.sql(oracle)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = normalize(spark_rows, spark_cols), normalize(duck_rows, duck_cols)
    mism = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b][:5]
    assert ns == nd, f"{name}: first mismatched rows: " + "; ".join(
        f"spark={ns[i]} duck={nd[i]}" for i in mism
    )


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_no_oracle_queries_run(spark, name):
    """Rows-only sanity for non-SQL-expressible ops (driver's weaker
    check); their semantics are pinned by dedicated tests."""
    sdf = QUERIES[name].fn(spark, SF_SMOKE)
    assert sdf.columns
    assert sdf.count() > 0, f"{name}: registered query returned no rows on the fixture"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30


def test_approx_distinct_error(spark):
    """q32's HLL++ estimate must land within 5% of the exact distinct
    count per group (rsd=0.02 ⇒ 3σ ≈ 6%; the fixture's cardinalities
    sit far inside that)."""
    from pyspark.sql import functions as F

    from fsharp_mapreduce_spark.registry import QUERIES, table

    approx = {
        r.l_returnflag: r.approx_orders
        for r in QUERIES["q32_approx_distinct"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r.l_returnflag: r.exact
        for r in table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) / exact[k] <= 0.05, (k, est, exact[k])


def test_approx_quantiles_error(spark):
    """q37's sketch percentiles must land within 1% relative of the
    exact interpolated percentiles per group (accuracy=10000 on a
    ~6k-row fixture is effectively exact up to interpolation — the
    sketch returns an observed value, the exact form interpolates)."""
    from pyspark.sql import functions as F

    from fsharp_mapreduce_spark.registry import QUERIES, table

    approx = {
        r.l_returnflag: (r.ap25, r.ap50, r.ap75, r.ap95)
        for r in QUERIES["q37_approx_quantiles"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r.l_returnflag: (r.p25, r.p50, r.p75, r.p95)
        for r in table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            *[
                F.percentile("l_extendedprice", F.lit(q)).alias(f"p{int(q * 100)}")
                for q in (0.25, 0.50, 0.75, 0.95)
            ]
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in approx:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / abs(e) <= 0.01, (k, a, e)
