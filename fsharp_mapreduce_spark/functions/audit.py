"""Declarative data-quality constraint auditing (the Deequ/dbt-test
shape): a check list compiles into ONE aggregation pass over the
table, so a 100 TB nightly audit costs a single scan with map-side
partial aggregation regardless of how many constraints it carries —
never one job per check. Referential integrity is the one check that
can't ride a single-table agg; it compiles to a LEFT ANTI count on
the key columns only (keyed exchange of 8-byte keys, or a broadcast
when the parent key set is dimension-sized).

The reference has no quality machinery at all; a reference user
hand-rolls each check as a separate map/reduce job (N scans for N
checks, Common.fs:23-45) — here the check set is declarative data and
the scan count is the invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fsharp_mapreduce_spark.registry import register, table


def check_not_null(col: str) -> tuple[str, Column]:
    """Rows violating NOT NULL."""
    return (
        f"{col}_nulls",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("bigint"),
    )


def check_unique(col: str) -> tuple[str, Column]:
    """Excess rows beyond one per key (0 ⇔ column is unique)."""
    return (
        f"{col}_dups",
        (F.count(F.col(col)) - F.count_distinct(F.col(col))).cast("bigint"),
    )


def check_in_set(col: str, allowed: list[str]) -> tuple[str, Column]:
    """Rows whose value is outside the accepted set."""
    arr = F.array(*[F.lit(v) for v in allowed])
    return (
        f"{col}_out_of_set",
        F.sum(F.when(~F.array_contains(arr, F.col(col)), 1).otherwise(0)).cast(
            "bigint"
        ),
    )


def check_min(col: str, lo: float) -> tuple[str, Column]:
    """Rows below the lower bound."""
    return (
        f"{col}_below_min",
        F.sum(F.when(F.col(col) < lo, 1).otherwise(0)).cast("bigint"),
    )


def audit(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """Compile a check list into one single-pass aggregate: a one-row
    DataFrame with n_rows plus one violation-count column per check.
    Every check is an associative conditional aggregate, so the whole
    audit is one map-side-combined exchange to a single 1-row result."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    # coalesce: SUM over zero rows is NULL — an empty table must audit
    # as "zero violations", not as NULL-gated ambiguity
    aggs += [
        F.coalesce(col, F.lit(0).cast("bigint")).alias(name)
        for name, col in checks
    ]
    return df.agg(*aggs)


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Referential-integrity count: child rows whose key has no parent
    — a LEFT ANTI join on the key projections only (nothing but the
    8-byte keys rides the exchange; Catalyst broadcasts the parent
    keys when they are dimension-sized)."""
    orphans = child.select(child_key).join(
        parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("bigint").alias("fk_orphans"))


@register(
    "q48_constraint_audit",
    oracle="""
    WITH o AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS o_totalprice_nulls,
             CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
               AS o_orderkey_dups,
             CAST(SUM(CASE WHEN NOT list_contains(['O', 'F', 'P'], o_orderstatus)
                           THEN 1 ELSE 0 END) AS BIGINT) AS o_orderstatus_out_of_set,
             CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS o_totalprice_below_min
      FROM orders
    ),
    fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS fk_orphans
      FROM lineitem l LEFT JOIN orders p ON l.l_orderkey = p.o_orderkey
      WHERE p.o_orderkey IS NULL
    )
    SELECT o.*, fk.fk_orphans FROM o CROSS JOIN fk
    """,
    tags=("quality", "audit", "constraints"),
)
def q48_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative audit over orders + lineitem→orders referential
    integrity: five single-table checks compiled into ONE aggregation
    pass (plan-pinned: exactly one scan of orders feeds all of them),
    plus the anti-join orphan count. One row out; at 100 TB the audit
    cost is one corpus scan + one keyed 8-byte-key exchange, however
    many checks the list grows to."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    single_pass = audit(
        o,
        [
            check_not_null("o_totalprice"),
            check_unique("o_orderkey"),
            check_in_set("o_orderstatus", ["O", "F", "P"]),
            check_min("o_totalprice", 0.0),
        ],
    )
    fk = fk_violations(li, o, "l_orderkey", "o_orderkey")
    return single_pass.crossJoin(fk)


# ---------------------------------------------------------------------------
# q71: per-column data profiling — the Analyzer half of the Deequ
# shape (q48 is the Check half). A 100 TB ingest runs this BEFORE
# writing constraints: it tells you what the data looks like
# (completeness, cardinality, ranges) so the q48 check list has
# something to assert. One aggregation pass over the table computes
# every metric for every profiled column (map-side combined; the
# exact distinct counts plan as ONE Expand — swap
# `F.count_distinct` for `F.approx_count_distinct` at true corpus
# scale where ±2% cardinality is acceptable and the Expand factor
# matters); a `stack` generator unpivots the single metrics row to
# one row per column without re-executing the aggregate.

PROFILE_NUMERIC = ["l_orderkey", "l_quantity", "l_extendedprice"]
PROFILE_STRING = ["l_returnflag", "l_linestatus"]
PROFILE_TS = ["l_shipdate"]


def profile(df: DataFrame, numeric: list[str], string: list[str],
            ts: list[str]) -> DataFrame:
    """Two-scan column profile: (column_name, n_rows, n_null,
    n_distinct, min_num, max_num, min_str, max_str) per profiled
    column. Numeric mins/maxes round to 4 dp (the repo's cross-engine
    double discipline); timestamps profile as exact epoch-microsecond
    integers; strings profile lexicographically.

    The exact distinct counts ride their own aggregate ON PURPOSE: a
    multi-column count_distinct plans as one Expand (each row
    replicated per distinct column), and fusing the null/min/max
    metrics into that aggregate makes every replica carry every other
    metric expression — measured 6× slower at sf0.1 (12.3 s fused vs
    2.0 s split). Split, the distinct family pays the Expand exchange
    alone and everything else rides one plain column-pruned scan; the
    two 1-row results meet in a literal-sized cross join. Scan count
    is the invariant: 2 for ANY number of profiled columns."""
    d_aggs = [
        F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__nd")
        for c in numeric + string + ts
    ]
    distincts = df.agg(*d_aggs)

    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in numeric + string + ts:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"{c}__nulls")
        )
        if c in numeric:
            aggs.append(F.round(F.min(c).cast("double"), 4).alias(f"{c}__min"))
            aggs.append(F.round(F.max(c).cast("double"), 4).alias(f"{c}__max"))
        elif c in ts:
            # parquet timestamps arrive NTZ; unix_micros needs LTZ —
            # the session zone is UTC, so the cast is the identity
            # wall-clock mapping DuckDB's epoch_us applies
            aggs.append(
                F.unix_micros(F.min(c).cast("timestamp_ltz"))
                .cast("double")
                .alias(f"{c}__min")
            )
            aggs.append(
                F.unix_micros(F.max(c).cast("timestamp_ltz"))
                .cast("double")
                .alias(f"{c}__max")
            )
        else:
            aggs.append(F.min(c).alias(f"{c}__min"))
            aggs.append(F.max(c).alias(f"{c}__max"))
    one = df.agg(*aggs).crossJoin(distincts)

    rows = []
    for c in numeric + string + ts:
        is_str = c in string
        rows.append(
            f"'{c}', {c}__nulls, {c}__nd, "
            + (
                "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
                f"{c}__min, {c}__max"
                if is_str
                else f"{c}__min, {c}__max, "
                "CAST(NULL AS STRING), CAST(NULL AS STRING)"
            )
        )
    n = len(numeric) + len(string) + len(ts)
    stack = (
        f"stack({n}, " + ", ".join(rows) + ") AS "
        "(column_name, n_null, n_distinct, min_num, max_num, min_str, max_str)"
    )
    return one.select("n_rows", F.expr(stack)).select(
        "column_name", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


def _q71_oracle() -> str:
    base_metrics = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    selects = []
    for c in PROFILE_NUMERIC + PROFILE_STRING + PROFILE_TS:
        base_metrics.append(
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS {c}__nulls"
        )
        base_metrics.append(
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {c}__nd"
        )
        if c in PROFILE_NUMERIC:
            base_metrics.append(f"ROUND(CAST(MIN({c}) AS DOUBLE), 4) AS {c}__min")
            base_metrics.append(f"ROUND(CAST(MAX({c}) AS DOUBLE), 4) AS {c}__max")
        elif c in PROFILE_TS:
            base_metrics.append(f"CAST(epoch_us(MIN({c})) AS DOUBLE) AS {c}__min")
            base_metrics.append(f"CAST(epoch_us(MAX({c})) AS DOUBLE) AS {c}__max")
        else:
            base_metrics.append(f"MIN({c}) AS {c}__min")
            base_metrics.append(f"MAX({c}) AS {c}__max")
        num = c not in PROFILE_STRING
        selects.append(
            f"SELECT '{c}' AS column_name, n_rows, {c}__nulls AS n_null, "
            f"{c}__nd AS n_distinct, "
            + (
                f"{c}__min AS min_num, {c}__max AS max_num, "
                "CAST(NULL AS VARCHAR) AS min_str, "
                "CAST(NULL AS VARCHAR) AS max_str"
                if num
                else "CAST(NULL AS DOUBLE) AS min_num, "
                f"CAST(NULL AS DOUBLE) AS max_num, "
                f"{c}__min AS min_str, {c}__max AS max_str"
            )
            + " FROM base"
        )
    return (
        "WITH base AS (SELECT " + ", ".join(base_metrics) + " FROM lineitem) "
        + " UNION ALL ".join(selects)
    )


@register(
    "q71_data_profile",
    oracle=_q71_oracle(),
    tags=("quality", "audit", "profiling"),
)
def q71_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile of six lineitem columns (int, double, string, and
    timestamp representatives): completeness, exact cardinality, and
    ranges, unpivoted to one row per column. Plan-pinned TWO scans
    regardless of column count (see ``profile``); every metric
    value-hash-checked against DuckDB computing the identical
    aggregates."""
    li = table(spark, sf_dir, "lineitem")
    return profile(li, PROFILE_NUMERIC, PROFILE_STRING, PROFILE_TS)
