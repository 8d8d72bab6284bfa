"""Pins the MapReduce compat contract (SURVEY.md §2a, §7 phase 1):
golden dice job, partition invariance, value-slot grouping quirk,
zero-emission maps, ordered folds, and a naive-fold differential.
"""

from __future__ import annotations

import operator
import random
from collections import defaultdict

import pytest

from fsharp_mapreduce_spark.compat import MapReduceJob, range_source, table_source
from fsharp_mapreduce_spark.compat.job import (
    dice_job_report,
    dice_map_fn,
    dice_reduce_fn,
)


def run_dice(spark, n_partitions, limit=100_000, seed=7):
    job = MapReduceJob(
        source=range_source(limit, seed=seed),
        map_fn=dice_map_fn,
        reduce_fn=dice_reduce_fn,
        zero=0,
        merge_fn=operator.add,
        group_on="value",  # the reference groups on the value slot (Worker.fs:40)
        num_partitions=n_partitions,
    )
    return job.run(spark)


def test_dice_job_golden(spark):
    res = run_dice(spark, 8)
    assert set(res) == {"Win", "Lose"}
    assert res["Win"] + res["Lose"] == 100_000
    # Seeded → exact, and the win rate must sit near 1/6.
    assert abs(res["Win"] / 100_000 - 1 / 6) < 0.01


def test_dice_partition_invariance(spark):
    """Identical output with 1, 2, 8 partitions (merge disjointness ≡
    Orchestrator.fs:166-175 holds under Spark's shuffle)."""
    results = [run_dice(spark, n) for n in (1, 2, 8)]
    assert results[0] == results[1] == results[2]


def test_dice_report_format(spark):
    res = run_dice(spark, 4)
    rep = dice_job_report(res)
    assert rep["expected_pct"] == "16.66666667"
    assert len(rep["win_rate_pct"].split(".")[1]) == 8


def test_handle_results_callback(spark):
    seen = {}
    job = MapReduceJob(
        source=range_source(1000, seed=1),
        map_fn=dice_map_fn,
        reduce_fn=dice_reduce_fn,
        zero=0,
        merge_fn=operator.add,
        handle_results=lambda d: seen.update(d),
        group_on="value",
    )
    out = job.run(spark)
    assert seen == out and sum(seen.values()) == 1000


def test_zero_emission_map(spark):
    """Empty pair list from map is legal (Orchestrator.fs:41)."""
    job = MapReduceJob(
        source=range_source(10_000, seed=3),
        map_fn=lambda row: [("k", row.roll)] if row.roll == 6 else [],
        reduce_fn=lambda v, acc: acc + v,
        zero=0,
        merge_fn=operator.add,
    )
    res = job.run(spark)
    assert set(res) <= {"k"}
    assert res.get("k", 0) % 6 == 0


def test_multi_emission_map(spark):
    """Map may emit many pairs per record (Worker.fs:20)."""
    job = MapReduceJob(
        source=range_source(1000, seed=5),
        map_fn=lambda row: [("n", 1), ("sum", row.roll)],
        reduce_fn=lambda v, acc: acc + v,
        zero=0,
        merge_fn=operator.add,
    )
    res = job.run(spark)
    assert res["n"] == 1000
    assert 1000 <= res["sum"] <= 6000


def test_reduce_by_key_no_zero(spark):
    """Pairwise fold path (no zero → reduceByKey)."""
    job = MapReduceJob(
        source=range_source(5000, seed=11),
        map_fn=lambda row: [(row.roll % 2, row.roll)],
        reduce_fn=lambda v, acc: max(v, acc),
    )
    res = job.run(spark)
    assert res[0] in (2, 4, 6) and res[1] in (1, 3, 5)


def test_zero_without_merge_raises(spark):
    job = MapReduceJob(
        source=range_source(10, seed=1),
        map_fn=dice_map_fn,
        reduce_fn=dice_reduce_fn,
        zero=0,
    )
    with pytest.raises(ValueError, match="merge_fn"):
        job.run(spark)


def test_ordered_fold(spark):
    """Order-sensitive fold escape hatch: string concat in emission
    order must be deterministic regardless of partition count."""

    def mk(n):
        return MapReduceJob(
            source=table_source("/root/testdata/sf0.001/nation.parquet"),
            map_fn=lambda row: [("names", row.n_name)],
            reduce_fn=lambda v, acc: acc + "|" + v,
            zero="",
            ordered=True,
            num_partitions=n,
        )

    a = mk(1).run(spark)
    b = mk(8).run(spark)
    assert a == b
    assert a["names"].count("|") >= 1


def test_property_random_jobs_vs_naive_fold(spark):
    """Hypothesis-driven MapReduce equivalence: random inputs × a
    family of (map_fn, reduce_fn, zero, merge) combinations, each
    checked against the single-threaded naive fold. Few examples
    (a Spark job per example) but fully random data including
    negatives, duplicates, and empty-ish groups."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    fn_family = [
        (lambda r: [(r.g, r.v)], lambda v, acc: acc + v, 0, operator.add),
        (lambda r: [(r.g, r.v)], lambda v, acc: acc ^ v, 0, operator.xor),
        (lambda r: [(r.v % 3, 1)], lambda v, acc: acc + v, 0, operator.add),
        (lambda r: [] if r.v % 2 else [(r.g, r.v)], lambda v, acc: min(acc, v), 1 << 30, min),
    ]

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=-1000, max_value=1000),
                st.sampled_from("abc"),
            ),
            min_size=1,
            max_size=200,
        ),
        case=st.integers(min_value=0, max_value=len(fn_family) - 1),
    )
    def check(rows, case):
        map_fn, red, zero, merge = fn_family[case]
        data = [(i, v, g) for i, (v, g) in enumerate(rows)]

        def source(s):
            return s.createDataFrame(data, "id long, v int, g string")

        got = MapReduceJob(source, map_fn, red, zero, merge_fn=merge).run(spark)
        expect: dict = defaultdict(lambda: zero)

        class R:
            __slots__ = ("id", "v", "g")

            def __init__(self, t):
                self.id, self.v, self.g = t

        for t in data:
            for k, v in map_fn(R(t)):
                expect[k] = red(v, expect[k])
        assert got == dict(expect)

    check()


def test_differential_vs_naive_fold(spark):
    """MapReduce-equivalence property (SURVEY.md §5.3): engine result ==
    single-threaded fold over map outputs grouped by key, for a family
    of random commutative-associative jobs."""
    rng = random.Random(42)
    rows = [(i, rng.randint(1, 100), rng.choice("abcde")) for i in range(2000)]

    def source(s):
        return s.createDataFrame(rows, "id long, v int, g string")

    cases = [
        (lambda r: [(r.g, r.v)], lambda v, acc: acc + v, 0, operator.add),
        (lambda r: [(r.g, 1), (r.g + "!", r.v)], lambda v, acc: acc + v, 0, operator.add),
        (lambda r: [(r.v % 7, r.v)], lambda v, acc: max(acc, v), -1, max),
    ]
    for map_fn, red, zero, merge in cases:
        got = MapReduceJob(source, map_fn, red, zero, merge_fn=merge).run(spark)
        expect: dict = defaultdict(lambda: zero)

        class R:
            __slots__ = ("id", "v", "g")

            def __init__(self, t):
                self.id, self.v, self.g = t

        for t in rows:
            for k, v in map_fn(R(t)):
                expect[k] = red(v, expect[k])
        assert got == dict(expect)


def test_property_ordered_fold_vs_naive(spark):
    """Hypothesis-driven ORDERED-fold equivalence: non-commutative
    string concatenation over random keys, emission orders and
    partition counts must equal the single-threaded fold in emission
    order — the contract of the `_run_ordered` escape hatch (the
    reference's arrival-order fold, Worker.fs:89-96) under every
    partitioning."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from fsharp_mapreduce_spark.compat.job import MapReduceJob

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(st.integers(min_value=0, max_value=5), st.sampled_from("xyz")),
            min_size=1,
            max_size=120,
        ),
        n_parts=st.integers(min_value=1, max_value=9),
    )
    def check(rows, n_parts):
        data = [(i, k, c) for i, (k, c) in enumerate(rows)]

        def source(sp):
            return sp.createDataFrame(data, "i long, k long, c string")

        job = MapReduceJob(
            source,
            lambda r: [(r.k, r.c)],
            lambda v, acc: acc + v,
            zero="",
            ordered=True,
            num_partitions=n_parts,
        )
        got = job.run(spark)
        naive: dict = {}
        for _i, k, c in data:
            naive[k] = naive.get(k, "") + c
        assert got == naive

    check()
