"""MapReduce compatibility API — the reference's entire user surface.

The reference job is four closures (see /root/reference):

- load fn   ``int -> int -> obj list``  (skip, take)     Loader.fs:17
- map fn    ``obj -> KeyValuePair<obj,obj> list``        Worker.fs:20
- reduce fn ``(KVPair, Dictionary) -> Dictionary``       Worker.fs:23
- handleResults ``Dictionary -> unit``                   Orchestrator.fs:55

Execution there is: Loader pulls ``chunkSize`` records at a time
(Loader.fs:32-38), records are round-robined to workers
(Orchestrator.fs:77), each emitted KV pair is routed by consistent
hash to a reduce worker (Worker.fs:35-43), folded into a per-worker
dict (Worker.fs:89-96), dicts are disjoint-merged on the driver
(Orchestrator.fs:166-175) and handed to ``handleResults``.

Here the same contract is one Spark job:
``source → flatMap(map_fn) → aggregateByKey(reduce_fn) → collect →
handle_results``. Spark's DAG scheduler replaces every ack/flow-control
mechanism in the reference (SURVEY.md §3); partial (map-side)
aggregation is a strict upgrade over the reference's
one-message-per-pair shuffle (Worker.fs:81).

Semantic notes, pinned by tests:

1. **Value-slot grouping.** The reference shuffles AND folds on the
   *value* slot of the emitted pair (`Worker.fs:39-43`; the example's
   reduce keys on ``todo.Value``, Example-Job.fs:58-60). This API uses
   the conventional ``(key, value)`` contract — the reference's value
   slot maps to our key slot. ``MapReduceJob(..., group_on="value")``
   reproduces the reference's wiring exactly for ported jobs.
2. **Fold ordering.** The reference folds pairs in arrival order with
   no combiner. Distributed aggregation requires the fold to be
   commutative + associative (true of the example job). For
   order-sensitive folds use ``ordered=True``, which sorts each key's
   values by an explicit sequence number before a per-key sequential
   fold — deterministic, at the cost of a sort.
3. **Merge disjointness.** The reference's dict merge throws on
   duplicate keys across workers (Orchestrator.fs:168 ``Union``);
   Spark's shuffle guarantees one partition per key, so disjointness
   holds by construction. Tests pin partition-count invariance.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def range_source(limit: int, seed: int | None = None, faces: int = 6):
    """Seeded dice-roll source ≡ the example job's synthetic loader
    (Example-Job.fs:46-49: random rolls 1..6, ``loaderLimit`` records).

    Deterministic under a fixed seed and partition count, unlike the
    reference's ``System.Random`` source — required for golden tests.
    """

    def _load(spark: SparkSession) -> DataFrame:
        df = spark.range(limit)
        roll = (F.rand(seed) * faces + 1).cast("int") if seed is not None else (
            F.rand() * faces + 1
        ).cast("int")
        return df.select(F.col("id").alias("roll_id"), roll.alias("roll"))

    return _load


def table_source(path: str):
    """Parquet table as a job source — what a reference user's custom
    ``dataLoadFn`` (Loader.fs:17) becomes: Spark's split planning owns
    skip/take cursor tracking (Loader.fs:14,38)."""

    def _load(spark: SparkSession) -> DataFrame:
        return spark.read.parquet(path)

    return _load


class MapReduceJob:
    """A reference-style job: source + map + reduce + handle_results.

    Parameters
    ----------
    source:
        ``Callable[[SparkSession], DataFrame]`` — the load fn. Batched
        pull semantics (Gimme chunkSize, Orchestrator.fs:74) collapse
        into Spark's input-split planning; ``chunk_size`` is accepted
        for API parity and IGNORED (see ``run``).
    map_fn:
        ``row -> iterable[(key, value)]`` — may emit zero pairs
        (legal per Orchestrator.fs:41), one, or many (Worker.fs:20).
    reduce_fn:
        ``(value, acc) -> acc`` — the per-key fold (Worker.fs:23
        restated per-key: the reference fold mutates a dict keyed by
        the grouping slot; here Spark owns the dict and the user folds
        one key's values).
    zero:
        initial accumulator per key (the reference's "not found in
        dict → insert fresh" branch, Example-Job.fs:59-61).
    merge_fn:
        ``(acc, acc) -> acc`` combiner for cross-partition merge.
        Defaults to ``reduce_fn``-compatible fold when accumulators
        and values share a type; required otherwise.
    handle_results:
        driver callback on the merged ``{key: acc}`` dict
        (Orchestrator.fs:175).
    group_on:
        ``"key"`` (conventional) or ``"value"`` — the reference groups
        on the emitted pair's VALUE slot (Worker.fs:39-43); ported
        jobs set ``"value"``.
    ordered:
        sequential per-key fold in emission order (escape hatch for
        non-commutative folds; SURVEY.md §7 hard-part 1).
    """

    def __init__(
        self,
        source: Callable[[SparkSession], DataFrame],
        map_fn: Callable[[Any], Iterable[tuple[Any, Any]]],
        reduce_fn: Callable[[Any, Any], Any],
        zero: Any = None,
        merge_fn: Callable[[Any, Any], Any] | None = None,
        handle_results: Callable[[dict], Any] | None = None,
        group_on: str = "key",
        ordered: bool = False,
        num_partitions: int | None = None,
    ):
        if group_on not in ("key", "value"):
            raise ValueError("group_on must be 'key' or 'value'")
        self.source = source
        self.map_fn = map_fn
        self.reduce_fn = reduce_fn
        self.zero = zero
        self.merge_fn = merge_fn
        self.handle_results = handle_results
        self.group_on = group_on
        self.ordered = ordered
        self.num_partitions = num_partitions

    # -- execution ---------------------------------------------------

    def _pair_rdd(self, spark: SparkSession):
        df = self.source(spark)
        map_fn, group_on = self.map_fn, self.group_on

        def flat(row):
            for k, v in map_fn(row):
                # Reference routes by pair.Value (Worker.fs:40); we
                # normalize so downstream always groups on element 0.
                yield (v, k) if group_on == "value" else (k, v)

        return df.rdd.flatMap(flat)

    def run(self, spark: SparkSession, chunk_size: int | None = None) -> dict:
        """Execute and return the merged {key: acc} dict; also invokes
        ``handle_results`` if provided (Orchestrator.fs:175).

        ``chunk_size`` is accepted for reference API parity
        (Start chunkSize, Orchestrator.fs:134-140) and deliberately
        IGNORED: in the reference it is flow control (caps in-flight
        records between Loader and Workers), a concern Spark's DAG
        scheduler owns entirely. Mapping it onto partition count would
        change semantics (1M rows at the reference's chunkSize=1000
        would mean 1000 shuffle partitions) and require a pre-count of
        the source; parallelism is configured via ``num_partitions``.
        """
        from fsharp_mapreduce_spark.session import ensure_package_shipped

        # User closures may reference package helpers (dice_map_fn et
        # al.); guarantee executors can import them regardless of the
        # driver's cwd.
        ensure_package_shipped(spark)
        pairs = self._pair_rdd(spark)
        n = self.num_partitions or spark.sparkContext.defaultParallelism

        if self.ordered:
            if self.zero is None:
                # The ordered fold seeds every key with `zero`
                # (acc = seq(v, zero) for the first value); the
                # unordered zero=None path instead seeds with the first
                # VALUE via reduceByKey. Passing None here would feed
                # seq(v, None) deep inside an executor task — refuse
                # with the real cause instead (code-review r4).
                raise ValueError(
                    "ordered=True requires an explicit zero accumulator: "
                    "the sequential fold seeds each key with it"
                )
            merged = dict(self._run_ordered(pairs, n))
        else:
            zero, seq = self.zero, self.reduce_fn
            comb = self.merge_fn
            if comb is None:
                if zero is None:
                    # Pure pairwise fold: value type == acc type.
                    merged = dict(pairs.reduceByKey(seq, numPartitions=n).collect())
                    return self._finish(merged)
                # A seqOp like (value, acc) -> acc+1 is NOT a valid
                # cross-partition combiner; refusing beats silently
                # wrong counts under >1 partition.
                raise ValueError(
                    "zero given without merge_fn: distributed aggregation "
                    "needs an (acc, acc) -> acc combiner"
                )
            # PySpark's seqFunc is (acc, value); the reference's reduce
            # fn takes the pair first (Worker.fs:23) — flip here.
            merged = dict(
                pairs.aggregateByKey(
                    zero, lambda acc, v: seq(v, acc), comb, numPartitions=n
                ).collect()
            )
        return self._finish(merged)

    def _run_ordered(self, pairs, n):
        """Deterministic sequential fold per key WITHOUT materializing
        any key's value list: tag each pair with its emission index,
        hash-partition by key only, sort within each partition by that
        index (``repartitionAndSortWithinPartitions`` — one shuffle
        backed by Spark's spillable external sorter), then stream each
        partition once, folding values into a per-key accumulator dict.
        Per-key emission order is a subsequence of the partition's
        index order, so the fold sees values in exactly the order the
        map phase emitted them. Task memory is O(distinct keys × acc) —
        the same bound as a hash aggregate; a hot key costs its
        accumulator, not its value list (the groupByKey formulation
        this replaced held every value of a key in one executor's
        memory)."""
        from pyspark.rdd import portable_hash

        zero, seq = self.zero, self.reduce_fn
        from pyspark import StorageLevel

        # zipWithIndex launches a per-partition COUNT job before the
        # real pass — without the persist that first job re-executes
        # the whole source scan + map_fn, doubling the map phase
        # (code-review r4). MEMORY_AND_DISK, not the MEMORY_ONLY
        # default: an evicted partition would re-run the source scan +
        # map_fn between the count job and the fold pass — the exact
        # double-execution (and, for nondeterministic map_fns,
        # index-misalignment) hazard this persist exists to close
        # (ADVICE r4).
        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        indexed = pairs.zipWithIndex().map(lambda t: ((t[0][0], t[1]), t[0][1]))
        parted = indexed.repartitionAndSortWithinPartitions(
            numPartitions=n,
            partitionFunc=lambda k: portable_hash(k[0]),
            keyfunc=lambda k: k[1],
        )

        def fold_stream(it):
            accs: dict = {}
            for (k, _i), v in it:
                accs[k] = seq(v, accs[k] if k in accs else zero)
            return iter(accs.items())

        try:
            return parted.mapPartitions(fold_stream).collect()
        finally:
            pairs.unpersist()

    def _finish(self, merged: dict):
        if self.handle_results is not None:
            out = self.handle_results(merged)
            return merged if out is None else out
        return merged


def dice_job_report(results: dict) -> dict:
    """The example job's handleResults logic (Example-Job.fs:64-69):
    win rate = wins / (wins + losses), reported as a percentage next to
    the analytic expectation 1/6, 8 decimal places."""
    wins = results.get("Win", 0)
    losses = results.get("Lose", 0)
    rate = (wins / (wins + losses)) * 100.0 if (wins + losses) else 0.0
    return {
        "wins": wins,
        "losses": losses,
        "win_rate_pct": f"{rate:.8f}",
        "expected_pct": f"{100.0 / 6.0:.8f}",
    }


def dice_map_fn(row) -> list[tuple[str, str]]:
    """The example map fn (Example-Job.fs:52-54): emits the pair
    ("Result", "Win"|"Lose"); roll == 3 wins (code tests 3 even though
    the comment says 6 — either way P(win)=1/6, Example-Job.fs:8,53)."""
    return [("Result", "Win" if row.roll == 3 else "Lose")]


def dice_reduce_fn(value, acc: int) -> int:
    """The example reduce fn (Example-Job.fs:57-61): get-or-insert
    increment — a frequency count over the grouping slot."""
    return acc + 1
