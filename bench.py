#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md table of record).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the sum of per-query median wall-clock (seconds, median
of --runs measured runs after one warm-up). ``--duckdb`` additionally
times the DuckDB oracles on the same files — that populates the
BASELINE.md ratio table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Shapes chosen to cover the engine surface: scan/agg, fact-fact join,
# window, distinct, JSON, sessionize, dedup (exact-jaccard + LSH),
# text, similarity, and the flagship MapReduce query.
HEADLINE = [
    "q01_pricing_summary",
    "q02_filter_project",
    "q04_revenue_by_nation",
    "q09_agg_distinct",
    "q13_window_topk_per_group",
    "q17_topk_global",
    "q31_global_ranks_scalable",
    "q24_json_extract",
    "q26_sessionize",
    "q27_dice_frequency",
    "t02_ngram_jaccard_pairs",
    "t03_minhash_lsh_pairs",
    "t06_quality_score",
    "t08_fingerprint",
    "t09_embedding_neardup",
    "t10_embedding_neardup_lsh",
    "t11_simhash_neardup_pairs",
    "t12_dedup_clusters",
    "t13_hash_sample",
    "t16_token_chunking",
    "t17_bigram_pmi",
    "t18_clean_text",
    "t19_tfidf_top_terms",
    "t21_bigram_lm_score",
    "t22_winnow_containment_pairs",
    "t23_dedup_clusters_star",
    "s01_knn_bruteforce",
    "s02_knn_lsh",
    "s04_knn_ivf",
    "s05_range_search",
    "s06_knn_join",
    "s07_knn_join_lsh",
    "s08_knn_quantized",
    "q39_time_range_window",
    "q40_dice_pull_source",
    "st01_stream_tumbling_agg",
    "m03_frame_sample",
]


def _last_json_obj(stdout: str) -> dict:
    """The subprocess payload: the LAST stdout line that parses as a
    JSON object. Spark/py4j occasionally emit stray trailing lines on
    stdout, so blindly parsing splitlines()[-1] throws an unexplained
    JSONDecodeError (ADVICE r3)."""
    for line in reversed(stdout.strip().splitlines()):
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict):
            return obj
    raise RuntimeError(f"no JSON payload in subprocess stdout:\n{stdout[-2000:]}")


def run_spark(sf_dir: str, runs: int, names: list[str]) -> dict[str, float]:
    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules
    from fsharp_mapreduce_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark(app_name="fsharp_mapreduce_spark-bench")
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name].fn
        # 3 warm-up runs: the first executions of a plan pay JVM JIT
        # compilation of generated/interpreted expression classes
        # (measured 3-4× on expression-heavy queries); steady-state is
        # what a long-running cluster job sees.
        for _ in range(3):
            # clearCache between warm-ups too: queries that persist()
            # intermediates would otherwise accumulate executor-storage
            # blocks across the warm-up loop (ADVICE r2: persist leak)
            spark.catalog.clearCache()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(runs):
            # each measured run is a true cold end-to-end execution:
            # queries that persist() intermediates must rebuild them,
            # exactly as a fresh pipeline invocation would.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            # noop sink: full execution, no driver collect bottleneck
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
        print(f"# spark {name} {timings[name]}", file=sys.stderr, flush=True)
    return timings


def run_dice_anchor(runs: int, rows: int = 5_000_000) -> float:
    """Like-for-like MapReduce anchor (BASELINE.md): the reproduced
    dice job through the compat API at the reference's own cardinality
    band (1M-10M records, Example-Job.fs:40; 5M = mid-band). The
    reference publishes no timings — this records OUR number so rounds
    are comparable to each other. Full pipeline: seeded source →
    flatMap → value-slot shuffle → keyed fold → driver merge."""
    from fsharp_mapreduce_spark.compat.job import (
        MapReduceJob,
        dice_map_fn,
        dice_reduce_fn,
        range_source,
    )
    from fsharp_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="fsharp_mapreduce_spark-bench")
    job = MapReduceJob(
        range_source(rows, seed=42),
        dice_map_fn,
        dice_reduce_fn,
        zero=0,
        merge_fn=lambda a, b: a + b,
        group_on="value",
    )
    job.run(spark)  # warm-up (JIT + python worker pool spin-up)
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        res = job.run(spark)
        samples.append(time.perf_counter() - t0)
        assert res["Win"] + res["Lose"] == rows
    return round(statistics.median(samples), 4)


# Oracles excluded from the DuckDB TIMING side (still used for
# correctness at sf0.01): their SQL formulation is deliberately
# naive-quadratic (the point of the Spark-side algorithm is to avoid
# that shape), so timing them at sf0.1 measures the oracle's
# intractability, not a baseline. t09's all-pairs oracle stays — it IS
# the apples-to-apples brute-force comparison and finishes.
DUCKDB_TIMING_SKIP = {
    # near-all-pairs candidate set at the fixture's wide-OR (k=2, L=8)
    # tuning: ~90% of all vector pairs get a fold-cosine in SQL
    "t10_embedding_neardup_lsh",
    # replays 32 minhash perms per shingle as interpreted list lambdas
    # (~32M evals at sf0.1, measured >20 min): the oracle exists for
    # value-exactness at sf0.01, not as a performance baseline —
    # DuckDB has no native minhash to compare against
    "t03_minhash_lsh_pairs",
    # same shape: 16 hyperplane fold-dots per vector plus fold-cosines
    # over every probe-bucket candidate
    "s02_knn_lsh",
    # replays the per-character simhash folds (~12M interpreted evals
    # at sf0.1)
    "t11_simhash_neardup_pairs",
    # embeds the t03 minhash replay inside a recursive CTE
    "t12_dedup_clusters",
    # wide-OR LSH replay: near-all-pairs fold-cosines at sf0.1 (same
    # family as t10/s02)
    "s07_knn_join_lsh",
    # data-derived oracle: the registered SQL embeds centroid literals
    # fit on the sf0.01 GATE fixture — running it on sf0.1 would time
    # a semantically different query
    "s04_knn_ivf",
    # shares t12's recursive-CTE oracle (quadratic at sf0.1)
    "t23_dedup_clusters_star",
}


def run_duckdb(sf_dir: str, runs: int, names: list[str]) -> dict[str, float]:
    import duckdb

    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()
    names = [n for n in names if n not in DUCKDB_TIMING_SKIP]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    timings: dict[str, float] = {}
    for name in names:
        sql = QUERIES[name].oracle
        if not sql:
            continue
        con.sql(sql).fetchall()  # warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
        print(f"# duckdb {name} {timings[name]}", file=sys.stderr, flush=True)
    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--duckdb", action="store_true", help="also time DuckDB oracles")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument(
        "--dice-only",
        action="store_true",
        help="measure only the MapReduce anchor (used by the subprocess below)",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    names = args.queries or HEADLINE

    if args.dice_only:
        print(json.dumps({"dice_mr_compat_5m": run_dice_anchor(args.runs)}))
        return

    dice = None
    if args.queries is None:
        # The like-for-like MapReduce anchor rides along with the
        # default headline set (not an SF-scaled registry query — fixed
        # 5M-row band per BASELINE.md — so it stays out of `value`).
        # Measured in its OWN JVM (subprocess): the anchor and the SQL
        # queries poison each other's timings in a shared JVM — r2
        # measured the anchor LAST and read 4.09s vs ~1.9s quiet; the
        # r3 anchor-FIRST attempt fixed the anchor but inflated the
        # floor-bound SQL queries 2-3× (the anchor's 32 Python workers
        # + 40M-row RDD heap churn linger). Process isolation makes
        # both readings quiet-JVM numbers, comparable to BASELINE.md.
        import subprocess

        proc = subprocess.run(
            [sys.executable, __file__, "--dice-only", "--runs", str(args.runs)],
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            # surface the child's traceback — CalledProcessError alone
            # would hide the actual failure
            print(proc.stderr, file=sys.stderr)
            raise RuntimeError(f"dice anchor subprocess failed (rc={proc.returncode})")
        dice = _last_json_obj(proc.stdout)["dice_mr_compat_5m"]
    timings = run_spark(sf_dir, args.runs, names)
    result = {
        "metric": "sum of per-query median wall-clock, headline queries",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if dice is not None:
        result["dice_mr_compat_5m"] = dice
    if args.duckdb:
        duck = run_duckdb(sf_dir, args.runs, names)
        result["duckdb_queries"] = duck
        result["duckdb_value"] = round(sum(duck.values()), 4)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
