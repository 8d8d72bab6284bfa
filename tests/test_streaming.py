"""Stream/batch parity: every streaming query's answer over the
bounded, chunk-replayed events fixture must equal the straight batch
computation — the property the reference's chunked Loader relies on
implicitly (Loader.fs:32-38: chunked pulls must not change the
answer)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules, table
from fsharp_mapreduce_spark.streaming.loader import stage_as_chunked_files
from tests.conftest import SF_SMOKE

load_all_query_modules()


def rows_as_set(df):
    return {tuple(r) for r in df.collect()}


def test_tumbling_agg_stream_equals_batch(spark):
    stream = QUERIES["st01_stream_tumbling_agg"].fn(spark, SF_SMOKE)
    ev = table(spark, SF_SMOKE, "events")
    batch = ev.groupBy(
        F.window("ts", "1 hour").getField("start").alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    assert rows_as_set(stream) == rows_as_set(batch)


def test_stream_dedup_equals_batch_distinct(spark):
    stream = QUERIES["st02_stream_dedup"].fn(spark, SF_SMOKE)
    ev = table(spark, SF_SMOKE, "events")
    batch = ev.dropDuplicates(["event_id"]).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique")
    )
    assert rows_as_set(stream) == rows_as_set(batch)


def test_session_window_stream_equals_batch(spark):
    """Streaming session_window (state-store merged across 4
    micro-batches) equals batch session_window over the same events."""
    stream = QUERIES["st03_stream_session_window"].fn(spark, SF_SMOKE)
    ev = table(spark, SF_SMOKE, "events")
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window").getField("start").alias("session_start"),
            F.col("session_window").getField("end").alias("session_end"),
            "n_events",
        )
    )
    assert rows_as_set(stream) == rows_as_set(batch)


def test_stateful_fold_stream_equals_batch(spark):
    stream = QUERIES["st04_stream_stateful_running_max"].fn(spark, SF_SMOKE)
    ev = table(spark, SF_SMOKE, "events")
    batch = {
        r.user_id: (r.n, r.mx, r.sm)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("value"), 4).alias("mx"),
            F.sum("value").alias("sm"),
        )
        .collect()
    }
    got = {r.user_id: (r.n_events, r.max_value, r.total_value) for r in stream.collect()}
    assert set(got) == set(batch)
    for uid, (n, mx, sm) in batch.items():
        gn, gmx, gsm = got[uid]
        assert gn == n
        assert math.isclose(gmx, mx, abs_tol=1e-4)
        # Python-side sequential sum vs JVM sum: same values, possibly
        # different order — tolerance, not equality.
        assert math.isclose(gsm, sm, rel_tol=1e-9, abs_tol=1e-3)


def test_chunked_replay_is_chunked(spark):
    """The staging harness really does replay in n_chunks micro-batches
    (≡ n Gimme pulls), and ordered staging yields time-ordered chunks."""
    ev = table(spark, SF_SMOKE, "events").select("event_id", "ts")
    staged = stage_as_chunked_files(ev, n_chunks=4, order_by=["ts"])
    import glob

    files = sorted(
        glob.glob(f"{staged}/*.parquet"), key=lambda p: __import__("os").path.getmtime(p)
    )
    assert len(files) == 4
    bounds = []
    for f in files:
        r = spark.read.parquet(f).agg(F.min("ts"), F.max("ts")).collect()[0]
        bounds.append((r[0], r[1]))
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2, f"chunks out of order: {bounds}"
