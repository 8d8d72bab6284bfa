#!/usr/bin/env python
"""Per-query job/stage profile (guide §1: measure first, empirically).

Runs registered queries on the tuned session with the event log on,
then reports, per query: wall-clock (median of --runs after warm-ups,
noop sink), the JOB breakdown (description, duration, stage count) and
per-stage shuffle bytes — the data that says WHERE the time goes
(scheduling floors vs shuffle vs compute) before anything is changed.

For streaming queries it additionally attaches a StreamingQueryListener
and dumps each micro-batch's durationMs breakdown (triggerExecution,
queryPlanning, walCommit, stateOperators commit) — the per-trigger
floor decomposition.

Usage: python scripts/profile_query.py [--runs N] query [query ...]
Writes /tmp/fsmr_profile_<query>.json per query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

EVDIR = "/tmp/fsmr_eventlog"


class _ProgressCapture:
    """Python StreamingQueryListener that records every progress dict."""

    def __init__(self):
        from pyspark.sql.streaming import StreamingQueryListener

        events: list[dict] = []

        class L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                try:
                    events.append(json.loads(event.progress.json))
                except Exception:
                    pass

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self.listener = L()
        self.events = events


def _jobs_from_eventlog(app_id: str, t0_ms: float, t1_ms: float) -> list[dict]:
    """Parse the event log for jobs that ran inside [t0, t1]."""
    candidates = sorted(Path(EVDIR).glob(f"*{app_id}*"))
    if not candidates:
        return []
    path = candidates[-1]
    def read_part(p: Path) -> str:
        data = p.read_bytes()
        if p.name.endswith(".zstd"):
            import zstandard

            data = zstandard.ZstdDecompressor().decompressobj().decompress(data)
        return data.decode("utf-8", "replace")

    if path.is_dir():  # Spark 4 rolling event log v2: a directory of
        # events_N_<appid>[.codec] part files
        parts = sorted(
            path.glob("events_*"), key=lambda p: int(p.name.split("_")[1])
        )
        text = "".join(read_part(p) for p in parts)
    else:
        text = read_part(path)
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in text.splitlines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "job": jid,
                "t0": ev["Submission Time"],
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                ),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif k == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            acc = {
                a.get("Name"): a.get("Value")
                for a in si.get("Accumulables", [])
            }
            stages[si["Stage ID"]] = {
                "name": si.get("Stage Name", ""),
                "tasks": si.get("Number of Tasks"),
                "ms": (si.get("Completion Time") or 0)
                - (si.get("Submission Time") or 0),
                "shuffle_write_b": acc.get("internal.metrics.shuffle.write.bytesWritten"),
                "shuffle_read_b": acc.get("internal.metrics.shuffle.read.remoteBytesRead"),
                "input_b": acc.get("internal.metrics.input.bytesRead"),
            }
    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j or j["t1"] < t0_ms or j["t0"] > t1_ms:
            continue
        j["ms"] = j["t1"] - j["t0"]
        j["stage_detail"] = [
            {**stages[s], "stage": s} for s in j["stages"] if s in stages
        ]
        j["n_stages_run"] = len(j["stage_detail"])
        del j["stages"]
        out.append(j)
    return out


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=2)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    os.makedirs(EVDIR, exist_ok=True)
    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules
    from fsharp_mapreduce_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark(
        app_name="fsmr-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVDIR}",
            "spark.eventLog.compress": "false",
        },
    )
    app_id = spark.sparkContext.applicationId
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    for name in args.queries:
        fn = QUERIES[name].fn
        cap = None
        if "streaming" in QUERIES[name].tags:
            cap = _ProgressCapture()
            spark.streams.addListener(cap.listener)
        for _ in range(args.warmups):
            spark.catalog.clearCache()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        if cap is not None:
            cap.events.clear()
        samples = []
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0_wall = time.time() * 1000
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        t1_wall = time.time() * 1000
        spark.sparkContext.setJobDescription(None)
        if cap is not None:
            spark.streams.removeListener(cap.listener)

        # flush the event log then parse
        time.sleep(0.5)
        jobs = _jobs_from_eventlog(app_id, t0_wall, t1_wall)
        prof = {
            "query": name,
            "samples": [round(s, 4) for s in samples],
            "median": round(sorted(samples)[len(samples) // 2], 4),
            "n_jobs_per_run": round(len(jobs) / max(1, args.runs), 1),
            "jobs": jobs,
        }
        if cap is not None:
            trimmed = []
            for e in cap.events:
                trimmed.append(
                    {
                        "batchId": e.get("batchId"),
                        "numInputRows": e.get("numInputRows"),
                        "durationMs": e.get("durationMs"),
                        "stateOperators": [
                            {
                                "operatorName": s.get("operatorName"),
                                "commitTimeMs": s.get("commitTimeMs"),
                                "numRowsTotal": s.get("numRowsTotal"),
                                "numShufflePartitions": s.get(
                                    "numShufflePartitions"
                                ),
                            }
                            for s in e.get("stateOperators", [])
                        ],
                    }
                )
            prof["streaming_progress"] = trimmed
        out = Path(f"/tmp/fsmr_profile_{name}.json")
        out.write_text(json.dumps(prof, indent=1))
        top = sorted(jobs, key=lambda j: -j["ms"])[:8]
        print(
            json.dumps(
                {
                    "query": name,
                    "median": prof["median"],
                    "jobs_per_run": prof["n_jobs_per_run"],
                    "top_jobs_ms": [
                        {"ms": j["ms"], "desc": j["desc"][:60], "stages": j["n_stages_run"]}
                        for j in top
                    ],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
