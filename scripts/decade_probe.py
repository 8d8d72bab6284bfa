#!/usr/bin/env python
"""Decade-up timing probe (VERDICT r5 #3): time queries at sf0.1 (the
bench fixture) and at a generated sf0.5 (scripts/gen_sf.py — 5x the
rows), and report the wall-clock growth against the 5x input growth.

A query whose time grows ~>=5x here is work-dominated already and
would be a scale hazard another decade up; the SCALING.md thesis is
that per-row cost growth stays ~<=1x (time_x / data_x <= ~1).

Usage: python scripts/decade_probe.py SF5_DIR [query ...]
Prints one JSON line per query:
  {"query": ..., "sf0.1_sec": ..., "sf0.5_sec": ..., "time_x": ...,
   "per_row_x": ...}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"

DEFAULT = [
    "t22_winnow_containment_pairs",
    "t02_ngram_jaccard_pairs",
    "t12_dedup_clusters",
    "t23_dedup_clusters_star",
    "s06_knn_join",
    "s07_knn_join_lsh",
    "q31_global_ranks_scalable",
    "t30_incremental_dedup",
    "q50_local_supplier_revenue",
    "st05_stream_stream_join",
]


def main() -> None:
    sf5_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    # data ratio vs the sf0.1 base, parsed from a trailing sfX.Y in
    # the dir name (gen_sf.py convention); default 5x (sf0.5)
    import re

    m = re.search(r"sf(\d+(?:\.\d+)?)$", sf5_dir.rstrip("/"))
    data_x = (float(m.group(1)) / 0.1) if m else 5.0

    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules
    from fsharp_mapreduce_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark(app_name="fsmr-decade-probe")

    for name in names:
        fn = QUERIES[name].fn
        out = {"query": name}
        for label, sf_dir in (("sf0.1_sec", BASE), ("sf0.5_sec", sf5_dir)):  # label kept stable; data_x says the real ratio
            # one warm-up (JIT), then median of 3 cold runs
            spark.catalog.clearCache()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            out[label] = round(sorted(samples)[1], 4)
        out["data_x"] = data_x
        out["time_x"] = round(out["sf0.5_sec"] / out["sf0.1_sec"], 2)
        out["per_row_x"] = round(out["time_x"] / data_x, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
