#!/usr/bin/env python
"""t12 ≡ t23 clustering-equivalence check (VERDICT r10 #5).

t12 (label-propagation connected components) and t23 (large-star /
small-star contraction) must induce the SAME partition of the
near-duplicate graph — they differ only in the iteration schedule, so
any divergence is a bug in one of the two engines, not data noise.
Cluster ids are schedule-dependent labels; the partition itself is
not. Canonicalize each clustering by relabeling every cluster with the
MIN doc_id it contains, then compare the (doc_id, canon_label) sets.

Usage: python scripts/equiv_t12_t23.py SF_DIR
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)


def canonical(df):
    from pyspark.sql import functions as F

    # relabel: cluster_id -> min(doc_id) member, the schedule-free name
    cols = df.columns
    cluster_col = [c for c in cols if c != "doc_id"][0]
    m = df.groupBy(cluster_col).agg(F.min("doc_id").alias("canon"))
    return df.join(m, cluster_col).select("doc_id", "canon")


def main() -> int:
    sf_dir = sys.argv[1]
    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules
    from fsharp_mapreduce_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark(app_name="fsmr-equiv-t12-t23")

    out = {}
    for name in ("t12_dedup_clusters", "t23_dedup_clusters_star"):
        t0 = time.time()
        got = canonical(QUERIES[name].fn(spark, sf_dir))
        # exceptAll both ways inside the JVM: no driver materialization
        out[name] = {"df": got, "sec": None, "t0": t0}
        n = got.count()
        out[name]["sec"] = round(time.time() - t0, 1)
        out[name]["rows"] = n
        print(f"{name}: {n} rows in {out[name]['sec']}s", flush=True)

    a = out["t12_dedup_clusters"]["df"]
    b = out["t23_dedup_clusters_star"]["df"]
    only_a = a.exceptAll(b).count()
    only_b = b.exceptAll(a).count()
    same = only_a == 0 and only_b == 0
    print(
        f"t12-vs-t23 equivalence sf_dir={sf_dir}: "
        f"{'PARTITION-MATCH' if same else 'DIVERGED'} "
        f"rows={out['t12_dedup_clusters']['rows']}/{out['t23_dedup_clusters_star']['rows']} "
        f"only_t12={only_a} only_t23={only_b}",
        flush=True,
    )
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
