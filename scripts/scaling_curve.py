#!/usr/bin/env python
"""Scaling-curve evidence for SCALING.md: run representative queries at
sf0.001 / sf0.01 / sf0.1 (100× input growth end-to-end) and report
wall-clock + scale factor. The claim under test: plans are floor-bound,
not work-bound, at fixture scale — wall-clock must grow FAR slower than
input size, because the per-row work rides on the fixed ~0.1-0.3s
scheduling floor. A query whose time grew ~100× here would be flagged
as work-dominated already at toy scale (a scale-killer at 100 TB).

Usage: python scripts/scaling_curve.py [query ...]
Prints one JSON line per query: {"query": ..., "sf": {sf: sec}}.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

DEFAULT = [
    "q01_pricing_summary",  # scan + hash agg
    "q04_revenue_by_nation",  # fact-fact shuffle join
    "t03_minhash_lsh_pairs",  # bucketed dedup candidates
    "t22_winnow_containment_pairs",  # fingerprint sketch + bucket join
    "t12_dedup_clusters",  # iterative connected components
    "s07_knn_join_lsh",  # sub-quadratic kNN join
    "t25_decontaminate",  # broadcast-probe n-gram membership (r4)
    "t26_paragraph_dedup",  # digest-keyed exact block dedup (r4)
    "t28_preprocess_funnel",  # composed filter funnel (r4)
]


def main() -> int:
    # reuse bench.py's measurement loop (warm-ups, clearCache-per-run,
    # noop sink, median) so the two harnesses can't silently diverge
    from bench import run_spark

    names = sys.argv[1:] or DEFAULT
    for name in names:
        out = {}
        for sf in SFS:
            out[Path(sf).name] = run_spark(sf, runs=3, names=[name])[name]
        lo, hi = out[Path(SFS[0]).name], out[Path(SFS[-1]).name]
        print(
            json.dumps(
                {"query": name, "sf": out, "time_x_for_100x_data": round(hi / lo, 2)}
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
