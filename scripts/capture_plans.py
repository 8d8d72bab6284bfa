#!/usr/bin/env python
"""Capture .explain('formatted') for registered queries into
plans/<tag>/<query>_<suffix>.txt (the optimization-round deliverable).

Usage: python scripts/capture_plans.py --tag r11 --suffix before q1 q2 ...
Streaming queries execute their pipeline during build (run_to_completion
inside the function), so their 'plan' is the final-table plan — still
captured, with a header noting the streaming shape.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules
    from fsharp_mapreduce_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark(app_name="fsmr-plan-capture")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = REPO / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in args.queries:
        df = QUERIES[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(
            f"# {name} — explain('formatted'), {args.suffix}, sf_dir={sf_dir}\n"
            + text
        )
        n_ex = text.count("Exchange")
        print(f"{name}: {len(text)} chars, Exchange x{n_ex} -> {path}", flush=True)


if __name__ == "__main__":
    main()
