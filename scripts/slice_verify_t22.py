#!/usr/bin/env python
"""Sampled-slice value verification for t22 at decade-up SFs
(VERDICT r6 #3 option b — SCALING.md evidence).

The generated-fixture geometry makes t22's FULL exact verification
intractable as one DuckDB query at sf0.5 (~58M candidate pairs, ~20
hot fingerprints per doc defeat the upper-bound pre-filter — see
`_t22_oracle`'s docstring). The sound slice check: run the ENGINE's
full t22 result, restrict it to doc_a % SLICE_MOD == 0, and
hash-compare against `_t22_oracle(slice_mod=SLICE_MOD)` — the same
pipeline whose ks self-join keeps only that slice of left endpoints
while every upstream stage (postings, hot set, window minima, sizes)
still covers the FULL corpus. A hash match is exact value evidence
for 1/SLICE_MOD of the output rows of the full-scale run, with the
full-scale candidate structure intact.

Usage: python scripts/slice_verify_t22.py SF_DIR [SLICE_MOD] [RESIDUE]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(
            "%.9g" % r[i] if isinstance(r[i], float) else str(r[i]) for i in order
        )
        for r in rows
    )


def main() -> int:
    sf_dir = sys.argv[1]
    slice_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    residue = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    import duckdb
    from pyspark.sql import functions as F

    from fsharp_mapreduce_spark.functions.text import _t22_oracle
    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules
    from fsharp_mapreduce_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark(app_name="fsmr-t22-slice-verify")

    t0 = time.time()
    df = (
        QUERIES["t22_winnow_containment_pairs"]
        .fn(spark, sf_dir)
        .where(F.col("doc_a") % slice_mod == residue)
    )
    cols = df.columns
    got = canon(cols, [tuple(r) for r in df.collect()])
    t_engine = time.time() - t0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    t0 = time.time()
    cur = con.execute(_t22_oracle(slice_mod=slice_mod, residue=residue))
    ocols = [d[0] for d in cur.description]
    want = canon(ocols, cur.fetchall())
    t_oracle = time.time() - t0

    ok = got == want
    print(
        f"t22 slice-verify sf_dir={sf_dir} mod={slice_mod} residue={residue}: "
        f"{'HASH-MATCH' if ok else 'MISMATCH'} "
        f"rows={len(got)}/{len(want)} engine={t_engine:.1f}s "
        f"oracle={t_oracle:.1f}s"
    )
    if not ok:
        only_got = [r for r in got if r not in set(want)][:3]
        only_want = [r for r in want if r not in set(got)][:3]
        print("engine-only:", only_got)
        print("oracle-only:", only_want)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
