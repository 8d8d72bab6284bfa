#!/usr/bin/env python
"""Sampled-slice value verification for t03 at decade-up SFs
(VERDICT r10 #5 — SCALING.md sixth-decade evidence for the
PRODUCTION dedup path).

t02 (the exact verifier) carries sf5/sf10 slice pins already; t03 —
the banded-LSH pipeline a 100 TB run actually executes — had sf1.0
full-oracle hash evidence only. Protocol identical to
scripts/slice_verify_t02.py: run the ENGINE's full t03, restrict to
doc_a % SLICE_MOD == RESIDUE, and hash-compare against
``_t03_oracle(slice_mod, residue)`` — the same SQL whose band-bucket
candidate join keeps only that residue of LEFT endpoints while every
upstream stage (shingle hashes, minhash signatures, band table)
still covers the FULL corpus. A match is exact value evidence for
~1/SLICE_MOD of the output under the full-scale banding structure.

Usage: python scripts/slice_verify_t03.py SF_DIR [SLICE_MOD] [RESIDUE]
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

    from fsharp_mapreduce_spark.functions.dedup import _t03_oracle
    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules
    from fsharp_mapreduce_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark(app_name="fsmr-t03-slice-verify")

    t0 = time.time()
    df = (
        QUERIES["t03_minhash_lsh_pairs"]
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
    cur = con.execute(_t03_oracle(slice_mod=slice_mod, residue=residue))
    ocols = [d[0] for d in cur.description]
    want = canon(ocols, cur.fetchall())
    t_oracle = time.time() - t0

    ok = got == want
    print(
        f"t03 slice-verify sf_dir={sf_dir} mod={slice_mod} residue={residue}: "
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
