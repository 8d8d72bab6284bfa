#!/usr/bin/env python
"""Generate a schema-compatible synthetic fixture at an arbitrary SF
(VERDICT r5 #3: "run one decade above the bench SF").

The driver-generated fixtures stop at sf0.1 and are read-only, so the
decade-up evidence needs a local generator. This one mirrors the
sf0.1 tables' SCHEMAS exactly and their value GRAMMAR closely (same
vocabulary, key ranges scaled linearly, same categorical domains,
same date spans, planted near-duplicate documents so the dedup
operators have real work), seeded and deterministic. It does NOT
reproduce the driver's exact rows — hash verification against DuckDB
still works because `verify_probe` registers its views over whatever
directory it is pointed at, and every oracle is SQL over those same
files.

Usage: python scripts/gen_sf.py SF OUT_DIR [tables]
  e.g. python scripts/gen_sf.py 0.5 /tmp/sf0.5
       python scripts/gen_sf.py 20.0 /tmp/sf20.0 documents,embeddings

With no [tables] arg every table generates off ONE shared rng stream
(legacy behavior, byte-identical to earlier rounds' fixtures). With a
subset, each requested table draws from its OWN seeded stream
(``default_rng([42, table_idx])``) so the subset is deterministic
regardless of which tables are skipped — the sf20-cadence case
(VERDICT r10 #7) needs only documents+embeddings, and lineitem at
sf20 is 120M rows of wasted generation for a flat-family timing
probe. ``lineitem`` depends on orders' date draws, so requesting it
pulls ``orders`` in automatically.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
SEGMENTS = ["AUTOMOBILE", "FURNITURE", "MACHINERY", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
ADJ = ["large", "hot", "blue", "small", "red", "green", "dim", "pale"]
NOUN = ["ring", "bolt", "gear", "wheel", "pin", "cap", "rod", "clip"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "MEDIUM", "STANDARD", "PROMO"]

DAY_US = 86_400_000_000


def ts_us(base_days: int, extra_us: int = 0) -> int:
    return base_days * DAY_US + extra_us


def write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows", flush=True)


def main() -> None:
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    subset = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    if subset and "lineitem" in subset:
        subset.add("orders")
    table_ids = {
        "region": 0, "nation": 1, "customer": 2, "supplier": 3,
        "part": 4, "orders": 5, "lineitem": 6, "events": 7,
        "documents": 8, "embeddings": 9,
    }
    if subset:
        unknown = subset - set(table_ids)
        if unknown:
            raise SystemExit(f"unknown tables: {sorted(unknown)}")
    os.makedirs(out_dir, exist_ok=True)
    shared_rng = np.random.default_rng(42)

    def want(name: str) -> bool:
        return subset is None or name in subset

    def tab_rng(name: str) -> np.random.Generator:
        # full mode: the single shared stream (legacy, byte-identical);
        # subset mode: an independent per-table stream
        if subset is None:
            return shared_rng
        return np.random.default_rng([42, table_ids[name]])

    scale = sf / 0.1  # row counts are stated relative to the sf0.1 base

    def n_of(base: int) -> int:
        return int(base * scale)

    epoch_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    epoch_2024 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ts_type = pa.timestamp("us")

    # region / nation: fixed dimensions
    if want("region"):
        write(out_dir, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        }))
    if want("nation"):
        write(out_dir, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }))

    n_cust = n_of(15_000)
    if want("customer"):
        rng = tab_rng("customer")
        write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
        }))

    n_supp = n_of(1_000)
    if want("supplier"):
        rng = tab_rng("supplier")
        write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
        }))

    n_part = n_of(20_000)
    if want("part"):
        rng = tab_rng("part")
        write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{ADJ[a]} {NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 21, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 2),
        }))

    n_orders = n_of(150_000)
    span_days = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int)
    if want("orders"):
        rng = tab_rng("orders")
        odate_us = epoch_1995 + rng.integers(0, span_days + 1, n_orders) * DAY_US
        write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": [("O", "P", "F")[i] for i in rng.integers(0, 3, n_orders)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_orders), 2),
        "o_orderdate": pa.array(odate_us, ts_type),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_orders)],
        }))

    # lineitem: ~4 lines per order on average (6M / 1.5M at any SF)
    if want("lineitem"):
        rng = tab_rng("lineitem")
        lines_per_order = rng.integers(1, 8, n_orders)
        total = int(lines_per_order.sum())
        l_orderkey = np.repeat(np.arange(n_orders), lines_per_order)
        l_linenumber = np.concatenate([np.arange(1, k + 1) for k in lines_per_order])
        # Lag geometry mirrors the driver fixture (VERDICT r6 #5): bulk
        # ships within ~3 months, plus a 5% two-sided heavy tail spanning
        # the driver's measured [-2383, +2478]-day range — so the
        # date-threshold queries (q62's 365-day late audit) return >0 rows
        # at every generated SF instead of being vacuously hash-equal.
        lag_days = rng.integers(1, 96, total)
        tail = rng.random(total) < 0.05
        lag_days = np.where(tail, rng.integers(-2400, 2481, total), lag_days)
        l_ship_us = np.repeat(odate_us, lines_per_order) + lag_days * DAY_US
        write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, total), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, total), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, total).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, total), 2),
        "l_discount": np.round(rng.integers(0, 11, total) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, total) / 100.0, 2),
        "l_returnflag": [("N", "A", "R")[i] for i in rng.integers(0, 3, total)],
        "l_linestatus": [("O", "F")[i] for i in rng.integers(0, 2, total)],
        "l_shipdate": pa.array(l_ship_us, ts_type),
    }))

    n_events = n_of(100_000)
    n_users = n_of(1_500)
    if want("events"):
        rng = tab_rng("events")
        gaps = rng.exponential(26.0, n_events)
        ev_us = epoch_2024 + np.cumsum(gaps * 1e6).astype(np.int64)
        write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": pa.array(ev_us, ts_type),
        "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
        "event_type": [ETYPES[i] for i in rng.integers(0, 5, n_events)],
        "value": np.round(
            np.minimum(rng.exponential(60.0, n_events), 560.0), 2
        ),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_events)],
    }))

    # documents: word salad over the fixture vocabulary, ~2% planted
    # near-duplicates (a few word substitutions) so the dedup family
    # has genuine candidate/verify work at this SF
    n_docs = n_of(5_000)
    if want("documents"):
        rng = tab_rng("documents")
        texts: list[str] = []
        for i in range(n_docs):
            if i > 10 and rng.random() < 0.02:
                words = texts[int(rng.integers(0, i))].split(" ")
                for _ in range(max(1, len(words) // 20)):
                    words[int(rng.integers(0, len(words)))] = VOCAB[
                        int(rng.integers(0, len(VOCAB)))
                    ]
                texts.append(" ".join(words))
                continue
            n_words = int(rng.integers(8, 105))
            texts.append(
                " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), n_words))
            )
        write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(5, n_docs, p=LANG_P)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: ISOTROPIC gaussian vectors with label as a random
    # tag — matching the driver fixture's measured geometry
    # (within-label cosine ~0.0; an earlier clustered draft with
    # within-cluster cosine 0.76 made every LSH bucket capture a
    # whole O(n)-sized cluster and skewed s07's decade curve) — plus
    # ~2% planted near-duplicates (copy + small noise) so the
    # embedding-dedup family has genuine positives
    n_vec = n_of(2_000)
    if want("embeddings"):
        rng = tab_rng("embeddings")
        labels = rng.integers(0, 10, n_vec)
        vecs = rng.normal(0, 0.12, (n_vec, 64))
        n_dup = n_vec // 50
        dup_src = rng.integers(0, n_vec, n_dup)
        dup_dst = rng.integers(0, n_vec, n_dup)
        vecs[dup_dst] = vecs[dup_src] + rng.normal(0, 0.005, (n_dup, 64))
        vecs = vecs.astype(np.float32)
        write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    main()
