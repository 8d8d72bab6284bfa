"""Similarity-search semantics the oracle can't check: recall of the
approximate paths (hyperplane LSH, IVF) against exact brute force, and
the cosine expression-fold itself."""

from __future__ import annotations

import math
import os
import shutil

import pytest
from pyspark.sql import functions as F

from fsharp_mapreduce_spark.functions.similarity import (
    TOP_K,
    _bucket_candidates,
    _probe_set,
    build_lsh_index,
    cosine,
    knn_lsh_probe,
    s01_knn_bruteforce,
    s02_knn_lsh,
    s04_knn_ivf,
)
from fsharp_mapreduce_spark.registry import table
from tests.conftest import SF_SMOKE


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_bruteforce_topk_shape(spark):
    rows = s01_knn_bruteforce(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == TOP_K
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, TOP_K + 1))
        # sims non-increasing with rank
        by_rank = sorted(rs, key=lambda r: r.rank)
        sims = [r.sim for r in by_rank]
        assert all(a >= b for a, b in zip(sims, sims[1:]))
        assert all(q != r.neighbor_id for r in rs)


def test_lsh_recall_floor(spark):
    """Measured 0.60 at sf0.001 (random vectors, 256 buckets, probe=own
    cell only); 0.35 floor guards regressions without flaking."""
    exact = _pairs(s01_knn_bruteforce(spark, SF_SMOKE))
    approx = _pairs(s02_knn_lsh(spark, SF_SMOKE))
    assert len(approx & exact) / len(exact) >= 0.35


def test_ivf_recall_floor(spark):
    """Measured 0.72 at sf0.001 (16 spherical-k-means cells, nprobe=6
    on random data — uniformly hard for ANN); 0.6 floor. The k-means
    fit is seeded/deterministic, so this does not flake."""
    exact = _pairs(s01_knn_bruteforce(spark, SF_SMOKE))
    approx = _pairs(s04_knn_ivf(spark, SF_SMOKE))
    assert len(approx & exact) / len(exact) >= 0.6


def test_approx_sims_are_exact_for_returned_pairs(spark):
    """Approximate variants may MISS neighbors but must never mis-score
    one: any (query, neighbor) they return carries the same cosine the
    exact path computes."""
    exact = {(r.query_id, r.neighbor_id): r.sim for r in s01_knn_bruteforce(spark, SF_SMOKE).collect()}
    for df in (s02_knn_lsh(spark, SF_SMOKE), s04_knn_ivf(spark, SF_SMOKE)):
        for r in df.collect():
            key = (r.query_id, r.neighbor_id)
            if key in exact:
                assert math.isclose(r.sim, exact[key], abs_tol=1e-9)


@pytest.fixture(scope="module")
def lsh_index(spark):
    """A materialized bucketed LSH index over the fixture corpus."""
    name = "test_lsh_index"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
    build_lsh_index(table(spark, SF_SMOKE, "embeddings"), name)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)


def test_lsh_index_probe_matches_on_the_fly(spark, lsh_index):
    """Probing the materialized index returns exactly the on-the-fly
    s02 answer — the index is a cache of the bucket assignment, not a
    different algorithm."""
    fly = {(r.query_id, r.neighbor_id, r.rank, r.sim) for r in s02_knn_lsh(spark, SF_SMOKE).collect()}
    idx = {(r.query_id, r.neighbor_id, r.rank, r.sim) for r in knn_lsh_probe(spark, lsh_index).collect()}
    assert idx == fly


def test_lsh_index_probe_plan_exchange_free(spark, lsh_index):
    """The 'exchange-free probe' claim, pinned: candidate generation
    over the bucketed index is a broadcast hash join whose index side
    is a bare table scan — no shuffle exchange anywhere in the plan
    (the only exchange is the probe-set broadcast)."""
    tagged = spark.table(lsh_index)
    cand = _bucket_candidates(tagged, _probe_set(tagged))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_lsh_index_bucketed_agg_skips_exchange(spark, lsh_index):
    """Bucketed storage co-locates (tbl, bucket): the per-bucket
    cardinality audit (the skew check a real deployment runs on its
    index) aggregates with NO exchange."""
    agg = spark.table(lsh_index).groupBy("tbl", "bucket").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan


def test_lsh_index_rebuild_over_stale_location(spark):
    """Regression: a previous PROCESS can leave the managed table's
    warehouse directory behind without a catalog entry this session can
    see (in-memory catalog + shared warehouse dir). saveAsTable's
    overwrite refuses such a location (LOCATION_ALREADY_EXISTS), so
    build_lsh_index must clear both catalog entry and stale local dir
    before writing — rebuilding a deterministic index name from a fresh
    session must succeed."""
    name = "test_lsh_index_stale_loc"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    stale = os.path.join(warehouse, name)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(stale, ignore_errors=True)
    # simulate the leftover: a non-empty location with NO catalog entry
    os.makedirs(stale)
    with open(os.path.join(stale, "leftover.parquet"), "wb") as f:
        f.write(b"stale")
    try:
        build_lsh_index(table(spark, SF_SMOKE, "embeddings"), name)
        assert knn_lsh_probe(spark, name).count() > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(stale, ignore_errors=True)


def test_cosine_fold_identities(spark):
    df = spark.createDataFrame(
        [
            ([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
            ([1.0, 0.0], [0.0, 1.0]),
            ([1.0, 1.0], [-1.0, -1.0]),
        ],
        "a array<float>, b array<float>",
    )
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert math.isclose(got[0].c, 1.0, abs_tol=1e-12)
    assert math.isclose(got[1].c, 0.0, abs_tol=1e-12)
    assert math.isclose(got[2].c, -1.0, abs_tol=1e-12)


def test_knn_join_multiblock_matches_bruteforce(spark, tmp_path_factory):
    """s06's blocked decomposition across MULTIPLE blocks (the fixture
    corpus fits one 1024-block, so the differential only exercises the
    diagonal path): 2500 synthetic vectors → 3 blocks; the per-block-
    pair local top-k union must reproduce the exact numpy brute-force
    neighbor sets for every vector."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.similarity import KNN_JOIN_K, s06_knn_join

    rng = np.random.RandomState(7)
    n = 2500
    x = rng.normal(size=(n, 16))
    d = str(tmp_path_factory.mktemp("knnjoin"))
    spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    got = {}
    for r in s06_knn_join(spark, d).collect():
        got.setdefault(r.vec_id, set()).add(r.neighbor_id)

    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = u @ u.T
    np.fill_diagonal(sims, -np.inf)
    for i in range(n):
        want = set(np.argsort(-sims[i])[:KNN_JOIN_K].tolist())
        assert got[i] == want, (i, got[i], want)


def test_knn_join_no_self_pairs_tiny_diagonal_block(spark, tmp_path_factory):
    """ADVICE r2 (medium): a diagonal block with ≤ k rows used to leak
    the -inf self entry through argpartition — the (v, v) candidate
    re-scored to cosine 1.0 and displaced a true neighbor at rank 1.
    n = 3 (< KNN_JOIN_K + 1) forces that regime: every vector must get
    exactly the other two vectors, never itself."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.similarity import s06_knn_join

    rng = np.random.RandomState(11)
    n = 3
    x = rng.normal(size=(n, 8))
    d = str(tmp_path_factory.mktemp("knnjoin_tiny"))
    spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    rows = s06_knn_join(spark, d).collect()
    assert all(r.vec_id != r.neighbor_id for r in rows)
    by_v = {}
    for r in rows:
        by_v.setdefault(r.vec_id, set()).add(r.neighbor_id)
    for i in range(n):
        assert by_v[i] == {j for j in range(n) if j != i}


def test_s07_recall_vs_exact(spark):
    """VERDICT r2 #2 done-criterion: the LSH kNN-join's neighbor sets
    must recover ≥ 0.9 of s06's exact kNN graph (wide-OR tuning on the
    adversarially-random fixture — see the S07_TABLES comment)."""
    from fsharp_mapreduce_spark.functions.similarity import (
        s06_knn_join,
        s07_knn_join_lsh,
    )

    exact = {(r.vec_id, r.neighbor_id) for r in s06_knn_join(spark, SF_SMOKE).collect()}
    approx = {
        (r.vec_id, r.neighbor_id) for r in s07_knn_join_lsh(spark, SF_SMOKE).collect()
    }
    assert len(exact) > 0
    assert len(approx & exact) / len(exact) >= 0.9


def test_s07_candidate_law_linear(spark):
    """The cost law that makes s07 the 100 TB kNN-join, re-pinned
    against n for the density-adaptive rule (VERDICT r7 #2): with the
    DEFAULT (adaptive) plane count, candidates PER VECTOR are
    independent of corpus size — the ≤ k·L constructive bound holds at
    both scales and the per-vector mean doesn't grow with n — vs the
    ~100× all-pairs law of s06's blocked formulation."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.similarity import (
        KNN_JOIN_K,
        S07_TABLES,
        _knn_join_lsh_candidates,
    )

    def synth(n):
        rng = np.random.RandomState(42)
        x = rng.normal(size=(n, 16))
        return spark.createDataFrame(
            [(i, x[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<double>",
        )

    n1, n10 = 400, 4000
    L = S07_TABLES
    c1 = _knn_join_lsh_candidates(synth(n1)).count()
    c10 = _knn_join_lsh_candidates(synth(n10)).count()
    assert 0 < c1 <= n1 * L * KNN_JOIN_K  # the constructive bound
    assert 0 < c10 <= n10 * L * KNN_JOIN_K
    per_vec1, per_vec10 = c1 / n1, c10 / n10
    # candidates-per-vector independent of n (adaptive k keeps bucket
    # occupancy ~constant; the local top-k cut bounds emissions)
    assert per_vec10 <= per_vec1 * 1.25, (per_vec1, per_vec10)
    allpairs_growth = (n10 * (n10 - 1)) / (n1 * (n1 - 1))  # ≈ 100×
    growth = c10 / c1
    assert growth < allpairs_growth / 4, (growth, allpairs_growth)


def test_s07_candidate_law_duplicate_groups(spark):
    """ADVICE r11: a planted group of d ≫ k exact duplicates must not
    blow the candidate stream to O(d²) — LSH always co-buckets
    identical vectors, so every table's bucket for the group holds all
    d copies and the margin cut admits every boundary tie. The bounded
    tie admission (cap_exact_tie_admission) keeps only the k smallest
    neighbor ids per exact-tie class, restoring the ~k·L·n law; the
    final result is unchanged because the exact-rescore window resolves
    equal sims by neighbor_id ASC — exactly the ids the cap keeps
    (end-to-end pinned vs the DuckDB oracle by
    test_s06_prune_keeps_exact_ties on the same mechanism)."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.similarity import (
        KNN_JOIN_K,
        S07_TABLES,
        _knn_join_lsh_candidates,
    )

    rng = np.random.RandomState(5)
    d, extra = 64, 32
    x = rng.normal(size=(extra, 16))
    dup = rng.normal(size=16)
    vecs = [dup] * d + [x[i] for i in range(extra)]
    df = spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    n = d + extra
    c = _knn_join_lsh_candidates(df).count()
    # pre-cap, the duplicate group ALONE admits d·(d−1) = 4032 directed
    # boundary pairs (every copy ties at exactly 1.0 with every other);
    # capped, the whole stream obeys the constructive ~k·L·n bound
    assert 0 < c <= n * S07_TABLES * KNN_JOIN_K, c
    assert c < d * (d - 1) / 2, c


def test_cap_exact_tie_admission_unit():
    """The keep-mask law directly: per (row, class) only the cap
    smallest ids survive; singleton classes are untouched; empty input
    yields an empty mask."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.similarity import (
        cap_exact_tie_admission,
    )

    rows = np.array([0, 0, 0, 0, 0, 1, 1])
    cls_ = np.array([7, 7, 7, 7, 3, 7, 7])
    ids = np.array([40, 10, 30, 20, 5, 2, 1])
    keep = cap_exact_tie_admission(rows, cls_, ids, 2)
    # row 0 / class 7: ids {40,10,30,20} → keep 10, 20; class 3
    # singleton kept; row 1 / class 7: both kept (≤ cap)
    assert [int(i) for i in ids[keep]] == [10, 20, 5, 2, 1]
    assert cap_exact_tie_admission(rows[:0], cls_[:0], ids[:0], 2).size == 0


def test_adaptive_planes_capacity_rule(spark):
    """The density-adaptive k rule itself: expected bucket occupancy
    n/2^k stays ≈ target as n grows (fixed k lets it grow ∝ n — the
    round-7 scale flag), measured on REAL bucket assignments, and the
    fixture SFs stay at the k=2 floor so the gate tuning point is
    unchanged."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.similarity import (
        S07_TARGET_BUCKET_ROWS,
        _lsh_bucket_udf,
        adaptive_planes_per_table,
    )
    from pyspark.sql import functions as F

    # the rule's shape: floor at small n, log growth, clamp
    assert adaptive_planes_per_table(0) == 2
    assert adaptive_planes_per_table(500) == 2
    assert adaptive_planes_per_table(2000) == 2    # sf0.1 fixture
    assert adaptive_planes_per_table(10_000) == 5  # generated sf0.5
    assert adaptive_planes_per_table(20_000) == 6  # generated sf1.0
    assert adaptive_planes_per_table(10**12) == 16  # clamped

    # measured occupancy: mean rows/bucket stays within 2× target as
    # the corpus grows 8× (random normals ⇒ near-uniform sign buckets)
    rng = np.random.RandomState(7)
    for n in (1000, 8000):
        k = adaptive_planes_per_table(n)
        x = rng.normal(size=(n, 16))
        df = spark.createDataFrame(
            [(i, x[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        bucket_ids = _lsh_bucket_udf(8, k)
        occ = (
            df.select(
                F.posexplode(bucket_ids(F.col("embedding"))).alias("tbl", "bucket")
            )
            .groupBy("tbl", "bucket")
            .count()
            .agg(F.avg("count").alias("m"))
            .collect()[0]["m"]
        )
        assert occ <= 2 * S07_TARGET_BUCKET_ROWS, (n, k, occ)


def test_s08_quantized_recall_vs_exact(spark):
    """The int8 candidate stage keeps 4× top-k candidates, so the
    re-ranked result should recover nearly all of the exact top-k:
    recall ≥ 0.8 on the fixture (measured well above)."""
    from fsharp_mapreduce_spark.functions.similarity import s08_knn_quantized

    exact = _pairs(s01_knn_bruteforce(spark, SF_SMOKE))
    quant = _pairs(s08_knn_quantized(spark, SF_SMOKE))
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, f"quantized recall {recall:.2f}"


def test_s08_candidate_stage_is_integer_exact(spark):
    """The quantized scores must be BIGINT (exact cross-engine
    arithmetic — the determinism selling point of the int8 stage):
    re-derive the approx scores for one probe in numpy int64 and
    compare exactly."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.similarity import N_QUERIES

    emb = table(spark, SF_SMOKE, "embeddings")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    max_abs = max(np.abs(v).max() for v in vecs.values())
    scale = 127.0 / max_abs
    q = {
        k: np.clip(np.round(v * scale), -127, 127).astype(np.int64)
        for k, v in vecs.items()
    }
    probe = 0
    assert probe < N_QUERIES
    expected = {
        k: int(q[probe] @ q[k]) for k in vecs if k != probe
    }
    from pyspark.sql import functions as FF

    qt = emb.select(
        "vec_id",
        FF.transform(
            "embedding",
            lambda x: FF.least(
                FF.lit(127.0),
                FF.greatest(FF.lit(-127.0), FF.round(x.cast("double") * scale)),
            ).cast("bigint"),
        ).alias("qv"),
    )
    pq = qt.where(FF.col("vec_id") == probe).collect()[0]["qv"]
    got = {
        r.vec_id: sum(a * b for a, b in zip(pq, r.qv))
        for r in qt.where(FF.col("vec_id") != probe).collect()
    }
    assert got == expected


@pytest.fixture(scope="module")
def ivf_index(spark, tmp_path_factory):
    """A materialized cell_id-partitioned IVF index over the fixture
    corpus (VERDICT r3 #6: the code twin of s04's 100 TB claim)."""
    from fsharp_mapreduce_spark.functions.similarity import build_ivf_index

    path = str(tmp_path_factory.mktemp("ivf") / "index")
    cents = build_ivf_index(table(spark, SF_SMOKE, "embeddings"), path)
    return path, cents


def test_ivf_index_probe_matches_on_the_fly(spark, ivf_index):
    """Probing the materialized index returns exactly the inline s04
    answer — the index is a cache of the cell assignment, not a
    different algorithm."""
    from fsharp_mapreduce_spark.functions.similarity import (
        N_QUERIES,
        knn_ivf_probe,
        s04_knn_ivf,
    )

    path, cents = ivf_index
    queries = table(spark, SF_SMOKE, "embeddings").where(F.col("vec_id") < N_QUERIES)
    fly = {(r.query_id, r.neighbor_id, r.rank, r.sim)
           for r in s04_knn_ivf(spark, SF_SMOKE).collect()}
    idx = {(r.query_id, r.neighbor_id, r.rank, r.sim)
           for r in knn_ivf_probe(spark, path, cents, queries).collect()}
    assert idx == fly


def test_ivf_index_probe_prunes_partitions(spark, ivf_index):
    """The partition-pruning claim, pinned: the probe's literal cell
    filter must reach the scan as a PartitionFilter, and the scan must
    read only the probed cell directories — at 100 TB unselected cells
    are never listed, so probe I/O scales with nprobe, not corpus."""
    import re

    from fsharp_mapreduce_spark.functions.similarity import (
        N_CELLS,
        N_QUERIES,
        knn_ivf_probe,
    )

    path, cents = ivf_index
    queries = table(spark, SF_SMOKE, "embeddings").where(F.col("vec_id") < N_QUERIES)
    df = knn_ivf_probe(spark, path, cents, queries)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the index scan must carry the literal cell set as a partition
    # filter: "PartitionFilters: [cell_id#N INSET c1, c2, ..." on the
    # FileScan over the index path
    scan_line = next(
        line for line in plan.splitlines() if "FileScan" in line and "/index" in line
    )
    m = re.search(r"PartitionFilters: \[cell_id#\d+ INSET ([\d, ]+)", scan_line)
    assert m, scan_line
    probed = {int(c) for c in m.group(1).split(",") if c.strip()}
    # the written index has N_CELLS directories; the probe must read a
    # strict subset (on the fixture: Q×nprobe with overlap < N_CELLS)
    import os

    n_dirs = len([d for d in os.listdir(path) if d.startswith("cell_id=")])
    assert n_dirs == N_CELLS
    assert 0 < len(probed) < N_CELLS, (probed, N_CELLS)


def test_knn_join_exact_ties_break_by_neighbor_id(spark, tmp_path_factory):
    """Code-review r4: duplicate embeddings make cosines EXACTLY tied,
    and the in-UDF local top-k cut used to keep an arbitrary k of them
    (argpartition has no tie order) while the oracle's ROW_NUMBER
    keeps the smallest neighbor_ids. Six identical vectors, k=3: every
    member's neighbors must be the three smallest OTHER ids, in both
    the exact (s06) and LSH (s07) joins."""
    from fsharp_mapreduce_spark.functions.similarity import (
        KNN_JOIN_K,
        s06_knn_join,
        s07_knn_join_lsh,
    )

    assert KNN_JOIN_K == 3
    vec = [1.0, 0.5, -0.25, 2.0, 0.0, 1.5, -1.0, 0.75]
    far = [-5.0, 3.0, 2.0, -1.0, 4.0, -2.0, 0.5, -3.0]
    rows = [(i, vec) for i in range(6)] + [(10, far)]
    d = str(tmp_path_factory.mktemp("knn_ties"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    for fn in (s06_knn_join, s07_knn_join_lsh):
        got = {}
        for r in fn(spark, d).collect():
            got.setdefault(r.vec_id, set()).add(r.neighbor_id)
        for v in range(6):
            want = sorted(set(range(6)) - {v})[:3]
            assert got[v] == set(want), (fn.__name__, v, got[v], want)


def test_s11_registered_equals_inline_s04(spark):
    """The registered materialized-index query (s11) must return
    exactly the inline s04 answer — same queries, same centroids, same
    ranking — so it can legitimately share s04's oracle factory."""
    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()
    a = {tuple(r) for r in QUERIES["s04_knn_ivf"].fn(spark, SF_SMOKE).collect()}
    b = {tuple(r) for r in QUERIES["s11_knn_ivf_index_probe"].fn(spark, SF_SMOKE).collect()}
    assert a == b


def test_s12_registered_equals_inline_s02(spark):
    """The registered materialized-LSH-index query (s12) must return
    exactly the inline s02 answer, so it can share s02's oracle."""
    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()
    a = {tuple(r) for r in QUERIES["s02_knn_lsh"].fn(spark, SF_SMOKE).collect()}
    b = {tuple(r) for r in QUERIES["s12_knn_lsh_index_probe"].fn(spark, SF_SMOKE).collect()}
    assert a == b


def test_s13_append_lifecycle(spark, tmp_path_factory):
    """s13's append semantics, pinned directly: build on the base
    split, append the batch with the SAME centroids — the union index
    must hold every corpus row exactly once, batch rows must land in
    the cell an inline full-table assignment (same centroids) gives
    them, and the probe over the union must equal the probe over an
    index built in ONE shot from the full table with those centroids
    (append is pure maintenance, not a different algorithm)."""
    from fsharp_mapreduce_spark.functions.similarity import (
        APPEND_MOD,
        APPEND_REMAINDER,
        N_QUERIES,
        _assign_cells,
        append_ivf_index,
        build_ivf_index,
        knn_ivf_probe,
    )

    emb = table(spark, SF_SMOKE, "embeddings")
    is_batch = F.col("vec_id") % APPEND_MOD == APPEND_REMAINDER
    path = str(tmp_path_factory.mktemp("ivf_append") / "index")
    cents = build_ivf_index(emb.where(~is_batch), path)
    n_base = spark.read.parquet(path).count()
    append_ivf_index(emb.where(is_batch), path, cents)

    union = spark.read.parquet(path)
    assert n_base == emb.where(~is_batch).count()
    assert union.count() == emb.count()
    assert union.select("vec_id").distinct().count() == emb.count()

    # batch rows sit in the same cell a full-table assignment (same
    # centroids) would put them in
    inline = _assign_cells(emb, cents).select("vec_id", "cell_id")
    mismatch = (
        union.select("vec_id", "cell_id")
        .join(inline.withColumnRenamed("cell_id", "want"), "vec_id")
        .where(F.col("cell_id") != F.col("want"))
        .count()
    )
    assert mismatch == 0

    # probe(union) == probe(one-shot index over the full table with
    # the same centroids)
    one_shot = str(tmp_path_factory.mktemp("ivf_oneshot") / "index")
    _assign_cells(emb, cents).write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(one_shot)
    queries = emb.where(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    a = {tuple(r) for r in knn_ivf_probe(spark, path, cents, queries).collect()}
    b = {tuple(r) for r in knn_ivf_probe(spark, one_shot, cents, queries).collect()}
    assert a == b


def test_s13_append_assignment_is_map_only(spark):
    """The nightly-ingest cost claim: the append's assignment
    projection is exchange-free — one Arrow-batched GEMM projection
    over the batch scan, no shuffle, no join, no touch of the base
    index rows."""
    from fsharp_mapreduce_spark.functions.similarity import (
        APPEND_MOD,
        APPEND_REMAINDER,
        N_CELLS,
        _assign_cells,
        _kmeans_centroids,
    )

    emb = table(spark, SF_SMOKE, "embeddings")
    is_batch = F.col("vec_id") % APPEND_MOD == APPEND_REMAINDER
    cents = _kmeans_centroids(emb.where(~is_batch), N_CELLS)
    assigned = _assign_cells(emb.where(is_batch), cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_s14_pq_recall_vs_exact(spark):
    """PQ recall floor on the fixture (random vectors — PQ's worst
    case, no cluster structure): measured 0.84 at C=100; 0.6 guards
    regressions without flaking (the fit and encode are seeded and
    bit-deterministic, so this value is stable)."""
    from fsharp_mapreduce_spark.functions.similarity import (
        s01_knn_bruteforce,
        s14_knn_pq,
    )

    exact = _pairs(s01_knn_bruteforce(spark, SF_SMOKE))
    approx = _pairs(s14_knn_pq(spark, SF_SMOKE))
    assert len(approx & exact) / len(exact) >= 0.6


def test_s14_returned_sims_are_exact(spark):
    """The two-stage contract: any (query, neighbor) s14 returns
    carries the exact cosine — quantization may hide neighbors, never
    mis-score one."""
    from fsharp_mapreduce_spark.functions.similarity import (
        s01_knn_bruteforce,
        s14_knn_pq,
    )

    exact = {
        (r.query_id, r.neighbor_id): r.sim
        for r in s01_knn_bruteforce(spark, SF_SMOKE).collect()
    }
    for r in s14_knn_pq(spark, SF_SMOKE).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert math.isclose(r.sim, exact[key], abs_tol=1e-9)


def test_s15_prefilter_beats_postfilter(spark):
    """The reason filtered ANN must PRE-filter: every s15 neighbor
    carries the required label, and the post-filter formulation (plain
    s02 top-k, then drop ineligible rows) returns strictly fewer
    eligible neighbors on the ~10-way-labeled fixture."""
    from fsharp_mapreduce_spark.functions.similarity import (
        FILTER_LABEL,
        s02_knn_lsh,
        s15_knn_filtered,
    )

    labels = {
        r.vec_id: r.label
        for r in table(spark, SF_SMOKE, "embeddings").select("vec_id", "label").collect()
    }
    pre = s15_knn_filtered(spark, SF_SMOKE).collect()
    assert pre, "filtered search returned nothing"
    assert all(labels[r.neighbor_id] == FILTER_LABEL for r in pre)

    post = [
        r
        for r in s02_knn_lsh(spark, SF_SMOKE).collect()
        if labels[r.neighbor_id] == FILTER_LABEL
    ]
    assert len(post) < len(pre), (len(post), len(pre))


def test_s16_rrf_fuses_both_retrievers(spark):
    """s16: every fused row's rrf equals the formula applied to its
    ranks; docs present in BOTH top-10 lists outscore docs of equal
    rank present in one; row count is between 10 and 20 (two top-10
    lists, overlap-dependent)."""
    from fsharp_mapreduce_spark.registry import QUERIES

    rows = QUERIES["s16_hybrid_rrf"].fn(spark, SF_SMOKE).collect()
    assert 10 <= len(rows) <= 20, len(rows)
    for r in rows:
        expect = 0.0
        if r["sparse_rk"] is not None:
            expect += 1.0 / (60 + r["sparse_rk"])
        if r["dense_rk"] is not None:
            expect += 1.0 / (60 + r["dense_rk"])
        assert abs(r["rrf"] - round(expect, 6)) < 1e-12, r
    for r in rows:
        for rk in (r["sparse_rk"], r["dense_rk"]):
            assert rk is None or 1 <= rk <= 10, r
        assert r["sparse_rk"] is not None or r["dense_rk"] is not None, r
    # each retriever contributes exactly its top-10 list
    assert sum(r["sparse_rk"] is not None for r in rows) == 10
    assert sum(r["dense_rk"] is not None for r in rows) == 10


def test_s17_mmr_prefers_diversity_over_neardup(spark, tmp_path):
    """Planted MMR property: when the two most relevant candidates are
    near-duplicates, rank 2 must go to the diverse moderately-relevant
    vector, not the duplicate — the exact behavior plain relevance
    ranking (s01) gets wrong."""
    import numpy as np

    from fsharp_mapreduce_spark.registry import QUERIES

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),      # the probe
        (1, [0.99, 0.10, 0.0, 0.0], 0),    # near-dup A (most relevant)
        (2, [0.995, 0.09, 0.0, 0.0], 0),   # near-dup B (≈ same direction)
        (3, [0.70, 0.0, 0.70, 0.0], 0),    # diverse, moderately relevant
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding", "label"]).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        "label",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    rows = {r["rank"]: r["doc_id"] for r in
            QUERIES["s17_mmr_rerank"].fn(spark, str(tmp_path)).collect()}
    assert rows[1] in (1, 2)          # highest relevance wins rank 1
    assert rows[2] == 3, rows         # diversity beats the near-dup
    assert rows[3] in (1, 2) and rows[3] != rows[1]


def test_s18_hamming_matches_numpy_and_recall_floor(spark):
    """s18: (a) the BIGINT sign-fold + bit_count(xor) hamming equals a
    numpy recomputation for every emitted candidate; (b) two-stage
    recall vs exact s01 stays above the 0.3 floor (measured 0.48-0.52
    on the random fixture — uniformly hard for 64 sign bits)."""
    import numpy as np

    from fsharp_mapreduce_spark.registry import QUERIES, table

    rows = QUERIES["s18_knn_binary_hamming"].fn(spark, SF_SMOKE).collect()
    emb = {
        r.vec_id: np.array(r.embedding)
        for r in table(spark, SF_SMOKE, "embeddings").collect()
    }
    bits = {k: (v >= 0).astype(int) for k, v in emb.items()}
    for r in rows:
        want = int((bits[r.query_id] != bits[r.neighbor_id]).sum())
        assert r.ham == want, (r.query_id, r.neighbor_id, r.ham, want)
    exact = _pairs(s01_knn_bruteforce(spark, SF_SMOKE))
    got = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(got & exact) / len(exact) >= 0.3


def test_s19_ivf_pq_recall_vs_exact(spark):
    """Composed IVF-PQ recall floor (random vectors — worst case for
    both layers): measured 0.68 at sf0.001 (IVF alone 0.76 — the PQ
    candidate layer inside probed cells costs a few neighbors, which
    is the architecture's documented trade). 0.5 guards regressions
    without flaking: both fits are seeded and bit-deterministic."""
    from fsharp_mapreduce_spark.functions.similarity import (
        s01_knn_bruteforce,
        s19_knn_ivf_pq,
    )

    exact = _pairs(s01_knn_bruteforce(spark, SF_SMOKE))
    approx = _pairs(s19_knn_ivf_pq(spark, SF_SMOKE))
    assert len(approx & exact) / len(exact) >= 0.5


def test_s19_returned_sims_are_exact(spark):
    """Two layers of quantization may HIDE neighbors, never mis-score
    one: every (query, neighbor) s19 returns carries the exact
    cosine."""
    from fsharp_mapreduce_spark.functions.similarity import (
        s01_knn_bruteforce,
        s19_knn_ivf_pq,
    )

    exact = {
        (r.query_id, r.neighbor_id): r.sim
        for r in s01_knn_bruteforce(spark, SF_SMOKE).collect()
    }
    for r in s19_knn_ivf_pq(spark, SF_SMOKE).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert abs(r.sim - exact[key]) < 1e-9, (key, r.sim, exact[key])


def test_s19_corpus_stage_is_map_only(spark):
    """The fused cell-assignment + PQ-encode corpus projection must
    stay exchange-free — at 100 TB this is the stage that touches
    every vector, and its only movement should be the broadcast of
    the tiny probe table into the candidate join."""
    from fsharp_mapreduce_spark.functions.similarity import (
        _assign_cells,
        _kmeans_centroids,
        _pq_codebooks,
        _pq_encode_udf,
    )
    from fsharp_mapreduce_spark.registry import table
    from pyspark.sql import functions as F

    emb = table(spark, SF_SMOKE, "embeddings")
    cents = _kmeans_centroids(emb, 16)
    enc = _pq_encode_udf(_pq_codebooks(emb))
    coded = _assign_cells(emb, cents).select(
        "vec_id", "cell_id", enc(F.col("embedding")).alias("recon")
    )
    plan = coded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_s20_delete_semantics_and_partition_economics(spark):
    """The s20 lifecycle on the smoke fixture, pinned at four levels:
    (a) no deleted vec_id survives in the index or appears as a probe
    neighbor; (b) UNTOUCHED cell directories keep their files
    byte-for-byte (the dynamic-overwrite contract); (c) a cell whose
    every vector is deleted has its stale directory swept — deleted
    rows cannot resurrect on the next listing; (d) the LOCATE pass's
    index scan reads only (vec_id, cell_id), never embeddings."""
    import os

    from fsharp_mapreduce_spark.functions.similarity import (
        _ivf_index_dir,
        build_ivf_index,
        delete_from_ivf_index,
        s20_ivf_index_delete,
        DELETE_MOD,
        DELETE_REMAINDER,
    )
    from fsharp_mapreduce_spark.plans.explain import read_schema_columns
    from fsharp_mapreduce_spark.registry import table
    from pyspark.sql import functions as F

    # (a) registered query: no deleted id anywhere in the answer
    rows = s20_ivf_index_delete(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.neighbor_id % DELETE_MOD != DELETE_REMAINDER, r
        assert r.query_id % DELETE_MOD != DELETE_REMAINDER, r

    # and the index itself holds zero deleted rows
    path = _ivf_index_dir(spark, SF_SMOKE, "_delete")
    left = (
        spark.read.parquet(path)
        .where(F.col("vec_id") % DELETE_MOD == DELETE_REMAINDER)
        .count()
    )
    assert left == 0

    # (b)+(c): a controlled two-cell index — delete ALL of one cell's
    # vectors, none of the other's
    emb = table(spark, SF_SMOKE, "embeddings")
    p2 = _ivf_index_dir(spark, SF_SMOKE, "_delete_unit")
    build_ivf_index(emb, p2, n_cells=2)
    by_cell = {
        r.cell_id: r.ids
        for r in spark.read.parquet(p2)
        .groupBy("cell_id")
        .agg(F.collect_list("vec_id").alias("ids"))
        .collect()
    }
    assert set(by_cell) == {0, 1}
    victim, kept = (0, 1) if len(by_cell[0]) <= len(by_cell[1]) else (1, 0)
    kept_dir = os.path.join(p2, f"cell_id={kept}")
    before = {
        f: os.path.getmtime(os.path.join(kept_dir, f))
        for f in os.listdir(kept_dir)
    }
    ids_df = spark.createDataFrame(
        [(int(i),) for i in by_cell[victim]], "vec_id long"
    )
    n = delete_from_ivf_index(spark, p2, ids_df)
    assert n == 1
    assert not os.path.isdir(os.path.join(p2, f"cell_id={victim}")), (
        "emptied cell directory must be swept"
    )
    after = {
        f: os.path.getmtime(os.path.join(kept_dir, f))
        for f in os.listdir(kept_dir)
    }
    assert after == before, "untouched cell was rewritten"
    assert spark.read.parquet(p2).count() == len(by_cell[kept])

    # (d) locate-pass scan schema
    located = (
        spark.read.parquet(p2)
        .select("vec_id", "cell_id")
        .join(F.broadcast(ids_df), "vec_id")
        .select("cell_id")
        .distinct()
    )
    for cols in read_schema_columns(located):
        assert "embedding" not in cols, cols


def test_s20_delete_rejects_nonlocal_index_path(spark):
    """ADVICE r6 #4: the emptied-cell sweep is os.path/shutil-based —
    on a non-local scheme it would silently no-op and dynamic
    overwrite would resurrect every deleted vector. The guard must
    fire BEFORE any Spark work (no reads of the fake path)."""
    import pytest

    from fsharp_mapreduce_spark.functions.similarity import delete_from_ivf_index

    ids_df = spark.createDataFrame([(1,)], "vec_id long")
    for path in ("hdfs://nn:8020/idx", "s3a://bucket/idx"):
        with pytest.raises(NotImplementedError, match="resurrect"):
            delete_from_ivf_index(spark, path, ids_df)
    # local paths (bare and file://) pass the guard — they fail later
    # only if the path doesn't exist, proving the guard itself let
    # them through
    with pytest.raises(Exception, match="(?i)path does not exist|unable to infer"):
        delete_from_ivf_index(spark, "/tmp/fsmr_nonexistent_idx_guard", ids_df)


def test_s21_multiprobe_recall_dominates_s02(spark):
    """Multi-probe candidates are a strict superset of s02's (mask 0
    IS s02's probe) and ranking is exact over the candidate set, so
    recall vs the exact baseline is provably monotone — assert the
    structural ≥ plus the measured floor (0.88 at sf0.001 vs s02's
    0.48 on the same four tables; 0.7 guards regressions on the
    random-vector worst case without flaking — planes and buckets
    are fully deterministic)."""
    from fsharp_mapreduce_spark.functions.similarity import (
        s01_knn_bruteforce,
        s02_knn_lsh,
        s21_knn_lsh_multiprobe,
    )

    exact = _pairs(s01_knn_bruteforce(spark, SF_SMOKE))
    r02 = len(_pairs(s02_knn_lsh(spark, SF_SMOKE)) & exact) / len(exact)
    r21 = len(_pairs(s21_knn_lsh_multiprobe(spark, SF_SMOKE)) & exact) / len(exact)
    assert r21 >= r02, (r21, r02)
    assert r21 >= 0.7, r21


def test_s22_rebalance_moves_vectors_and_matches_fresh_build(spark):
    """Non-vacuity + the maintenance invariant: the stale-fit build
    genuinely drifts (the rebalance moves >0 vectors), the new
    generation's probe results are IDENTICAL to a fresh full-fit
    build's (REBALANCE ≡ REBUILD — assignment is a pure per-vector
    function of the centroid matrix), and the old generation stays
    readable after the swap."""
    from pyspark.sql import functions as F

    from fsharp_mapreduce_spark.functions.similarity import (
        APPEND_MOD,
        APPEND_REMAINDER,
        N_CELLS,
        N_QUERIES,
        _ivf_index_dir,
        _kmeans_centroids,
        append_ivf_index,
        build_ivf_index,
        knn_ivf_probe,
        rebalance_ivf_index,
        s22_ivf_index_rebalance,
    )
    from fsharp_mapreduce_spark.registry import table

    emb = table(spark, SF_SMOKE, "embeddings")
    is_batch = F.col("vec_id") % APPEND_MOD == APPEND_REMAINDER
    stale = _ivf_index_dir(spark, SF_SMOKE, "_rebal_unit_g1")
    stale_cents = build_ivf_index(emb.where(~is_batch), stale)
    append_ivf_index(emb.where(is_batch), stale, stale_cents)
    new_cents = _kmeans_centroids(spark.read.parquet(stale), N_CELLS)
    g2 = _ivf_index_dir(spark, SF_SMOKE, "_rebal_unit_g2")
    moved = rebalance_ivf_index(spark, stale, g2, new_cents)
    assert moved > 0  # the drift is real on the fixture

    # rebalance ≡ rebuild: the new generation is row-identical to a
    # fresh build with the same centroids
    fresh = _ivf_index_dir(spark, SF_SMOKE, "_rebal_unit_fresh")
    build_ivf_index(emb, fresh)
    got = {
        (r.vec_id, r.cell_id)
        for r in spark.read.parquet(g2).select("vec_id", "cell_id").collect()
    }
    want = {
        (r.vec_id, r.cell_id)
        for r in spark.read.parquet(fresh).select("vec_id", "cell_id").collect()
    }
    assert got == want

    # generation swap left the old index intact
    assert spark.read.parquet(stale).count() == len(got)

    # the registered query end-to-end equals the fresh-build probe
    q = emb.where(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding")
    fresh_probe = {
        tuple(r) for r in knn_ivf_probe(spark, fresh, new_cents, q).collect()
    }
    reg = {tuple(r) for r in s22_ivf_index_rebalance(spark, SF_SMOKE).collect()}
    assert reg == fresh_probe


def test_s02_probe_family_adaptive_k(spark):
    """VERDICT r8 #2: the s02 probe family (s02/s12/s15/s21/st14)
    follows the shared capacity rule — the fixture SFs stay at the
    registered 4-bit floor (gate/bench tuning point unchanged), the
    decade corpora widen k so expected occupancy stays ≈ the target
    instead of every probe's candidate set becoming a constant
    fraction of the corpus, the multiprobe mask set widens with k,
    and measured occupancy on real bucket assignments stays within
    2× target across 8× corpus growth."""
    import numpy as np
    from pyspark.sql import functions as F

    from fsharp_mapreduce_spark.functions.similarity import (
        MAX_DIM,
        N_TABLES,
        S02_MAX_PLANES,
        S02_TARGET_BUCKET_ROWS,
        _lsh_bucket_udf,
        multiprobe_masks,
        s02_planes_for,
    )

    # the rule's shape: floor at fixture scales, log growth, clamp
    assert s02_planes_for(0) == 4
    assert s02_planes_for(500) == 4       # sf0.001 / sf0.01 fixtures
    assert s02_planes_for(2000) == 4      # sf0.1 bench fixture
    assert s02_planes_for(10_000) == 7    # generated sf0.5
    assert s02_planes_for(20_000) == 8    # generated sf1.0
    assert s02_planes_for(40_000) == 9    # generated sf2.0
    assert s02_planes_for(10**12) == S02_MAX_PLANES
    # the clamp keeps every precomputed plane row in range
    assert N_TABLES * S02_MAX_PLANES <= MAX_DIM

    # multiprobe masks derive from the adaptive k (the old module
    # constant hardcoded 4 bit positions regardless of bucket width)
    assert multiprobe_masks(4) == [0, 1, 2, 4, 8]
    assert multiprobe_masks(6) == [0, 1, 2, 4, 8, 16, 32]

    # measured occupancy: mean rows/bucket within 2× target across 8×
    # corpus growth (random normals ⇒ near-uniform sign buckets)
    rng = np.random.RandomState(11)
    for n in (1000, 8000):
        k = s02_planes_for(n)
        x = rng.normal(size=(n, 16))
        df = spark.createDataFrame(
            [(i, x[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        bucket_ids = _lsh_bucket_udf(N_TABLES, k)
        occ = (
            df.select(
                F.posexplode(bucket_ids(F.col("embedding"))).alias("tbl", "bucket")
            )
            .groupBy("tbl", "bucket")
            .count()
            .agg(F.avg("count").alias("m"))
            .collect()[0]["m"]
        )
        assert occ <= 2 * S02_TARGET_BUCKET_ROWS, (n, k, occ)


def test_s23_recall_audit_matches_independent_recall(spark):
    """The audit's algebra: one row per probe, n_exact = TOP_K,
    0 <= n_hits <= n_exact, recall = round(n_hits/n_exact, 6), and the
    numbers agree with a recall computed independently from the two
    REGISTERED pipelines it composes."""
    from fsharp_mapreduce_spark.functions.similarity import (
        N_QUERIES,
        TOP_K,
        s01_knn_bruteforce,
        s02_knn_lsh,
        s23_recall_audit,
    )

    exact = _pairs(s01_knn_bruteforce(spark, SF_SMOKE))
    approx = _pairs(s02_knn_lsh(spark, SF_SMOKE))
    out = {r.query_id: r for r in s23_recall_audit(spark, SF_SMOKE).collect()}
    assert len(out) == N_QUERIES
    for qid, r in out.items():
        want_hits = len({p for p in exact if p[0] == qid}
                        & {p for p in approx if p[0] == qid})
        assert r.n_exact == TOP_K
        assert r.n_hits == want_hits, (qid, r.n_hits, want_hits)
        assert abs(r.recall - round(want_hits / TOP_K, 6)) < 1e-9


def test_s06_prune_keeps_exact_ties(spark, tmp_path):
    """The r9 certified prune must not break exact-tie semantics: with
    duplicate embeddings the k-boundary cosines tie EXACTLY (1.0), the
    GEMM scores tie too, so every duplicate survives the margin prune
    and the fold + neighbor_id window decides — byte-identical to the
    DuckDB oracle on the same planted corpus. Five exact copies of one
    vector guarantee more tied candidates than k on both sides of the
    boundary."""
    import duckdb
    import numpy as np

    from fsharp_mapreduce_spark.functions.similarity import s06_knn_join
    from fsharp_mapreduce_spark.registry import QUERIES

    rng = np.random.default_rng(3)
    base = rng.normal(size=(12, 8)).astype(np.float32)
    for dup in (5, 6, 7, 8, 9):  # five exact copies of vector 1
        base[dup] = base[1]
    rows = [
        (int(i), [float(x) for x in base[i]], int(i % 3)) for i in range(len(base))
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = s06_knn_join(spark, str(tmp_path))
    got = sorted(
        (r.vec_id, r.neighbor_id, r.rank, round(r.sim, 6)) for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    want = sorted(
        (a, b, c, round(d, 6))
        for a, b, c, d in con.execute(QUERIES["s06_knn_join"].oracle).fetchall()
    )
    con.close()
    assert got == want
    # non-vacuity: vector 1's duplicates produced exact 1.0 ties and
    # the smallest neighbor_ids won the boundary
    v1 = [(n, r) for v, n, r, s in got if v == 1 and s == 1.0]
    assert len(v1) == 3 and [n for n, _ in sorted(v1, key=lambda x: x[1])] == [5, 6, 7]


def test_s24_recall_curve_monotone_and_anchored(spark):
    """The probe-budget curve's algebra on the fixture: one row per
    budget 1..k+1; recall and candidate mass both MONOTONE
    non-decreasing in the budget (a pair surfaced by probe i is in
    every budget > i); recall in [0, 1]; the first budget (own
    bucket only) aggregates exactly s02's recall as s23 measures it,
    and the full budget aggregates s21's — the curve's endpoints ARE
    the registered fixed-budget pipelines."""
    from fsharp_mapreduce_spark.functions.similarity import (
        s21_knn_lsh_multiprobe,
        s23_recall_audit,
        s24_multiprobe_recall_curve,
        s01_knn_bruteforce,
    )

    sf = "/root/testdata/sf0.01"
    rows = sorted(
        s24_multiprobe_recall_curve(spark, sf).collect(),
        key=lambda r: r.n_probes,
    )
    assert [r.n_probes for r in rows] == list(range(1, len(rows) + 1))
    assert all(0.0 <= r.recall <= 1.0 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert b.recall >= a.recall, (a, b)
        assert b.n_candidates >= a.n_candidates, (a, b)
        assert b.n_hits >= a.n_hits, (a, b)
    # endpoint anchors: budget 1 == s02 (via s23's per-query audit),
    # full budget == s21's hits against the same exact baseline
    s23 = s23_recall_audit(spark, sf).collect()
    assert rows[0].n_hits == sum(r.n_hits for r in s23)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in s01_knn_bruteforce(spark, sf).collect()
    }
    s21_hits = sum(
        1
        for r in s21_knn_lsh_multiprobe(spark, sf).collect()
        if (r.query_id, r.neighbor_id) in exact
    )
    assert rows[-1].n_hits == s21_hits


def test_s25_planted_outliers_exact(spark):
    """s25: with the x3 plant, EXACTLY the vec_id % OUTLIER_PLANT_MOD
    == 0 vectors flag as outliers at sf0.001 — perfect separation, no
    false positives — and every rel_dist sits where the flag says."""
    from fsharp_mapreduce_spark.functions.similarity import (
        OUTLIER_FACTOR,
        OUTLIER_PLANT_MOD,
    )
    from fsharp_mapreduce_spark.registry import QUERIES

    rows = QUERIES["s25_embedding_outliers"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.is_outlier == (r.vec_id % OUTLIER_PLANT_MOD == 0), r
        assert (r.rel_dist > OUTLIER_FACTOR) == r.is_outlier, r
        assert r.dist_sq_scaled > 0


def test_s25_handbuilt_group_isolation(spark):
    """The production surface on a hand-built fixture: outliers are
    judged against THEIR OWN group's centroid — a vector normal for
    group B but far from group A's centroid must not flag in B."""
    from fsharp_mapreduce_spark.functions.similarity import embedding_outliers

    rows = [
        # group a: tight cluster at ~(1, 0) plus one far point
        (1, "a", [1.0, 0.0]), (2, "a", [1.1, 0.0]), (3, "a", [0.9, 0.0]),
        (4, "a", [1.0, 0.1]), (5, "a", [10.0, 10.0]),
        # group b: tight cluster at ~(10, 10) — same coords as a's outlier
        (6, "b", [10.0, 10.0]), (7, "b", [10.1, 10.0]), (8, "b", [9.9, 10.0]),
        (9, "b", [10.0, 10.1]), (10, "b", [10.0, 9.9]),
    ]
    got = {
        r.vec_id: r.is_outlier
        for r in embedding_outliers(
            spark.createDataFrame(
                rows, "vec_id long, label string, embedding array<double>"
            )
        ).collect()
    }
    assert got[5] is True, got
    assert all(got[i] is False for i in (1, 2, 3, 4, 6, 7, 8, 9, 10)), got
