"""Semantics tests for the dedup family that the DuckDB oracle can't
express (xxhash64-based MinHash/SimHash): recall/precision of the
approximate paths against the exact verifiers, on the driver fixture
plus purpose-built near-duplicate corpora.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fsharp_mapreduce_spark.functions.dedup import (
    JACCARD_THRESHOLD,
    _lsh_candidate_pairs,
    embedding_neardup_lsh,
    hashed_shingle_sets,
    ngram_jaccard_pairs,
    shingle_candidate_pairs,
    t02_ngram_jaccard_pairs,
    t03_minhash_lsh_pairs,
    t04_simhash,
    t09_embedding_neardup,
    t10_embedding_neardup_lsh,
)
from tests.conftest import SF_SMOKE


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


@pytest.fixture(scope="module")
def synth_docs_dir(spark, tmp_path_factory):
    """A corpus with KNOWN near-duplicate structure: 3 clusters of
    near-identical texts + singletons, written as a documents.parquet
    fixture so the registered queries run on it unchanged."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun"
    )
    rows = []
    # cluster A: doc 0,1,2 — one-word edits of base (high jaccard)
    rows.append((0, base))
    rows.append((1, base.replace("lazy", "sleepy")))
    rows.append((2, base.replace("afternoon", "morning")))
    # cluster B: doc 10, 11 — identical
    poem = "row row row your boat gently down the stream merrily " * 3
    rows.append((10, poem.strip()))
    rows.append((11, poem.strip()))
    # singletons: unrelated vocabulary
    rows.append((20, "completely unrelated text about spark catalyst optimizer internals"))
    rows.append((21, "parquet columnar storage with predicate pushdown and pruning rules"))
    d = str(tmp_path_factory.mktemp("synthdocs"))
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return d


def test_exact_jaccard_finds_planted_clusters(spark, synth_docs_dir):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in t02_ngram_jaccard_pairs(spark, synth_docs_dir).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert pairs[(10, 11)] == 1.0  # identical docs
    assert all(a // 10 == b // 10 for a, b in pairs), (
        f"cross-cluster false positive: {pairs}"
    )
    assert all(j >= JACCARD_THRESHOLD for j in pairs.values())


def test_minhash_recall_on_planted_clusters(spark, synth_docs_dir):
    """LSH banding must surface every planted near-dup pair (their
    jaccard is far above the 8-band/4-row threshold curve's knee)."""
    exact = set(
        (r.doc_a, r.doc_b) for r in t02_ngram_jaccard_pairs(spark, synth_docs_dir).collect()
    )
    lsh = set(
        (r.doc_a, r.doc_b) for r in t03_minhash_lsh_pairs(spark, synth_docs_dir).collect()
    )
    assert exact, "planted corpus must contain exact pairs"
    assert lsh >= exact, f"missed pairs: {exact - lsh}"
    # precision is exact by construction (candidates are verified)
    assert lsh <= exact


def test_minhash_recall_on_fixture(spark):
    """On the driver fixture: every exact pair with jaccard ≥ 0.7 must
    be recalled (measured 1.0 at sf0.001; floor 0.9 guards flakiness),
    and precision is exactly 1 (verified candidates)."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in t02_ngram_jaccard_pairs(spark, SF_SMOKE).collect()
    }
    lsh = set((r.doc_a, r.doc_b) for r in t03_minhash_lsh_pairs(spark, SF_SMOKE).collect())
    high = {p for p, j in exact.items() if j >= 0.7}
    if high:
        assert len(lsh & high) / len(high) >= 0.9
    assert lsh <= set(exact), "LSH produced a pair exact Jaccard rejects"


def _simhash_sigs(spark, d):
    return {
        r.doc_id: (r.simhash_hi << 32) | r.simhash_lo
        for r in t04_simhash(spark, d).collect()
    }


def test_simhash_near_dups(spark, synth_docs_dir):
    """Near-identical docs land within small Hamming distance;
    unrelated docs stay far apart; identical docs collide exactly."""
    sig = _simhash_sigs(spark, synth_docs_dir)
    assert sig[10] == sig[11]  # identical text -> identical signature
    assert hamming64(sig[0], sig[1]) <= 12
    assert hamming64(sig[0], sig[2]) <= 12
    assert hamming64(sig[0], sig[20]) >= 16
    assert hamming64(sig[20], sig[21]) >= 16


def test_simhash_banding_equals_bruteforce(spark):
    """t11's 4×16-bit banding is pigeonhole-EXACT at ham ≤ 3: its
    output must equal the brute-force all-pairs Hamming filter — no
    recall loss, no spurious pairs."""
    from fsharp_mapreduce_spark.functions.dedup import (
        SIMHASH_HAM_MAX,
        t11_simhash_neardup_pairs,
    )

    sig = _simhash_sigs(spark, SF_SMOKE)
    ids = sorted(sig)
    brute = {
        (a, b): hamming64(sig[a], sig[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if hamming64(sig[a], sig[b]) <= SIMHASH_HAM_MAX
    }
    banded = {
        (r.doc_a, r.doc_b): r.hamming
        for r in t11_simhash_neardup_pairs(spark, SF_SMOKE).collect()
    }
    assert banded == brute


def test_connected_components_chain(spark):
    """Transitive closure: a chain 1-2, 2-3 plus a separate pair 10-11
    and an isolated vertex 20 → components {1,2,3}→1, {10,11}→10,
    {20}→20. Near-dup chains MUST collapse even when the endpoints are
    not directly similar."""
    from fsharp_mapreduce_spark.functions.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    verts = spark.createDataFrame([(v,) for v in (1, 2, 3, 10, 11, 20)], "v long")
    out = {r.v: r.label for r in connected_components(edges, verts).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_single_edge_expansion(spark):
    """VERDICT r2 #6: the edge INPUT pipeline must execute exactly once
    inside connected_components. The symmetrizing union expands the
    edges subtree into both branches, so without the eager persist the
    upstream pipeline (t12 feeds the whole t03 MinHash+LSH query here)
    would run twice. An accumulator inside a mapInPandas stage counts
    how many edge rows the upstream actually produced end-to-end."""
    from fsharp_mapreduce_spark.functions.dedup import connected_components

    acc = spark.sparkContext.accumulator(0)
    base = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")

    def tick(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    edges = base.mapInPandas(tick, "src long, dst long")
    verts = spark.createDataFrame([(v,) for v in (1, 2, 3, 10, 11)], "v long")
    out = {r.v: r.label for r in connected_components(edges, verts).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert acc.value == 3, (
        f"edge pipeline produced {acc.value} rows for a 3-edge graph — "
        "the union re-expanded the upstream subtree"
    )


def test_star_cc_matches_min_label_and_handles_long_chains(spark):
    """The large-star/small-star variant (the unbounded-diameter escape
    hatch ADVICE r2 named): must agree with min-label propagation on a
    mixed graph, and must converge on a diameter-63 chain in O(log n)
    rounds — where min-label's default 25-round budget provably raises."""
    import pytest as _pytest

    from fsharp_mapreduce_spark.functions.dedup import (
        connected_components,
        connected_components_star,
    )

    # mixed graph: chain + pair + isolated vertex (the t12 shape)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    verts = spark.createDataFrame([(v,) for v in (1, 2, 3, 10, 11, 20)], "v long")
    want = {r.v: r.label for r in connected_components(edges, verts).collect()}
    got = {r.v: r.label for r in connected_components_star(edges, verts).collect()}
    assert got == want == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}

    # diameter-63 chain: min-label needs 63 rounds (raises at 25),
    # star contraction settles in ~log rounds
    n = 64
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    cverts = spark.createDataFrame([(v,) for v in range(n)], "v long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, cverts)
    labels = {
        r.v: r.label for r in connected_components_star(chain, cverts).collect()
    }
    assert labels == {v: 0 for v in range(n)}


def test_star_cc_random_graph_equivalence(spark):
    """Property check: on a seeded random graph, star contraction and a
    driver-side union-find must produce identical component labels."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.dedup import connected_components_star

    rng = np.random.RandomState(5)
    n, m = 200, 150
    pairs = [(int(a), int(b)) for a, b in rng.randint(0, n, size=(m, 2)) if a != b]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    verts = spark.createDataFrame([(v,) for v in range(n)], "v long")

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in range(n)}
    got = {r.v: r.label for r in connected_components_star(edges, verts).collect()}
    assert got == want


def test_connected_components_raises_on_nonconvergence(spark):
    """ADVICE r2: exhausting max_iter must raise, never return
    partially-propagated labels. A 4-chain needs 3 propagation rounds;
    max_iter=1 cannot converge."""
    import pytest as _pytest

    from fsharp_mapreduce_spark.functions.dedup import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    verts = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "v long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, verts, max_iter=1)


def test_simhash_vectorized_matches_expression(spark):
    """The numpy signature stage must be bit-identical to the
    pure-Catalyst-expression twin (and therefore to the DuckDB
    oracle's integer pipeline) on the whole fixture corpus."""
    from fsharp_mapreduce_spark.functions.dedup import (
        _expression_simhash_signatures,
        simhash_signatures,
    )
    from fsharp_mapreduce_spark.registry import table

    docs = table(spark, SF_SMOKE, "documents")
    vec = {
        r.doc_id: (r.simhash_hi, r.simhash_lo)
        for r in simhash_signatures(docs).collect()
    }
    expr = {
        r.doc_id: (r.simhash_hi, r.simhash_lo)
        for r in _expression_simhash_signatures(docs).collect()
    }
    assert vec == expr


def test_simhash_deterministic(spark, synth_docs_dir):
    a = _simhash_sigs(spark, synth_docs_dir)
    b = _simhash_sigs(spark, synth_docs_dir)
    assert a == b


@pytest.fixture(scope="module")
def skew_docs(spark):
    """A corpus with one pathologically hot shingle: 100 of 200 docs
    share a 3-token boilerplate prefix but are otherwise unique, plus
    one genuinely duplicated doc pair whose overlap does NOT go
    through the hot shingle."""
    rows = []
    for i in range(100):
        rows.append((i, f"shared boiler plate u{i}a u{i}b u{i}c u{i}d"))
    for i in range(100, 200):
        rows.append((i, f"v{i}a v{i}b v{i}c v{i}d v{i}e v{i}f"))
    dup = "real duplicate content that repeats across exactly two documents"
    rows.append((300, dup))
    rows.append((301, dup))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stop_shingle_cap_bounds_candidates(spark, skew_docs):
    """The hot shingle ('shared boiler plate', df=100 > cap=10) must be
    dropped from candidate generation: capped candidates stay O(true
    dups) while uncapped candidates blow up O(df²)."""
    hsets = hashed_shingle_sets(skew_docs).persist()
    uncapped = shingle_candidate_pairs(hsets, cap=10**9).count()
    capped = shingle_candidate_pairs(hsets, cap=10).count()
    assert uncapped >= 100 * 99 // 2  # the quadratic blowup the cap kills
    assert capped <= 5


def test_stop_shingle_cap_keeps_true_dups_exact(spark, skew_docs):
    """With the cap active, the true duplicate pair is still found via
    its non-hot shingles and its Jaccard is exact (full-set verify)."""
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(skew_docs, cap=10).collect()
    }
    assert pairs[(300, 301)] == 1.0
    assert all((a, b) == (300, 301) for a, b in pairs)


@pytest.fixture(scope="module")
def synth_emb_dir(spark, tmp_path_factory):
    """Embeddings with planted near-duplicates: vec 1 = vec 0 slightly
    perturbed, vec 2 = vec 0 scaled (cosine exactly 1), vec 3+
    orthogonal-ish."""
    dim = 8
    v0 = [1.0, 0.5, -0.25, 2.0, 0.0, 1.5, -1.0, 0.75]
    v1 = [x + 0.01 for x in v0]  # tiny perturbation
    v2 = [2.0 * x for x in v0]  # same direction
    v3 = [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0]
    v4 = [0.0, 0.0, 1.0, 0.0, -1.0, 0.0, 0.0, 3.0]
    rows = [(i, v, 0) for i, v in enumerate([v0, v1, v2, v3, v4])]
    d = str(tmp_path_factory.mktemp("synthemb"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def test_embedding_neardup_planted(spark, synth_emb_dir):
    pairs = {
        (r.vec_a, r.vec_b): r.sim for r in t09_embedding_neardup(spark, synth_emb_dir).collect()
    }
    assert pairs[(0, 2)] == 1.0  # scaled copy: cosine exactly 1
    assert pairs[(0, 1)] > 0.99 and pairs[(1, 2)] > 0.99
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_lsh_neardup_recall_vs_exact(spark):
    """t10 (LSH candidate gen + exact re-score) vs t09 (blocked
    all-pairs exact) on the driver fixture. Precision is exact by
    construction — every emitted pair passed the same fold-cosine
    threshold — so t10 ⊆ t09 with identical sims; recall must clear
    the (k=2, L=8) S-curve floor (≈0.98 at sim 0.4; 0.9 guards flakes)."""
    exact = {
        (r.vec_a, r.vec_b): r.sim for r in t09_embedding_neardup(spark, SF_SMOKE).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.sim
        for r in t10_embedding_neardup_lsh(spark, SF_SMOKE).collect()
    }
    assert exact, "fixture must contain exact near-dup pairs"
    assert set(lsh) <= set(exact), f"false positives: {set(lsh) - set(exact)}"
    for p, sim in lsh.items():
        assert sim == exact[p], f"sim mismatch on {p}: {sim} != {exact[p]}"
    assert len(lsh) / len(exact) >= 0.9


def test_lsh_neardup_production_pruning(spark):
    """The production dedup regime (sim ≥ 0.95, k=8, L=8): candidate
    generation must prune the vast majority of background pairs while
    recalling every planted near-dup. 200 random 64-dim Gaussian
    vectors (pairwise cosine ~ N(0, 1/64) — essentially orthogonal)
    plus 10 planted dup pairs at cosine ≈ 0.995."""
    import numpy as np

    rng = np.random.default_rng(20260813)
    rows = []
    for i in range(200):
        rows.append((i, [float(x) for x in rng.standard_normal(64)]))
    planted = []
    for j in range(10):
        base = rng.standard_normal(64)
        dup = base + 0.05 * rng.standard_normal(64)  # cosine ≈ 0.995
        rows.append((1000 + 2 * j, [float(x) for x in base]))
        rows.append((1001 + 2 * j, [float(x) for x in dup]))
        planted.append((1000 + 2 * j, 1001 + 2 * j))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cands = set(
        (r.vec_a, r.vec_b)
        for r in _lsh_candidate_pairs(emb, n_tables=8, planes_per_table=8).collect()
    )
    n = len(rows)
    all_pairs = n * (n - 1) // 2
    assert len(cands) <= 0.10 * all_pairs, (
        f"candidate gen barely prunes: {len(cands)}/{all_pairs}"
    )

    result = {
        (r.vec_a, r.vec_b): r.sim
        for r in embedding_neardup_lsh(
            emb, threshold=0.95, n_tables=8, planes_per_table=8
        ).collect()
    }
    missed = [p for p in planted if p not in result]
    assert not missed, f"planted dups missed: {missed}"
    assert all(sim >= 0.95 for sim in result.values())


def test_token_chunking_edges(spark):
    """Chunk layout at the boundaries: shorter-than-window docs give
    one chunk; exactly-window docs give one chunk; window+1 gives two
    overlapping chunks with the stride offset; every token appears in
    at least one chunk."""
    from fsharp_mapreduce_spark.functions.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )
    from fsharp_mapreduce_spark.registry import QUERIES

    words = lambda n: " ".join(f"w{i}" for i in range(n))  # noqa: E731
    docs = spark.createDataFrame(
        [
            (1, words(3)),
            (2, words(CHUNK_TOKENS)),
            (3, words(CHUNK_TOKENS + 1)),
            (4, words(2 * CHUNK_TOKENS)),
        ],
        "doc_id long, text string",
    )
    import tempfile

    from fsharp_mapreduce_spark.scratch import scratch_dir

    d = scratch_dir("fsmr_chunk_edge_")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = QUERIES["t16_token_chunking"].fn(spark, d).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_tokens, r.chunk_text))
    assert len(by_doc[1]) == 1 and by_doc[1][0][1] == 3
    assert len(by_doc[2]) == 1 and by_doc[2][0][1] == CHUNK_TOKENS
    assert len(by_doc[3]) == 2
    # chunk 1 of doc 3 starts at the stride and carries the tail
    c3 = sorted(by_doc[3])
    assert c3[1][2].startswith(f"w{CHUNK_STRIDE} ")
    assert c3[1][1] == CHUNK_TOKENS + 1 - CHUNK_STRIDE
    # doc 4: ceil((128-64)/48)+1 = 3 chunks, last token present
    assert len(by_doc[4]) == 3
    assert any(c[2].endswith(f"w{2 * CHUNK_TOKENS - 1}") for c in by_doc[4])


def test_fixed_size_sample_partition_invariant(spark):
    """t15's exactly-k hash sample must select the identical id set
    regardless of input partitioning — the determinism contract that
    makes samples reproducible across cluster shapes."""
    from fsharp_mapreduce_spark.functions.sampling import t15_fixed_size_sample

    base = {r.doc_id for r in t15_fixed_size_sample(spark, SF_SMOKE).collect()}
    # same query against a repartitioned copy of the table
    import tempfile

    from fsharp_mapreduce_spark.registry import table as _table

    from fsharp_mapreduce_spark.scratch import scratch_dir

    d = scratch_dir("fsmr_t15_inv_")
    _table(spark, SF_SMOKE, "documents").repartition(13).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    again = {r.doc_id for r in t15_fixed_size_sample(spark, d).collect()}
    assert base == again


def test_lsh_scaling_law_sublinear_candidates(spark):
    """VERDICT r1 item-4 done-criterion, as a deterministic WORK
    metric (wall-clock at fixture scale measures scheduler floors, not
    asymptotics): growing the corpus 10× while adding log₂10 ≈ 3 sign
    bits per LSH table — the standard capacity rule that keeps
    per-bucket occupancy constant — must grow the bucketed path's
    candidate-pair count far slower than the all-pairs count grows
    (~100×). This is the scaling law that lets t10 replace t09's
    blocked all-pairs GEMM at 100 TB."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.dedup import _lsh_candidate_pairs

    def synth(n):
        rng = np.random.RandomState(42)
        x = rng.normal(size=(n, 16))
        return spark.createDataFrame(
            [(i, x[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<double>",
        )

    n1, n10 = 400, 4000
    c1 = _lsh_candidate_pairs(synth(n1), n_tables=8, planes_per_table=4).count()
    c10 = _lsh_candidate_pairs(synth(n10), n_tables=8, planes_per_table=7).count()
    assert c1 > 0 and c10 > 0
    allpairs_growth = (n10 * (n10 - 1)) / (n1 * (n1 - 1))  # ≈ 100×
    growth = c10 / c1
    # analytic expectation ≈ 2^(7-4)/100 → ~12.5×; assert an order
    # under quadratic with headroom
    assert growth < allpairs_growth / 4, (growth, allpairs_growth)


def test_t22_winnowing_detects_containment_quote(spark, tmp_path):
    """The winnowing guarantee (Schleimer et al. 2003): any shared
    substring of length >= w + k - 1 chars leaves a common
    fingerprint. Construct the case whole-doc methods miss: doc B is
    an exact 200-char QUOTE from the middle of doc A (whole-doc
    resemblance ~1/3), doc C is unrelated. t22 must pair (A, B) with
    containment ~1 and must not pair C with anything."""
    import random

    from fsharp_mapreduce_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz "

    def rand_text(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    a = rand_text(600)
    b = a[200:400]  # pure quote: 200 >= w + k - 1 = 23
    c = rand_text(600)
    rows = [
        (0, a, "en", "synth", len(a)),
        (1, b, "en", "synth", len(b)),
        (2, c, "en", "synth", len(c)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["t22_winnow_containment_pairs"].fn(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r.containment for r in out}
    assert (0, 1) in pairs, out
    assert pairs[(0, 1)] >= 0.9
    assert all(2 not in p for p in pairs)


@pytest.fixture(scope="module")
def winnow_skew_docs(spark):
    """A corpus with hot winnowing fingerprints: 100 of 200 docs share
    a 40-char boilerplate prefix (≥ w + k − 1 = 23 chars ⇒ guaranteed
    common fingerprints, each posted by 100 docs) but are otherwise
    unique random text; plus one true duplicate pair that shares no
    boilerplate."""
    import random

    rng = random.Random(13)
    alpha = "abcdefghijklmnopqrstuvwxyz "

    def rand_text(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    boiler = "copyright acme corp all rights reserved "  # 40 chars
    rows = [(i, boiler + rand_text(160)) for i in range(100)]
    rows += [(i, rand_text(200)) for i in range(100, 200)]
    dup = rand_text(200)
    rows.append((300, dup))
    rows.append((301, dup))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_cap_bounds_candidates(spark, winnow_skew_docs):
    """Hot boilerplate fingerprints (posted by 100 docs > cap=10) must
    be dropped from candidate generation: capped candidates stay
    O(true dups) while uncapped candidates blow up O(postings²)."""
    from fsharp_mapreduce_spark.functions.text import (
        winnow_candidate_pairs,
        winnow_fingerprints,
    )

    fps = winnow_fingerprints(winnow_skew_docs).persist()
    try:
        uncapped = winnow_candidate_pairs(fps, cap=10**9).count()
        capped = winnow_candidate_pairs(fps, cap=10).count()
    finally:
        fps.unpersist()
    assert uncapped >= 100 * 99 // 2  # the quadratic blowup the cap kills
    assert capped <= 5


def test_winnow_cap_keeps_true_dups_exact(spark, winnow_skew_docs):
    """With the cap active, the true duplicate pair is still surfaced
    via its own fingerprints with EXACT containment 1.0 (verification
    intersects the full sketches, not the capped postings)."""
    from fsharp_mapreduce_spark.functions.text import winnow_containment_pairs

    pairs = {
        (r.doc_a, r.doc_b): r.containment
        for r in winnow_containment_pairs(winnow_skew_docs, cap=10).collect()
    }
    assert pairs[(300, 301)] == 1.0
    # boilerplate-only pairs are connected solely through hot
    # fingerprints — the cap keeps them out of the candidate set
    assert all((a, b) == (300, 301) for a, b in pairs)


def test_winnow_vectorized_matches_expression(spark, winnow_skew_docs):
    """The r11 vectorized winnow kernel (numpy sliding-window rolling
    hashes) computes the IDENTICAL fingerprint set per document as the
    pure-expression formulation it replaced — the simhash
    vectorized-vs-expression pin, winnowing flavor. Sets compared
    (fps array order is not part of the contract: every consumer
    explodes or sizes the array). Edge docs included: empty text,
    sub-k text, k ≤ len < w+k−1 (single-window fallback)."""
    from fsharp_mapreduce_spark.functions.text import (
        _expression_winnow_fingerprints,
        winnow_fingerprints,
    )

    edge = spark.createDataFrame(
        [
            (900, ""),
            (901, "abc"),
            (902, "abcdefgh"),
            (903, "abcdefghij"),
            # non-ASCII (ADVICE r11): the kernel reads codepoints via
            # utf-32-le while the expression twin reads
            # split('')/ascii() — pin their agreement beyond ASCII,
            # including an astral-plane char (🚀 = U+1F680, a
            # surrogate pair in the JVM's UTF-16)
            (904, "héllo wörld — мир 你好"),
            (905, "rocket 🚀 launch 🚀🚀 pad"),
        ],
        "doc_id long, text string",
    )
    docs = winnow_skew_docs.unionByName(edge)
    vec = {r.doc_id: sorted(r.fps) for r in winnow_fingerprints(docs).collect()}
    expr = {
        r.doc_id: sorted(r.fps)
        for r in _expression_winnow_fingerprints(docs).collect()
    }
    assert vec == expr


def test_decontaminate_with_external_eval_table(spark):
    """The real decontamination API (VERDICT r3 #8): the eval set is a
    SECOND DataFrame, not a doc_id slice. A training doc sharing an
    8-token run with an eval doc is flagged with the correct overlap
    count; disjoint docs are not flagged."""
    from fsharp_mapreduce_spark.functions.text import decontaminate

    contaminated = "a b c d e f g h i j"  # 10 tokens → 3 shared 8-grams
    clean = "q r s t u v w x y z"
    train = spark.createDataFrame(
        [(1, contaminated), (2, clean)], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(900, "a b c d e f g h i j k l")], "doc_id long, text string"
    )
    rows = {r.doc_id: r.n_shared_ngrams for r in decontaminate(train, ev).collect()}
    assert rows == {1: 3}


def test_decontaminate_fixture_slice_matches_external_eval(spark):
    """Passing the doc_id % 50 slice explicitly as the eval table must
    reproduce the registered fixture query exactly (minus the slice's
    self-exclusion, which the default mode applies)."""
    from fsharp_mapreduce_spark.functions.text import DECON_EVAL_MOD, decontaminate
    from fsharp_mapreduce_spark.registry import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    ev = docs.where(F.col("doc_id") % DECON_EVAL_MOD == 0)
    train = docs.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
    explicit = {
        (r.doc_id, r.n_shared_ngrams) for r in decontaminate(train, ev).collect()
    }
    default = {(r.doc_id, r.n_shared_ngrams) for r in decontaminate(docs).collect()}
    assert explicit == default


def test_paragraph_dedup_planted_partial_copy(spark):
    """t26's reason to exist: doc B copies exactly one 16-token block
    of doc A (a partial copy t01 misses — the docs are not equal — and
    exact-substring, which t03's whole-doc resemblance dilutes).
    Block accounting: A = 32 tokens (2 blocks, 1 duplicated), B = that
    one block verbatim (1 block, duplicated), C unrelated (0 dup)."""
    from fsharp_mapreduce_spark.functions.dedup import paragraph_dedup

    block1 = " ".join(f"w{i}" for i in range(16))
    block2 = " ".join(f"x{i}" for i in range(16))
    other = " ".join(f"z{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, f"{block1} {block2}"), (2, block1), (3, other)],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_blocks, r.n_dup_blocks, r.dup_fraction)
           for r in paragraph_dedup(df).collect()}
    assert out[1] == (2, 1, 0.5)
    assert out[2] == (1, 1, 1.0)
    assert out[3] == (1, 0, 0.0)


def test_paragraph_dedup_counts_repeated_positions_once_per_doc_pairing(spark):
    """A block repeated WITHIN one doc only (no other doc has it) is
    not cross-doc duplication; the same block in two docs marks every
    occurrence in both."""
    from fsharp_mapreduce_spark.functions.dedup import paragraph_dedup

    rep = " ".join(f"r{i}" for i in range(16))
    solo = " ".join(f"s{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, f"{solo} {solo}"),            # within-doc repeat only
         (2, f"{rep} {rep}"), (3, rep)],   # cross-doc duplicate, repeated in 2
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_blocks, r.n_dup_blocks) for r in paragraph_dedup(df).collect()}
    assert out[1] == (2, 0)
    assert out[2] == (2, 2)
    assert out[3] == (1, 1)


def test_mixture_rebalance_equalizes_sources(spark):
    """t27: the smallest source keeps EVERYTHING (rate 1 → the integer
    membership test is h*n < n*B, always true), every rate is feasible
    (≤ 1), the funnel is monotone (n_kept ≤ n_docs), and the achieved
    per-source sample sizes are near-equal (hash-uniformity noise)."""
    from fsharp_mapreduce_spark.functions.sampling import t27_mixture_rebalance

    rows = t27_mixture_rebalance(spark, SF_SMOKE).collect()
    assert rows
    min_docs = min(r.n_docs for r in rows)
    for r in rows:
        assert 0 < r.n_kept <= r.n_docs
        assert r.target_rate <= 1.0
        if r.n_docs == min_docs:
            assert r.n_kept == r.n_docs  # smallest source: rate exactly 1
    kept = [r.n_kept for r in rows]
    # target is min_docs per source; binomial noise around it
    assert max(kept) <= 1.5 * min_docs + 5 and min(kept) >= 0.5 * min_docs - 5


def test_preprocess_funnel_monotone(spark):
    """t28: the funnel only removes documents — counts are
    non-increasing across stages and stage 0 is the full corpus."""
    from fsharp_mapreduce_spark.functions.text import t28_preprocess_funnel
    from fsharp_mapreduce_spark.registry import table

    total = table(spark, SF_SMOKE, "documents").count()
    rows = sorted(t28_preprocess_funnel(spark, SF_SMOKE).collect(), key=lambda r: r.stage)
    assert [r.stage for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0].n_docs == total
    counts = [r.n_docs for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert counts[-1] > 0


def test_incremental_dedup_planted_batch(spark):
    """t30 semantics on a planted batch: a batch doc (id % 10 == 7)
    that is an exact copy of a corpus doc flags is_exact_dup AND
    near-dup (jaccard 1.0); a one-word-edit batch doc flags near-only;
    an unrelated batch doc flags neither. Corpus-side duplicates of
    each other must NOT leak into the output (batch rows only)."""
    from fsharp_mapreduce_spark.functions.dedup import incremental_dedup

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun"
    )
    rows = [
        (1, base),  # corpus
        (2, base),  # corpus dup of 1 — must not appear in output
        (3, "parquet columnar storage with predicate pushdown and pruning"),
        (7, base),  # batch: exact copy of corpus doc 1
        (17, base.replace("lazy", "sleepy")),  # batch: near copy
        (27, "completely unrelated text about catalyst optimizer rules"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in incremental_dedup(docs).collect()}
    assert set(out) == {7, 17, 27}
    assert out[7].is_exact_dup and out[7].max_jaccard == 1.0
    assert out[7].n_near_dups == 2  # docs 1 AND 2 both match
    assert not out[17].is_exact_dup and out[17].n_near_dups == 2
    assert 0.5 <= out[17].max_jaccard < 1.0
    assert not out[27].is_exact_dup and out[27].n_near_dups == 0
    assert out[27].max_jaccard == 0.0


def test_t31_cms_bounds(spark):
    """The count-min guarantee on the live fixture: every estimate is
    an overestimate (hash collisions only ADD), and the error is
    within the sketch's εN bound (ε = e/w) with room to spare."""
    import math as _math

    from fsharp_mapreduce_spark.functions.text import (
        CMS_WIDTH,
        t31_count_min_heavy_hitters,
    )
    from fsharp_mapreduce_spark.registry import table as _table

    rows = t31_count_min_heavy_hitters(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    n_tokens = (
        _table(spark, SF_SMOKE, "documents")
        .selectExpr("SUM(size(split(lower(text), ' '))) AS n")
        .collect()[0]
        .n
    )
    eps_n = _math.e / CMS_WIDTH * n_tokens
    for r in rows:
        assert r.est_n >= r.exact_n, (r.token, r.est_n, r.exact_n)
        assert r.est_n - r.exact_n <= eps_n, (r.token, r.est_n, r.exact_n, eps_n)


def test_t33_cluster_split_prevents_leakage(spark, tmp_path):
    """The t33 guarantee on an adversarial corpus: many near-dup pairs
    whose doc_ids hash to DIFFERENT splits under a naive doc-hash
    split. The cluster split must report zero cross-split pairs while
    the doc-hash counterfactual (computed here directly) leaks."""
    from fsharp_mapreduce_spark.functions.dedup import (
        SPLIT_MOD,
        SPLIT_TRAIN_BELOW,
        md5_int_hash,
        ngram_jaccard_pairs,
        t33_leakage_safe_split,
    )

    # 20 near-dup pairs with DISJOINT vocabularies (cross-pair
    # Jaccard = 0, within-pair ≈ 0.9) and adjacent doc_ids
    rows = []
    for i in range(20):
        words = [f"w{i}x{j}" for j in range(20)]
        rows.append((2 * i, " ".join(words)))
        rows.append((2 * i + 1, " ".join(words[:-1] + ["changed"])))
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")

    out = {r.split: r for r in t33_leakage_safe_split(spark, d).collect()}
    assert sum(r.n_docs for r in out.values()) == 40
    assert sum(r.n_clusters for r in out.values()) == 20
    assert all(r.n_cross_split_pairs == 0 for r in out.values()), out

    # counterfactual: the naive doc-hash split leaks on this corpus
    pairs = ngram_jaccard_pairs(spark.read.parquet(f"{d}/documents.parquet"))
    h = lambda c: md5_int_hash(F.col(c).cast("string")) % SPLIT_MOD
    leaked = pairs.where(
        (h("doc_a") < SPLIT_TRAIN_BELOW) != (h("doc_b") < SPLIT_TRAIN_BELOW)
    ).count()
    assert leaked > 0, "adversarial corpus failed to produce doc-hash leakage"


def test_t34_fuzzy_blocking_is_exact(spark, tmp_path):
    """The positional-q-gram count-filter guarantee, checked against
    brute force on a planted corpus including CROSS-LENGTH pairs
    (insertions shift positions — the case the |Δpos| ≤ K guard
    exists for) and duplicate rows (collapsed to the dictionary
    grain): the blocked join must find exactly the name pairs
    levenshtein ≤ K finds."""
    from fsharp_mapreduce_spark.functions.text import FUZZY_K, t34_fuzzy_match

    rows = [
        (1, "cold widget"),
        (2, "bold widget"),      # sub, d=1
        (3, "cold widgets"),     # insert, d=1 (length differs)
        (4, "old widget"),       # delete, d=1
        (5, "warm gasket"),
        (6, "warm gasket"),      # duplicate row → n_copies=2, not a pair
        (7, "completely different name"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, "p_partkey long, p_name string").write.mode(
        "overwrite"
    ).parquet(f"{d}/part.parquet")

    got = {r.name: r for r in t34_fuzzy_match(spark, d).collect()}

    import itertools
    from collections import Counter

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    copies = Counter(n for _, n in rows)
    want = {nm: [0, None] for nm in copies}
    for na, nb in itertools.combinations(sorted(copies), 2):
        dist = lev(na, nb)
        if dist <= FUZZY_K:
            for k, o in ((na, nb), (nb, na)):
                want[k][0] += 1
                cand = (dist, o)
                if want[k][1] is None or cand < want[k][1]:
                    want[k][1] = cand
    assert set(got) == set(want)
    for nm, (n, best) in want.items():
        r = got[nm]
        assert r.n_copies == copies[nm], (nm, r)
        assert r.n_fuzzy == n, (nm, r, n)
        if best is None:
            assert r.best_match is None and r.best_dist is None, (nm, r)
        else:
            assert (r.best_dist, r.best_match) == best, (nm, r, best)


def test_textrank_matches_numpy_power_iteration(spark):
    """Golden: textrank_scores on a tiny planted corpus must equal a
    dense numpy power iteration of the same weighted-PageRank update
    (PR' = (1-d)·1 + d·M_norm·PR) on the hand-derivable co-occurrence
    graph."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.text import textrank_scores

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta"),
            (2, "beta gamma delta"),
            (3, "delta alpha delta gamma"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["node"]: r["score"]
        for r in textrank_scores(docs, damping=0.85, iters=3).collect()
    }

    # build the same graph in numpy: adjacent distinct pairs, undirected
    words = ["alpha", "beta", "gamma", "delta"]
    idx = {w: i for i, w in enumerate(words)}
    W = np.zeros((4, 4))
    for text in [
        "alpha beta gamma alpha beta",
        "beta gamma delta",
        "delta alpha delta gamma",
    ]:
        t = text.split()
        for a, b in zip(t, t[1:]):
            if a != b:
                W[idx[a], idx[b]] += 1
                W[idx[b], idx[a]] += 1
    M = W / W.sum(axis=1, keepdims=True)  # row-normalized out-weights
    pr = np.ones(4)
    for _ in range(3):
        pr = 0.15 + 0.85 * (M.T @ pr)
    for w in words:
        assert abs(got[w] - pr[idx[w]]) < 1e-9, (w, got[w], pr[idx[w]])


def test_distribution_drift_fires_on_planted_shift(spark):
    """The drift audit's discrimination: an unbiased batch slice scores
    PSI ≈ 0 (stable) while a vocabulary-skewed batch of the same size
    crosses the industry 0.2 major-shift threshold on the same corpus."""
    from fsharp_mapreduce_spark.functions.text import distribution_drift
    from pyspark.sql import functions as F

    corpus_rows = [(i, w) for i in range(200) for w in ("alpha", "beta", "gamma")]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "tok"])
    stable = corpus.where(F.col("doc_id") % 5 == 0)  # unbiased slice
    skewed = corpus.where(F.col("tok") == "alpha").limit(120)  # one-token batch

    psi_stable = distribution_drift(corpus, stable).collect()[0]["psi"]
    psi_skewed = distribution_drift(corpus, skewed).collect()[0]["psi"]
    assert abs(psi_stable) < 0.01, psi_stable
    assert psi_skewed > 0.2, psi_skewed


def test_ngram_novelty_discriminates(spark):
    """ngram_novelty extremes: a batch that IS a subset of the
    reference scores 0 novelty; a batch sharing no vocabulary with the
    reference scores 1.0."""
    from fsharp_mapreduce_spark.functions.text import ngram_novelty

    ref = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(10)],
        ["doc_id", "text"],
    )
    subset = ref.limit(3)
    disjoint = spark.createDataFrame(
        [(99, "omega psi chi phi upsilon tau")], ["doc_id", "text"]
    )
    r0 = ngram_novelty(ref, subset).collect()[0]
    r1 = ngram_novelty(ref, disjoint).collect()[0]
    assert r0["novelty_rate"] == 0.0, r0
    assert r1["novelty_rate"] == 1.0, r1
    assert r1["n_novel"] == r1["n_batch_grams"]


def test_deterministic_shuffle_is_seeded_permutation(spark):
    """deterministic_shuffle: positions are a permutation 1..n,
    identical across repartitioned inputs (retry/cluster-shape
    invariance), and a different seed yields a different order."""
    from fsharp_mapreduce_spark.functions.sampling import deterministic_shuffle
    from fsharp_mapreduce_spark.registry import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    a = {r["doc_id"]: r["shuffle_pos"] for r in deterministic_shuffle(docs).collect()}
    n = len(a)
    assert sorted(a.values()) == list(range(1, n + 1))
    b = {
        r["doc_id"]: r["shuffle_pos"]
        for r in deterministic_shuffle(docs.repartition(7)).collect()
    }
    assert a == b
    c = {
        r["doc_id"]: r["shuffle_pos"]
        for r in deterministic_shuffle(docs, seed=1).collect()
    }
    assert sorted(c.values()) == list(range(1, n + 1))
    assert c != a


def test_t39_weighted_sample_bias_and_determinism(spark):
    """weighted_sample (Efraimidis-Spirakis): selection probability
    must track the weight — rows with 20x the weight of their peers
    should be strongly overrepresented vs their population share —
    and membership must be a pure function of the key (identical at 1
    and 8 partitions, identical across calls)."""
    from pyspark.sql import functions as F

    from fsharp_mapreduce_spark.functions.sampling import weighted_sample

    # 2000 rows: 10% heavy (w=200), 90% light (w=10)
    df = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, F.lit(200)).otherwise(F.lit(10)).alias("w"),
    )
    top = weighted_sample(df, F.col("id"), F.col("w"), k=200)
    heavy = top.where(F.col("w") == 200).count()
    # heavy rows hold 200*200/(200*200+1800*10) ≈ 69% of total weight
    # but only 10% of rows; A-ES inclusion should land far above the
    # uniform 10% share (loose floor at 35% to stay flake-proof)
    assert heavy > 70, heavy

    one = {r.id for r in weighted_sample(df.coalesce(1), F.col("id"), F.col("w"), k=200).collect()}
    many = {r.id for r in weighted_sample(df.repartition(8), F.col("id"), F.col("w"), k=200).collect()}
    again = {r.id for r in top.collect()}
    assert one == many == again


def test_t39_plan_is_takeordered(spark):
    """The k-selection must plan as TakeOrderedAndProject (partition
    heaps + driver merge) — no global sort, no single-partition
    exchange."""
    from fsharp_mapreduce_spark.registry import QUERIES

    df = QUERIES["t39_weighted_sample"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def _ref_list_merge(syms, a, b):
    """Greedy left-to-right BPE pair merge on a symbol LIST — the
    textbook definition the string algebra must reproduce."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _formula_merge(s, a, b):
    """The double-space replace algebra of `_bpe_merge_expr`, in
    Python (str.replace shares leftmost-non-overlapping semantics
    with Spark's replace() and DuckDB's replace())."""
    doubled = (" " + s + " ").replace(" ", "  ")
    merged = doubled.replace(f" {a}  {b} ", f" {a}{b} ")
    return merged.replace("  ", " ").strip()


def test_bpe_merge_formula_equals_list_merge(spark):
    """Property: the double-space string algebra == greedy pairwise
    list merge for every sequence — including runs ('a a a a' must
    merge to 'aa aa', the case the single-space pattern gets wrong by
    consuming the shared delimiter) — exhaustively over all symbol
    sequences of length ≤ 6 from a 2-symbol alphabet plus multi-char
    symbol cases, then spot-checked THROUGH Spark's replace() to pin
    engine semantics, not just Python's."""
    from itertools import product

    from fsharp_mapreduce_spark.functions.text import _bpe_merge_expr

    cases = []
    for n in range(1, 7):
        for seq in product(["a", "b"], repeat=n):
            cases.append((list(seq), "a", "b"))
            cases.append((list(seq), "a", "a"))
            cases.append((list(seq), "b", "a"))
    cases += [
        (["ab", "a", "b", "ab"], "a", "b"),
        (["ab", "ab", "ab"], "ab", "ab"),
        (["x", "ab", "ab", "y"], "ab", "ab"),
    ]
    for syms, a, b in cases:
        want = " ".join(_ref_list_merge(syms, a, b))
        got = _formula_merge(" ".join(syms), a, b)
        assert got == want, (syms, a, b, got, want)

    # Same algebra THROUGH Spark's replace(): one column per distinct
    # merge pair, all cases in a single job.
    spot = [(" ".join(s), a, b) for s, a, b in cases]
    df = spark.createDataFrame([(s,) for s, _, _ in spot], "s string")
    for a, b in sorted({(a, b) for _, a, b in spot}):
        sub = sorted({s for s, aa, bb in spot if (aa, bb) == (a, b)})
        got_rows = (
            spark.createDataFrame([(s,) for s in sub], "s string")
            .select("s", _bpe_merge_expr(F.col("s"), a, b).alias("m"))
            .collect()
        )
        for r in got_rows:
            assert r["m"] == _formula_merge(r["s"], a, b), (r["s"], a, b, r["m"])


def test_t40_bpe_matches_pure_python_reference(spark):
    """bpe_train on a planted corpus == a from-scratch Python BPE
    (Sennrich-style word-frequency training with the same
    (count DESC, pair ASC) tie-break). The reference builds its pair
    counts from symbol LISTS — fully independent of the string
    algebra and of SQL — so agreement pins the distributed pipeline's
    semantics, not its implementation."""
    from collections import Counter

    from fsharp_mapreduce_spark.functions.text import bpe_train

    texts = [
        "low low low lower lower lowest",
        "new newer newest wide wider widest",
        "low newer low wider newest lowest",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")

    words = Counter()
    for t in texts:
        for w in t.split():
            words[w] += 1
    vocab = {w: [c for c in w] for w in words}
    expected = []
    for r in range(1, 6):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((r, a, b, a + b, n))
        vocab = {w: _ref_list_merge(s, a, b) for w, s in vocab.items()}

    got = [
        (r["round_id"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, rounds=5).orderBy("round_id").collect()
    ]
    assert got == expected, (got, expected)


def test_bpe_train_driver_and_distributed_paths_agree(spark):
    """r10: bpe_train's driver-side merge loop (vocabulary under
    BPE_DRIVER_VOCAB_CAP, the default path on every fixture) and the
    distributed per-round pipeline (forced with driver_vocab_cap=0)
    must emit the IDENTICAL merge table — same argmax, same
    tie-breaks, same pair counts, every round. The planted corpus has
    real ties ('low'/'lower'/'lowest' share prefixes), so a tie-break
    divergence between Python tuple order and Spark's binary string
    order would surface here."""
    from fsharp_mapreduce_spark.functions.text import bpe_train

    texts = [
        "low low low lower lower lowest",
        "new newer newest wide wider widest",
        "low newer low wider newest lowest",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    as_rows = lambda df: [  # noqa: E731
        tuple(r) for r in df.orderBy("round_id").collect()
    ]
    fast = as_rows(bpe_train(docs, rounds=6))
    slow = as_rows(bpe_train(docs, rounds=6, driver_vocab_cap=0))
    assert fast == slow and len(fast) == 6, (fast, slow)


def test_t41_bpe_encode_matches_pure_python_reference(spark):
    """bpe_encode on the planted corpus == tokenizing each document
    with a from-scratch Python BPE (train with the same tie-break,
    then greedy list-merge each word in priority order). Pins that
    the doc-level symbol string + boundary-symbol trick tokenizes
    EXACTLY like per-word application — merges never leak across
    word boundaries."""
    from collections import Counter

    from fsharp_mapreduce_spark.functions.text import bpe_encode

    texts = [
        "low low low lower lower lowest",
        "new newer newest wide wider widest",
        "low newer low wider newest lowest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    words = Counter()
    for t in texts:
        for w in t.split():
            words[w] += 1
    vocab = {w: [c for c in w] for w in words}
    merges = []
    for _r in range(5):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        if not pc:
            break
        (a, b), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        vocab = {w: _ref_list_merge(s, a, b) for w, s in vocab.items()}

    def encode_word(w):
        syms = [c for c in w]
        for a, b in merges:
            syms = _ref_list_merge(syms, a, b)
        return syms

    expected = {
        i: sum(len(encode_word(w)) for w in t.split())
        for i, t in enumerate(texts)
    }
    got = {
        r["doc_id"]: r["n_tokens_bpe"]
        for r in bpe_encode(docs, rounds=5).collect()
    }
    assert got == expected, (got, expected)


def test_t42_full_matrix_and_source_grain(spark):
    """source_overlap_matrix semantics (VERDICT r6 #4): (1) the matrix
    is the deterministic FULL upper triangle — S sources emit exactly
    S·(S−1)/2 rows and zero-overlap pairs still appear with
    n_common=0 / jaccard=0.0 (the broadcast source-list cross, not the
    intersection join, drives row existence); (2) everything is
    DISTINCT at (source, gram) grain, so duplicating a document inside
    a source changes NOTHING — which is exactly the ≤S·(S−1)/2
    pairs-per-gram bound: a gram meets source pairs, never doc pairs.
    Jaccard values are checked against a from-scratch Python set
    reference (same lowercase/whitespace 3-gram definition)."""
    from fsharp_mapreduce_spark.functions.text import (
        OVERLAP_NGRAM,
        source_overlap_matrix,
    )

    corpus = [
        # A and B share the "the quick brown fox" run; C is disjoint.
        (0, "the quick brown fox jumps high", "A"),
        (1, "the quick brown fox sleeps now", "B"),
        (2, "b only words here truly", "B"),
        (3, "zeta eta theta iota kappa lambda", "C"),
    ]

    def grams(t):
        ws = t.lower().split()
        return {
            " ".join(ws[i : i + OVERLAP_NGRAM])
            for i in range(len(ws) - OVERLAP_NGRAM + 1)
        }

    by_src = {}
    for _i, t, s in corpus:
        by_src.setdefault(s, set()).update(grams(t))
    expected = {}
    for a in sorted(by_src):
        for b in sorted(by_src):
            if a < b:
                inter = len(by_src[a] & by_src[b])
                union = len(by_src[a] | by_src[b])
                expected[(a, b)] = (
                    len(by_src[a]), len(by_src[b]), inter,
                    round(inter / union, 6),
                )

    docs = spark.createDataFrame(corpus, "doc_id long, text string, source string")
    rows = source_overlap_matrix(docs).collect()
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_grams_a"], r["n_grams_b"], r["n_common"], round(r["jaccard"], 6)
        )
        for r in rows
    }
    assert len(rows) == 3  # S=3 → exactly S·(S−1)/2, zero-overlap pairs included
    assert got == expected, (got, expected)
    assert got[("A", "C")][2] == 0 and got[("A", "C")][3] == 0.0
    assert got[("B", "C")][2] == 0

    # Source-grain distinctness: replicate doc 0 eight times inside A
    # (and once inside B) — per-gram postings grow, the matrix does not.
    dup = corpus + [(10 + k, "the quick brown fox jumps high", "A") for k in range(8)]
    dup += [(30, "the quick brown fox sleeps now", "B")]
    docs_dup = spark.createDataFrame(dup, "doc_id long, text string, source string")
    rows_dup = source_overlap_matrix(docs_dup).collect()
    got_dup = {
        (r["source_a"], r["source_b"]): (
            r["n_grams_a"], r["n_grams_b"], r["n_common"], round(r["jaccard"], 6)
        )
        for r in rows_dup
    }
    assert got_dup == got, (got_dup, got)


def test_t44_heavy_hitter_ranking_and_spreads(spark):
    """boilerplate_blocks on a planted corpus: a block duplicated
    across sources ranks first with exact occurrence/doc/source
    spreads; blocks appearing in a single document never emit; the
    sample text is the block itself; within-doc repeats count as
    occurrences but one document."""
    from fsharp_mapreduce_spark.functions.dedup import boilerplate_blocks

    boiler = " ".join(f"b{i}" for i in range(16))          # 16-token block
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(16))
    corpus = [
        (0, boiler + " " + boiler, "A"),        # twice in one doc
        (1, boiler + " " + uniq("x"), "B"),
        (2, boiler + " " + uniq("y"), "C"),
        (3, uniq("z") + " " + uniq("w"), "C"),  # all-unique doc
        (4, uniq("z") + " " + uniq("q"), "C"),  # shares z-block, same source
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string, source string")
    rows = boilerplate_blocks(docs, para_tokens=16, k=10).collect()
    by_sample = {r["sample_block"]: r for r in rows}
    top = rows[0] if rows else None
    # boiler: 4 occurrences (2 in doc 0) across 3 docs and 3 sources
    b = by_sample[boiler]
    assert (b["n_occurrences"], b["n_docs"], b["n_sources"]) == (4, 3, 3)
    # z-block: 2 occurrences, 2 docs, ONE source
    z = by_sample[uniq("z")]
    assert (z["n_occurrences"], z["n_docs"], z["n_sources"]) == (2, 2, 1)
    # only duplicated blocks emit (x/y/w/q are single-doc)
    assert set(by_sample) == {boiler, uniq("z")}
    # ranking: boiler first (orderBy n_occurrences DESC is pre-limit;
    # re-sort client-side since the driver compare sorts anyway)
    assert sorted(rows, key=lambda r: -r["n_occurrences"])[0]["sample_block"] == boiler


def test_t45_vocab_growth_planted_curve(spark):
    """Heaps-curve semantics on a planted 10-doc corpus (N=10 → one
    doc per decile): doc i introduces exactly one NEW unigram beyond
    doc 0's base vocabulary, so vocab_cum grows by 1 per decile after
    the first; bigram novelty and token totals follow exactly; a
    decile introducing nothing new adds 0."""
    from fsharp_mapreduce_spark.functions.text import t45_vocab_growth
    from fsharp_mapreduce_spark.registry import table as _table  # noqa: F401

    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fsharp_mapreduce_spark.scratch import scratch_dir

    # docs: doc 0 = "a b", doc i>=1 = "a w<i>" except doc 5 repeats
    # doc 4's text verbatim (a decile with ZERO new vocabulary)
    texts = ["a b"]
    for i in range(1, 10):
        texts.append("a w4" if i == 5 else f"a w{i}")
    d = scratch_dir("fsmr_t45_fix_")
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(10)),
                "text": texts,
                "lang": ["en"] * 10,
                "source": ["s"] * 10,
                "n_chars": [len(t) for t in texts],
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    rows = {r.decile: r for r in t45_vocab_growth(spark, d).collect()}
    assert sorted(rows) == list(range(1, 11))
    assert [rows[i].docs_cum for i in range(1, 11)] == list(range(1, 11))
    assert [rows[i].tokens_cum for i in range(1, 11)] == [2 * i for i in range(1, 11)]
    # unigrams: {a,b} then +1 new word per doc, except doc 5 (+0)
    assert [rows[i].vocab_cum for i in range(1, 11)] == [
        2, 3, 4, 5, 6, 6, 7, 8, 9, 10
    ]
    # bigrams: each doc has exactly one bigram; doc 5's repeats doc 4's
    assert [rows[i].bigram_vocab_cum for i in range(1, 11)] == [
        1, 2, 3, 4, 5, 5, 6, 7, 8, 9
    ]


def test_t02_blocked_counts_equal_join_formulation(spark):
    """The round-8 blocked sparse-counting rewrite must be
    OUTPUT-IDENTICAL to the join+agg formulation it replaced — on a
    corpus WITH hot shingles (tiny cap) and a block size small enough
    to force multiple blocks and cross-block pairs, and including the
    optimistic-bound pre-filter (a pair that passes the threshold
    ONLY via its hot remainder must survive to the patch)."""
    from pyspark.sql import functions as F

    from fsharp_mapreduce_spark.functions import dedup as D

    # 30 docs over a tiny vocab: heavy shared boilerplate (hot under
    # cap=3) + planted near-dup pairs
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = []
    for i in range(30):
        if i % 3 == 0:
            texts.append(base + f" tail{i // 3}")  # near-dups of base
        else:
            texts.append(f"doc {i} unique words w{i}a w{i}b w{i}c " + base)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def run(blocked: bool, cap: int):
        hsets = D.hashed_shingle_sets(docs)
        e = hsets.select("doc_id", F.explode("hs").alias("shingle"))
        hot = D._hot_shingles(e, cap)
        has_hot = bool(hot.head(1))
        h = hot if has_hot else None
        if blocked:
            pairs = D._kept_pair_counts_blocked(hsets, h, block_docs=7)
        else:
            pairs = D._kept_pair_counts(e, h)
        return pairs

    for cap in (3, 1024):
        got = {
            (r.doc_a, r.doc_b): r.kept_shared
            for r in run(True, cap).collect()
        }
        want = {
            (r.doc_a, r.doc_b): r.kept_shared
            for r in run(False, cap).collect()
        }
        # blocked emits only bound-passing pairs; every blocked pair
        # must carry the exact join-path count, and every pair the
        # bound admits in the join path that can reach the threshold
        # must be present in the blocked output
        for k, v in got.items():
            assert want[k] == v, (cap, k, v, want[k])
        # end-to-end: the registered pipeline (which consumes the
        # blocked counts) equals itself run over the join counts by
        # construction — pin via the public function on both caps
        full = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in D.ngram_jaccard_pairs(docs, cap=cap).collect()
        }
        if cap == 1024:
            assert full, "planted near-dups must emit under the real cap"
        # recompute expected jaccards from raw sets (exact ground truth)
        hs = {
            r.doc_id: set(r.hs)
            for r in D.hashed_shingle_sets(docs).collect()
        }
        hot_set = {
            r.shingle
            for r in D._hot_shingles(
                D.hashed_shingle_sets(docs).select(
                    "doc_id", F.explode("hs").alias("shingle")
                ),
                cap,
            ).collect()
        }
        expected = set()
        ids = sorted(hs)
        for i in ids:
            for j in ids:
                if i >= j:
                    continue
                if not (hs[i] & hs[j]) - hot_set:
                    continue  # no kept co-occurrence → never a candidate
                inter = len(hs[i] & hs[j])
                jac = inter / (len(hs[i]) + len(hs[j]) - inter)
                if jac >= D.JACCARD_THRESHOLD:
                    expected.add((i, j, round(jac, 6)))
        assert full == expected, (cap, full ^ expected)


def test_t02_blocked_counts_sparse_hashed_ids(spark):
    """Blocks must chunk the sorted distinct doc-id SET, not stride
    the raw id range (VERDICT r8 #5): with md5-scale sparse ids
    (spread over ~2^60) the old range-stride enumeration would launch
    ~2^47 empty filter+collect jobs — this test would hang. Pass count
    is ceil(n_docs / block_docs) regardless of id sparsity, and the
    pair counts must equal the join formulation on the same corpus."""
    from pyspark.sql import functions as F

    from fsharp_mapreduce_spark.functions import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(20):
        # sparse, non-uniform 60-bit-ish ids (deterministic)
        doc_id = (i * 0x9E3779B97F4A7C15) & ((1 << 60) - 1)
        text = base + f" tail{i // 4}" if i % 4 == 0 else (
            f"doc {i} unique words w{i}a w{i}b " + base
        )
        rows.append((doc_id, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hsets = D.hashed_shingle_sets(docs)
    e = hsets.select("doc_id", F.explode("hs").alias("shingle"))
    got = {
        (r.doc_a, r.doc_b): r.kept_shared
        for r in D._kept_pair_counts_blocked(
            hsets, None, block_docs=6
        ).collect()
    }
    want = {
        (r.doc_a, r.doc_b): r.kept_shared
        for r in D._kept_pair_counts(e, None).collect()
    }
    assert got, "planted near-dups must co-occur"
    for k, v in got.items():
        assert want[k] == v, (k, v, want[k])


def test_t02_block_boundaries_driver_size_and_coverage(spark):
    """VERDICT r10 #3: boundary derivation must collect O(n_blocks)
    rows, not the full id list. _block_boundaries returns exactly
    ceil(n_docs / block_docs) disjoint sorted intervals, each holding
    ≤ block_docs distinct ids (the broadcast bound), jointly covering
    every id — for dense AND sparse/hashed id spaces."""
    from fsharp_mapreduce_spark.functions import dedup as D

    for ids in (
        list(range(25)),  # dense
        [(i * 0x9E3779B97F4A7C15) & ((1 << 60) - 1) for i in range(25)],
    ):
        hsets = spark.createDataFrame(
            [(i, [1, 2]) for i in ids], "doc_id long, hs array<long>"
        )
        for block_docs in (7, 25, 100):
            bounds = D._block_boundaries(hsets, block_docs)
            n_blocks = -(-len(ids) // block_docs)
            assert len(bounds) == n_blocks, (block_docs, bounds)
            s = sorted(ids)
            covered = []
            prev_hi = None
            for lo, hi in bounds:
                assert lo <= hi
                if prev_hi is not None:
                    assert lo > prev_hi, "intervals must be disjoint+sorted"
                prev_hi = hi
                members = [x for x in s if lo <= x <= hi]
                assert 0 < len(members) <= block_docs, (lo, hi, members)
                covered.extend(members)
            assert covered == s, "blocks must cover every distinct id"
    assert D._block_boundaries(
        spark.createDataFrame([], "doc_id long, hs array<long>"), 8
    ) == []


def test_t45_vocab_growth_zero_token_docs(spark):
    """ADVICE r8 (medium): a zero-token document (empty or
    whitespace-only text) must yield an EMPTY bigram list — the raw
    `slice(ts, 1, size(ts)-1)` got length -1 and raised
    INVALID_PARAMETER_VALUE, while the DuckDB oracle's
    generate_series(1, -1) yields empty. Single-token docs (no
    bigram) are covered for the same guard."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fsharp_mapreduce_spark.functions.text import t45_vocab_growth
    from fsharp_mapreduce_spark.scratch import scratch_dir

    texts = ["a b", "", "   ", "solo", "a c"]
    d = scratch_dir("fsmr_t45_empty_")
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    rows = {r.decile: r for r in t45_vocab_growth(spark, d).collect()}
    # 5 docs → docs 0..4 land in deciles 1,3,5,7,9 (doc_id*10 div 5 +1)
    last = rows[max(rows)]
    # unigrams: a, b, solo, c ; bigrams: "a b", "a c" — the empty and
    # whitespace-only docs contribute nothing and nothing crashes
    assert last.vocab_cum == 4
    assert last.bigram_vocab_cum == 2
    assert last.docs_cum == 5
    assert last.tokens_cum == 5


def test_t46_recall_curve_structure(spark, synth_docs_dir):
    """The audit's algebra on the planted corpus: buckets in [0,9],
    n_found <= n_true per band, Σn_true = |t02 ground truth|, and —
    since the planted pairs sit far above the banding knee — every
    band present reads recall 1.0 with the top band populated
    (identical docs share every band signature)."""
    from fsharp_mapreduce_spark.functions.dedup import (
        t02_ngram_jaccard_pairs,
        t46_lsh_recall_audit,
    )

    truth = t02_ngram_jaccard_pairs(spark, synth_docs_dir).count()
    rows = t46_lsh_recall_audit(spark, synth_docs_dir).collect()
    assert rows, "planted corpus must produce at least one band"
    assert all(0 <= r.bucket <= 9 for r in rows)
    assert all(r.n_found <= r.n_true for r in rows)
    assert sum(r.n_true for r in rows) == truth
    assert all(abs(r.jaccard_lo - (0.5 + r.bucket * 0.05)) < 1e-9 for r in rows)
    # planted near-dups are all recalled (test_minhash_recall's pin,
    # restated through the registered audit)
    assert all(r.recall == 1.0 for r in rows), rows


def test_t47_semantic_dedup_planted_clusters(spark):
    """semantic_dedup on planted structure: three well-separated
    direction groups (k-means must put each group in one cell at
    k >= 3), with (a) a triple of IDENTICAL vectors -> the two higher
    ids dropped, both pointing dup_of at the LOWEST id with
    max_sim 1.0 and the lowest id itself KEPT (absent from output);
    (b) a near-dup pair -> higher id dropped; (c) isolated vectors
    in a third direction -> kept. Pins the keep-lowest-id rule, the
    within-cell scope, and the audit columns."""
    import numpy as np

    from fsharp_mapreduce_spark.functions.dedup import semantic_dedup

    rng = np.random.RandomState(11)
    dim = 8

    def around(base, eps, n):
        return [
            (base + eps * rng.randn(dim)).tolist() for _ in range(n)
        ]

    ax_a = np.array([10.0] + [0.0] * (dim - 1))
    ax_b = np.array([0.0, 10.0] + [0.0] * (dim - 2))
    ax_c = np.array([0.0, 0.0, 10.0] + [0.0] * (dim - 3))
    rows = []
    # group A: ids 1, 5, 9 identical; 3 loose A-direction fillers
    ident = (ax_a + 0.01 * rng.randn(dim)).tolist()
    rows += [(1, ident), (5, ident), (9, ident)]
    rows += [(i, v) for i, v in zip((12, 13, 14), around(ax_a, 6.0, 3))]
    # group B: near-dup pair 20 < 21, plus a loose filler
    nb = ax_b + 0.001 * rng.randn(dim)
    rows += [(20, nb.tolist()), (21, (nb + 1e-4 * rng.randn(dim)).tolist())]
    rows += [(25, (ax_b + 6.0 * rng.randn(dim)).tolist())]
    # group C: isolated spread-out vectors
    rows += [(i, v) for i, v in zip((30, 31, 32), around(ax_c, 6.0, 3))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {
        r["vec_id"]: (r["dup_of"], r["n_dups"], r["max_sim"])
        for r in semantic_dedup(emb, threshold=0.95, n_cells=3).collect()
    }
    assert 5 in got and got[5][0] == 1 and got[5][2] == 1.0
    assert 9 in got and got[9][0] in (1, 5) and got[9][2] == 1.0
    assert 9 in got and got[9][0] == 1  # min over {1, 5}
    assert got[9][1] == 2  # duplicates of both 1 and 5
    assert 21 in got and got[21][0] == 20 and got[21][2] >= 0.999999
    assert 1 not in got and 20 not in got  # lowest ids kept
    for kept in (12, 13, 14, 25, 30, 31, 32):
        assert kept not in got, (kept, got.get(kept))


def test_t48_duplicate_spans_planted(spark):
    """duplicate_spans on planted structure, pinning every rule:
    (a) a 12-token shared prefix merges its 5 overlapping dup grams
    into ONE maximal span covering exactly the shared tokens; (b) a
    WITHIN-doc repeated 10-token block yields two separate spans
    (within-doc repeats count, as in Lee et al.); (c) an all-unique
    doc yields no rows; (d) two dup grams exactly k positions apart
    (islands touching, nothing duplicated in between crossing the
    block boundary) MERGE — the adjacency rule; (e) span extent is
    [start, last_gram_pos + k - 1]."""
    from fsharp_mapreduce_spark.functions.dedup import SPAN_GRAM, duplicate_spans

    assert SPAN_GRAM == 8  # the planted positions below assume k=8

    def uniq(tag, n):
        return " ".join(f"{tag}{i}" for i in range(n))

    shared12 = uniq("s", 12)
    block10 = uniq("x", 10)
    shared16 = uniq("y", 16)
    a8, b8 = uniq("a", 8), uniq("b", 8)
    rows = [
        (1, shared12 + " " + uniq("p", 10)),
        (2, shared12 + " " + uniq("q", 10)),
        (3, block10 + " " + uniq("f", 10) + " " + block10),
        (4, uniq("z", 25)),
        (5, shared16 + " " + uniq("v", 5)),
        (6, shared16 + " " + uniq("w", 5)),
        (7, a8 + " " + b8),
        (8, a8 + " " + uniq("c", 8)),
        (9, uniq("d", 8) + " " + b8),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start): (r.span_end, r.span_tokens, r.n_grams)
        for r in duplicate_spans(docs).collect()
    }
    assert got[(1, 0)] == (11, 12, 5)  # shared prefix, 5 grams merged
    assert got[(2, 0)] == (11, 12, 5)
    assert got[(3, 0)] == (9, 10, 3)  # within-doc repeat: two islands
    assert got[(3, 20)] == (29, 10, 3)
    assert got[(5, 0)] == (15, 16, 9)
    assert got[(6, 0)] == (15, 16, 9)
    # doc 7: dup grams at pos 0 (A-block, shared with doc 8) and pos 8
    # (B-block, shared with doc 9); boundary-crossing grams unique ->
    # gap == k, islands MERGE into one 16-token span of 2 grams
    assert got[(7, 0)] == (15, 16, 2)
    assert got[(8, 0)] == (7, 8, 1)
    assert got[(9, 8)] == (15, 8, 1)
    assert not any(d == 4 for d, _ in got), got  # unique doc: no rows
    assert len(got) == 9, got


def test_semdedup_cell_capacity_rule():
    """The t47 cell-count rule: the N_CELLS floor at fixture scale
    (gate SF unchanged — 2k vectors / 2000 target = 1 -> floor 16),
    one cell per SEMDEDUP_TARGET_CELL_ROWS above it (sf5.0 100k ->
    50, sf10 200k -> 100), sample-bounded at KMEANS_SAMPLE // 8."""
    from fsharp_mapreduce_spark.functions.similarity import (
        KMEANS_SAMPLE,
        N_CELLS,
        semdedup_cells_for,
    )

    assert semdedup_cells_for(200) == N_CELLS
    assert semdedup_cells_for(2_000) == N_CELLS
    assert semdedup_cells_for(100_000) == 50
    assert semdedup_cells_for(200_000) == 100
    assert semdedup_cells_for(10**9) == KMEANS_SAMPLE // 8


def test_t49_pii_planted_fixture(spark):
    """Planted-PII fixture (VERDICT r10 #4): exact match counts AND
    exact redacted strings for each pattern class, multi-hit docs,
    adjacency (SSN next to phone — the 3-2-4 / 3-3-4 shapes must not
    cross-match), and a PII-free doc that must emit zero everywhere."""
    from fsharp_mapreduce_spark.functions.text import pii_redact

    rows = [
        (1, "write to alice.smith+x@sub.example.org today"),
        (2, "call 555-867-5309 or 555-123-4567 now"),
        (3, "server at 192.168.10.7 and 10.0.0.1 responded"),
        (4, "ssn 123-45-6789 on file"),
        (5, "mix bob@ex.co 555-111-2222 172.16.254.3 987-65-4321 end"),
        (6, "no pii here just words"),
        (7, "adjacent 123-45-6789 555-123-4567 shapes"),
    ]
    got = {
        r.doc_id: r
        for r in pii_redact(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    want = {
        1: (1, 0, 0, 0, "write to <EMAIL> today"),
        2: (0, 2, 0, 0, "call <PHONE> or <PHONE> now"),
        3: (0, 0, 2, 0, "server at <IP> and <IP> responded"),
        4: (0, 0, 0, 1, "ssn <ID> on file"),
        5: (1, 1, 1, 1, "mix <EMAIL> <PHONE> <IP> <ID> end"),
        6: (0, 0, 0, 0, "no pii here just words"),
        7: (0, 1, 0, 1, "adjacent <ID> <PHONE> shapes"),
    }
    for doc_id, (ne, np_, ni, ns, red) in want.items():
        r = got[doc_id]
        assert (r.n_email, r.n_phone, r.n_ipv4, r.n_ssn) == (ne, np_, ni, ns), (
            doc_id,
            r,
        )
        assert r.redacted == red, (doc_id, r.redacted)


def test_t50_bigram_lm_exact_values(spark):
    """t50's model fit and integer log-mass replayed in pure Python on
    a hand-built corpus: exact lp sums (the scaled-BIGINT discipline),
    exact bigram counts, and the ordering property the filter exists
    for — a predictable doc scores strictly lower cross-entropy than a
    doc of one-off bigrams under the SAME corpus model."""
    import math
    from collections import Counter

    from fsharp_mapreduce_spark.functions.text import LM_SCALE, bigram_lm_score

    rows = [(1, "a b a b a b a b"), (2, "c d e f g h i j")]
    got = {
        r.doc_id: r
        for r in bigram_lm_score(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }

    # pure-python replay of the documented algorithm
    docs = {i: t.split(" ") for i, t in rows}
    bigrams = {i: list(zip(t, t[1:])) for i, t in docs.items()}
    lm = Counter(b for bs in bigrams.values() for b in bs)
    ctx = Counter()
    for (w1, _), c in lm.items():
        ctx[w1] += c
    vocab = {w for (w1, w2) in lm for w in (w1, w2)}
    for i, bs in bigrams.items():
        lps = [
            math.floor(
                math.log((lm[b] + 1.0) / (ctx[b[0]] + len(vocab))) * LM_SCALE + 0.5
            )
            for b in bs
        ]
        assert got[i].n_bigrams == len(bs), (i, got[i])
        assert got[i].sum_logp_scaled == sum(lps), (i, got[i], sum(lps))
        want_xent = round(-sum(lps) / (len(lps) * LM_SCALE * math.log(2)), 4)
        assert abs(got[i].cross_entropy - want_xent) < 1e-9, (i, got[i], want_xent)
    # the point of the filter: repetitive/predictable < token soup
    assert got[1].cross_entropy < got[2].cross_entropy, got


def test_t51_nb_classifier_exact_replay(spark):
    """t51's NB fit, smoothing, integer log-mass, argmax tie-break,
    and margin replayed in pure Python on a hand-built labeled corpus
    — plus the semantic property the classifier exists for: a document
    made of class-x tokens predicts class x under the corpus model."""
    import math
    from collections import Counter

    from fsharp_mapreduce_spark.functions.text import NB_SCALE, nb_classify

    rows = [
        (1, "a a b", "x"),
        (2, "b b c c c", "y"),
        (3, "a b a", "x"),
        (4, "c c b", "y"),
        (5, "a a a", "x"),
    ]
    got = {
        r.doc_id: r
        for r in nb_classify(
            spark.createDataFrame(rows, "doc_id long, text string, lang string")
        ).collect()
    }

    docs = {i: (t.split(" "), c) for i, t, c in rows}
    cnt: Counter = Counter()
    n_docs: Counter = Counter()
    for toks, c in docs.values():
        n_docs[c] += 1
        for w in toks:
            cnt[(c, w)] += 1
    classes = sorted(n_docs)
    tot = {c: sum(m for (cc, _), m in cnt.items() if cc == c) for c in classes}
    vocab = {w for (_, w) in cnt}
    n_all = sum(n_docs.values())
    pri = {
        c: math.floor(math.log(n_docs[c] / n_all) * NB_SCALE + 0.5)
        for c in classes
    }
    for i, (toks, actual) in docs.items():
        scores = {}
        for c in classes:
            lp = sum(
                math.floor(
                    math.log((cnt[(c, w)] + 1.0) / (tot[c] + len(vocab)))
                    * NB_SCALE
                    + 0.5
                )
                for w in toks
            )
            scores[c] = lp + pri[c]
        ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        pred, best = ordered[0]
        margin = best - ordered[1][1] if len(ordered) > 1 else 0
        r = got[i]
        assert r.pred_lang == pred, (i, r, ordered)
        assert r.score_scaled == best, (i, r, ordered)
        assert r.margin_scaled == margin, (i, r, ordered)
        assert r.is_correct == (pred == actual), (i, r)
        assert r.lang == actual
    # the filter's point: the all-'a' doc lands in the a-heavy class
    assert got[5].pred_lang == "x", got[5]
    assert got[2].pred_lang == "y", got[2]


def test_q71_profile_counts_nulls_and_ranges(spark):
    """q71's profile() on a crafted frame with planted nulls and known
    ranges: null counts, exact cardinalities, 4-dp numeric rounding,
    epoch-microsecond timestamp ranges, lexicographic string ranges,
    and the NULL-typed off-diagonal columns of the unpivot."""
    import datetime

    from fsharp_mapreduce_spark.functions.audit import profile

    rows = [
        (1, 2.5004999, "b", datetime.datetime(2024, 1, 1, 0, 0, 0)),
        (2, None, "a", datetime.datetime(2024, 1, 2, 3, 4, 5)),
        (None, 7.25, None, None),
        (1, 2.5004999, "c", datetime.datetime(2024, 1, 1, 0, 0, 0)),
    ]
    df = spark.createDataFrame(
        rows, "k long, x double, s string, ts timestamp"
    )
    got = {
        r.column_name: r
        for r in profile(df, ["k", "x"], ["s"], ["ts"]).collect()
    }
    assert set(got) == {"k", "x", "s", "ts"}
    assert all(r.n_rows == 4 for r in got.values())
    assert (got["k"].n_null, got["k"].n_distinct) == (1, 2)
    assert (got["k"].min_num, got["k"].max_num) == (1.0, 2.0)
    assert got["k"].min_str is None and got["k"].max_str is None
    assert (got["x"].n_null, got["x"].n_distinct) == (1, 2)
    assert (got["x"].min_num, got["x"].max_num) == (2.5005, 7.25)
    assert (got["s"].n_null, got["s"].n_distinct) == (1, 3)
    assert (got["s"].min_str, got["s"].max_str) == ("a", "c")
    assert got["s"].min_num is None and got["s"].max_num is None
    epoch = datetime.datetime(1970, 1, 1)
    lo = (datetime.datetime(2024, 1, 1) - epoch).total_seconds() * 1_000_000
    hi = (datetime.datetime(2024, 1, 2, 3, 4, 5) - epoch).total_seconds() * 1_000_000
    assert (got["ts"].n_null, got["ts"].n_distinct) == (1, 2)
    assert (got["ts"].min_num, got["ts"].max_num) == (lo, hi)
