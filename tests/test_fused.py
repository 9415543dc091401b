"""Fully fused in-kernel traversal (ops/pallas_fused.py): interpret-mode
parity on CPU; the same kernel compiles to Mosaic on TPU (measured in
tools/perf_fused.py and bench.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
from expann_tpu.ops.pallas_beam import build_packed
from expann_tpu.ops.pallas_fused import fused_search


def _build(x, expand=1, use_fused=True, qt=8, cand=8, ef=40, packed_dtype="bf16"):
    cfg = AntitopoConfig(
        M=12,
        ef_construction=60,
        ef_search=ef,
        query_expand=expand,
        use_packed=True,
        use_fused=use_fused,
        fused_qt=qt,
        fused_cand=cand,
        packed_dtype=packed_dtype,
        seed=0,
    )
    eng = AntitopoEngine(config=cfg)
    eng.store_many_vectors(x)
    eng.build()
    return eng


@pytest.mark.parametrize("expand,cand", [(1, 8), (2, 8), (4, 16)])
def test_query_fused_matches_packed(expand, cand):
    rng = np.random.default_rng(2)
    n, d, k = 600, 32, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((40, d)).astype(np.float32)
    d2 = ((queries[:, None] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]

    def recall(ids):
        return np.mean([len(set(a) & set(b)) / k for a, b in zip(ids, gt)])

    packed_eng = _build(x, expand=expand, use_fused=False)
    fused_eng = _build(x, expand=expand, cand=cand)
    r_packed = recall(packed_eng.query_k_batch(queries, k))
    ids = fused_eng.query_k_batch(queries, k)
    r_fused = recall(ids)
    # the fused merge keeps cand candidates per iteration vs the packed
    # path's full sort; the gap must stay within noise (VERDICT r4 gate
    # tightening: 0.02 at equal ef, so a seeded ~4-point regression in the
    # flagship kernel fails the suite)
    assert r_fused >= r_packed - 0.02, (r_fused, r_packed)
    assert r_fused > 0.9
    # duplicate-free results (the reference's basic_bench assertion)
    for row in ids:
        valid = row[(row >= 0) & (row < n)]
        assert len(set(valid.tolist())) == len(valid)
    assert fused_eng.num_distcomps > 0


def test_query_fused_i8_matches_bf16():
    """s8 packed blocks (code-space scoring + exact f32 rerank) must match
    the bf16 fused path's recall within a small quantization give."""
    rng = np.random.default_rng(4)
    n, d, k = 600, 32, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((40, d)).astype(np.float32)
    d2 = ((queries[:, None] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]

    def recall(ids):
        return np.mean([len(set(a) & set(b)) / k for a, b in zip(ids, gt)])

    bf16_eng = _build(x, expand=2, cand=16)
    i8_eng = _build(x, expand=2, cand=16, packed_dtype="i8")
    assert i8_eng.graph is not None
    r_bf16 = recall(bf16_eng.query_k_batch(queries, k))
    ids = i8_eng.query_k_batch(queries, k)
    r_i8 = recall(ids)
    assert i8_eng.graph.packed.dtype == jnp.int8
    assert r_i8 >= r_bf16 - 0.03, (r_i8, r_bf16)
    for row in ids:
        valid = row[(row >= 0) & (row < n)]
        assert len(set(valid.tolist())) == len(valid)


def test_query_wire_i8_matches_bf16_wire():
    """query_wire='i8' ships 1 B/dim absmax codes + per-query scales and
    dequantizes in-trace (models/search.fused_query_batch); only the query
    itself is perturbed (corpus untouched), so recall must track the bf16
    wire within the query-quantization noise band."""
    rng = np.random.default_rng(11)
    n, d, k = 600, 32, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((40, d)).astype(np.float32)
    d2 = ((queries[:, None] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]

    def recall(ids):
        return np.mean([len(set(a) & set(b)) / k for a, b in zip(ids, gt)])

    bf16_eng = _build(x, expand=2, cand=16)
    i8w_eng = _build(x, expand=2, cand=16)
    i8w_eng.cfg.query_wire = "i8"
    r_bf16 = recall(bf16_eng.query_k_batch(queries, k))
    ids = i8w_eng.query_k_batch(queries, k)
    r_i8w = recall(ids)
    assert r_i8w >= r_bf16 - 0.02, (r_i8w, r_bf16)
    for row in ids:
        valid = row[(row >= 0) & (row < n)]
        assert len(set(valid.tolist())) == len(valid)
    # exact-match probes survive the wire: self-queries return themselves
    probe = [7, 123, 400]
    pids = i8w_eng.query_k_batch(x[probe], k)
    for want, row in zip(probe, pids):
        assert int(row[0]) == want, (want, row)


def test_fused_i8_zero_distance_queries():
    """Queries that EQUAL stored vectors produce exact-zero code-space
    distances — the pack_keys floor path (zero would be a subnormal key
    whose lane bits FTZ hardware could flush; ops/pallas_fused.py).  The
    matching id must come back first with ~zero distance."""
    rng = np.random.default_rng(9)
    n, d, k = 500, 32, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    eng = _build(x, expand=2, cand=16, packed_dtype="i8")
    probe = [3, 57, 211, 499]
    ids = eng.query_k_batch(x[probe], k)
    for want, row in zip(probe, ids):
        assert int(row[0]) == want, (want, row)


@pytest.mark.parametrize("merge", ["topt", "count", "pair"])
def test_fused_search_exact_on_full_beam(merge):
    """With ef >= n, full candidate keep, and a complete adjacency, one
    expansion wave reaches everything: the beam must equal exact top-n."""
    rng = np.random.default_rng(5)
    n, d = 60, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    # complete graph: every node's adjacency lists all nodes
    vecs = jnp.asarray(
        np.concatenate(
            [np.pad(x, ((0, 0), (0, 128 - d))), np.zeros((1, 128), np.float32)]
        )
    )
    norms = jnp.concatenate(
        [jnp.sum(vecs[:n] ** 2, 1), jnp.array([np.inf])]
    )
    adj = jnp.asarray(
        np.tile(np.arange(n, dtype=np.int32), (n + 1, 1))
    )
    packed, aux = build_packed(vecs, norms, adj, dtype=jnp.float32)

    B, EF, ef = 8, 128, 120
    q = rng.standard_normal((B, d)).astype(np.float32)
    qp = jnp.asarray(np.pad(q, ((0, 0), (0, 128 - d))))
    qn = np.sum(q**2, axis=1)
    bd0 = jnp.full((B, EF), jnp.inf, jnp.float32).at[:, 0].set(
        jnp.asarray(qn + np.sum(x[0] ** 2) - 2 * q @ x[0])
    )
    bi0 = jnp.full((B, EF), n, jnp.int32).at[:, 0].set(0)
    ids, dists, ncomp, iters = fused_search(
        packed, aux, qp, bd0, bi0, ef=ef, expand=1, cand=64,
        qt=8, interpret=True, merge=merge,
    )
    ids = np.asarray(ids)
    d2 = ((q[:, None] - x[None]) ** 2).sum(-1)
    want = np.sort(d2, axis=1)[:, :n]
    for b in range(B):
        got = sorted(int(i) for i in ids[b] if i < n)
        assert got == sorted(
            np.argsort(d2[b])[: len(got)].tolist()
        ) or set(np.argsort(d2[b])[:ef].tolist()) >= set(got)
        # all n nodes fit in the ef=120 beam: the result must be exactly
        # the full corpus; distance tolerance is bf16-level so the
        # optional bf16-carry mode (dbg="bf16carry") passes unchanged —
        # callers rerank in exact f32 either way
        assert len(got) == n
        gd = np.sort(np.asarray(dists)[b][np.asarray(ids)[b] < n])
        np.testing.assert_allclose(gd, want[b], rtol=2e-2, atol=0.5)
    assert int(np.asarray(iters).max()) <= n + 2
    assert int(np.asarray(ncomp).sum()) > 0


@pytest.mark.parametrize("merge", ["topt", "count", "pair"])
def test_fused_search_dedup_under_maximal_overlap(merge):
    """Adversarial dedup check for the merge's dup logic: on a COMPLETE
    graph with expand=2 both expanded blocks offer the SAME candidate
    list every iteration (maximal cross-segment duplication), and every
    iteration re-offers nodes already in the beam.  The beam must stay
    duplicate-free and still converge to the exact top-n.  Exercises
    both the "topt" off-chain dup checks and the "count" running-beam
    dup checks (ops/pallas_fused.py)."""
    rng = np.random.default_rng(17)
    n, d = 60, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    vecs = jnp.asarray(
        np.concatenate(
            [np.pad(x, ((0, 0), (0, 128 - d))), np.zeros((1, 128), np.float32)]
        )
    )
    norms = jnp.concatenate([jnp.sum(vecs[:n] ** 2, 1), jnp.array([np.inf])])
    adj = jnp.asarray(np.tile(np.arange(n, dtype=np.int32), (n + 1, 1)))
    packed, aux = build_packed(vecs, norms, adj, dtype=jnp.float32)

    B, EF, ef = 8, 128, 120
    q = rng.standard_normal((B, d)).astype(np.float32)
    qp = jnp.asarray(np.pad(q, ((0, 0), (0, 128 - d))))
    qn = np.sum(q**2, axis=1)
    bd0 = jnp.full((B, EF), jnp.inf, jnp.float32).at[:, 0].set(
        jnp.asarray(qn + np.sum(x[0] ** 2) - 2 * q @ x[0])
    )
    bi0 = jnp.full((B, EF), n, jnp.int32).at[:, 0].set(0)
    # cand covering the whole row: every unvisited neighbour is insertable
    # each iteration, so the beam must converge to the entire corpus
    ids, dists, _, _ = fused_search(
        packed, aux, qp, bd0, bi0, ef=ef, expand=2, cand=256,
        qt=8, interpret=True, merge=merge,
    )
    ids = np.asarray(ids)
    for b in range(B):
        got = [int(i) for i in ids[b] if i < n]
        # no duplicates, ever
        assert len(set(got)) == len(got), got
        # converged to the full corpus (n < ef)
        assert sorted(got) == list(range(n))
    # small cand: the per-segment extraction quota is spent on already-in-
    # beam nodes (documented divergence from the reference's uncapped
    # neighbour push) — the beam may stall early but must stay dup-free
    ids, _, _, _ = fused_search(
        packed, aux, qp, bd0, bi0, ef=ef, expand=2, cand=16,
        qt=8, interpret=True, merge=merge,
    )
    ids = np.asarray(ids)
    for b in range(B):
        got = [int(i) for i in ids[b] if i < n]
        assert len(set(got)) == len(got), got


def test_fused_group_wait_matches_eager_wait():
    """The opt-in dbg="group_wait" DMA-wait placement (per-8-query-group
    waits just before each group's matmul) must be result-identical to
    the default all-upfront wait.  Measured 24% SLOWER on device
    (BENCH_NOTES "DMA-wait placement") so it is opt-in, but the variant
    stays parity-tested.  Needs RS % 128 == 0 (the group-wait gate) and
    qt=16 so there are TWO groups — the second group's waits really run
    after the first group's compute."""
    rng = np.random.default_rng(23)
    n, d, R = 300, 32, 128
    x = rng.standard_normal((n, d)).astype(np.float32)
    vecs = jnp.asarray(
        np.concatenate(
            [np.pad(x, ((0, 0), (0, 128 - d))), np.zeros((1, 128), np.float32)]
        )
    )
    norms = jnp.concatenate([jnp.sum(vecs[:n] ** 2, 1), jnp.array([np.inf])])
    # random R=128 adjacency (RS = 128): row i lists 128 distinct others
    adj_np = np.empty((n + 1, R), np.int32)
    for i in range(n + 1):
        adj_np[i] = rng.choice(n, size=R, replace=False)
    adj = jnp.asarray(adj_np)
    packed, aux = build_packed(vecs, norms, adj, dtype=jnp.float32)
    assert packed.shape[1] % 128 == 0

    B, EF = 16, 128
    q = rng.standard_normal((B, d)).astype(np.float32)
    qp = jnp.asarray(np.pad(q, ((0, 0), (0, 128 - d))))
    qn = np.sum(q**2, axis=1)
    bd0 = jnp.full((B, EF), jnp.inf, jnp.float32).at[:, 0].set(
        jnp.asarray(qn + np.sum(x[0] ** 2) - 2 * q @ x[0])
    )
    bi0 = jnp.full((B, EF), n, jnp.int32).at[:, 0].set(0)

    outs = {}
    for dbg in ("", "group_wait"):
        ids, dists, ncomp, _ = fused_search(
            packed, aux, qp, bd0, bi0, ef=100, expand=2, cand=16,
            qt=16, interpret=True, dbg=dbg,
        )
        outs[dbg] = (np.asarray(ids), np.asarray(dists), np.asarray(ncomp))
    np.testing.assert_array_equal(outs[""][0], outs["group_wait"][0])
    np.testing.assert_array_equal(outs[""][1], outs["group_wait"][1])
    np.testing.assert_array_equal(outs[""][2], outs["group_wait"][2])
    # sanity: the search actually went somewhere
    assert (outs[""][0][:, 0] < n).all()


def test_fused_vpu_score_matches_matmul_score():
    """dbg="vpu_score" swaps the grouped MXU matmul + block-diagonal
    extraction for the broadcast-multiply VPU path (the RS<128 engine)
    at RS%128==0.  On the production s8 code path both engines are
    exact (s32 accumulate vs f32 sums of integers < 2^21) and agree
    bitwise; this f32-data test tolerates ULP-level accumulation-order
    differences in the distances while requiring identical ids."""
    rng = np.random.default_rng(29)
    n, d, R = 300, 32, 128
    x = rng.standard_normal((n, d)).astype(np.float32)
    vecs = jnp.asarray(
        np.concatenate(
            [np.pad(x, ((0, 0), (0, 128 - d))), np.zeros((1, 128), np.float32)]
        )
    )
    norms = jnp.concatenate([jnp.sum(vecs[:n] ** 2, 1), jnp.array([np.inf])])
    adj_np = np.empty((n + 1, R), np.int32)
    for i in range(n + 1):
        adj_np[i] = rng.choice(n, size=R, replace=False)
    adj = jnp.asarray(adj_np)
    packed, aux = build_packed(vecs, norms, adj, dtype=jnp.float32)
    assert packed.shape[1] % 128 == 0

    B, EF = 16, 128
    q = rng.standard_normal((B, d)).astype(np.float32)
    qp = jnp.asarray(np.pad(q, ((0, 0), (0, 128 - d))))
    qn = np.sum(q**2, axis=1)
    bd0 = jnp.full((B, EF), jnp.inf, jnp.float32).at[:, 0].set(
        jnp.asarray(qn + np.sum(x[0] ** 2) - 2 * q @ x[0])
    )
    bi0 = jnp.full((B, EF), n, jnp.int32).at[:, 0].set(0)

    outs = {}
    for dbg in ("", "vpu_score"):
        ids, dists, ncomp, _ = fused_search(
            packed, aux, qp, bd0, bi0, ef=100, expand=2, cand=16,
            qt=16, interpret=True, dbg=dbg,
        )
        outs[dbg] = (np.asarray(ids), np.asarray(dists), np.asarray(ncomp))
    np.testing.assert_array_equal(outs[""][0], outs["vpu_score"][0])
    finite = np.isfinite(outs[""][1]) & (outs[""][1] < 1e30)
    # rtol covers packed-key lane bits (low ~7 mantissa bits, <= ~1.6e-5
    # relative): the same node admitted from a different segment records
    # a different lane in its key's low bits
    np.testing.assert_allclose(
        outs[""][1][finite], outs["vpu_score"][1][finite], rtol=1e-4
    )
    np.testing.assert_array_equal(outs[""][2], outs["vpu_score"][2])
    assert (outs[""][0][:, 0] < n).all()


def test_sort_tiles_is_order_identical():
    """fused_sort_tiles permutes queries into similar-difficulty tiles
    and unpermutes the outputs — results must be identical (same ids,
    same per-query distcomp counts) to the unsorted path."""
    from expann_tpu.models.search import fused_query_batch

    rng = np.random.default_rng(3)
    x = rng.standard_normal((400, 64)).astype(np.float32)
    cfg = AntitopoConfig(
        M=8, ef_construction=48, use_packed=True, use_fused=True,
        fused_qt=8, query_expand=2, fused_cand=8, precision="default",
    )
    eng = AntitopoEngine(config=cfg)
    eng.store_many_vectors(x)
    eng.build()
    eng._resolve_packed()
    q = jnp.asarray(
        np.pad(rng.standard_normal((32, 64)).astype(np.float32), ((0, 0), (0, 64)))
    )
    a = fused_query_batch(
        eng.graph, q, 24, 5, qt=8, interpret=True, sort_tiles=False
    )
    b = fused_query_batch(
        eng.graph, q, 24, 5, qt=8, interpret=True, sort_tiles=True
    )
    # ids may differ only where distances tie; distances must match and
    # the counters may differ only via tile co-residency (iteration count
    # is per-tile), so check ids/distances exactly here: with qt=8 and
    # 32 queries the permutation changes tile membership, but each
    # query's own traversal is deterministic given its seed beam.
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=1e-6)


def test_sort_tiles_order_identical_i8():
    """Same order-identity on the s8 code-space path: sort_tiles permutes
    the QUANTIZED query array and the code-space seed beams; outputs must
    still be unpermuted exactly."""
    from expann_tpu.models.search import fused_query_batch

    rng = np.random.default_rng(9)
    x = rng.standard_normal((400, 64)).astype(np.float32)
    cfg = AntitopoConfig(
        M=8, ef_construction=48, use_packed=True, use_fused=True,
        fused_qt=8, query_expand=2, fused_cand=8, precision="default",
        packed_dtype="i8",
    )
    eng = AntitopoEngine(config=cfg)
    eng.store_many_vectors(x)
    eng.build()
    eng._resolve_packed()
    assert eng.graph.packed_codes is not None
    q = jnp.asarray(
        np.pad(rng.standard_normal((32, 64)).astype(np.float32), ((0, 0), (0, 64)))
    )
    a = fused_query_batch(
        eng.graph, q, 24, 5, qt=8, interpret=True, sort_tiles=False
    )
    b = fused_query_batch(
        eng.graph, q, 24, 5, qt=8, interpret=True, sort_tiles=True
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=1e-6)


def test_fused_count_merge_engine_recall():
    """Engine-level A/B of the merge modes: "count" offers ALL neighbours
    of each expanded node (the reference's heap semantics) instead of the
    top cand/E per segment, so at equal ef its recall must match or beat
    the quota-capped "topt" mode within noise, and results stay dup-free."""
    rng = np.random.default_rng(11)
    n, d, k = 800, 32, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((40, d)).astype(np.float32)
    d2 = ((queries[:, None] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]

    def recall(ids):
        return np.mean([len(set(a) & set(b)) / k for a, b in zip(ids, gt)])

    def build(merge):
        cfg = AntitopoConfig(
            M=12, ef_construction=60, ef_search=40, query_expand=2,
            use_packed=True, use_fused=True, fused_qt=8, fused_cand=8,
            fused_merge=merge, seed=0,
        )
        eng = AntitopoEngine(config=cfg)
        eng.store_many_vectors(x)
        eng.build()
        return eng

    r_topt = recall(build("topt").query_k_batch(queries, k))
    count_eng = build("count")
    ids = count_eng.query_k_batch(queries, k)
    r_count = recall(ids)
    assert r_count >= r_topt - 0.02, (r_count, r_topt)
    for row in ids:
        valid = row[(row >= 0) & (row < n)]
        assert len(set(valid.tolist())) == len(valid)
    assert count_eng.num_distcomps > 0


def test_multi_seed_entry_scan_on_clustered_data():
    """On multi-basin (clustered) data, single greedy descent can trap the
    beam in the wrong cluster; the dense multi-seed entry scan
    (entry_seeds > 0) must recover recall at equal ef."""
    from expann_tpu.data.loader import generate_synthetic_clustered

    x, queries = generate_synthetic_clustered(
        2000, 60, 24, n_clusters=24, sigma=0.25, seed=6
    )
    k = 10
    d2 = ((queries[:, None] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]

    def recall(ids):
        return np.mean([len(set(a) & set(b)) / k for a, b in zip(ids, gt)])

    def build(seeds):
        cfg = AntitopoConfig(
            M=8,
            ef_construction=48,
            ef_search=24,
            query_expand=1,
            use_packed=True,
            use_fused=True,
            fused_qt=8,
            fused_cand=8,
            entry_seeds=seeds,
            seed=0,
        )
        eng = AntitopoEngine(config=cfg)
        eng.store_many_vectors(x)
        eng.build()
        return eng

    base_eng = build(0)
    base = recall(base_eng.query_k_batch(queries, k))
    seeded_eng = build(8)
    seeded = recall(seeded_eng.query_k_batch(queries, k))
    assert seeded_eng.graph.entry_members is not None
    assert seeded >= base - 0.01, (seeded, base)
    assert seeded >= 0.9, (seeded, base)
    # distcomps must account for the dense entry scan
    assert seeded_eng.num_distcomps > base_eng.num_distcomps


def test_fused_respects_done_flag_early_exit():
    """Tiles whose queries all terminate must stop iterating early."""
    rng = np.random.default_rng(9)
    n, d = 400, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    eng = _build(x, expand=2, ef=20)
    q = rng.standard_normal((16, d)).astype(np.float32)
    ids = eng.query_k_batch(q, 5)
    assert ids.shape == (16, 5)
    assert (ids < n).all() and (ids >= 0).all()


def test_fused_pair_merge_engine_recall():
    """Engine-level A/B of the round-4 "pair" merge (pairwise top-k
    replacement, prefix-shifted around dup-suppressed candidates) against
    "topt": both keep exactly the top-EF of the offered candidate stream,
    so at equal ef their recall must match within noise and results stay
    dup-free."""
    rng = np.random.default_rng(17)
    n, d, k = 800, 32, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((40, d)).astype(np.float32)
    d2 = ((queries[:, None] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]

    def recall(ids):
        return np.mean([len(set(a) & set(b)) / k for a, b in zip(ids, gt)])

    def build(merge):
        cfg = AntitopoConfig(
            M=12, ef_construction=60, ef_search=40, query_expand=2,
            use_packed=True, use_fused=True, fused_qt=8, fused_cand=8,
            fused_merge=merge, seed=0,
        )
        eng = AntitopoEngine(config=cfg)
        eng.store_many_vectors(x)
        eng.build()
        return eng

    r_topt = recall(build("topt").query_k_batch(queries, k))
    pair_eng = build("pair")
    ids = pair_eng.query_k_batch(queries, k)
    r_pair = recall(ids)
    assert r_pair >= r_topt - 0.02, (r_pair, r_topt)
    for row in ids:
        valid = row[(row >= 0) & (row < n)]
        assert len(set(valid.tolist())) == len(valid)
    assert pair_eng.num_distcomps > 0
