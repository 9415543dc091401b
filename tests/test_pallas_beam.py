"""Packed-neighbour beam expansion: kernel parity + end-to-end query path.

Runs in Pallas interpret mode on CPU; the same code compiles to Mosaic on
TPU (timed in tools/perf_pallas_gather.py and bench.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
from expann_tpu.ops.pallas_beam import build_packed, packed_score


def _toy_graph(rng, n=300, d=128, r=40):
    x = rng.standard_normal((n, d)).astype(np.float32)
    vecs = jnp.asarray(np.concatenate([x, np.zeros((1, d), np.float32)]))
    norms = jnp.concatenate([jnp.sum(vecs[:n] ** 2, 1), jnp.array([np.inf])])
    adj = rng.integers(0, n, (n + 1, r)).astype(np.int32)
    adj[:, -5:] = n  # sentinel padding slots
    adj[n] = n
    return x, vecs, norms, jnp.asarray(adj)


def test_packed_score_matches_gather_scoring():
    rng = np.random.default_rng(0)
    n, d, r = 300, 128, 40
    x, vecs, norms, adj = _toy_graph(rng, n, d, r)
    packed, aux = build_packed(vecs, norms, adj, dtype=jnp.float32)
    assert packed.shape[1] == 48  # r=40 rounded to the sublane quantum
    assert aux.shape[2] == 128  # aux tile lane-padded

    B, E = 16, 4
    sel = jnp.asarray(rng.integers(0, n + 1, (B, E)).astype(np.int32))
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    pd, ids = packed_score(packed, aux, sel, q, interpret=True)
    qn = np.sum(np.asarray(q) ** 2, axis=1)
    got_d = np.asarray(pd) + qn[:, None]

    adj_np = np.asarray(
        jnp.concatenate([adj, jnp.full((n + 1, 88), n, jnp.int32)], axis=1)
    )
    nbrs = adj_np[np.asarray(sel)].reshape(B, -1)
    nv = np.asarray(vecs)[nbrs]
    nn = np.asarray(norms)[nbrs]
    exp_d = qn[:, None] + nn - 2 * np.einsum("bd,bkd->bk", np.asarray(q), nv)

    assert (np.asarray(ids) == nbrs).all()
    finite = np.isfinite(exp_d)
    assert (np.isfinite(got_d) == finite).all()
    np.testing.assert_allclose(got_d[finite], exp_d[finite], rtol=2e-5, atol=1e-3)


def test_packed_score_topt_extraction():
    """In-kernel top-t must equal sorting the full scores and taking t."""
    rng = np.random.default_rng(7)
    n, d, r = 300, 128, 40
    x, vecs, norms, adj = _toy_graph(rng, n, d, r)
    packed, aux = build_packed(vecs, norms, adj, dtype=jnp.float32)

    B, E, t = 16, 4, 8
    sel = jnp.asarray(rng.integers(0, n + 1, (B, E)).astype(np.int32))
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    fd, fi = packed_score(packed, aux, sel, q, interpret=True)
    td, ti = packed_score(packed, aux, sel, q, topt=t, interpret=True)
    R = aux.shape[2]  # full (untruncated) output width is the aux tile
    fd = np.asarray(fd).reshape(B, E, R)
    fi = np.asarray(fi).reshape(B, E, R)
    td = np.asarray(td).reshape(B, E, t)
    ti = np.asarray(ti).reshape(B, E, t)
    order = np.argsort(fd, axis=-1, kind="stable")
    want_d = np.take_along_axis(fd, order, -1)[:, :, :t]
    np.testing.assert_allclose(
        np.where(np.isinf(td), 1e30, td),
        np.where(np.isinf(want_d), 1e30, want_d),
        rtol=1e-6,
    )
    # ids must match where distances are finite and unique
    want_i = np.take_along_axis(fi, order, -1)[:, :, :t]
    uniq = np.isfinite(want_d)
    assert (ti == want_i)[uniq].mean() > 0.99  # ties may reorder ids


def test_packed_score_sentinel_rows_all_inf():
    rng = np.random.default_rng(1)
    n, d, r = 100, 128, 16
    _, vecs, norms, adj = _toy_graph(rng, n, d, r)
    packed, aux = build_packed(vecs, norms, adj, dtype=jnp.float32)
    sel = jnp.full((8, 2), n, jnp.int32)  # expand only the sentinel node
    q = jnp.asarray(rng.standard_normal((8, d)).astype(np.float32))
    pd, ids = packed_score(packed, aux, sel, q, interpret=True)
    assert np.isinf(np.asarray(pd)).all()
    assert (np.asarray(ids) == n).all()


@pytest.mark.parametrize("expand", [1, 4])
def test_query_packed_matches_plain(expand):
    rng = np.random.default_rng(2)
    n, d, k = 600, 32, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((40, d)).astype(np.float32)

    # exact ground truth
    d2 = ((queries[:, None] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]

    def recall(ids):
        return np.mean([len(set(a) & set(b)) / k for a, b in zip(ids, gt)])

    results = {}
    for use_packed in (False, True):
        cfg = AntitopoConfig(
            M=12,
            ef_construction=60,
            ef_search=40,
            query_expand=expand,
            use_packed=use_packed,
            seed=0,
        )
        eng = AntitopoEngine(config=cfg)
        eng.store_many_vectors(x)
        eng.build()
        results[use_packed] = eng.query_k_batch(queries, k)

    r_plain = recall(results[False])
    r_packed = recall(results[True])
    # bf16 packed scoring + exact f32 rerank should track the plain path
    assert r_packed >= r_plain - 0.02, (r_packed, r_plain)
    assert r_packed > 0.9


def test_aux_ids_survive_beyond_2pow24():
    """Ids ride the f32 aux tile as BIASED int32 bit patterns
    (encode_ids_f32: normal-range floats — raw bits of small ids would be
    denormals, which TPU float datapaths flush to zero), so ids >= 2^24 —
    where f32 value-encoding loses integers — round-trip exactly through
    the packed serving path.  Lifts the round-2 ceiling on the flagship
    path (COMPONENTS.md divergence #3: the graph engine is the scalable
    path, so it must address > 16.7M rows; the encoding is exact to
    2^29)."""
    from expann_tpu.ops.pallas_beam import decode_ids_f32, encode_ids_f32

    rng = np.random.default_rng(4)
    n, d, r = 64, 128, 16
    x, vecs, norms, adj = _toy_graph(rng, n, d, r)
    packed, aux = build_packed(vecs, norms, adj, dtype=jnp.float32)

    # encode/decode round-trip across the full range incl. > 2^24
    probe = jnp.asarray(
        np.array([0, 1, 2**23 - 1, 2**24, 2**24 + 1, 2**29 - 1], np.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(decode_ids_f32(encode_ids_f32(probe))), np.asarray(probe)
    )
    # and the encoded carriers are NORMAL floats (no flush hazard)
    carriers = np.abs(np.asarray(encode_ids_f32(probe)))
    assert (carriers >= np.finfo(np.float32).tiny).all()

    # overwrite the id lane with ids far above 2^24 (value-cast f32 would
    # corrupt these: e.g. 2**24 + 1 == float32(2**24))
    big = (2**24 + 1 + np.arange(aux.shape[0] * aux.shape[2])).reshape(
        aux.shape[0], aux.shape[2]
    ).astype(np.int32)
    aux_big = np.array(aux)  # writable copy
    aux_big[:, 1, :] = np.asarray(encode_ids_f32(jnp.asarray(big)))
    aux_big = jnp.asarray(aux_big)

    B, E = 8, 2
    sel = jnp.asarray(rng.integers(0, n, (B, E)).astype(np.int32))
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    _, ids = packed_score(packed, aux_big, sel, q, interpret=True)
    ids = np.asarray(ids).reshape(B, E, -1)
    sel_np = np.asarray(sel)
    for b in range(B):
        for e in range(E):
            want = big[sel_np[b, e], : ids.shape[2]]
            got = ids[b, e]
            assert (got == want).all(), (b, e, got[:4], want[:4])
    # sanity: a value-cast would NOT have survived
    assert (np.float32(2**24 + 1) == np.float32(2**24)).all()
