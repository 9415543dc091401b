"""Batched anti-topo prune must reproduce the sequential oracle's greedy
selection exactly (same candidates in, same edges out, same order)."""

import numpy as np
import jax.numpy as jnp

from expann_tpu.models.prune import antitopo_prune, pairwise_co_dist
from expann_tpu.models.refbuild import SequentialOracle


def _oracle_prune(vecs, cands, cap, ortho_factor, ortho_bias, prune_overflow):
    o = SequentialOracle(
        M=cap,
        M0=cap,
        ortho_factor=ortho_factor,
        ortho_bias=ortho_bias,
        prune_overflow=prune_overflow,
    )
    o.vecs = [v for v in vecs]
    o.edges = [[list(cands)]]
    o.prune(0, 0, lazy=False)
    return [i for _, i in o.edges[0][0]]


def _batched_prune(vecs, cands, cap, ortho_factor, ortho_bias, prune_overflow):
    cands = sorted(cands)
    C = len(cands)
    cand_ids = np.array([[i for _, i in cands]], np.int32)
    cand_d = np.array([[d for d, _ in cands]], np.float32)
    cvecs = vecs[cand_ids[0]][None]  # (1, C, D)
    cnorms = (cvecs.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    co = pairwise_co_dist(jnp.asarray(cvecs), jnp.asarray(cnorms))
    sel_ids, sel_d = antitopo_prune(
        jnp.asarray(cand_ids),
        jnp.asarray(cand_d),
        co,
        cap=cap,
        ortho_factor=ortho_factor,
        ortho_bias=ortho_bias,
        prune_overflow=prune_overflow,
        sentinel=len(vecs),
    )
    out = np.asarray(sel_ids)[0]
    return [int(i) for i in out if i < len(vecs)]


def _run_case(seed, n, d, cap, overflow, factor=0.5, bias=0.0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    target = rng.standard_normal(d).astype(np.float32)
    cands = [
        (float(((vecs[i] - target) ** 2).sum()), i) for i in range(n)
    ]
    want = _oracle_prune(vecs, cands, cap, factor, bias, overflow)
    got = _batched_prune(vecs, cands, cap, factor, bias, overflow)
    assert got == want, f"seed={seed} cap={cap} overflow={overflow}"


def test_prune_matches_oracle_overflow0():
    for seed in range(5):
        _run_case(seed, n=40, d=16, cap=8, overflow=0)


def test_prune_matches_oracle_overflow1():
    for seed in range(5):
        _run_case(seed + 100, n=40, d=16, cap=8, overflow=1)


def test_prune_matches_oracle_large_bias():
    _run_case(7, n=60, d=8, cap=10, overflow=0, factor=2.0, bias=0.5)


def test_prune_cap_exceeds_candidates():
    _run_case(11, n=6, d=4, cap=10, overflow=0)
