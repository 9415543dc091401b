"""Estimate the straggler cost of per-tile termination in the fused kernel.

A query tile (qt rows) runs until its SLOWEST query converges, so kernel
time is proportional to sum-over-tiles of max(per-query iterations).
Per-query iteration counts are ESTIMATED from the kernel's distcomp
counters as (ncomp - entry_scan) / (RS*E): an UNDERESTIMATE near
convergence, where a query with fewer than E unexpanded finite entries
is charged RS per actually-selected block only.  The bias applies
equally under every candidate ordering, so the current/oracle/proxy
tile-cost RATIOS remain meaningful even though absolute iteration
counts are low.  This probe measures:

  * the per-query iteration distribution on the canonical 56k config,
  * the tile cost under the CURRENT (random) query order,
  * the tile cost under an ORACLE order (sort by true iters), and
  * the tile cost under the implementable PROXY order (sort by best
    entry-seed distance, available before the kernel launches).

If proxy ~ oracle and the saving is >15%, a sort-by-entry-distance
permutation around fused_search is worth wiring in.

Usage: python tools/probe_straggler.py [n] [ef] [Q] [qt]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tile_cost(iters: np.ndarray, qt: int) -> float:
    it = iters.reshape(-1, qt)
    return float(it.max(axis=1).sum())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 56000
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 110
    Q = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    qt = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    import jax.numpy as jnp

    from expann_tpu.data.loader import load_synthetic_uniform_sphere_points
    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine

    ds = load_synthetic_uniform_sphere_points(n=n, m=400, k=10, d=128)
    cfg = AntitopoConfig(
        M=60, ef_construction=500, ortho_count=1, prune_overflow=1,
        prune_cand=500, precision="default",
        query_expand=2, fused_cand=16, fused_qt=qt, query_block=Q,
        entry_seeds=8, ef_search=ef, packed_dtype="i8",
        index_filename=f"/tmp/perf_fused_idx_{n}.npz",
        read_index=True, write_index=True,
    )
    eng = AntitopoEngine(config=cfg)
    eng.store_many_vectors(ds.vecs)
    t0 = time.time()
    eng.build()
    print(f"build/load: {time.time() - t0:.1f}s", flush=True)

    eng._resolve_packed()  # attach the packed layout (lazy on first query)
    g = eng.graph
    RS = g.packed.shape[1]
    E = cfg.query_expand
    per_iter = RS * E

    rng = np.random.default_rng(7)
    q = rng.standard_normal((Q, 128)).astype(np.float32)

    # per-query ncomp via the engine counters' plumbing: call the fused
    # path directly to get the rows
    from expann_tpu.models.search import fused_query_batch

    eng.set_ef_search(ef)
    ids, _, ncomp = fused_query_batch(
        g, jnp.asarray(q), ef, 10, ef_cap=128, expand=E,
        cand=cfg.fused_cand, qt=qt, seeds=cfg.entry_seeds,
    )
    ncomp = np.asarray(ncomp)
    # subtract the (uniform) entry-scan charge
    extra = int(g.entry_members_n) if g.entry_members_n is not None else 0
    iters = (ncomp - extra) / per_iter
    print(
        f"iters/query: mean {iters.mean():.1f} median {np.median(iters):.0f} "
        f"p90 {np.percentile(iters, 90):.0f} max {iters.max():.0f}",
        flush=True,
    )

    # proxy key: best entry-seed distance (recompute the entry scan)
    qj = jnp.asarray(q)
    qk = jnp.clip(
        jnp.round((qj - g.packed_center) * g.packed_scale), -127.0, 127.0
    )
    qkn = jnp.sum(qk * qk, axis=1)
    mem = g.entry_members
    mv = g.packed_codes[mem].astype(jnp.float32)
    mn = g.packed_code_norms[mem]
    md = mn[None, :] + qkn[:, None] - 2.0 * qk @ mv.T
    key = np.asarray(jnp.min(md, axis=1))

    cur = tile_cost(iters, qt)
    oracle = tile_cost(np.sort(iters), qt)
    proxy = tile_cost(iters[np.argsort(key)], qt)
    mean_bound = iters.mean() * (Q // qt)  # perfect (unreachable) packing
    print(f"tile-iter cost  current: {cur:.0f}")
    print(f"tile-iter cost   oracle: {oracle:.0f}  ({cur / oracle:.3f}x saving)")
    print(f"tile-iter cost    proxy: {proxy:.0f}  ({cur / proxy:.3f}x saving)")
    print(f"lower bound (mean*T): {mean_bound:.0f}")
    r = np.corrcoef(key, iters)[0, 1]
    print(f"proxy corr(entry_d, iters) = {r:.3f}")


if __name__ == "__main__":
    main()
