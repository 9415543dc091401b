"""Per-iteration cost breakdown of the fused traversal kernel.

Runs fused_search at a FIXED iteration cap (max_iters small enough that no
tile terminates early) with components disabled one at a time, and prints
the per-tile-iteration cost of each configuration.  Fresh random queries
per timed call (identical dispatches dedup on this host).

Usage: python tools/probe_fused_cost.py [n=8000] [E=4] [C=32] [QT=8] [pdt=bf16]
Env: PROBE_ITERS (default 24), PROBE_DBG (';'-separated dbg strings)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from expann_tpu.utils import runtime  # noqa: F401


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    QT = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    PDT = sys.argv[5] if len(sys.argv) > 5 else "bf16"

    import jax
    import jax.numpy as jnp

    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
    from expann_tpu.data.loader import load_synthetic_uniform_sphere_points
    from expann_tpu.ops.pallas_fused import fused_search

    d, ef, EF, ITERS, B = 128, 120, 128, int(os.environ.get('PROBE_ITERS', 24)), 8192
    ds = load_synthetic_uniform_sphere_points(n=n, m=400, k=10, d=d)
    cfg = AntitopoConfig(
        M=60, ef_construction=500, ortho_count=1, prune_overflow=1,
        prune_cand=500, precision="default", packed_dtype=PDT,
        index_filename=f"/tmp/perf_fused_idx_{n}.npz",
        read_index=True, write_index=True,
    )
    eng = AntitopoEngine(config=cfg)
    eng.store_many_vectors(ds.vecs)
    eng.build()
    eng._resolve_packed()
    g = eng.graph
    sentinel = g.sentinel
    rng = np.random.default_rng(11)

    @jax.jit
    def prep(qs):
        ep = jnp.zeros((B,), jnp.int32)
        bd0 = jnp.full((B, EF), jnp.inf, jnp.float32).at[:, 0].set(0.0)
        bi0 = jnp.full((B, EF), sentinel, jnp.int32).at[:, 0].set(ep)
        return bd0, bi0

    def run(dbg, cand=C, expand=E):
        def call():
            qs = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
            bd0, bi0 = prep(qs)
            ids, _, nc, it = fused_search(
                g.packed, g.packed_aux, qs, bd0, bi0,
                ef=ef, expand=expand, cand=cand, max_iters=ITERS, qt=QT,
                dbg=dbg,
            )
            return ids, it

        ids, it = call()
        ids.block_until_ready()
        assert int(np.asarray(it).min()) == ITERS, np.asarray(it).min()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ids, _ = call()
            ids.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        per_iter = best / (B / QT) / ITERS
        print(f"{dbg or 'full':>28s} E={expand} C={cand} QT={QT}:"
              f" {best*1e3:7.1f} ms -> {per_iter*1e6:6.2f} us/tile-iter",
              flush=True)
        return per_iter

    for dbg in (os.environ.get("PROBE_DBG") or "nodone,fori,minimal").split(";"):
        run(dbg.strip())


if __name__ == "__main__":
    main()
