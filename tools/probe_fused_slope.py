"""Noise-robust per-iteration cost breakdown of the fused kernel.

The single-dispatch probe (probe_fused_cost.py) is polluted on this host:
the axon tunnel adds ~100ms wall variance per dispatch, swamping a single
timed dispatch.  This probe instead measures PRODUCTION-SHAPED runs —
Q queries in pipelined chunks, all dispatched before blocking — at TWO
runtime ``max_iters`` points (no recompile: max_iters is an SMEM scalar),
and reports the per-tile-iteration SLOPE, which cancels both the fixed
dispatch wall and the transfer pipeline fill.

Usage: python tools/probe_fused_slope.py [n] [qt] [pdt]
Env: PROBE_DBG (';'-separated), PROBE_Q (default 65536), PROBE_REPS (5)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from expann_tpu.utils import runtime  # noqa: F401


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 56000
    QT = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    PDT = sys.argv[3] if len(sys.argv) > 3 else "i8"
    E = int(os.environ.get("PROBE_E", 2))
    C = int(os.environ.get("PROBE_C", 16))
    Q = int(os.environ.get("PROBE_Q", 65536))
    reps = int(os.environ.get("PROBE_REPS", 5))
    CHUNK = 8192
    IT_LO, IT_HI = 28, 112

    import jax.numpy as jnp

    from expann_tpu.data.loader import load_synthetic_uniform_sphere_points
    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
    from expann_tpu.ops.pallas_fused import fused_search

    d, ef, EF = 128, 120, 128
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
    ntiles = (Q // QT)

    def run(dbg, iters):
        bd0 = jnp.full((CHUNK, EF), jnp.inf, jnp.float32).at[:, 0].set(0.0)
        bi0 = jnp.full((CHUNK, EF), sentinel, jnp.int32).at[:, 0].set(0)

        def call():
            # FRESH queries per timed call: identical dispatches over
            # identical inputs dedup/cache on this host (CLAUDE.md) and
            # would collapse both t_lo and t_hi toward the cached-return
            # cost, corrupting the slope
            qs = jnp.asarray(rng.standard_normal((Q, d)).astype(np.float32))
            outs = []
            for s in range(0, Q, CHUNK):
                ids, _, _, it = fused_search(
                    g.packed, g.packed_aux, qs[s : s + CHUNK], bd0, bi0,
                    ef=ef, expand=E, cand=C, max_iters=iters, qt=QT, dbg=dbg,
                )
                outs.append((ids, it))
            for ids, _ in outs:
                ids.block_until_ready()
            return outs

        outs = call()  # warmup/compile
        assert int(np.asarray(outs[0][1]).min()) == iters
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            call()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    base = {}
    dbgs = (os.environ.get("PROBE_DBG")
            or "nodone,fori;nodone,fori,skip_merge;nodone,fori,selonly;"
               "nodone,fori,minimal;nodone,fori,skip_score;"
               "nodone,fori,skip_dma").split(";")
    for dbg in [s.strip() for s in dbgs]:
        t_lo = run(dbg, IT_LO)
        t_hi = run(dbg, IT_HI)
        slope = (t_hi - t_lo) / (IT_HI - IT_LO) / ntiles * 1e6
        base[dbg] = slope
        full = base.get("nodone,fori")
        delta = f"  (saves {full - slope:5.2f})" if full and dbg != "nodone,fori" else ""
        print(f"{dbg:>28s}: lo {t_lo*1e3:7.1f} ms  hi {t_hi*1e3:7.1f} ms"
              f" -> {slope:6.2f} us/tile-iter{delta}", flush=True)


if __name__ == "__main__":
    main()
