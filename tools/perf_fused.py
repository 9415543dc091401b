"""Validate + measure the fully fused traversal kernel (ops/pallas_fused.py)
against the per-iteration packed path on a real graph index.

Usage: python tools/perf_fused.py [n] [ef] [expand] [cand]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from expann_tpu.utils import runtime  # noqa: F401  (compile cache)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 56000
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    expand = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cand = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    qt = int(sys.argv[5]) if len(sys.argv) > 5 else 8

    import jax
    import jax.numpy as jnp

    from expann_tpu.data.loader import load_synthetic_uniform_sphere_points
    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
    from expann_tpu.models.search import _gather_dist2
    from expann_tpu.ops.distance import squared_norms
    from expann_tpu.ops.pallas_fused import fused_search

    m, k, d = 400, 10, 128
    ds = load_synthetic_uniform_sphere_points(n=n, m=m, k=k, d=d)
    gt_sets = [set(int(v) for v in row) for row in ds.ground_truth]

    cfg = AntitopoConfig(
        M=60, ef_construction=500, ortho_count=1, prune_overflow=1,
        prune_cand=500, query_expand=4, packed_topt=8, query_block=4096,
        precision="default",
        index_filename=f"/tmp/perf_fused_idx_{n}.npz",
        read_index=True,
        write_index=True,
    )
    eng = AntitopoEngine(config=cfg)
    eng.store_many_vectors(ds.vecs)
    t0 = time.perf_counter()
    eng.build()
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)
    eng._resolve_packed()
    g = eng.graph

    def recall(ans):
        hits = sum(
            len(set(int(v) for v in ans[i]) & gt_sets[i]) for i in range(m)
        )
        return hits / (m * k)

    # --- baseline: engine path (fused via auto on TPU) ---
    if not os.environ.get("SKIP_ENGINE"):
        eng.set_ef_search(ef)
        t0 = time.perf_counter()
        a0 = eng.query_k_batch(ds.queries, k)
        print(f"engine path recall={recall(a0):.4f} ({time.perf_counter()-t0:.1f}s incl compile)")

    # --- fused path, correctness on the real queries ---
    EF = ef + ((-ef) % 128)
    sentinel = g.sentinel

    @jax.jit
    def _run_fused(gr, qs):
        qs = qs.astype(jnp.float32)
        qn = squared_norms(qs)
        B = qs.shape[0]
        ep = jnp.full((B,), gr.starting_vertex, jnp.int32)
        ep_d = _gather_dist2(gr.vectors, gr.norms, ep[:, None], qs, qn, "default")
        from expann_tpu.models.search import greedy_descent
        epp, epd = ep, ep_d[:, 0]
        for layer in reversed(gr.layers):
            epp, epd = greedy_descent(
                gr.vectors, gr.norms, layer.slot, layer.adj, qs, qn, epp, epd,
                "default",
            )
        bd0 = jnp.full((B, EF), jnp.inf, jnp.float32).at[:, 0].set(epd)
        bi0 = jnp.full((B, EF), sentinel, jnp.int32).at[:, 0].set(epp)
        ids, _, nc, it = fused_search(
            gr.packed, gr.packed_aux, qs, bd0, bi0,
            ef=ef, expand=expand, cand=cand, qt=qt,
        )
        # exact f32 rerank
        dd = _gather_dist2(gr.vectors, gr.norms, ids, qs, qn, "default")
        dd, ids = jax.lax.sort((dd, ids), num_keys=1)
        return ids[:, :k], nc, it

    def run_fused(qs):
        return _run_fused(g, qs)

    qpad = np.concatenate(
        [ds.queries, np.zeros(((-m) % qt, d), np.float32)], axis=0
    )
    t0 = time.perf_counter()
    a1, nc, it = run_fused(jnp.asarray(qpad))
    a1 = np.asarray(a1)[:m]
    print(
        f"fused path  recall={recall(a1):.4f} ({time.perf_counter()-t0:.1f}s incl compile)"
        f" distcomps/q={float(np.asarray(nc).sum())/m:.0f}"
        f" iters: mean={float(np.asarray(it).mean()):.1f} max={int(np.asarray(it).max())}"
    )

    # --- throughput: unique random queries, fresh batch per rep ---
    rng = np.random.default_rng(7)
    for B in (8192,):
        def batch():
            return jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))

        ids, _, _ = run_fused(batch())
        ids.block_until_ready()
        best = float("inf")
        for _ in range(3):
            b = batch()
            t0 = time.perf_counter()
            run_fused(b)[0].block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"fused  B={B}: {B/best:,.0f} QPS ({best*1e6/B:.1f} us/q)")

        if not os.environ.get("SKIP_ENGINE"):
            eng.set_ef_search(ef)
            eng.query_k_batch(
                np.asarray(rng.standard_normal((B, d)), np.float32), k
            )
            best = float("inf")
            for _ in range(3):
                b = np.asarray(rng.standard_normal((B, d)), np.float32)
                t0 = time.perf_counter()
                eng.query_k_batch(b, k)
                best = min(best, time.perf_counter() - t0)
            print(f"engine B={B}: {B/best:,.0f} QPS ({best*1e6/B:.1f} us/q)")


if __name__ == "__main__":
    main()
