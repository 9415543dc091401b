"""Engine-level graph QPS vs batch size.

Round-3 finding (probe_fused_cost.py with a "noop" loop body): the
per-dispatch wall overhead on this axon host (~100-200ms, batch-size
independent) dominated the round-2 per-iteration cost attribution — an
empty 64-iteration traversal costs within noise of a full one.  The
decisive lever is therefore AMORTIZATION: batch size and chunk pipelining,
measured end-to-end here, not in-kernel microcosts.

Usage: python tools/perf_e2e_graph.py [n] [ef] [Q1,Q2,...] [query_block] [packed_dtype]
Env: PERF_E (query_expand, default 2), PERF_C (fused_cand, default 16),
     PERF_QT (fused_qt, default 128), PERF_SORT=1 (fused_sort_tiles on)
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
    ef = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    qs = [int(v) for v in (sys.argv[3] if len(sys.argv) > 3 else
                           "8192,32768,65536").split(",")]
    qb = int(sys.argv[4]) if len(sys.argv) > 4 else 4096
    pdt = sys.argv[5] if len(sys.argv) > 5 else "bf16"

    from expann_tpu.data.loader import load_synthetic_uniform_sphere_points
    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine

    d, k = 128, 10
    ds = load_synthetic_uniform_sphere_points(n=n, m=400, k=k, d=d)
    cfg = AntitopoConfig(
        M=60, ef_construction=500, ortho_count=1, prune_overflow=1,
        prune_cand=500, precision="default",
        query_expand=int(os.environ.get("PERF_E", 2)),
        fused_cand=int(os.environ.get("PERF_C", 16)),
        fused_qt=int(os.environ.get("PERF_QT", 128)), query_block=qb,
        fused_sort_tiles=os.environ.get("PERF_SORT") == "1",
        entry_seeds=8, ef_search=ef,
        packed_dtype=pdt,
        index_filename=f"/tmp/perf_fused_idx_{n}.npz",
        read_index=True, write_index=True,
    )
    eng = AntitopoEngine(config=cfg)
    eng.store_many_vectors(ds.vecs)
    t0 = time.perf_counter()
    eng.build()
    print(f"build/load: {time.perf_counter() - t0:.1f}s", flush=True)

    gt = [set(int(v) for v in row) for row in ds.ground_truth]
    ans = eng.query_k_batch(ds.queries, k)
    rec = sum(len(set(map(int, a)) & g) for a, g in zip(ans, gt)) / (400 * k)
    print(f"ef={ef} recall@10={rec:.4f} "
          f"distcomps/q={eng.num_distcomps / 400:.0f}", flush=True)

    rng = np.random.default_rng(7)
    for Q in qs:
        eng.query_k_batch(rng.standard_normal((Q, d)).astype(np.float32), k)
        times = []
        for _ in range(5):
            b = rng.standard_normal((Q, d)).astype(np.float32)
            t0 = time.perf_counter()
            eng.query_k_batch(b, k)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(f"Q={Q:6d} qb={qb}: median {med*1e3:7.1f} ms -> "
              f"{Q/med:8.0f} QPS  (best {Q/min(times):8.0f})", flush=True)


if __name__ == "__main__":
    main()
