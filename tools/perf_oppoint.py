"""Operating-point re-sweep of the fused traversal: (expand, cand) x ef.

The round-2 sweep that fixed the serving operating point at expand=2,
cand=16 (bench.py config) ran on a kernel whose per-candidate dup
checks made merge cost scale hard with expand*cand.  The round-4
bit-packed dup detection removed that term (BENCH_NOTES "bit-packed
dup detection"), so the optimum may have moved toward wider expansion
(fewer, fatter iterations).  This tool re-measures the grid.

For each (E, C): recall@10 on the canonical m=400 queries through the
REAL engine path (fused_query_batch), then device-side us/query via
the chained-slope instrument perf_latency.py validated (serially
dependent dispatches inside one jit, runtime reps bound, slope between
two reps counts — RPC overhead and dedup both cancel).  ef is a
runtime scalar: each (E, C) compiles once, every ef rides the same
program (ef > 128 compiles the 256-wide beam once more).

Usage: python tools/perf_oppoint.py [--grid "1x16,2x8,2x16,2x32,4x8,4x16"]
           [--efs 80,100,120] [--B 512] [--n 56000]
Needs /tmp/perf_fused_idx_<n>.npz (tools/perf_e2e_graph.py builds it).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from expann_tpu.utils import runtime  # noqa: F401  (compile cache)

D = 128
_SALT = [0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="1x16,2x8,2x16,2x32,4x8,4x16")
    ap.add_argument("--efs", default="80,100,120")
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--n", type=int, default=56000)
    # explicit index file (e.g. a serving-R-truncated variant from
    # tools/truncate_index.py) instead of the derived cache path
    ap.add_argument("--idx", default="")
    args = ap.parse_args()
    grid = [tuple(int(v) for v in g.split("x")) for g in args.grid.split(",")]
    efs = [int(v) for v in args.efs.split(",")]

    import jax
    import jax.numpy as jnp

    from expann_tpu.data.loader import load_synthetic_uniform_sphere_points
    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
    from expann_tpu.models.brute_force import _rerank_body
    from expann_tpu.models.search import fused_query_batch
    from expann_tpu.ops.pallas_fused import fused_search

    idx = args.idx or f"/tmp/perf_fused_idx_{args.n}.npz"
    assert os.path.exists(idx), f"{idx} missing (tools/perf_e2e_graph.py)"
    ds = load_synthetic_uniform_sphere_points(n=args.n, m=400, k=10, d=D)
    gt_sets = [set(int(v) for v in row) for row in np.asarray(ds.ground_truth)]

    cfg = AntitopoConfig(
        M=60, ef_construction=500, prune_cand=500, packed_dtype="i8",
        entry_seeds=8, ef_search=100, index_filename=idx,
        read_index=True, write_index=False,
    )
    eng = AntitopoEngine(config=cfg)
    eng.build()
    eng._resolve_packed()
    g = eng.graph
    center, qscale = g.packed_center, g.packed_scale
    sentinel = g.sentinel
    mem = g.entry_members
    mv = g.packed_codes[mem].astype(jnp.float32)
    mn = g.packed_code_norms[mem]
    qs = np.asarray(ds.queries, np.float32)

    def _entry_scan_op(q, mv_, mn_, mem_):
        qk = jnp.clip(jnp.round((q - center) * qscale), -127.0, 127.0)
        qkn = jnp.sum(qk * qk, axis=1)
        md = mn_[None, :] + qkn[:, None] - 2.0 * jax.lax.dot_general(
            qk, mv_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        neg_d, i = jax.lax.approx_max_k(-md, 8)
        return neg_d, mem_[i]

    @functools.partial(jax.jit, static_argnames=("qt_", "E_", "C_"))
    def _trav_chain(reps, salt, ef, packed, auxb, vecs, nrm, bd, bi, qb_,
                    qt_, E_, C_):
        def search(q):
            qk = jnp.clip(jnp.round((q - center) * qscale), -127.0, 127.0)
            ids, _, _, _ = fused_search(
                packed, auxb, qk, bd, bi, ef=ef, expand=E_, cand=C_, qt=qt_,
            )
            rids, _ = _rerank_body(q, vecs, nrm, ids, 10)
            return (rids.sum() % 1024).astype(jnp.float32) * 1e-3

        def body(_, carry):
            c, acc = carry
            c2 = search(qb_ + c * 1e-6)
            return (c2, acc + c2)

        _, acc = jax.lax.fori_loop(0, reps, body, (salt, jnp.float32(0.0)))
        return acc

    rng = np.random.default_rng(7)
    B = args.B
    qb = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    neg_d, sids = jax.jit(_entry_scan_op)(qb, mv, mn, mem)

    for E, C in grid:
        # recall through the real engine path at each ef
        recs = {}
        for ef in efs:
            eng.cfg.query_expand = E
            eng.cfg.fused_cand = C
            eng.set_ef_search(ef)
            ids = eng.query_k_batch(qs, 10)
            recs[ef] = float(np.mean(
                [len(set(int(v) for v in r) & s) / 10
                 for r, s in zip(ids, gt_sets)]
            ))
        for ef in efs:
            ew = 128 if ef <= 128 else 256
            bd0 = jnp.full((B, ew), np.inf, jnp.float32).at[:, :8].set(-neg_d)
            bi0 = jnp.full((B, ew), sentinel, jnp.int32).at[:, :8].set(sids)

            def run(reps, salt):
                return _trav_chain(
                    jnp.int32(reps), np.float32(salt), jnp.int32(ef),
                    g.packed, g.packed_aux, g.vectors, g.norms,
                    bd0, bi0, qb, qt_=128, E_=E, C_=C,
                )

            def t(reps):
                _SALT[0] += 1
                t0 = time.perf_counter()
                run(reps, (_SALT[0] % 997) * 1e-4).block_until_ready()
                return time.perf_counter() - t0

            t(1)  # compile
            r1, r2 = 4, 8
            while t(r2) < 0.5 and r2 < 4096:
                r2 *= 2
            slopes = []
            for _ in range(3):
                slopes.append((t(r2) - t(r1)) / (r2 - r1))
            us_q = float(np.median(slopes)) * 1e6 / B
            print(
                f"E={E} C={C} ef={ef}: recall={recs[ef]:.4f} "
                f"{us_q:8.2f} us/query ({1e6 / us_q:.0f} QPS device-side, "
                f"reps {r1}->{r2})",
                flush=True,
            )


if __name__ == "__main__":
    main()
