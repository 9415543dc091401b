"""Per-iteration cost attribution of the fused traversal kernel, CHAINED.

tools/probe_fused_cost.py timed lone dispatches and its numbers drowned in
this host's per-dispatch RPC overhead ("noop" measured SLOWER than the full
kernel).  This probe uses the chained-slope instrument perf_latency.py
validated: R serially-dependent fused_search calls inside one jit (query
i+1 perturbed by result i, reps a runtime fori_loop bound, unique salt per
dispatch), latency = slope between two reps counts, so RPC overhead and
dedup both cancel.

Every variant runs a FIXED iteration count (dbg includes "nodone,fori":
no expansion marking, no early exit, pure-scalar loop condition), so the
DBG ladder subtracts cleanly:

    merge      = full - skip_merge
    insertion  = full - extract_only
    extraction = extract_only - skip_merge
    matmul     = full - skip_matmul
    dma+score  = full - (skip_dma,skip_score)
    done-check = nodone - nodone,fori   (the one early-exit reduction+sync)

Usage: python tools/probe_trav_cost.py [n=56000] [E=2] [C=16] [QT=128]
           [pdt=i8] [B=512]
Env: PROBE_ITERS (default 32), PROBE_DBG (';'-separated ladder override).
Needs /tmp/perf_fused_idx_<n>.npz (tools/perf_e2e_graph.py builds it).
"""

from __future__ import annotations

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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 56000
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    QT = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    PDT = sys.argv[5] if len(sys.argv) > 5 else "i8"
    B = int(sys.argv[6]) if len(sys.argv) > 6 else 512
    ITERS = int(os.environ.get("PROBE_ITERS", 32))

    import jax
    import jax.numpy as jnp

    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
    from expann_tpu.ops.pallas_fused import fused_search

    idx = f"/tmp/perf_fused_idx_{n}.npz"
    assert os.path.exists(idx), f"{idx} missing (tools/perf_e2e_graph.py)"
    cfg = AntitopoConfig(
        M=60, ef_construction=500, prune_cand=500, packed_dtype=PDT,
        entry_seeds=8, ef_search=100, index_filename=idx,
        read_index=True, write_index=False,
    )
    eng = AntitopoEngine(config=cfg)
    eng.build()
    eng._resolve_packed()
    g = eng.graph
    center, qscale = g.packed_center, g.packed_scale
    sentinel = g.sentinel
    print(f"n={n} E={E} C={C} QT={QT} pdt={PDT} B={B} ITERS={ITERS}",
          flush=True)

    rng = np.random.default_rng(5)
    qb = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    # seed beams: entry node only (the probe runs fixed iterations — seed
    # quality is irrelevant to cost, and this keeps the program tiny)
    bd0 = jnp.full((B, 128), np.inf, jnp.float32).at[:, 0].set(0.0)
    bi0 = jnp.full((B, 128), sentinel, jnp.int32).at[:, 0].set(0)

    @functools.partial(jax.jit, static_argnames=("dbg_", "merge_"))
    def _chain(reps, salt, packed, auxb, bd, bi, qb_, dbg_, merge_):
        def body(_, carry):
            c, acc = carry
            q = qb_ + c * 1e-6
            if center is not None:
                qk = jnp.clip(jnp.round((q - center) * qscale), -127.0, 127.0)
            else:
                qk = q
            ids, _, _, _ = fused_search(
                packed, auxb, qk, bd, bi,
                ef=jnp.int32(100), expand=E, cand=C,
                max_iters=jnp.int32(ITERS), qt=QT, dbg=dbg_, merge=merge_,
            )
            c2 = (ids.sum() % 1024).astype(jnp.float32) * 1e-3
            return (c2, acc + c2)

        _, acc = jax.lax.fori_loop(0, reps, body, (salt, jnp.float32(0.0)))
        return acc

    def run(spec, reps):
        dbg, _, mg = spec.partition("@")
        _SALT[0] += 1
        return _chain(
            jnp.int32(reps), np.float32((_SALT[0] % 997) * 1e-4),
            g.packed, g.packed_aux, bd0, bi0, qb, dbg_=dbg,
            merge_=(mg or "topt"),
        )

    # entries are "<dbg>[@<merge>]"
    ladder = (os.environ.get("PROBE_DBG") or ";".join([
        "nodone,fori",
        "nodone",
        "nodone,fori,skip_merge",
        "nodone,fori,extract_only",
        "nodone,fori,skip_matmul",
        "nodone,fori,skip_dma,skip_score",
        "nodone,fori,selonly",
        "nodone,fori,minimal",
        "nodone,fori,noop",
    ])).split(";")

    tiles = B // QT
    results = {}
    for dbg in [v.strip() for v in ladder if v.strip()]:
        t0 = time.perf_counter()
        run(dbg, 1).block_until_ready()
        tc = time.perf_counter() - t0
        # grow reps until the window clears RPC noise
        r1, r2 = 4, 24
        while True:
            t0 = time.perf_counter()
            run(dbg, r2).block_until_ready()
            if time.perf_counter() - t0 > 0.5 or r2 >= 4096:
                break
            r2 *= 4
        slopes = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(dbg, r1).block_until_ready()
            t1 = time.perf_counter()
            run(dbg, r2).block_until_ready()
            t2 = time.perf_counter()
            slopes.append(((t2 - t1) - (t1 - t0)) / (r2 - r1))
        lat = float(np.median(slopes))
        per_iter = lat / tiles / ITERS
        results[dbg] = per_iter
        print(f"{dbg:>34s}: {lat * 1e6:9.1f} us/dispatch -> "
              f"{per_iter * 1e6:7.2f} us/tile-iter "
              f"(compile {tc:.0f}s, reps {r1}->{r2})", flush=True)

    f = results.get("nodone,fori")
    if f:
        def delta(a, b, label):
            if a in results and b in results:
                print(f"  {label:28s} {(results[a] - results[b]) * 1e6:7.2f}"
                      " us/tile-iter", flush=True)

        print("--- attribution ---", flush=True)
        delta("nodone,fori", "nodone,fori,skip_merge", "merge total")
        delta("nodone,fori", "nodone,fori,extract_only", "  insertion")
        delta("nodone,fori,extract_only", "nodone,fori,skip_merge",
              "  extraction")
        delta("nodone,fori", "nodone,fori,skip_matmul", "matmul")
        delta("nodone,fori", "nodone,fori,skip_dma,skip_score", "dma+score")
        delta("nodone", "nodone,fori", "done-check")
        delta("nodone,fori,selonly", "nodone,fori,minimal", "selection")
        print(f"  {'full (fixed-iter)':28s} {f * 1e6:7.2f} us/tile-iter",
              flush=True)


if __name__ == "__main__":
    main()
