"""Device-side serving LATENCY at small batch sizes.

The regime map (BENCH_NOTES "Revised graph-vs-flat conclusion") claims the
graph engine wins single-query / small-batch latency at the million-row
scale while the flat scan wins batched throughput.  This tool measures it.

Method: R chained searches inside ONE jit — query i+1 is perturbed by a
function of result i, so the chain is serially dependent (defeats both the
dispatch-dedup trap and async pipelining; CLAUDE.md), and the reps count is
a RUNTIME fori_loop bound (one compile per (engine, B)).  Latency is the
slope between two reps counts, which cancels this axon host's per-dispatch
RPC overhead (~25-200 ms) — the quantity reported is what an on-host
deployment would see per serving dispatch.

One engine per process (the 1M graph's packed layout and the flat corpora
should not share HBM):

  python tools/perf_latency.py --engine graph   --scale 1m
  python tools/perf_latency.py --engine flat    --scale 56k --B 8,64,512

Engines: flat (bf16 streamed scan), flat_i8 (s8 scan + exact f32 rerank),
graph (fully fused s8 packed traversal, 8-seed entry scan, ef=100).
Scales: 56k (canonical synthetic) and 1m (hardened clustered M=48 index,
/tmp/expann_1m_idx_M48_clustered.npz — built by tools/bench_1m.py).
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


def _salted(run, reps: int):
    """Every dispatch gets a UNIQUE salt operand: repeated calls with
    byte-identical (program, operands) get result-deduped by this host's
    axon layer exactly like identical dispatches inside a loop do
    (CLAUDE.md) — observed as a ~zero reps-slope on the heavier 1M
    chains.  The salt seeds the chain's initial carry, so the chain
    cost itself is unchanged."""
    _SALT[0] += 1
    return run(reps, np.float32((_SALT[0] % 997) * 1e-4))


def _slope(run, r1: int, r2: int, reps: int = 3) -> float:
    """Median of `reps` (t(r2) - t(r1)) / (r2 - r1) slopes, seconds."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _salted(run, r1).block_until_ready()
        t1 = time.perf_counter()
        _salted(run, r2).block_until_ready()
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (r2 - r1))
    return float(np.median(ts))


def _measure(run, label: str, B: int):
    import jax.numpy as jnp  # noqa: F401

    _salted(run, 1).block_until_ready()  # compile
    # grow the reps delta until the measured window clears RPC noise
    r1, r2 = 4, 24
    while True:
        t0 = time.perf_counter()
        _salted(run, r2).block_until_ready()
        if time.perf_counter() - t0 > 0.5 or r2 >= 4096:
            break
        r2 = r2 * 4
    lat = _slope(run, r1, r2)
    print(
        f"{label:10s} B={B:4d}: {lat * 1e6:9.1f} us/dispatch "
        f"({lat / B * 1e6:8.2f} us/query, {B / lat:9.0f} QPS device-side, "
        f"reps {r1}->{r2})",
        flush=True,
    )


def _chain(search, qbase, B):
    """Build a runtime-reps chained runner around a (B, D)->scalar search."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(reps, salt):
        def body(_, carry):
            c, acc = carry
            q = qbase + c * 1e-6
            c2 = search(q)
            return (c2, acc + c2)

        _, acc = jax.lax.fori_loop(
            0, reps, body, (salt, jnp.float32(0.0))
        )
        return acc

    return run


def run_flat(scale_n: int, x: np.ndarray, Bs, i8: bool):
    import jax.numpy as jnp

    from expann_tpu.models.brute_force import _rerank_exact
    from expann_tpu.ops.pallas_topk import (
        flat_topk,
        flat_topk_prepare,
        quantize_corpus_i8,
    )

    k = 10
    if i8:
        xdev, center, scale, n_real = quantize_corpus_i8(x)
        cdev = jnp.asarray(center, jnp.float32)
        xr = jnp.asarray(x, jnp.bfloat16)  # rerank corpus (bf16, 2 B/dim)
        xn = jnp.asarray((x * x).sum(axis=1))
    else:
        xdev, n_real = flat_topk_prepare(x)

    # Corpus-scale arrays (the scan codes, the bf16 rerank corpus, its
    # norms) ride as jit OPERANDS, never closure captures: captured device
    # arrays serialize into the remote-compile request, and the i8 chain's
    # ~388MB of captures (codes 128MB + rerank corpus 256MB + norms)
    # exceeded the compile server's request-body limit (HTTP 413) at 1M.
    import jax

    @functools.partial(jax.jit, static_argnames=("qt_",))
    def _i8_chain(reps, salt, xdev_, xr_, xn_, cdev_, qb_, qt_):
        def body(_, carry):
            c, acc = carry
            q = qb_ + c * 1e-6
            qk = jnp.clip(
                jnp.round((q - cdev_[None, :]) * scale), -127, 127
            ).astype(jnp.int8)
            ids, _ = flat_topk(
                qk, xdev_, n_real=n_real, k=min(3 * k, 128), query_tile=qt_
            )
            rids, _rd = _rerank_exact(q, xr_, xn_, ids, k)
            c2 = (rids.sum() % 1024).astype(jnp.float32) * 1e-3
            return (c2, acc + c2)

        _, acc = jax.lax.fori_loop(
            0, reps, body, (salt, jnp.float32(0.0))
        )
        return acc

    @functools.partial(jax.jit, static_argnames=("qt_",))
    def _bf16_chain(reps, salt, xdev_, qb_, qt_):
        def body(_, carry):
            c, acc = carry
            q = qb_ + c * 1e-6
            ids, _ = flat_topk(
                q.astype(jnp.bfloat16), xdev_, n_real=n_real, k=k,
                query_tile=qt_,
            )
            c2 = (ids.sum() % 1024).astype(jnp.float32) * 1e-3
            return (c2, acc + c2)

        _, acc = jax.lax.fori_loop(
            0, reps, body, (salt, jnp.float32(0.0))
        )
        return acc

    rng = np.random.default_rng(3)
    for B in Bs:
        # the kernel's query tile needs >= 32 rows for the i8/bf16 sublane
        # layouts: a smaller serving batch is padded, exactly as the
        # engine itself pads (the padded dispatch IS the B<32 latency)
        qt = min(max(B, 32), 256)
        Bp = B + (-B) % qt
        qb = jnp.asarray(rng.standard_normal((Bp, D)).astype(np.float32))

        if i8:
            run = (lambda qb_, qt_: lambda reps, salt: _i8_chain(
                reps, salt, xdev, xr, xn, cdev, qb_, qt_=qt_))(qb, qt)
        else:
            run = (lambda qb_, qt_: lambda reps, salt: _bf16_chain(
                reps, salt, xdev, qb_, qt_=qt_))(qb, qt)
        _measure(run, "flat_i8" if i8 else "flat", B)


def run_graph(scale: str, Bs):
    import jax.numpy as jnp

    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
    from expann_tpu.models.search import fused_query_batch

    idx = (
        "/tmp/perf_fused_idx_56000.npz"
        if scale == "56k"
        else "/tmp/expann_1m_idx_M48_clustered.npz"
    )
    assert os.path.exists(idx), (
        f"{idx} missing — build it first (tools/perf_e2e_graph.py for 56k, "
        "tools/bench_1m.py --data clustered --M 48 --efc 300 for 1m)"
    )
    M = 60 if scale == "56k" else 48
    cfg = AntitopoConfig(
        M=M,
        ef_construction=500,
        prune_cand=500,
        packed_dtype="i8",
        entry_seeds=8,
        ef_search=100,
        index_filename=idx,
        read_index=True,
        write_index=False,
    )
    eng = AntitopoEngine(config=cfg)
    # vectors live in the index file — no corpus ingest needed
    t0 = time.perf_counter()
    eng.build()
    eng._resolve_packed()
    print(f"graph load+pack: {time.perf_counter() - t0:.1f}s", flush=True)

    # Chaining the WHOLE fused_query_batch (entry scan with approx_max_k +
    # traversal + rerank) in one jit produces an XLA program large enough
    # to wedge this host's remote compile server for >30 min (CLAUDE.md).
    # Measure the two serving stages as separate small chains instead and
    # report their sum: (a) the dense multi-seed entry scan, (b) the fused
    # Pallas traversal from precomputed seed beams + the exact f32 rerank.
    import jax

    from expann_tpu.models.brute_force import _rerank_body
    from expann_tpu.ops.pallas_fused import fused_search

    g = eng.graph
    mem = g.entry_members
    if g.packed_codes is not None:
        mv = g.packed_codes[mem].astype(jnp.float32)
        mn = g.packed_code_norms[mem]
        center, qscale = g.packed_center, g.packed_scale
    else:
        mv, mn = g.vectors[mem], g.norms[mem]
        center, qscale = None, None
    sentinel = g.sentinel

    # Every corpus-scale device array (entry-member codes mv/mn/mem, the
    # packed corpus, the rerank vectors) is passed as a jit OPERAND, never
    # a closure capture: closed-over arrays become embedded HLO constants
    # and the serialized program exceeds this host's remote-compile-server
    # request limit (HTTP 413) at corpus scale.
    def _entry_scan_op(q, mv_, mn_, mem_):
        if center is not None:
            qk = jnp.clip(jnp.round((q - center) * qscale), -127.0, 127.0)
        else:
            qk = q
        qkn = jnp.sum(qk * qk, axis=1)
        md = mn_[None, :] + qkn[:, None] - 2.0 * jax.lax.dot_general(
            qk, mv_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        neg_d, idx = jax.lax.approx_max_k(-md, 8)
        return neg_d, mem_[idx]

    @jax.jit
    def _entry_chain(reps, salt, mv_, mn_, mem_, qb_):
        def body(_, carry):
            c, acc = carry
            _, sids = _entry_scan_op(qb_ + c * 1e-6, mv_, mn_, mem_)
            c2 = (sids.sum() % 1024).astype(jnp.float32) * 1e-3
            return (c2, acc + c2)

        _, acc = jax.lax.fori_loop(
            0, reps, body, (salt, jnp.float32(0.0))
        )
        return acc

    rng = np.random.default_rng(3)
    for B in Bs:
        # the fused kernel's query tile must be a multiple of 8: a smaller
        # serving batch is padded, exactly as the engine pads (the padded
        # dispatch IS the B<8 latency)
        qt = min(max(B, 8), 128)
        Bp = B + (-B) % qt
        qb = jnp.asarray(rng.standard_normal((Bp, D)).astype(np.float32))

        # precomputed seed beams for the traversal chain (the query
        # perturbation below leaves them valid seeds — the traversal
        # refines entries, it does not require them optimal)
        neg_d, sids = jax.jit(_entry_scan_op)(qb, mv, mn, mem)
        bd0 = jnp.full((Bp, 128), np.inf, jnp.float32).at[:, :8].set(-neg_d)
        bi0 = jnp.full((Bp, 128), sentinel, jnp.int32).at[:, :8].set(sids)

        @functools.partial(jax.jit, static_argnames=("qt_",))
        def _trav_chain(reps, salt, packed, auxb, vecs, nrm, bd, bi, qb_, qt_):
            def search(q):
                if center is not None:
                    qk = jnp.clip(
                        jnp.round((q - center) * qscale), -127.0, 127.0
                    )
                else:
                    qk = q
                ids, _, _, _ = fused_search(
                    packed, auxb, qk, bd, bi,
                    ef=jnp.int32(100), expand=2, cand=16, qt=qt_,
                    merge=os.environ.get("EXPANN_FUSED_MERGE", "topt"),
                    dbg=os.environ.get("EXPANN_FUSED_DBG", ""),
                )
                rids, _ = _rerank_body(q, vecs, nrm, ids, 10)
                return (rids.sum() % 1024).astype(jnp.float32) * 1e-3

            def body(_, carry):
                c, acc = carry
                c2 = search(qb_ + c * 1e-6)
                return (c2, acc + c2)

            _, acc = jax.lax.fori_loop(
                0, reps, body, (salt, jnp.float32(0.0))
            )
            return acc

        def trav_run(reps, salt):
            return _trav_chain(
                reps, salt, g.packed, g.packed_aux, g.vectors, g.norms,
                bd0, bi0, qb, qt_=qt,
            )

        _measure(lambda reps, salt: _entry_chain(reps, salt, mv, mn, mem, qb),
                 "graph:entry", B)
        _measure(trav_run, "graph:trav", B)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", choices=("flat", "flat_i8", "graph"),
                    required=True)
    ap.add_argument("--scale", choices=("56k", "1m"), default="56k")
    ap.add_argument("--B", default="8,64,512")
    args = ap.parse_args()
    Bs = [int(v) for v in args.B.split(",")]

    n = 56000 if args.scale == "56k" else 1_000_000
    print(f"engine={args.engine} scale={args.scale} n={n}", flush=True)
    if args.engine == "graph":
        run_graph(args.scale, Bs)
        return
    if args.scale == "56k":
        from expann_tpu.data.loader import (
            load_synthetic_uniform_sphere_points,
        )

        ds = load_synthetic_uniform_sphere_points(n=n, m=400, k=10, d=D)
        x = ds.vecs
    else:
        from expann_tpu.data.loader import generate_synthetic_clustered

        x, _ = generate_synthetic_clustered(n=n, m=16, d=D, seed=1234)
    run_flat(n, x, Bs, i8=(args.engine == "flat_i8"))


if __name__ == "__main__":
    main()
