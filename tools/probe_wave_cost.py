"""Attribute the per-wave cost of the million-row one-shot distributed build.

The M=48/efc=300 1M builds run ~9.3 s/wave (245 waves, BENCH_NOTES); this
probe times the pieces separately on the real device so the next build-time
lever is chosen from data, not guesses:

  (a) candidate generation alone — the segmented flat_topk scans exactly as
      per_shard_flat issues them (n_seg segments of the corpus, k<=128),
  (b) the full forward wave step (_dist_wave_step: candidates + prune +
      forward-row writes + optional reverse scatter),
  (c) the reverse step (_dist_reverse_step: reverse prune + scatter).

(b) - (a) ~= prune + scatter; (c) isolates the reverse half.  Usage:

  python tools/probe_wave_cost.py [n=1000000] [C=300] [cap=96] [wave=4096]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # CPU smoke runs: the host sitecustomize force-prepends the axon
    # platform, so the config update is also required (CLAUDE.md), and
    # the AOT cache must be off (machine-feature mismatch -> SIGILL risk)
    os.environ["EXPANN_TPU_NO_CACHE"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")

from expann_tpu.utils import runtime  # noqa: F401  (compile cache)


def timeit(fn, reps=3):
    """fn(rep) -> value.  Each rep MUST see different input data — the
    axon executor dedups identical dispatches and reports ~0s (CLAUDE.md);
    the 2026-08-18 queue run's 0.001 s/wave numbers were exactly this."""
    import jax

    jax.block_until_ready(fn(0))  # compile
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(r + 1))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    W = int(sys.argv[4]) if len(sys.argv) > 4 else 4096

    import jax
    import jax.numpy as jnp

    from expann_tpu.models.build import BuildConfig
    from expann_tpu.ops.pallas_topk import flat_topk
    from expann_tpu.parallel.distbuild import (
        _dist_reverse_step,
        _dist_wave_step,
    )
    from expann_tpu.parallel.sharded import make_mesh

    D = 128
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, D)).astype(np.float32)
    wq_h = x[: W].copy()

    mesh = make_mesh(1)
    S, n_shard = 1, n
    GSENT = S * n_shard
    R = 128  # overflow_rows default in build_distributed

    block = 1024
    n_flat = ((n + block - 1) // block) * block
    xh = np.full((S, n_flat, D), 1e4, np.float32)
    xh[0, :n] = x
    xs_flat = jnp.asarray(xh, jnp.bfloat16)
    del xh

    vectors = jnp.asarray(x[None])  # (S, n_shard, D)
    norms = jnp.asarray((x * x).sum(1)[None])
    adj = jnp.full((S, n_shard + 1, R), GSENT, jnp.int32)
    counts = jnp.zeros((S, n_shard + 1), jnp.int32)
    # one wave-query batch per rep (distinct rows defeat dispatch dedup)
    wqs = [
        jnp.asarray(x[r * W : (r + 1) * W] if (r + 1) * W <= n else wq_h)
        for r in range(5)
    ]
    gids = jnp.arange(W, dtype=jnp.int32)

    # (a) segmented flat_topk candidates, as per_shard_flat issues them
    n_seg = (C + 1 + 127) // 128
    seg_rows = n_flat // n_seg
    seg_rows += (-seg_rows) % 1024
    kk = min(C + 1, 128)

    interpret = jax.default_backend() not in ("tpu", "axon")
    topk_mode = os.environ.get("EXPANN_TOPK_MODE", "fixed")
    print(f"topk_mode={topk_mode}", flush=True)

    def cands_only():
        outs = []
        for si in range(n_seg):
            s0 = si * seg_rows
            s1 = min(s0 + seg_rows, n_flat)
            if s0 >= n_flat:
                break
            outs.append(
                flat_topk(
                    wq, xs_flat[0, s0:s1], n_real=s1 - s0, k=kk,
                    interpret=interpret, mode=topk_mode,
                )
            )
        return outs

    t_cand = timeit(cands_only)
    print(
        f"(a) candidates only ({n_seg} segs, k={kk}): {t_cand:7.3f} s/wave",
        flush=True,
    )

    # (b) full forward wave step.  adj/counts are DONATED, so each timed
    # call threads the previous call's outputs back in (same shapes; the
    # write volume per wave is comparable whether rows are empty or full).
    cfg = BuildConfig(M=cap // 2)
    state = {"adj": adj, "counts": counts}

    def fwd():
        state["adj"], state["counts"] = _dist_wave_step(
            vectors, norms, state["adj"], state["counts"], wq, gids,
            jnp.int32(n),
            C=C, cap=cap, ortho_factor=cfg.ortho_factor,
            ortho_bias=cfg.ortho_bias, prune_overflow=cfg.prune_overflow,
            overflow_rows=R, n_shard=n_shard, mesh=mesh,
            precision="default", reverse=False,
            xs_flat=xs_flat, n_total=n, interpret=interpret,
            topk_mode=topk_mode,
        )
        return state["counts"]

    t_fwd = timeit(fwd)
    print(
        f"(b) forward wave step:                    {t_fwd:7.3f} s/wave"
        f"   (prune+writes ~= {t_fwd - t_cand:.3f})",
        flush=True,
    )

    # (c) reverse step over the forward-populated adjacency (donated too)
    def rev():
        state["adj"], state["counts"] = _dist_reverse_step(
            vectors, norms, state["adj"], state["counts"], gids,
            cap=cap, ortho_factor=cfg.ortho_factor,
            ortho_bias=cfg.ortho_bias, prune_overflow=cfg.prune_overflow,
            overflow_rows=R, n_shard=n_shard, precision="default",
        )
        return state["counts"]

    t_rev = timeit(rev)
    print(f"(c) reverse step:                         {t_rev:7.3f} s/wave", flush=True)
    waves = (n + W - 1) // W
    print(
        f"projected build: {waves} waves x (fwd {t_fwd:.2f} + rev {t_rev:.2f})"
        f" = {waves * (t_fwd + t_rev) / 60:.1f} min",
        flush=True,
    )


if __name__ == "__main__":
    main()
