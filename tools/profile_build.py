"""Wall-clock attribution of the canonical 56k one-shot graph build.

Round-4 binding capture reported graph_build_s=260.2 on identical code that
measured 112.9s in round 3 — VERDICT r4 'weak #2' asked for a decomposition.
The suspected leg was the host round-trip of the merged reverse-edge lists
in models/build._build_layer (hundreds of MB over the axon tunnel); round 5
replaced it with the device-resident _finish_rows_device.  This script
times the build end to end plus each externally visible phase, twice
(cold = includes compiles, warm = cached), so the remaining time can be
attributed to compile vs dispatch vs compute.

Usage: python tools/profile_build.py [--n 56000] [--reps 2]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=56000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from expann_tpu.data.loader import load_synthetic_uniform_sphere_points
    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine

    ds = load_synthetic_uniform_sphere_points(n=args.n, m=400, k=10, d=args.d)

    rng = np.random.default_rng(99)
    for rep in range(args.reps):
        cfg = AntitopoConfig(
            M=60, ef_construction=500, ortho_count=1, prune_overflow=1,
            prune_cand=500, query_expand=2, packed_topt=8, fused_cand=8,
            fused_qt=128, query_block=16384, entry_seeds=8,
            precision="default",
        )
        eng = AntitopoEngine(config=cfg)
        # perturb per rep: identical dispatches dedup on this host
        # (CLAUDE.md timing note) and would fake a ~0s warm build
        vecs = ds.vecs + (
            rep * 1e-4 * rng.standard_normal(ds.vecs.shape)
        ).astype(np.float32)
        eng.store_many_vectors(vecs)
        t0 = time.perf_counter()
        eng.build()
        total = time.perf_counter() - t0
        print(f"rep {rep}: build total {total:.1f}s", flush=True)

    # phase split on the last rep's path: re-run the raw builder directly
    import jax

    from expann_tpu.models.build import (
        BuildConfig, _build_layer, build_upper_layers, draw_levels,
    )
    from expann_tpu.models.graph import make_corpus

    bcfg = BuildConfig(
        M=60, ef_construction=500, ortho_count=1, prune_overflow=1,
        prune_cand=500, builder="oneshot",
    )
    x = (
        ds.vecs + 1e-4 * rng.standard_normal(ds.vecs.shape)
    ).astype(np.float32)  # fresh data: defeat dispatch dedup
    n = x.shape[0]
    t0 = time.perf_counter()
    vectors, norms = make_corpus(x)
    jax.block_until_ready(vectors)
    t1 = time.perf_counter()
    levels, max_layer, sv = draw_levels(n, bcfg.M, bcfg.seed)
    t2 = time.perf_counter()
    adj0 = _build_layer(vectors[:n], norms[:n], cap=bcfg.M0, cfg=bcfg)
    jax.block_until_ready(adj0)
    t3 = time.perf_counter()
    upper = build_upper_layers(vectors, norms, levels, max_layer, bcfg)
    for u in upper:
        jax.block_until_ready(u.adj)
    t4 = time.perf_counter()
    print(
        f"phases: corpus_upload {t1 - t0:.1f}s  level_draw {t2 - t1:.1f}s  "
        f"bottom_layer {t3 - t2:.1f}s  upper_layers {t4 - t3:.1f}s  "
        f"(raw graph total {t4 - t0:.1f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
