"""Tens-of-millions-row single-chip flat serving demonstration.

The packed graph layout duplicates each vector once per adjacency block,
so beyond ~2-4M rows per 16GB chip the graph engine shards over a mesh
(parallel/sharded.py).  The FLAT engine has no such duplication: a bf16
corpus stores 2 bytes/dim, so one v5e chip holds 20M x d=128 in 5.1GB
and serves it with the streamed MXU kernel (ops/pallas_topk.py) — far
past the reference's canonical 56k and 20x its SIFT1M scale
(/root/reference/src/dataset_loader.h:127-168).  This tool measures
recall + QPS there; ids beyond 2^24 appear naturally at n > 16.7M.

Ground truth: exact f32 host matmul (chunked), cached to /tmp.

Usage: python tools/bench_bigflat.py [--n 20000000] [--m 100] [--mode fused]
  --mode fused     bf16 corpus (default; 2 B/dim)
  --mode fused_i8  s8 codes + exact f32 rerank (5 B/dim total: 10M max)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from expann_tpu.utils import runtime  # noqa: F401  (compile cache)


def gen_corpus(n: int, d: int, seed: int = 0) -> np.ndarray:
    """Chunked N(0,1) corpus straight into one preallocated f32 buffer."""
    x = np.empty((n, d), np.float32)
    rng = np.random.default_rng(seed)
    step = 1 << 20
    for s in range(0, n, step):
        e = min(n, s + step)
        x[s:e] = rng.standard_normal((e - s, d), dtype=np.float32)
    return x


def host_gt(x: np.ndarray, q: np.ndarray, k: int, cache: str) -> np.ndarray:
    if os.path.exists(cache):
        return np.load(cache)["gt"]
    t0 = time.time()
    m = q.shape[0]
    qn = (q * q).sum(1)[:, None]  # (m, 1)
    best_d = np.full((m, k), np.inf, np.float64)
    best_i = np.zeros((m, k), np.int64)
    step = 1 << 20
    for s in range(0, x.shape[0], step):
        xb = x[s : s + step]
        d2 = qn + (xb * xb).sum(1)[None, :] - 2.0 * (q @ xb.T)
        part = np.argpartition(d2, k, axis=1)[:, :k]
        cd = np.take_along_axis(d2, part, axis=1)
        alld = np.concatenate([best_d, cd], axis=1)
        alli = np.concatenate([best_i, part + s], axis=1)
        sel = np.argpartition(alld, k, axis=1)[:, :k]
        best_d = np.take_along_axis(alld, sel, axis=1)
        best_i = np.take_along_axis(alli, sel, axis=1)
    order = np.argsort(best_d, axis=1)
    gt = np.take_along_axis(best_i, order, axis=1)
    np.savez(cache, gt=gt)
    print(f"host GT: {time.time() - t0:.0f}s", flush=True)
    return gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--m", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=("fused", "fused_i8"), default="fused")
    ap.add_argument("--Q", type=int, default=16384, help="QPS batch size")
    args = ap.parse_args()
    n, d, m, k = args.n, args.d, args.m, args.k

    from expann_tpu.models.brute_force import BruteForceEngine

    print(f"generating {n} x {d} corpus ...", flush=True)
    x = gen_corpus(n, d)
    rng = np.random.default_rng(1)
    q = rng.standard_normal((m, d)).astype(np.float32)
    gt = host_gt(x, q, k, cache=f"/tmp/bigflat_gt_{n}_{d}_{m}.npz")

    # i8 mode at 10M+ rows: bf16 rerank corpus (2 B/dim) keeps codes +
    # rerank under 8GB HBM at n=20M
    eng = BruteForceEngine(
        mode=args.mode,
        rerank_store="bf16" if (args.mode == "fused_i8" and n > 8_000_000)
        else "f32",
    )
    eng.store_many_vectors(x)
    t0 = time.time()
    eng.build()
    build_s = time.time() - t0
    print(f"build (pad+upload): {build_s:.1f}s", flush=True)

    ids = eng.query_k_batch(q, k)
    rec = np.mean(
        [len(set(map(int, a)) & set(map(int, g))) / k for a, g in zip(ids, gt)]
    )
    big_ids = int((ids >= (1 << 24)).sum())
    print(f"recall@{k} = {rec:.4f}  (ids >= 2^24 in results: {big_ids})",
          flush=True)

    Q = args.Q
    eng.query_k_batch(rng.standard_normal((Q, d)).astype(np.float32), k)
    times = []
    for _ in range(5):
        b = rng.standard_normal((Q, d)).astype(np.float32)
        t0 = time.time()
        eng.query_k_batch(b, k)
        times.append(time.time() - t0)
    med = float(np.median(times))
    print(json.dumps({
        "point": f"bigflat_{args.mode}", "n": n, "recall": round(float(rec), 4),
        "qps": round(Q / med, 1), "qps_best": round(Q / min(times), 1),
        "build_s": round(build_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
