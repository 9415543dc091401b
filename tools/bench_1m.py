"""Million-row single-chip demonstration (the SIFT1M-shaped slot).

Synthetic 1M x d=128 corpus (SIFT fvecs files are absent in-image — the
loaders in data/loader.py run the real thing unchanged when they exist).
Measures:
  * index build wall-clock (distributed one-shot builder on a 1-device
    mesh with streamed flat_topk candidates — the million-row path),
  * graph query pareto: recall@10 vs QPS (packed Pallas beam search),
  * flat-scan points (bf16 and int8 fused kernels) for comparison.

Ground truth: exact XLA matmul top-k on 400 queries (BruteForceEngine
mode='exact' in 1M-safe batches).

Usage: python tools/bench_1m.py [--n 1000000] [--skip-build]
Writes results as JSON lines; the built index is cached at
/tmp/expann_1m_idx.npz for query-side re-runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GT = "/tmp/expann_1m_gt.npz"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=400)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--skip-build", action="store_true")
    # build + save the index npz, then exit (no GT, no serving sweeps) —
    # for rebuilding the /tmp index caches that tools/perf_latency.py loads
    ap.add_argument("--build-only", action="store_true")
    # M=32 (M0=64): the strongest graph whose s8 packed layout fits 16GB
    # HBM at N=1M; efc caps at 127 (flat_topk candidate extraction k<=128)
    ap.add_argument("--M", type=int, default=32)
    ap.add_argument("--efc", type=int, default=127)
    # "gaussian" = the reference's isotropic synthetic (hard at 1M —
    # curse of dimensionality); "clustered" = mixture of 1000 Gaussians
    # modelling real-corpus intrinsic dimension (SIFT-like)
    # "fvecs:<dir>" loads a real corpus from <dir>/{sift_base.fvecs,
    # sift_query.fvecs, sift_groundtruth.ivecs} (the reference's SIFT1M
    # layout, src/main.cpp:72-80) — any real fvecs corpus drops in with
    # no code change the day the files exist in-image
    ap.add_argument("--data", default="gaussian")
    # serve an explicit index file (e.g. an adjacency-truncated variant
    # from tools/truncate_index.py) instead of the derived cache path
    ap.add_argument("--idx", default="")
    # fused-path query wire: "bf16" (default) or "i8" (1 B/dim absmax
    # codes dequantized in-trace — models/search.fused_query_batch);
    # measured +21% e2e at 56k on a link-bound session (BENCH_NOTES)
    ap.add_argument("--wire", default="bf16", choices=("bf16", "i8"))
    ap.add_argument("--qb", type=int, default=8192,
                    help="serving query_block; 16384 halves the dispatch "
                    "count and measured +22%% at 56k (BENCH_NOTES)")
    # override the canonical pareto sweep with specific ef points
    # (expand=2, cand=8, i8 — the measured operating point), e.g.
    # --ef-list 100,110 to bracket a recall gate on a saved index
    ap.add_argument("--ef-list", default="")
    ap.add_argument("--skip-flat", action="store_true")
    args = ap.parse_args()
    if not (args.data in ("gaussian", "clustered")
            or args.data.startswith("fvecs:")):
        ap.error("--data must be gaussian, clustered, or fvecs:<dir>")
    global IDX, GT
    # n tag keeps non-1M runs (e.g. the 2M crossover demo) from
    # colliding with the canonical 1M cache files
    ntag = "" if args.n == 1_000_000 else f"_n{args.n}"
    dtag = ("fvecs_" + os.path.basename(args.data[6:].rstrip("/"))
            if args.data.startswith("fvecs:") else args.data)
    IDX = args.idx or f"/tmp/expann_1m_idx_M{args.M}_{dtag}{ntag}.npz"
    GT = f"/tmp/expann_1m_gt_{dtag}{ntag}.npz"

    import jax.numpy as jnp

    from expann_tpu.data.loader import (
        generate_synthetic,
        generate_synthetic_clustered,
    )
    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
    from expann_tpu.models.brute_force import BruteForceEngine
    from expann_tpu.models.build import BuildConfig
    from expann_tpu.parallel.distbuild import build_distributed
    from expann_tpu.parallel.sharded import make_mesh
    from expann_tpu.utils.persist import save_index

    n, m, d, k = args.n, args.m, args.d, args.k
    gt = "unset"
    if args.data.startswith("fvecs:"):
        from expann_tpu.data.loader import load_sift1m

        base = args.data[6:].rstrip("/")
        print(f"loading fvecs corpus from {base}/ ...", flush=True)
        ds = load_sift1m(
            os.path.join(base, "sift_base.fvecs"),
            os.path.join(base, "sift_query.fvecs"),
            os.path.join(base, "sift_groundtruth.ivecs"),
            k_custom=k,
        )
        x = np.asarray(ds.vecs, np.float32)
        queries = np.asarray(ds.queries, np.float32)
        gt = np.asarray(ds.ground_truth)
        n, d = x.shape
        m, k = gt.shape
        print(f"fvecs corpus: n={n} d={d} m={m} k={k}", flush=True)
    else:
        print(f"generating synthetic n={n} d={d} ...", flush=True)
        if args.data == "clustered":
            x, queries = generate_synthetic_clustered(n, m, d, seed=0)
        else:
            x, queries = generate_synthetic(n, m, d, seed=0)

    # ---- exact ground truth ----
    if not isinstance(gt, str):
        pass  # fvecs ground truth came with the files
    elif args.build_only:
        gt = None
    elif os.path.exists(GT):
        gt = np.load(GT)["gt"]
    else:
        t0 = time.perf_counter()
        bf = BruteForceEngine(batch_size=100)
        bf.store_many_vectors(x)
        bf.build()
        gt = bf.query_k_batch(queries, k)
        print(f"exact GT: {time.perf_counter() - t0:.0f}s", flush=True)
        np.savez(GT, gt=gt)
        del bf

    gt_sets = None if gt is None else [set(int(v) for v in row) for row in gt]

    def recall(ids):
        return float(
            np.mean([len(set(int(v) for v in a[:k]) & g) / k
                     for a, g in zip(ids, gt_sets)])
        )

    results = []

    # ---- build: distributed one-shot on a 1-device mesh ----
    cfg = BuildConfig(
        M=args.M, ef_construction=args.efc, prune_cand=args.efc,
        precision="default",
    )
    built = not (args.skip_build and os.path.exists(IDX))
    if not built:
        build_s = None
    else:
        mesh = make_mesh(1)
        t0 = time.perf_counter()
        graph, stats = build_distributed(
            x, cfg, mesh, wave_size=4096, mode="oneshot",
            candidates="flat", verbose=True,
        )
        build_s = time.perf_counter() - t0
        print(f"build: {build_s:.0f}s  {stats}", flush=True)
        save_index(IDX, graph, {"dim": d})
        del graph
        if not args.build_only:
            results.append({"point": "build", "build_s": round(build_s, 1),
                            "n": n, **stats})

    if args.build_only:
        if built:
            print(f"build-only: index saved to {IDX}", flush=True)
        else:
            print(f"build-only: index already present at {IDX} "
                  "(build skipped)", flush=True)
        return

    # ---- graph query pareto (fused traversal; ef <= 128 reuses ONE
    # compile since ef is a runtime scalar, ef=160 compiles the 256-wide
    # beam variant once) ----
    rng = np.random.default_rng(99)
    # bf16 packed blocks need n*roundup(M0,16)*D_pad*2 bytes of HBM; above
    # ~10GB only the s8 layout fits alongside the corpus on a 16GB chip
    rs16 = 2 * args.M + ((-2 * args.M) % 16)
    d_pad = d + ((-d) % 128)
    bf16_fits = n * rs16 * d_pad * 2 < 10e9
    # cand=8 vs 16 A/B at scale: the round-4 op-point re-sweep (56k)
    # moved the default to cand=8; the 1M pairs here verify it holds
    pts = [(2, 40, 16), (2, 80, 8), (2, 80, 16), (2, 120, 8), (2, 120, 16),
           (2, 200, 32), (2, 256, 32)]
    plist = [(e_, ef_, c_, "i8") for e_, ef_, c_ in pts]
    if bf16_fits:
        plist += [(2, 120, 16, "bf16")]
    if args.ef_list:
        plist = [(2, int(s), 8, "i8") for s in args.ef_list.split(",")]
    for expand, ef, cand, pdt in plist:
        acfg = AntitopoConfig(
            M=args.M, ef_construction=args.efc, ef_search=ef,
            query_expand=expand, fused_cand=cand, packed_dtype=pdt,
            query_block=args.qb,  # dispatch-overhead amortization
            entry_seeds=8,  # dense multi-seed entry scan (multi-basin data)
            precision="default", use_packed=True, query_wire=args.wire,
            index_filename=IDX, read_index=True,
        )
        eng = AntitopoEngine(config=acfg)
        eng.build()
        rec = recall(eng.query_k_batch(queries, k))
        dc = (eng.num_distcomps + eng.num_distcomps_compressed) / m
        B = 32768  # per-dispatch wall overhead amortizes with batch size
        # (tools/perf_e2e_graph.py: 42k -> 75k QPS at 56k going 8k -> 64k)
        eng.query_k_batch(rng.standard_normal((B, d)).astype(np.float32), k)
        best = 1e9
        for _ in range(3):
            qs = rng.standard_normal((B, d)).astype(np.float32)
            t0 = time.perf_counter()
            eng.query_k_batch(qs, k)
            best = min(best, time.perf_counter() - t0)
        wtag = "_wirei8" if args.wire == "i8" else ""
        if args.qb != 8192:
            wtag += f"_qb{args.qb}"
        pt = {"point": f"antitopo_ef{ef}_e{expand}_c{cand}_{pdt}{wtag}",
              "recall": round(rec, 4), "qps": round(B / best, 1),
              "distcomps": round(dc, 1)}
        results.append(pt)
        print(json.dumps(pt), flush=True)
        del eng

    # ---- flat scans ----
    for mode in () if args.skip_flat else ("fused", "fused_i8"):
        eng = BruteForceEngine(
            mode=mode,
            query_wire=args.wire if mode == "fused_i8" else "bf16",
        )
        eng.store_many_vectors(x)
        t0 = time.perf_counter()
        eng.build()
        fb = time.perf_counter() - t0
        rec = recall(eng.query_k_batch(queries, k))
        B = 16384
        eng.query_k_batch(rng.standard_normal((B, d)).astype(np.float32), k)
        best = 1e9
        for _ in range(3):
            qs = rng.standard_normal((B, d)).astype(np.float32)
            t0 = time.perf_counter()
            eng.query_k_batch(qs, k)
            best = min(best, time.perf_counter() - t0)
        pt = {"point": f"tpu_flat_{mode}", "recall": round(rec, 4),
              "qps": round(B / best, 1), "build_s": round(fb, 1)}
        results.append(pt)
        print(json.dumps(pt), flush=True)
        del eng

    print(json.dumps({"summary_1m": results}), flush=True)


if __name__ == "__main__":
    main()
