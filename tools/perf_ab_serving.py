"""Interleaved A/B of serving configurations on the canonical 56k index.

Two round-3/4 questions this answers with INTERLEAVED runs (A,B,A,B,...)
so the axon tunnel's load drift cancels instead of biasing whichever
config ran later:

1. VERDICT weak #4: `use_compression=true` captured 56.0k QPS while the
   mechanically identical packed_dtype="i8" path measured 82.8k in the
   builder's A/B.  In query_k_batch the two modes issue the SAME
   fused_query_batch call (models/antitopo.py — compression forces the
   centered-s8 packed layout), so any real gap must be environmental
   (run order, HBM residency, tunnel drift).  Modes: bf16 / i8 /
   compressed (i8 + codes attached).

2. The 56k latency sweep measured graph:trav at 9.18 us/query with a
   64-row query tile vs 11.52 us/query at 128 (tools/perf_latency.py,
   BENCH_NOTES) — is fused_qt=64 also the better THROUGHPUT tile at the
   bench's production batch?  --sweep qt compares fused_qt in {32,64,128}.

Usage:
  python tools/perf_ab_serving.py --sweep compression [--Q 65536] [--reps 5]
  python tools/perf_ab_serving.py --sweep qt
Prints one JSON line per (mode, rep) plus a per-mode median summary.
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

IDX = "/tmp/perf_fused_idx_56000.npz"
D = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep",
                    choices=("compression", "qt", "merge", "dma", "wire",
                             "qb", "combo"),
                    default="compression")
    ap.add_argument("--Q", type=int, default=65536)
    ap.add_argument("--ef", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine

    assert os.path.exists(IDX), f"{IDX} missing (tools/perf_e2e_graph.py)"

    def make(packed_dtype="bf16", use_compression=False, fused_qt=128,
             fused_merge="", query_wire="bf16", query_block=8192):
        cfg = AntitopoConfig(
            M=60, ef_construction=500, prune_cand=500,
            query_expand=2, fused_cand=16, fused_qt=fused_qt,
            query_block=query_block, entry_seeds=8, precision="default",
            packed_dtype=packed_dtype, use_compression=use_compression,
            ef_search=args.ef, fused_merge=fused_merge,
            query_wire=query_wire,
            index_filename=IDX, read_index=True, write_index=False,
        )
        eng = AntitopoEngine(config=cfg)
        eng.build()
        if use_compression:
            eng._attach_codes()
        eng._resolve_packed()
        return eng

    if args.sweep == "compression":
        modes = {
            "bf16": make("bf16", False),
            "i8": make("i8", False),
            "compressed": make("i8", True),
        }
    elif args.sweep == "qt":
        modes = {
            f"qt{qt}": make("i8", False, fused_qt=qt) for qt in (32, 64, 128)
        }
    elif args.sweep == "merge":
        # merge-mode A/B: the round-4 pairwise top-k merge (serial
        # replace-max chain replaced by prefix-shifted pairwise selects)
        # vs the round-3 "topt" chain, at the two best query tiles
        modes = {
            f"{mg}_qt{qt}": make("i8", False, fused_qt=qt, fused_merge=mg)
            for mg in ("topt", "pair") for qt in (64, 128)
        }
    elif args.sweep == "wire":
        # query wire A/B: bf16 (2 B/dim) vs i8 (1 B/dim absmax codes,
        # dequantized in-trace) on the i8 packed layout — halves the
        # host->device query upload on a link-bound e2e path at recall
        # parity (the corpus side is untouched)
        modes = {
            "wire_bf16": make("i8", False, query_wire="bf16"),
            "wire_i8": make("i8", False, query_wire="i8"),
        }
    elif args.sweep == "combo":
        # do the two link-side levers stack? i8 wire (half the upload
        # bytes) x query_block=16384 (half the RPC count)
        modes = {
            "base": make("i8", False),
            "wire_i8": make("i8", False, query_wire="i8"),
            "qb16384": make("i8", False, query_block=16384),
            "wire_i8_qb16384": make("i8", False, query_wire="i8",
                                    query_block=16384),
        }
    elif args.sweep == "qb":
        # query_block A/B: fewer, larger dispatches amortize the fixed
        # per-RPC wall cost (~100-200ms, batch-size independent) at the
        # price of a longer pipeline fill
        modes = {
            f"qb{qb}": make("i8", False, query_block=qb)
            for qb in (8192, 16384, 32768)
        }
    else:
        # DMA-wait placement A/B: per-8-query-group waits immediately
        # before each group's matmul (opt-in dbg="group_wait") vs the
        # default all-upfront waits.  The chained device-side probe
        # settled this (group 24% slower, BENCH_NOTES "DMA-wait
        # placement"); this wall-clock sweep is kept for e2e sanity.
        modes = {"group": make("i8", False), "eager": make("i8", False)}
        dbg_env = {"group": "group_wait", "eager": ""}

    rng = np.random.default_rng(11)

    def batch():
        return rng.standard_normal((args.Q, D)).astype(np.float32)

    # recall parity on the canonical 400 queries (merge modes must match)
    ds_path = ("data/synthetic_uniform_sphere_"
               "n56000_dim128_m400_k10.dataset")
    gt_sets = None
    if args.sweep in ("merge", "wire", "combo") and os.path.exists(ds_path):
        import json as _json

        with open(ds_path) as f:
            ds = _json.load(f)
        qreal = np.asarray(ds["all_query_vecs"], np.float32)
        gt = np.asarray(ds["all_query_ans"], np.int64)
        gt_sets = [set(int(v) for v in row) for row in gt]

    def set_env(name):
        if args.sweep == "dma":
            os.environ["EXPANN_FUSED_DBG"] = dbg_env[name]

    for name, eng in modes.items():  # compile/warm every mode first
        set_env(name)
        eng.query_k_batch(batch(), 10)
        if gt_sets is not None:
            ids = eng.query_k_batch(qreal, 10)
            rec = np.mean([
                len(set(map(int, a)) & g) / 10
                for a, g in zip(ids, gt_sets)
            ])
            print(f"warmed {name}  recall@10={rec:.4f}", flush=True)
        else:
            print(f"warmed {name}", flush=True)

    results = {name: [] for name in modes}
    for rep in range(args.reps):
        for name, eng in modes.items():  # interleaved: drift cancels
            set_env(name)
            b = batch()
            t0 = time.perf_counter()
            eng.query_k_batch(b, 10)
            qps = args.Q / (time.perf_counter() - t0)
            results[name].append(qps)
            print(json.dumps({"mode": name, "rep": rep,
                              "qps": round(qps, 1)}), flush=True)

    summary = {
        name: {"median_qps": round(float(np.median(v)), 1),
               "best_qps": round(max(v), 1)}
        for name, v in results.items()
    }
    print(json.dumps({"ab_summary": summary, "Q": args.Q, "ef": args.ef}))


if __name__ == "__main__":
    main()
