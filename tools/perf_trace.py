"""Trace-driven serving profile (exercises utils/profiling.trace).

Captures a ``jax.profiler`` trace around ONE fused serving dispatch on the
packed 56k index and reports where device time goes: per-op totals parsed
straight out of the perfetto ``trace.json.gz`` the profiler writes — no
TensorBoard needed on this headless host.

This is the TPU-native analogue of the reference's callgrind toggles
around the query loop (reference: src/basic_bench.h:76-77,128-129): the
counters say HOW MANY distance comps ran (RECORD_STATS,
src/antitopo_engine.h:125-129); the trace says WHERE the nanoseconds went.

Usage:  python tools/perf_trace.py [--B 8192] [--ef 100] [--top 15]
Writes the raw trace under /tmp/expann_tpu_trace/ and prints a JSON line
with the top ops by device time.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from expann_tpu.utils import runtime  # noqa: F401  (compile cache)
from expann_tpu.utils.profiling import annotate, trace

IDX = "/tmp/perf_fused_idx_56000.npz"


def parse_trace(log_dir: str, top: int):
    """Aggregate per-op device time out of the newest perfetto trace."""
    paths = sorted(
        glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    if not paths:
        return None, None
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # device events live on pids whose process_name mentions TPU/device;
    # host python/runtime threads are excluded from the op aggregation
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, nm in pid_name.items()
        if any(s in nm.lower() for s in ("tpu", "device", "xla", "/device"))
    }
    op_us = defaultdict(float)
    total_us = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        op_us[e["name"]] += e["dur"]
        total_us += e["dur"]
    ranked = sorted(op_us.items(), key=lambda kv: -kv[1])[:top]
    return ranked, total_us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=8192)
    ap.add_argument("--ef", type=int, default=100)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--log-dir", default="/tmp/expann_tpu_trace")
    args = ap.parse_args()

    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine

    assert os.path.exists(IDX), (
        f"{IDX} missing — build it first (tools/perf_e2e_graph.py)"
    )
    cfg = AntitopoConfig(
        M=60, ef_construction=500, prune_cand=500,
        packed_dtype="i8", entry_seeds=8, ef_search=args.ef,
        index_filename=IDX, read_index=True, write_index=False,
    )
    eng = AntitopoEngine(config=cfg)
    eng.build()
    eng._resolve_packed()

    rng = np.random.default_rng(7)
    qs = rng.standard_normal((args.B, 128)).astype(np.float32)
    # compile + warm OUTSIDE the trace so the capture is pure steady-state
    eng.query_k_batch(qs, 10)

    qs2 = rng.standard_normal((args.B, 128)).astype(np.float32)
    t0 = time.perf_counter()
    with trace(args.log_dir):
        with annotate("fused_serving_dispatch"):
            eng.query_k_batch(qs2, 10)
    wall = time.perf_counter() - t0
    print(f"traced dispatch: {wall * 1e3:.1f} ms wall (B={args.B})",
          flush=True)

    ranked, total_us = parse_trace(args.log_dir, args.top)
    if ranked is None:
        print(json.dumps({"error": "no trace.json.gz found",
                          "log_dir": args.log_dir}))
        return
    out = {
        "B": args.B,
        "ef": args.ef,
        "wall_ms": round(wall * 1e3, 1),
        "device_total_us": round(total_us, 1),
        "top_ops": [
            {"op": name[:120], "us": round(us, 1),
             "pct": round(100 * us / total_us, 1)}
            for name, us in ranked
        ],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
