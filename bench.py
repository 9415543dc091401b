"""Round benchmark: recall@10 vs QPS on the canonical synthetic config
(n=56000, m=400, d=128, k=10 — the reference's config_synthetic.json).

Measures the engine suite and reports the best QPS among points with
recall@10 >= 0.95:
  * TPU-Flat — the fused Pallas streamed matmul + on-chip top-k brute force
    (recall ~0.993 — near-exact, see ops/pallas_topk.py; the TPU-native
    answer at these corpus scales),
  * Anti-Topo graph engine at a few ef_search points (the algorithmic
    parity engine; wins at corpus scales beyond brute-force feasibility).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

vs_baseline: the reference publishes no numbers (BASELINE.md) and cannot be
built in this image (empty Eigen/pybind11 submodules, no network).  The
denominator is MEASURED on this host instead: a single-core C++
re-implementation of the reference's serving loop (greedy descent +
bottom-layer beam search + autovectorized AVX-512 L2, reference
src/antitopo_engine.h:497-688,854-903) over the same built 56k graph does
587.2 QPS at recall@10 = 0.952 (ef=100) — native/baseline_search.cpp,
methodology in BASELINE.md "Measured baseline".  The round-1..3 10k-QPS
engineering ESTIMATE (which assumed a modern multi-GHz desktop core rather
than this host's 1-core 2.1GHz Xeon) is still reported alongside as
vs_baseline_est10k for cross-round comparability.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_QPS_EST = 10_000.0  # round-1..3 engineering estimate (see docstring)
BASELINE_QPS_MEASURED = 587.2  # native/baseline_search.cpp @ recall 0.952
BASELINE_BUILD_S = 1028.9  # native/baseline_build.cpp, 56k M=60 efc=500 solo
RECALL_TARGET = 0.95


def _recall(ans, gt_sets, k):
    m = len(gt_sets)
    hits = sum(
        len(set(int(v) for v in ans[i]) & gt_sets[i]) for i in range(m)
    )
    return hits / (m * k)


def _qps(eng, d, k, Q=8192, seed=20260816, reps=5):
    """Throughput on UNIQUE random queries, a fresh batch per repetition.

    Tiling the 400 real queries (round 1) risked dispatch dedup/caching on
    this host (CLAUDE.md) and gave a graph traversal unrepresentatively
    identical beams; unique N(0,1) queries match the synthetic dataset's
    query distribution (data/loader.py:generate_synthetic).

    Returns ``(median_qps, best_qps)`` over ``reps`` timed runs: the
    MEDIAN is the reported number (the axon host<->device tunnel has
    measured load variance, BENCH_NOTES; best-of flatters), the best is
    recorded alongside for comparability with earlier rounds."""
    rng = np.random.default_rng(seed)

    def batch():
        return rng.standard_normal((Q, d)).astype(np.float32)

    eng.query_k_batch(batch(), k)  # warmup / compile
    times = []
    for _ in range(reps):
        b = batch()
        t0 = time.perf_counter()
        eng.query_k_batch(b, k)
        times.append(time.perf_counter() - t0)
    return Q / float(np.median(times)), Q / min(times)


def _device_qps_flat(flat, k, Q=65536, reps=5):
    """Device-side flat-scan ceiling: bf16 queries generated ON DEVICE
    (fresh PRNG key per rep — identical dispatches dedup on this host),
    one flat_topk dispatch per timed rep.  Excludes the host<->device
    query transfer; includes the per-dispatch RPC."""
    import jax
    import jax.numpy as jnp

    from expann_tpu.ops.pallas_topk import flat_topk

    D = flat._x_fused.shape[1]

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (Q, D), jnp.bfloat16)

    def run(key):
        ids, _ = flat_topk(
            gen(key), flat._x_fused, n_real=flat._n_fused, k=k
        )
        return ids

    run(jax.random.PRNGKey(0)).block_until_ready()  # warmup/compile
    times = []
    for r in range(reps):
        q_key = jax.random.PRNGKey(r + 1)
        t0 = time.perf_counter()
        run(q_key).block_until_ready()
        times.append(time.perf_counter() - t0)
    return Q / float(np.median(times))


def _device_qps_graph(graph_eng, d, k, ef=120, B=512):
    """Device-side graph-engine ceiling at the best recall>=0.95 point
    (ef=120): the full query path (entry scan + fused traversal + exact
    rerank) timed by the chained-slope instrument perf_latency.py
    validated — serially dependent dispatches inside ONE jit, so RPC
    overhead and dispatch dedup both cancel (CLAUDE.md timing note).
    Recorded alongside the e2e numbers because the axon host<->device
    tunnel's load variance dominates e2e at these rates (BENCH_NOTES
    round-4 refresh); this number is the tunnel-independent capability."""
    import functools

    import jax
    import jax.numpy as jnp

    from expann_tpu.models.search import fused_query_batch

    g = graph_eng.graph
    cfg = graph_eng.cfg

    @functools.partial(jax.jit, static_argnames=("k_", "qt_", "E_", "C_"))
    def chain(gr, qb, reps, salt, ef_s, k_, qt_, E_, C_):
        def body(_, carry):
            c, acc = carry
            ids, _, _ = fused_query_batch(
                gr, qb + c * 1e-6, ef=ef_s, k=k_, ef_cap=128,
                expand=E_, cand=C_, qt=qt_, seeds=cfg.entry_seeds,
                precision=cfg.precision,
            )
            c2 = (ids.sum() % 1024).astype(jnp.float32) * 1e-3
            return (c2, acc + c2)

        _, acc = jax.lax.fori_loop(0, reps, body, (salt, jnp.float32(0.0)))
        return acc

    rng = np.random.default_rng(7)
    qb = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    salt = [0]

    def t(reps):
        salt[0] += 1
        t0 = time.perf_counter()
        chain(
            g, qb, jnp.int32(reps), np.float32((salt[0] % 997) * 1e-4),
            jnp.int32(ef), k_=k, qt_=min(cfg.fused_qt, B),
            E_=cfg.query_expand, C_=cfg.fused_cand,
        ).block_until_ready()
        return time.perf_counter() - t0

    t(1)  # compile
    r1, r2 = 4, 8
    while t(r2) < 0.5 and r2 < 4096:
        r2 *= 2
    slopes = [(t(r2) - t(r1)) / (r2 - r1) for _ in range(3)]
    return B / float(np.median(slopes))


def _wait_for_device() -> None:
    """Bounded wait for the TPU tunnel before touching jax in-process.

    The axon tunnel has multi-hour outages during which the FIRST device
    RPC blocks forever (CLAUDE.md).  Probing in a subprocess keeps this
    process clean: poll once a minute for up to BENCH_DEVICE_WAIT_S
    (default 3h), then proceed regardless (a still-down tunnel blocks at
    first compile exactly as before — this preamble only ever helps)."""
    import subprocess

    budget = float(os.environ.get("BENCH_DEVICE_WAIT_S", "10800"))
    deadline = time.monotonic() + budget
    probe = [sys.executable, "-c", "import jax; jax.devices()"]
    while True:
        try:
            if subprocess.run(
                probe, timeout=60, capture_output=True
            ).returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            print(
                "bench.py: device probe still failing after "
                f"{budget:.0f}s wait budget; proceeding anyway",
                file=sys.stderr,
            )
            return
        print("bench.py: waiting for TPU tunnel ...", file=sys.stderr)
        time.sleep(60)


def main() -> None:
    _wait_for_device()
    quick = os.environ.get("BENCH_QUICK") == "1"
    n, m, d, k = (8000, 200, 128, 10) if quick else (56000, 400, 128, 10)

    from expann_tpu.data.loader import load_synthetic_uniform_sphere_points
    from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
    from expann_tpu.models.brute_force import BruteForceEngine

    ds = load_synthetic_uniform_sphere_points(n=n, m=m, k=k, d=d)
    gt_sets = [set(int(v) for v in row) for row in ds.ground_truth]
    points = []  # (name, recall, qps)

    # --- TPU-Flat: fused Pallas brute force ---
    flat = BruteForceEngine(mode="fused")
    flat.store_many_vectors(ds.vecs)
    t0 = time.perf_counter()
    flat.build()
    flat_build_s = time.perf_counter() - t0
    flat_recall = _recall(flat.query_k_batch(ds.queries, k), gt_sets, k)
    # per-call overhead dominates the fused kernel; throughput is measured
    # at a production-sized batch
    flat_qps, flat_best = _qps(flat, d, k, Q=16384 if quick else 65536)
    # a flat scan scores the whole corpus once per query
    points.append(("tpu_flat", flat_recall, flat_qps, n, flat_best))
    # device-side ceiling: queries already resident, fresh per dispatch —
    # excludes the axon host<->device tunnel whose load variance dominates
    # e2e jitter (BENCH_NOTES "tunnel-load variance")
    flat_dev_qps = _device_qps_flat(flat, k, Q=16384 if quick else 65536)

    # --- TPU-Flat i8 wire: s8 codes on the wire (1 B/dim), s8 MXU scan,
    # on-device dequantized-query rerank.  With the count-mode merge the
    # device scan runs ~1.1M QPS and e2e is bound by the host<->device
    # query transfer, so wire bytes are the e2e lever (models/brute_force
    # query_wire='i8').
    if not quick:
        flat8 = BruteForceEngine(mode="fused_i8", query_wire="i8")
        flat8.store_many_vectors(ds.vecs)
        flat8.build()
        rec8 = _recall(flat8.query_k_batch(ds.queries, k), gt_sets, k)
        qps8, best8 = _qps(flat8, d, k, Q=65536)
        points.append(("tpu_flat_i8", rec8, qps8, n, best8))

    # --- Anti-Topo graph engine ---
    # prune_overflow=1 and full-width prune candidates sit inside the
    # reference's own sweep grid (src/bench_runner.h:133-163) and give the
    # best recall curve on this dataset (see tools/ sweeps).  Queries run
    # the fully fused in-kernel traversal (use_fused='auto' -> on, TPU;
    # ops/pallas_fused.py) at the round-4 re-sweep's best operating point:
    # expand=2, cand=8, qt=128 (tools/perf_oppoint.py — post-dup-fix the
    # optimum moved from the round-2 cand=16: identical recall at 8-9%
    # lower device time, 143.8k QPS device-side @ ef=100).  query_block
    # with a production-sized Q: the per-dispatch wall overhead on this
    # host (~100-200ms, batch-size independent — tools/perf_e2e_graph.py)
    # dominates small batches; amortization is the decisive QPS lever
    # (42k -> 75k QPS at ef=100 going from Q=8k/qb=4k to Q=64k/qb=8k,
    # then +22% more at qb=16k — see the cfg note below).
    cfg = AntitopoConfig(
        M=60,
        ef_construction=500,
        ortho_count=1,
        prune_overflow=1,
        prune_cand=500,
        query_expand=2,
        packed_topt=8,
        fused_cand=8,
        fused_qt=128,
        # qb=16384 halves the RPC count at Q=65536 vs the round-3 8192:
        # +22% e2e (tools/perf_ab_serving.py --sweep qb).  Re-tested with
        # the round-5 prefetch uploads (2026-08-21): 32768 won a LOADED-
        # tunnel interleaved A/B by ~6% median but lost the light-tunnel
        # full capture by 9% (108.3k vs 118.9k @ wire_i8 ef=110), so
        # 16384 stays — block size trades wire batching against pipeline
        # granularity and the capture conditions are the light ones
        query_block=16384,
        # dense multi-seed entry scan: same recall, ~1.7x QPS (better
        # entries -> far fewer traversal iterations; the upper-layer
        # member matmul is nearly free on the MXU)
        entry_seeds=8,
        precision="default",
    )
    graph = AntitopoEngine(config=cfg)
    graph.store_many_vectors(ds.vecs)
    t0 = time.perf_counter()
    graph.build()
    graph_build_s = time.perf_counter() - t0
    for mult in ([4] if quick else [4, 6, 10, 12]):
        graph.set_ef_search(k * mult)  # also resets distcomp counters
        rec = _recall(graph.query_k_batch(ds.queries, k), gt_sets, k)
        distcomps = (
            graph.num_distcomps + graph.num_distcomps_compressed
        ) / m  # per query, from the recall run (RECORD_STATS parity)
        qps, qbest = _qps(graph, d, k, Q=8192 if quick else 65536)
        points.append((f"antitopo_ef{k * mult}", rec, qps, distcomps, qbest))

    # tunnel-independent graph capability at the best recall>=0.95 point
    graph_dev_qps = _device_qps_graph(graph, d, k, ef=120)

    # quantized serving (the reference's use_compression=true grid half):
    # centered-s8 packed blocks scored in code space in-kernel + exact f32
    # rerank — half the DMA bytes of the bandwidth-bound fused traversal
    if not quick:
        graph.cfg.use_compression = True
        graph._attach_codes()
        # ef=110 (mult 11) is the sweet spot measured in /tmp sweeps:
        # 77.5k QPS @ recall 0.9590 — the best graph point clearing the
        # 0.95 gate (ef=100 sits at 0.9497, just under)
        for mult in [10, 11, 12]:
            graph.set_ef_search(k * mult)
            rec = _recall(graph.query_k_batch(ds.queries, k), gt_sets, k)
            distcomps = (
                graph.num_distcomps + graph.num_distcomps_compressed
            ) / m
            qps, qbest = _qps(graph, d, k, Q=65536)
            points.append(
                (f"antitopo_compressed_ef{k * mult}", rec, qps, distcomps, qbest)
            )
        # tunnel-independent ceiling for the s8 code-space path too: the
        # i8 packed blocks halve the traversal's DMA bytes, so this is
        # the graph engine's true single-chip capability number
        graph_dev_qps_i8 = _device_qps_graph(graph, d, k, ef=120)

        # i8 query wire on the s8 packed layout (query_wire="i8"): the
        # host ships 1 B/dim absmax codes dequantized in-trace — halves
        # the query upload on the link-bound e2e path (+20% measured,
        # BENCH_NOTES "query wire") at a ~0.006 recall cost from query
        # quantization, so the gate-clearing points sit at ef>=120
        # (ef stays <= 128: crossing the 128-wide beam bucket would
        # compile the 256 kernel fresh inside the driver run)
        graph.cfg.query_wire = "i8"
        for mult in [11, 12]:
            graph.set_ef_search(k * mult)
            rec = _recall(graph.query_k_batch(ds.queries, k), gt_sets, k)
            distcomps = (
                graph.num_distcomps + graph.num_distcomps_compressed
            ) / m
            qps, qbest = _qps(graph, d, k, Q=65536)
            points.append(
                (f"antitopo_wire_i8_ef{k * mult}", rec, qps, distcomps, qbest)
            )
        graph.cfg.query_wire = "bf16"
    else:
        graph_dev_qps_i8 = 0.0

    qualifying = [p for p in points if p[1] >= RECALL_TARGET]
    best = max(qualifying, key=lambda p: p[2]) if qualifying else max(
        points, key=lambda p: p[1]
    )

    out = {
        "metric": f"synthetic n={n} d=128 best QPS at recall@10>={RECALL_TARGET}",
        "value": round(best[2], 1),
        "unit": "qps",
        "vs_baseline": round(best[2] / BASELINE_QPS_MEASURED, 3),
        "vs_baseline_est10k": round(best[2] / BASELINE_QPS_EST, 3),
        "best_engine": best[0],
        "recall": round(best[1], 4),
        "time_per_query_ns": round(1e9 / best[2], 0),
        "qps_stat": "median of 5 (fresh unique batches); qps_best alongside",
        "flat_device_qps": round(flat_dev_qps, 1),
        "graph_device_qps": round(graph_dev_qps, 1),
        "graph_device_qps_i8": round(graph_dev_qps_i8, 1),
        "graph_device_ef": 120,
        "pareto": [
            {
                "engine": nm,
                "recall": round(r, 4),
                "qps": round(q, 1),
                "qps_best": round(qb, 1),
                "distcomps_per_query": round(dc, 1),
            }
            for nm, r, q, dc, qb in points
        ],
        "flat_build_s": round(flat_build_s, 1),
        "graph_build_s": round(graph_build_s, 1),
        "vs_baseline_build": round(BASELINE_BUILD_S / graph_build_s, 2),
        "baseline_note": (
            "vs_baseline = measured single-core CPU reference-loop QPS on "
            "this host (587.2 @ recall 0.952, native/baseline_search.cpp, "
            "BASELINE.md); vs_baseline_est10k = rounds 1-3 estimate; "
            "vs_baseline_build = measured single-core insert-loop build "
            "wall-clock (1028.9s at the canonical 56k config, "
            "native/baseline_build.cpp) / graph_build_s"
        ),
        "pairing_note": (
            "recall is measured on the 400 canonical queries; QPS on "
            "fresh unique N(0,1) batches of the same distribution "
            "(identical repeated batches get dispatch-deduped on this "
            "stack and report absurd numbers — BENCH_NOTES 'protocol')"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
