"""Reproduce the i4 query-wire retirement result (BENCH_NOTES "i4 query
wire — recall-killer").

The flat i8 serving path is link-bound: ~88% of a 65536-query batch is
the 8MB i8 query upload.  The next wire rung down is 4-bit query codes
(64 B/query).  This sim answers — on CPU numpy, before any kernel work —
whether an i4 QUERY wire can hold recall@10 >= 0.95 when the corpus
stays s8 and the rerank can only use the dequantized wire query (the
true f32 query never crosses the wire, exactly the `query_wire="i8"`
flow in models/brute_force.py).

Recorded result (canonical 56k clustered dataset, 2026-08-19):

    i8 corpus-scale          0.9798
    i4 corpus-scale          0.7285
    i4 per-query absmax      0.8265
    i4 per-query absmax m=64 0.8265  (rerank width changes NOTHING)

The m=30 -> m=64 invariance localizes the loss: it is query-quantization
noise inside the rerank itself, not candidate coverage — so no scan-side
fix recovers it, and the direction was retired without device work.

Run: python tools/sim_i4_wire.py  (CPU-only, ~1 min; N=8000 quick mode
via SIM_QUICK=1)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dist2_int(qc: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Integer-exact squared L2 in code space, f64 accumulation on CPU."""
    q = qc.astype(np.float64)
    c = codes.astype(np.float64)
    return (
        (q * q).sum(1)[:, None] + (c * c).sum(1)[None, :] - 2.0 * q @ c.T
    )


def recall_at_k(ids: np.ndarray, gt: np.ndarray, k: int) -> float:
    hit = 0
    for row, g in zip(ids, gt):
        hit += len(set(row[:k].tolist()) & set(g[:k].tolist()))
    return hit / (ids.shape[0] * k)


def run_wire(name, codes, center, scale, q, gt, k=10, m=30):
    """Scan in code space with the wire query, rerank the top-m candidates
    against the DEQUANTIZED wire query (the true query is not available
    server-side), report recall@10."""
    qc_f = (q - center) * scale
    if name == "i8":
        qw = np.clip(np.rint(qc_f), -127, 127)
        deq = qw / scale + center
    elif name == "i4":
        # corpus-scale i4: reuse the corpus scale, coarsen to 4-bit steps
        qw = np.clip(np.rint(qc_f / 16.0), -7, 7)
        deq = qw * 16.0 / scale + center
        qw = qw * 16.0  # scan in the corpus code space
    elif name == "i4_absmax":
        # per-query absmax i4: each query ships its own scale (f32, 4 bytes)
        am = np.abs(qc_f).max(axis=1, keepdims=True)
        am = np.where(am == 0, 1.0, am)
        qw = np.clip(np.rint(qc_f / am * 7.0), -7, 7)
        qw = qw * am / 7.0  # rescale into corpus code space
        deq = qw / scale + center
    else:
        raise ValueError(name)

    d2 = dist2_int(qw, codes)
    cand = np.argsort(d2, axis=1)[:, :m]
    # exact f32 rerank — but with the dequantized wire query
    out = np.empty((q.shape[0], k), np.int64)
    for i in range(q.shape[0]):
        cv = codes[cand[i]].astype(np.float32) / scale + center
        dd = ((deq[i].astype(np.float32) - cv) ** 2).sum(1)
        out[i] = cand[i][np.argsort(dd)[:k]]
    return recall_at_k(out, gt, k)


def main():
    quick = os.environ.get("SIM_QUICK") == "1"
    n, mq, d, k = (8000, 100, 128, 10) if quick else (56000, 400, 128, 10)

    from expann_tpu.data.loader import load_synthetic_uniform_sphere_points
    from expann_tpu.ops.pallas_topk import quantize_corpus_i8

    ds = load_synthetic_uniform_sphere_points(n=n, m=mq, k=k, d=d)
    x = np.asarray(ds.vecs, np.float32)
    q = np.asarray(ds.queries, np.float32)
    gt = np.asarray(ds.ground_truth)

    codes_dev, center, scale, _ = quantize_corpus_i8(x)
    codes = np.asarray(codes_dev)[:n]

    for name, m in (("i8", 30), ("i4", 30), ("i4_absmax", 30),
                    ("i4_absmax", 64)):
        r = run_wire(name, codes, center, scale, q, gt, k=k, m=m)
        print(f"{name:12s} m={m:3d}  recall@{k} = {r:.4f}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
