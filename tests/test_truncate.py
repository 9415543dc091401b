"""Serving-R truncation (tools/truncate_index.py): a wider-built index
truncated to a smaller bottom-layer degree must load and serve through
the engine (including the fused path at RS not a multiple of 128, the
VPU-scoring kernel engine) with only a graceful recall cost.

Reference analogy: serving an M-built graph at a smaller degree — the
prune emits forward rows roughly best-first (models/build.py), so a
prefix of the row is a meaningful subgraph, which is what lets the 2M
scale story fit HBM (BENCH_NOTES) and the 56k serving-R sweep trade
matmul width for iterations.
"""

import os
import subprocess
import sys

import numpy as np

from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
from expann_tpu.utils.persist import save_index

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_truncated_index_serves(tmp_path):
    rng = np.random.default_rng(3)
    n, d = 500, 32
    x = rng.standard_normal((n, d)).astype(np.float32)
    eng = AntitopoEngine(
        config=AntitopoConfig(M=16, ef_construction=64, ef_search_mult=6)
    )
    eng.store_many_vectors(x)
    eng.build()
    full = str(tmp_path / "full.npz")
    save_index(full, eng.graph, {"dim": d})
    r_full = np.load(full)["adj_bottom"].shape[1]
    assert r_full >= 32

    trunc = str(tmp_path / "trunc.npz")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "truncate_index.py"),
         "--in", full, "--r0", "16", "--out", trunc],
        check=True,
    )
    assert np.load(trunc)["adj_bottom"].shape[1] == 16

    # exact oracle for recall
    d2 = (
        np.sum(x**2, 1)[None, :]
        + np.sum(x**2, 1)[:, None]
        - 2 * (x @ x.T)
    )
    gt = np.argsort(d2, axis=1)[:, :5]

    def recall(cfg):
        e2 = AntitopoEngine(config=cfg)
        e2.store_many_vectors(x)
        e2.build()  # reads the file
        ids = e2.query_k_batch(x, 5)
        return np.mean([
            len(set(map(int, ids[i])) & set(map(int, gt[i]))) / 5
            for i in range(n)
        ])

    base = dict(M=16, ef_construction=64, ef_search_mult=8, read_index=True)
    r_t = recall(AntitopoConfig(index_filename=trunc, **base))
    r_f = recall(AntitopoConfig(index_filename=full, **base))
    # truncated serving stays functional and close to the full graph
    assert r_f >= 0.9
    assert r_t >= r_f - 0.15
    assert r_t >= 0.7
