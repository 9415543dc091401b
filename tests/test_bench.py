import json
import os

import numpy as np

from expann_tpu.bench.bench_data import BenchData
from expann_tpu.bench.harness import get_benchmark_data
from expann_tpu.bench.manager import BenchDataManager
from expann_tpu.data.dataset import TestDataset
from expann_tpu.data.loader import (
    load_synthetic_uniform_sphere_points,
    read_vecs,
)
from expann_tpu.models.brute_force import BruteForceEngine


def test_bench_data_json_schema_roundtrip():
    bd = BenchData(
        time_per_query_ns=123.0,
        time_to_build_ns=456.0,
        average_distance=1.5,
        average_squared_distance=2.25,
        recall=0.97,
        engine_name="Anti-Topo Engine+",
        param_list={"M": "60"},
    )
    j = json.loads(bd.to_string())
    # exact reference field names (src/bench_data.h:20-27)
    assert set(j.keys()) == {
        "time_per_query_ns",
        "time_to_build_ns",
        "average_distance",
        "average_squared_distance",
        "recall",
        "engine_name",
        "param_list",
    }
    bd2 = BenchData.from_dict(j)
    assert bd2 == bd


def test_manager_all_latest_layout(tmp_path):
    bdm = BenchDataManager("testds")
    bdm.add(BenchData(recall=0.5, engine_name="e"))
    prefix = str(tmp_path) + "/run/"
    bdm.save(prefix)
    bdm.save(prefix)  # second save appends to all.json, overwrites latest
    with open(prefix + "data/latest.json") as f:
        latest = json.load(f)
    with open(prefix + "data/all.json") as f:
        allj = json.load(f)
    assert len(latest) == 1
    assert len(allj) == 2


def test_harness_brute_force_perfect_recall(tmp_path):
    ds = load_synthetic_uniform_sphere_points(
        n=300, m=20, k=5, d=16, cache_dir=str(tmp_path)
    )
    eng = BruteForceEngine()
    bd = get_benchmark_data(eng, ds)
    assert bd.recall == 1.0
    assert bd.engine_name == "Brute-Force Engine"
    assert bd.time_to_build_ns > 0
    assert bd.time_per_query_ns > 0
    # cache file created and loadable
    ds2 = load_synthetic_uniform_sphere_points(
        n=300, m=20, k=5, d=16, cache_dir=str(tmp_path)
    )
    np.testing.assert_array_equal(ds.ground_truth, ds2.ground_truth)


def test_fvecs_ivecs_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((10, 7)).astype(np.float32)
    path = str(tmp_path / "x.fvecs")
    with open(path, "wb") as f:
        for row in mat:
            np.int32(7).tofile(f)
            row.tofile(f)
    got = read_vecs(path, np.float32)
    np.testing.assert_array_equal(got, mat)

    imat = rng.integers(0, 100, (5, 3)).astype(np.int32)
    ipath = str(tmp_path / "x.ivecs")
    with open(ipath, "wb") as f:
        for row in imat:
            np.int32(3).tofile(f)
            row.tofile(f)
    got = read_vecs(ipath, np.int64)
    np.testing.assert_array_equal(got, imat.astype(np.int64))


def test_clustered_synthetic_generator():
    """Mixture-of-Gaussians generator: deterministic by seed, and the
    neighbourhood contrast (nn distance << mean distance) that isotropic
    Gaussian data lacks at high d — the property that makes it a
    SIFT-like 1M benchmark surrogate (tools/bench_1m.py --data clustered)."""
    from expann_tpu.data.loader import generate_synthetic_clustered

    x, q = generate_synthetic_clustered(
        4000, 50, 32, n_clusters=40, sigma=0.3, seed=3
    )
    x2, q2 = generate_synthetic_clustered(
        4000, 50, 32, n_clusters=40, sigma=0.3, seed=3
    )
    assert x.shape == (4000, 32) and q.shape == (50, 32)
    assert x.dtype == np.float32
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(q, q2)
    d = ((q[:, None] - x[None]) ** 2).sum(-1)
    nn = np.sqrt(np.sort(d, axis=1)[:, :5].mean())
    mean = np.sqrt(d.mean())
    assert nn < 0.5 * mean, (nn, mean)

    # hardened (round-3) properties: queries are NOT near-duplicates of
    # corpus points (SIFT queries are held-out, not perturbations) ...
    q_nn = np.sqrt(np.sort(d, axis=1)[:, 0])
    x_sub = x[:500]
    dxx = ((x_sub[:, None] - x[None]) ** 2).sum(-1)
    np.fill_diagonal(dxx[:, :500], np.inf)
    x_nn = np.sqrt(np.sort(dxx, axis=1)[:, 0])
    assert np.median(q_nn) > np.median(x_nn), (
        np.median(q_nn), np.median(x_nn)
    )
    # ... and cluster masses are skewed (unequal), unlike round 2's
    # equal-mass generator (available via uniform=True)
    xu, _ = generate_synthetic_clustered(
        4000, 50, 32, n_clusters=40, sigma=0.3, seed=3, uniform=True
    )
    assert not np.allclose(x[:100], xu[:100])


def _write_vecs(path, mat, as_int=False):
    """Write fvecs/ivecs: each record (int32 d, d 4-byte items)
    (reference: src/dataset_loader.h:96-125)."""
    d = mat.shape[1]
    with open(path, "wb") as f:
        for row in mat:
            np.int32(d).tofile(f)
            (row.astype(np.int32) if as_int else row.astype(np.float32)).tofile(f)


def test_cli_sift1m_end_to_end(tmp_path, monkeypatch):
    """The reference's canonical SIFT run, end-to-end through the CLI on
    tiny in-image fvecs/ivecs files: `main --dataset Sift1M` loads
    datasets/sift/*.{fvecs,ivecs}, runs the sweep, and persists
    reference-schema records to ./data/<ds>/data/{all,latest}.json
    (reference: src/main.cpp:72-106).  The job grid is shrunk to two tiny
    configs so the test runs on CPU; the file formats, loader path, runner,
    scoring, and persistence layout are the real ones."""
    import expann_tpu.bench.runner as runner
    from expann_tpu.cli import main
    from expann_tpu.models.antitopo import AntitopoConfig

    rng = np.random.default_rng(7)
    n, m, d, k = 400, 20, 16, 10
    # clustered (easy-ANN) data so the recall floor is robust for both the
    # exact and the quantized job on a tiny config
    centers = rng.standard_normal((40, d)).astype(np.float32)
    base = (
        centers[rng.integers(0, 40, n)]
        + 0.15 * rng.standard_normal((n, d))
    ).astype(np.float32)
    queries = (
        centers[rng.integers(0, 40, m)]
        + 0.15 * rng.standard_normal((m, d))
    ).astype(np.float32)
    d2 = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :k]

    sift_dir = tmp_path / "datasets" / "sift"
    sift_dir.mkdir(parents=True)
    _write_vecs(str(sift_dir / "sift_base.fvecs"), base)
    _write_vecs(str(sift_dir / "sift_query.fvecs"), queries)
    _write_vecs(str(sift_dir / "sift_groundtruth.ivecs"), gt, as_int=True)
    monkeypatch.chdir(tmp_path)

    def tiny_grid(index_dir="index"):
        jobs = []
        for use_compression in (False, True):
            jobs.append(
                AntitopoConfig(
                    M=6,
                    M0=12,
                    ef_search_mult=3,
                    ef_construction=24,
                    prune_cand=24,
                    use_compression=use_compression,
                    index_filename=f"{index_dir}/sift_tiny",
                    read_index=True,
                    write_index=True,
                )
            )
        return jobs

    monkeypatch.setattr(runner, "canonical_job_grid", tiny_grid)
    rc = main(["--dataset", "Sift1M", "--k", str(k), "--ds_name", "sift_tiny"])
    assert rc == 0

    for fname in ("latest.json", "all.json"):
        with open(tmp_path / "data" / "sift_tiny" / "data" / fname) as f:
            recs = json.load(f)
        assert len(recs) == 2
        for r in recs:
            assert set(r.keys()) >= {
                "time_per_query_ns",
                "time_to_build_ns",
                "recall",
                "engine_name",
                "param_list",
            }
            # tiny config on easy data: sanity recall floor, exact schema
            assert r["recall"] > 0.4, r
            assert r["engine_name"] == "Anti-Topo Engine+"
    # the sweep wrote the index file for build reuse (reference
    # src/bench_runner.h:149-158 scheme)
    assert (tmp_path / "index" / "sift_tiny").exists()
