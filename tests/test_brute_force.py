import numpy as np
import jax.numpy as jnp

from expann_tpu.models.brute_force import BruteForceEngine


def _np_knn(q, x, k):
    d = ((q[:, None, :].astype(np.float64) - x[None, :, :].astype(np.float64)) ** 2).sum(-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def test_brute_force_exact():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 32)).astype(np.float32)
    q = rng.standard_normal((17, 32)).astype(np.float32)
    eng = BruteForceEngine()
    eng.store_many_vectors(x)
    eng.build()
    got = eng.query_k_batch(q, 5)
    want = _np_knn(q, x, 5)
    # allow order flips on exact ties only (random floats: no ties expected)
    np.testing.assert_array_equal(got, want)


def test_brute_force_single_query_api():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((100, 16)).astype(np.float32)
    eng = BruteForceEngine()
    for row in x:
        eng.store_vector(row)
    eng.build()
    ids = eng.query_k(x[7], 1)
    assert ids == [7]


def test_brute_force_normalize():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((50, 8)).astype(np.float32) * 10
    eng = BruteForceEngine()
    eng.store_many_vectors(x, take_norms=True)
    eng.build()
    q = x[3] / np.linalg.norm(x[3])
    assert eng.query_k(q, 1) == [3]


def test_brute_force_fused_pallas_mode():
    # the fused Pallas kernel runs in interpret mode on CPU (small case)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((512, 32)).astype(np.float32)
    q = rng.standard_normal((64, 32)).astype(np.float32)
    eng = BruteForceEngine(mode="fused")
    eng.store_many_vectors(x)
    eng.build()
    got = eng.query_k_batch(q, 5)
    want = _np_knn(q, x, 5)
    # bf16 corpus: allow tiny disagreement on near-ties
    agree = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(got, want)])
    assert agree >= 0.95, f"fused agreement {agree}"


def test_brute_force_fused_i8_mode():
    # centered int8 scan + exact f32 rerank (interpret mode on CPU)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((512, 32)) * 3 + 1.5).astype(np.float32)
    q = (rng.standard_normal((64, 32)) * 3 + 1.5).astype(np.float32)
    eng = BruteForceEngine(mode="fused_i8")
    eng.store_many_vectors(x)
    eng.build()
    got = eng.query_k_batch(q, 5)
    want = _np_knn(q, x, 5)
    agree = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(got, want)])
    assert agree >= 0.97, f"fused_i8 agreement {agree}"


def test_brute_force_fused_i8_bf16_rerank():
    # i8 scan + NEAR-exact bf16 rerank corpus (2 B/dim — the 10M+ row
    # single-chip HBM regime, tools/bench_bigflat.py)
    rng = np.random.default_rng(6)
    x = (rng.standard_normal((512, 32)) * 3 + 1.5).astype(np.float32)
    q = (rng.standard_normal((64, 32)) * 3 + 1.5).astype(np.float32)
    eng = BruteForceEngine(mode="fused_i8", rerank_store="bf16")
    eng.store_many_vectors(x)
    eng.build()
    assert eng._x.dtype == jnp.bfloat16
    got = eng.query_k_batch(q, 5)
    want = _np_knn(q, x, 5)
    agree = np.mean([len(set(a) & set(b)) / 5 for a, b in zip(got, want)])
    assert agree >= 0.95, f"fused_i8 bf16-rerank agreement {agree}"
