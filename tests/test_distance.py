import numpy as np
import jax.numpy as jnp

from expann_tpu.ops.distance import (
    pairwise_dist2,
    batched_neighbour_dist2,
    squared_norms,
    pad_dim,
)


def _np_pairwise(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


def test_pairwise_dist2_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((7, 96)).astype(np.float32)
    x = rng.standard_normal((33, 96)).astype(np.float32)
    got = np.asarray(pairwise_dist2(jnp.asarray(pad_dim(q)), jnp.asarray(pad_dim(x))))
    want = _np_pairwise(q.astype(np.float64), x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_padding_preserves_distance():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((4, 100)).astype(np.float32)
    x = rng.standard_normal((5, 100)).astype(np.float32)
    unpadded = _np_pairwise(q.astype(np.float64), x.astype(np.float64))
    got = np.asarray(pairwise_dist2(jnp.asarray(pad_dim(q)), jnp.asarray(pad_dim(x))))
    np.testing.assert_allclose(got, unpadded, rtol=2e-4, atol=2e-3)


def test_batched_neighbour_dist2():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((6, 128)).astype(np.float32)
    nbr = rng.standard_normal((6, 10, 128)).astype(np.float32)
    nbr_norms = (nbr.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    got = np.asarray(
        batched_neighbour_dist2(jnp.asarray(q), jnp.asarray(nbr), jnp.asarray(nbr_norms))
    )
    want = ((q[:, None, :].astype(np.float64) - nbr.astype(np.float64)) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_squared_norms():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((12, 64)).astype(np.float32)
    got = np.asarray(squared_norms(jnp.asarray(x)))
    want = (x.astype(np.float64) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_inf_norm_sentinel_masks():
    # a row with stored norm +inf must score +inf (the sentinel trick)
    q = jnp.ones((2, 128), jnp.float32)
    nbr = jnp.zeros((2, 3, 128), jnp.float32)
    norms = jnp.array([[0.0, jnp.inf, 0.0]] * 2, jnp.float32)
    d = np.asarray(batched_neighbour_dist2(q, nbr, norms))
    assert np.isinf(d[:, 1]).all()
    assert np.isfinite(d[:, 0]).all()
