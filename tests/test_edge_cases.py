"""API edge cases: tiny corpora, k near n, input validation."""

import numpy as np
import pytest

from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
from expann_tpu.models.brute_force import BruteForceEngine


def test_brute_force_k_equals_n():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 8)).astype(np.float32)
    eng = BruteForceEngine()
    eng.store_many_vectors(x)
    eng.build()
    ids = eng.query_k_batch(x[:2], 16)
    for row in ids:
        assert sorted(int(v) for v in row) == list(range(16))


def test_antitopo_tiny_corpus():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 8)).astype(np.float32)
    eng = AntitopoEngine(config=AntitopoConfig(M=4, ef_construction=8, ef_search=8))
    eng.store_many_vectors(x)
    eng.build()
    ids = eng.query_k(x[2], 3)
    assert ids[0] == 2
    assert len(set(ids)) == len(ids)


def test_antitopo_single_vector():
    eng = AntitopoEngine(config=AntitopoConfig(M=4, ef_construction=8))
    eng.store_vector(np.ones(8, np.float32))
    eng.build()
    assert eng.query_k(np.ones(8, np.float32), 1) == [0]


def test_antitopo_k_exceeds_n_returns_all_real():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((6, 8)).astype(np.float32)
    eng = AntitopoEngine(config=AntitopoConfig(M=4, ef_construction=8, ef_search=16))
    eng.store_many_vectors(x)
    eng.build()
    ids = eng.query_k(x[0], 10)  # only 6 real vectors exist
    assert len(ids) <= 6
    assert ids[0] == 0
    assert all(0 <= i < 6 for i in ids)


def test_reject_non_2d_inputs():
    eng = AntitopoEngine(config=AntitopoConfig(M=4, ef_construction=8))
    with pytest.raises(ValueError):
        eng.store_many_vectors(np.ones(8, np.float32))
    eng.store_many_vectors(np.ones((10, 8), np.float32))
    eng.build()
    with pytest.raises(ValueError):
        eng.query_k_batch(np.ones(8, np.float32), 2)


def test_build_without_vectors_raises():
    eng = AntitopoEngine(config=AntitopoConfig(M=4, ef_construction=8))
    with pytest.raises(AssertionError):
        eng.build()


def test_packed_hbm_budget_guard(monkeypatch):
    """When the packed-neighbour layout would exceed the HBM budget the
    engine must fall back to the XLA gather beam instead of materializing
    it (the reference serves any RAM-resident corpus untruncated,
    src/in_memory_dataset.h:25-47 — at e.g. N=1M with the canonical
    M0=120 grid the packed duplication is 16.4GB on a 16GB chip)."""
    monkeypatch.setenv("EXPANN_PACKED_BUDGET_GB", "0.0000001")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((400, 32)).astype(np.float32)
    eng = AntitopoEngine(
        config=AntitopoConfig(M=6, ef_construction=30, use_packed=True)
    )
    eng.store_many_vectors(x)
    eng.build()
    assert eng._resolve_packed() is False
    assert eng.graph.packed is None
    eng.set_ef_search(40)
    ids = eng.query_k_batch(x[:8], 5)
    assert (ids[np.arange(8), 0] == np.arange(8)).all()

    # generous budget: the packed layout materializes
    monkeypatch.setenv("EXPANN_PACKED_BUDGET_GB", "10")
    assert eng._resolve_packed() is True
    assert eng.graph.packed is not None
