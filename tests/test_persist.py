import numpy as np

from expann_tpu.models.antitopo import AntitopoConfig, AntitopoEngine
from expann_tpu.utils.persist import load_index, save_index


def _build_small(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((400, 24)).astype(np.float32)
    eng = AntitopoEngine(config=AntitopoConfig(M=8, ef_construction=40, ef_search_mult=4))
    eng.store_many_vectors(x)
    eng.build()
    return eng, x


def test_save_load_roundtrip(tmp_path):
    eng, x = _build_small()
    path = str(tmp_path / "idx.npz")
    save_index(path, eng.graph, {"dim": eng.dim})
    graph2, meta = load_index(path)
    assert meta["dim"] == eng.dim
    np.testing.assert_array_equal(
        np.asarray(eng.graph.adj_bottom), np.asarray(graph2.adj_bottom)
    )
    np.testing.assert_array_equal(
        np.asarray(eng.graph.vectors), np.asarray(graph2.vectors)
    )
    assert len(graph2.layers) == len(eng.graph.layers)


def test_engine_read_write_index(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((400, 24)).astype(np.float32)
    path = str(tmp_path / "engine_idx")

    cfg = AntitopoConfig(
        M=8, ef_construction=40, ef_search_mult=4,
        index_filename=path, read_index=True, write_index=True,
    )
    eng = AntitopoEngine(config=cfg)
    eng.store_many_vectors(x)
    eng.build()  # file absent -> builds + writes
    ans1 = eng.query_k_batch(x[:10], 5)

    cfg2 = AntitopoConfig(
        M=8, ef_construction=40, ef_search_mult=4,
        index_filename=path, read_index=True, write_index=True,
    )
    eng2 = AntitopoEngine(config=cfg2)
    eng2.store_many_vectors(x)  # stored vectors ignored when reading
    eng2.build()  # file present -> reads, disables write
    ans2 = eng2.query_k_batch(x[:10], 5)
    np.testing.assert_array_equal(ans1, ans2)
    # search-time params NOT taken from the file (reference
    # src/antitopo_engine.h:1000-1003): engine keeps its own ef config
    assert eng2.cfg.ef_search_mult == 4


def test_query_after_load_same_recall(tmp_path):
    eng, x = _build_small(seed=2)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((20, 24)).astype(np.float32)
    a1 = eng.query_k_batch(q, 5)
    path = str(tmp_path / "idx2.npz")
    save_index(path, eng.graph, {"dim": eng.dim})
    graph2, _ = load_index(path)
    eng.graph = graph2
    a2 = eng.query_k_batch(q, 5)
    np.testing.assert_array_equal(a1, a2)
