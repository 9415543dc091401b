"""Index persistence.

Counterpart of the reference's raw-binary serialize/deserialize
(reference: src/antitopo_engine.h:930-1074), reshaped for array-oriented
state: the index is a directory-free single ``.npz`` container of named
arrays plus a JSON metadata sidecar embedded in the archive.  Matching the
reference's semantics, search-time params are *not* persisted (the loader
keeps the caller's ef_search / use_compression,
src/antitopo_engine.h:1000-1003,1021-1024), and derived structures (codes)
are rebuilt after load.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from expann_tpu.models.graph import GraphIndex, UpperLayer

FORMAT_VERSION = 1


def save_index(filename: str, graph: GraphIndex, meta: Dict | None = None) -> None:
    directory = os.path.dirname(filename)
    if directory:
        os.makedirs(directory, exist_ok=True)
    arrays = {
        "vectors": np.asarray(graph.vectors),
        "norms": np.asarray(graph.norms),
        "adj_bottom": np.asarray(graph.adj_bottom),
        "starting_vertex": np.asarray(graph.starting_vertex),
    }
    for i, layer in enumerate(graph.layers):
        arrays[f"layer{i}_slot"] = np.asarray(layer.slot)
        arrays[f"layer{i}_adj"] = np.asarray(layer.adj)
    header = {
        "format_version": FORMAT_VERSION,
        "num_layers": len(graph.layers),
        "meta": meta or {},
    }
    arrays["header"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8
    ).copy()
    np.savez(filename, **arrays)
    # np.savez appends .npz; normalize to the requested name.
    if not filename.endswith(".npz") and os.path.exists(filename + ".npz"):
        os.replace(filename + ".npz", filename)


def load_index(filename: str) -> Tuple[GraphIndex, Dict]:
    with np.load(filename) as z:
        header = json.loads(bytes(z["header"]).decode())
        assert header["format_version"] == FORMAT_VERSION
        layers = tuple(
            UpperLayer(
                slot=jnp.asarray(z[f"layer{i}_slot"]),
                adj=jnp.asarray(z[f"layer{i}_adj"]),
            )
            for i in range(header["num_layers"])
        )
        graph = GraphIndex(
            vectors=jnp.asarray(z["vectors"]),
            norms=jnp.asarray(z["norms"]),
            adj_bottom=jnp.asarray(z["adj_bottom"]),
            layers=layers,
            starting_vertex=jnp.int32(z["starting_vertex"]),
        )
    return graph, header["meta"]


def index_exists(filename: str) -> bool:
    return os.path.exists(filename)
