"""Multi-chip scaling: corpus-sharded index over a device mesh.

This is new capability relative to the reference, which is single-process
with no distributed backend at all (SURVEY.md section 2, "Parallelism /
distributed-communication inventory": the only concurrency is a benchmark
job thread pool, src/bench_runner.h:15-58).  The TPU-native design
(SURVEY.md section 5 "Distributed communication backend", section 7 step 7):

  * **corpus sharding (model-parallel analogue)**: the vector set and its
    graph are partitioned row-wise into one sub-index per device; arrays are
    stacked on a leading device axis and laid out with
    ``NamedSharding(P("shard"))`` so each chip holds exactly its sub-index,
  * **query fan-out**: a query batch is replicated to every chip via
    ``shard_map``; each chip beam-searches its own sub-index concurrently;
    the per-shard top-k lists are exchanged with one all-gather over ICI and
    merged with a global sort — union-of-shards recall is at least
    single-index recall for the same ef,
  * **data-parallel queries**: with a replicated index, the query batch is
    instead sharded over the mesh (``P("shard")`` on the batch dim) and XLA
    runs each chip's slice independently — the max-throughput serving mode,
  * **sharded build step**: candidate generation for a wave of new vectors
    runs corpus-sharded (each chip scores the wave against its shard, one
    all-gather merges per-shard top-C candidate lists), and the anti-topo
    prune runs wave-sharded (each chip prunes its slice of the wave) — the
    ICI-collective build loop the reference has no counterpart for.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from expann_tpu.models.build import BuildConfig, build_index
from expann_tpu.models.graph import GraphIndex
from expann_tpu.models.prune import antitopo_prune, pairwise_co_dist
from expann_tpu.models.search import beam_search
from expann_tpu.ops.distance import pad_dim, pairwise_dist2, squared_norms, LANE

AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


@dataclasses.dataclass
class ShardedIndex:
    """S stacked single-shard sub-indexes, device-sharded on the leading
    axis.  Per-shard global ids are ``shard * n_shard + local``.

    Upper HNSW layers are stacked per level across shards (padded to the
    max member count / degree; shards missing a level get all-sentinel
    rows, making descent a no-op there), so every shard's beam starts
    from a hierarchically descended entry point exactly like the
    single-chip engine (reference upper-layer descent:
    src/antitopo_engine.h:878-893).
    """

    vectors: jax.Array  # (S, n_shard + 1, D)
    norms: jax.Array  # (S, n_shard + 1)
    adj: jax.Array  # (S, n_shard + 1, R)
    start: jax.Array  # (S,) per-shard entry point
    n_total: int
    mesh: Mesh
    # packed-neighbour serving layout (ops/pallas_beam.build_packed per
    # shard, stacked on the shard axis) — set by pack_sharded()
    packed: Optional[jax.Array] = None  # (S, n_shard + 1, RS, D)
    packed_aux: Optional[jax.Array] = None  # (S, n_shard + 1, 2, R_tile)
    # stacked upper layers, level-major: slot maps local id -> adj row
    # (sentinel nl_max for non-members), adj stores LOCAL ids (sentinel
    # n_shard); tuples have one entry per level, bottom-up
    layer_slots: Tuple[jax.Array, ...] = ()  # each (S, n_shard + 1)
    layer_adjs: Tuple[jax.Array, ...] = ()  # each (S, nl_max + 1, Ru)

    @property
    def n_shard(self) -> int:
        return self.vectors.shape[1] - 1

    @property
    def num_shards(self) -> int:
        return self.vectors.shape[0]


def build_sharded(
    x: np.ndarray, cfg: Optional[BuildConfig] = None, mesh: Optional[Mesh] = None
) -> ShardedIndex:
    """Partition the corpus row-wise and build one sub-index per device.

    Shard assignment is contiguous blocks (global id = shard * n_shard +
    local), with the last shard padded by unreachable +inf-norm rows.
    """
    cfg = cfg or BuildConfig()
    mesh = mesh or make_mesh()
    S = mesh.devices.size
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    n_shard = (n + S - 1) // S

    vec_blocks, norm_blocks, adj_blocks, starts = [], [], [], []
    shard_layers = []  # per shard: list of (slot (local_n+1,), adj (n_l+1, Ru))
    R = None
    for s in range(S):
        part = x[s * n_shard : (s + 1) * n_shard]
        g = build_index(part, cfg)
        v = np.asarray(g.vectors)
        nm = np.asarray(g.norms)
        a = np.asarray(g.adj_bottom)
        shard_layers.append(
            [(np.asarray(L.slot), np.asarray(L.adj)) for L in g.layers]
        )
        local_n = part.shape[0]
        if local_n < n_shard:
            # pad to the common shard width with unreachable sentinel rows
            pad = n_shard - local_n
            v = np.concatenate(
                [v[:local_n], np.zeros((pad, v.shape[1]), np.float32), v[local_n:]]
            )
            nm = np.concatenate(
                [nm[:local_n], np.full(pad, np.inf, np.float32), nm[local_n:]]
            )
            a = np.where(a == local_n, n_shard, a)
            a = np.concatenate(
                [a[:local_n], np.full((pad, a.shape[1]), n_shard, np.int32), a[local_n:]]
            )
        R = a.shape[1] if R is None else max(R, a.shape[1])
        vec_blocks.append(v)
        norm_blocks.append(nm)
        adj_blocks.append(a)
        starts.append(int(g.starting_vertex))

    R = max(r.shape[1] for r in adj_blocks)
    adj_blocks = [
        np.pad(a, ((0, 0), (0, R - a.shape[1])), constant_values=n_shard)
        for a in adj_blocks
    ]

    # ---- stack upper layers level-major across shards ----
    # pad each level to the max member count / degree; a shard missing the
    # level gets an all-sentinel slot table, making its descent a no-op
    n_levels = max((len(ls) for ls in shard_layers), default=0)
    layer_slots, layer_adjs = [], []
    for lvl in range(n_levels):
        have = [
            ls[lvl] if lvl < len(ls) else None for ls in shard_layers
        ]
        nl_max = max(sl[1].shape[0] - 1 for sl in have if sl is not None)
        ru_max = max(sl[1].shape[1] for sl in have if sl is not None)
        slots = np.full((S, n_shard + 1), nl_max, np.int32)
        adjs = np.full((S, nl_max + 1, ru_max), n_shard, np.int32)
        for s, sl in enumerate(have):
            if sl is None:
                continue
            slot, adj_l = sl
            n_l = adj_l.shape[0] - 1
            local_np1 = slot.shape[0]
            # member slots carry over; the shard's own sentinel (n_l) and
            # any shard-padding rows map to the common sentinel nl_max
            s_fix = np.where(slot >= n_l, nl_max, slot)
            slots[s, : local_np1 - 1] = s_fix[:-1]
            # adj stores local ids w/ shard sentinel local_n -> n_shard
            a_fix = np.where(adj_l >= local_np1 - 1, n_shard, adj_l)
            adjs[s, :n_l, : adj_l.shape[1]] = a_fix[:n_l]
        layer_slots.append(slots)
        layer_adjs.append(adjs)

    sharding = NamedSharding(mesh, P(AXIS))
    return ShardedIndex(
        vectors=jax.device_put(np.stack(vec_blocks), sharding),
        norms=jax.device_put(np.stack(norm_blocks), sharding),
        adj=jax.device_put(np.stack(adj_blocks), sharding),
        start=jax.device_put(np.asarray(starts, np.int32), sharding),
        n_total=n,
        mesh=mesh,
        layer_slots=tuple(
            jax.device_put(s, sharding) for s in layer_slots
        ),
        layer_adjs=tuple(jax.device_put(a, sharding) for a in layer_adjs),
    )


@functools.partial(
    jax.jit, static_argnames=("k", "ef", "max_iters", "n_shard", "mesh", "precision")
)
def _sharded_query(
    vectors, norms, adj, start, layer_slots, layer_adjs, q,
    k: int, ef: int, max_iters: int,
    n_shard: int, mesh: Mesh, precision: str
):
    """Replicated queries fan out to every shard; each shard descends its
    own upper layers greedily, beam-searches its bottom layer, and the
    per-shard beams are all-gathered (the out-spec resharding rides ICI)
    and merged."""
    from expann_tpu.models.search import _gather_dist2, greedy_descent

    def per_shard(vec, nrm, a, st, slots, adjs, q):
        vec, nrm, a = vec[0], nrm[0], a[0]
        qn = squared_norms(q)
        B = q.shape[0]
        ep = jnp.broadcast_to(st, (B,)).astype(jnp.int32)
        ep_d = _gather_dist2(vec, nrm, ep[:, None], q, qn, precision)[:, 0]
        for sl, al in zip(reversed(slots), reversed(adjs)):
            ep, ep_d = greedy_descent(
                vec, nrm, sl[0], al[0], q, qn, ep, ep_d, precision
            )
        ids, d, _ = beam_search(
            vec, nrm, a, q, qn, ep[:, None],
            ef=ef, max_iters=max_iters, sentinel=n_shard, precision=precision,
        )
        shard_id = jax.lax.axis_index(AXIS)
        gids = jnp.where(
            ids[:, :k] >= n_shard, -1, ids[:, :k] + shard_id * n_shard
        )
        return gids[None], d[:, :k][None]

    L = len(layer_slots)
    gids, d = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(AXIS), P(AXIS), P(AXIS), P(AXIS),
            (P(AXIS),) * L, (P(AXIS),) * L, P(),
        ),
        out_specs=(P(AXIS), P(AXIS)),
    )(vectors, norms, adj, start, layer_slots, layer_adjs, q)
    # (S, B, k) -> global top-k merge
    S, B, _ = gids.shape
    all_d = jnp.transpose(d, (1, 0, 2)).reshape(B, S * k)
    all_i = jnp.transpose(gids, (1, 0, 2)).reshape(B, S * k)
    all_d, all_i = jax.lax.sort((all_d, all_i), num_keys=1)
    return all_i[:, :k], all_d[:, :k]


def sharded_query_batch(
    index: ShardedIndex,
    queries: np.ndarray,
    k: int,
    ef: int,
    max_iters: int = 0,
    precision: str = "highest",
) -> np.ndarray:
    q = np.asarray(queries, np.float32)
    q = pad_dim(q, index.vectors.shape[-1])
    if max_iters <= 0:
        max_iters = 8 * max(ef, k) + 16
    ids, _ = _sharded_query(
        index.vectors,
        index.norms,
        index.adj,
        index.start,
        index.layer_slots,
        index.layer_adjs,
        jnp.asarray(q),
        k=k,
        ef=max(ef, k),
        max_iters=max_iters,
        n_shard=index.n_shard,
        mesh=index.mesh,
        precision=precision,
    )
    return np.asarray(ids)


def pack_sharded(index: ShardedIndex, dtype=jnp.bfloat16) -> ShardedIndex:
    """Materialize per-shard packed-neighbour arrays (one expansion = one
    contiguous block DMA instead of R row gathers — BENCH_NOTES round-2
    measurements) and lay them out shard-per-device.  Returns a new
    ShardedIndex with ``packed``/``packed_aux`` populated."""
    from expann_tpu.ops.pallas_beam import build_packed

    S = index.num_shards
    pk_blocks, ax_blocks = [], []
    for s in range(S):
        pk, ax = build_packed(
            index.vectors[s], index.norms[s], index.adj[s], dtype=dtype
        )
        pk_blocks.append(np.asarray(pk))
        ax_blocks.append(np.asarray(ax))
    sharding = NamedSharding(index.mesh, P(AXIS))
    return dataclasses.replace(
        index,
        packed=jax.device_put(np.stack(pk_blocks), sharding),
        packed_aux=jax.device_put(np.stack(ax_blocks), sharding),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "ef", "expand", "cand", "qt", "max_iters", "n_shard", "mesh",
        "interpret",
    ),
)
def _sharded_packed_query(
    packed, aux, vectors, norms, start, layer_slots, layer_adjs, q,
    k: int, ef: int, expand: int, cand: int, qt: int, max_iters: int,
    n_shard: int, mesh: Mesh, interpret: bool,
):
    """Per-shard fully fused Pallas traversal (ops/pallas_fused.py) inside
    shard_map — upper-layer greedy descent, fused bottom beam, exact
    per-shard f32 rerank — then a global all-gather top-k merge over ICI;
    the packed counterpart of ``_sharded_query``."""
    from expann_tpu.models.search import _gather_dist2, greedy_descent
    from expann_tpu.ops.pallas_fused import fused_search

    EF = ef + ((-ef) % 128)

    def per_shard(pk, ax, vec, nrm, st, slots, adjs, q):
        pk, ax, vec, nrm = pk[0], ax[0], vec[0], nrm[0]
        qf = q.astype(jnp.float32)
        qn = squared_norms(qf)
        B = q.shape[0]
        ep = jnp.broadcast_to(st, (B,)).astype(jnp.int32)
        ep_d = _gather_dist2(vec, nrm, ep[:, None], qf, qn, "default")[:, 0]
        for sl, al in zip(reversed(slots), reversed(adjs)):
            ep, ep_d = greedy_descent(
                vec, nrm, sl[0], al[0], qf, qn, ep, ep_d, "default"
            )
        bd0 = jnp.full((B, EF), jnp.inf, jnp.float32).at[:, 0].set(ep_d)
        bi0 = jnp.full((B, EF), n_shard, jnp.int32).at[:, 0].set(ep)
        ids, _, _, _ = fused_search(
            pk, ax, qf, bd0, bi0,
            ef=ef, expand=expand, cand=cand, max_iters=max_iters, qt=qt,
            interpret=interpret,
        )
        # exact f32 rerank of the (unsorted, bf16-scored) beam
        dd = _gather_dist2(vec, nrm, ids, qf, qn, "default")
        dd, ids = jax.lax.sort((dd, ids), num_keys=1)
        shard_id = jax.lax.axis_index(AXIS)
        gids = jnp.where(
            ids[:, :k] >= n_shard, -1, ids[:, :k] + shard_id * n_shard
        )
        return gids[None], dd[:, :k][None]

    gids, d = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
            (P(AXIS),) * len(layer_slots), (P(AXIS),) * len(layer_slots),
            P(),
        ),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )(packed, aux, vectors, norms, start, layer_slots, layer_adjs, q)
    S, B, _ = gids.shape
    all_d = jnp.transpose(d, (1, 0, 2)).reshape(B, S * k)
    all_i = jnp.transpose(gids, (1, 0, 2)).reshape(B, S * k)
    all_d, all_i = jax.lax.sort((all_d, all_i), num_keys=1)
    return all_i[:, :k], all_d[:, :k]


def sharded_packed_query(
    index: ShardedIndex,
    queries: np.ndarray,
    k: int,
    ef: int,
    expand: int = 1,
    cand: int = 8,
    qt: int = 8,
    max_iters: int = 0,
) -> np.ndarray:
    """Replicated queries over per-shard packed fused traversals."""
    assert index.packed is not None, "call pack_sharded(index) first"
    q = np.asarray(queries, np.float32)
    q = pad_dim(q, index.vectors.shape[-1])
    pad = (-q.shape[0]) % qt
    if pad:
        q = np.concatenate([q, np.zeros((pad, q.shape[1]), np.float32)])
    if max_iters <= 0:
        max_iters = 8 * max(ef, k) + 16
    interpret = jax.default_backend() not in ("tpu", "axon")
    ids, _ = _sharded_packed_query(
        index.packed,
        index.packed_aux,
        index.vectors,
        index.norms,
        index.start,
        index.layer_slots,
        index.layer_adjs,
        jnp.asarray(q),
        k=k,
        ef=max(ef, k),
        expand=expand,
        cand=cand,
        qt=qt,
        max_iters=max_iters,
        n_shard=index.n_shard,
        mesh=index.mesh,
        interpret=interpret,
    )
    ids = np.asarray(ids)
    return ids[: ids.shape[0] - pad] if pad else ids


@functools.partial(
    jax.jit,
    static_argnames=("C", "cap", "prune_overflow", "n_shard", "mesh", "precision"),
)
def sharded_build_step(
    vectors, norms, wave, C: int, cap: int,
    ortho_factor, ortho_bias, prune_overflow: int,
    n_shard: int, mesh: Mesh, precision: str = "highest",
):
    """One corpus-sharded candidate-generation + wave-sharded prune step —
    the distributed analogue of the reference's per-insert candidate search
    + prune_edges (src/antitopo_engine.h:396-440), expressed as two matmuls
    and two collectives instead of a sequential pointer walk:

      1. every chip scores the (replicated) wave against its corpus shard
         and selects its local top-C (MXU matmul + sort),
      2. one all-gather over ICI concatenates the S local candidate lists;
         a merge-sort keeps the global top-C per wave vector,
      3. the wave is then split across chips (data-parallel) and each chip
         runs the batched anti-topo prune on its slice.

    Returns (sel_ids, sel_d) of shape (W, cap) with *global* candidate ids.
    """

    def per_shard(vec, nrm, wave):
        vec, nrm = vec[0], nrm[0]
        qn = squared_norms(wave)
        d2 = pairwise_dist2(wave, vec, x_norms=nrm, q_norms=qn, precision=precision)
        local_ids = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        d2s, idss = jax.lax.sort((d2, local_ids), num_keys=1)
        shard_id = jax.lax.axis_index(AXIS)
        gids = jnp.where(
            idss[:, :C] >= n_shard, -1, idss[:, :C] + shard_id * n_shard
        )
        return gids[None], d2s[:, :C][None]

    gids, gd = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS)),
    )(vectors, norms, wave)
    S = gids.shape[0]
    W = wave.shape[0]
    cat_d = jnp.transpose(gd, (1, 0, 2)).reshape(W, S * C)
    cat_i = jnp.transpose(gids, (1, 0, 2)).reshape(W, S * C)
    cat_d, cat_i = jax.lax.sort((cat_d, cat_i), num_keys=2)
    cand_d, cand_ids = cat_d[:, :C], cat_i[:, :C]

    # wave-sharded prune: gather candidate vectors from the (sharded)
    # corpus — XLA inserts the cross-shard collective gathers — then run
    # the batched greedy prune data-parallel over the wave dimension.
    flat_vecs = vectors[:, :n_shard].reshape(-1, vectors.shape[-1])
    safe = jnp.maximum(cand_ids, 0)
    cvecs = flat_vecs[safe]
    cnorms = jnp.where(
        (cand_ids >= 0) & jnp.isfinite(cand_d),
        squared_norms(cvecs.reshape(-1, cvecs.shape[-1])).reshape(cand_d.shape),
        jnp.inf,
    )
    co = pairwise_co_dist(cvecs, cnorms, precision)
    sentinel = vectors.shape[0] * n_shard
    sel_ids, sel_d = antitopo_prune(
        jnp.where(cand_ids < 0, sentinel, cand_ids),
        jnp.where(cand_ids < 0, jnp.inf, cand_d),
        co,
        cap=cap,
        ortho_factor=ortho_factor,
        ortho_bias=ortho_bias,
        prune_overflow=prune_overflow,
        sentinel=sentinel,
    )
    return sel_ids, sel_d


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "ef_cap", "expand", "cand", "qt", "seeds", "mesh",
        "precision", "interpret",
    ),
)
def _replicated_fused_dp(
    graph, q, ef,
    k: int, ef_cap: int, expand: int, cand: int, qt: int, seeds: int,
    mesh: Mesh, precision: str, interpret: bool,
):
    from expann_tpu.models.search import fused_query_batch

    def per_chip(graph, q_slice, ef):
        ids, d, nc = fused_query_batch(
            graph, q_slice[0], ef,
            k=k, ef_cap=ef_cap, expand=expand, cand=cand, qt=qt,
            seeds=seeds, precision=precision, interpret=interpret,
        )
        return ids[None], d[None], nc[None]

    return jax.shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS), P(AXIS)),
        check_vma=False,  # pallas outputs carry no vma metadata
    )(graph, q, ef)


def replicated_fused_query_dp(
    graph: GraphIndex,
    queries: np.ndarray,
    k: int,
    ef,
    mesh: Optional[Mesh] = None,
    expand: int = 2,
    cand: int = 16,
    qt: int = 8,
    seeds: int = 0,
    ef_cap: int = 128,
    precision: str = "default",
) -> np.ndarray:
    """Max-throughput multi-chip serving: the packed index is REPLICATED
    on every chip, the query batch is sharded over the mesh, and each chip
    runs the fully fused in-kernel traversal (ops/pallas_fused.py) on its
    slice — QPS multiplies by mesh size with zero cross-chip traffic
    during the search (one gather-free shard_map; results concatenate on
    the batch axis).  This is the fused upgrade of ``replicated_query_dp``
    (which routes through the slow XLA row-gather beam and is kept for
    precision-mode parity).  ``graph`` must carry packed arrays
    (AntitopoEngine._resolve_packed or ops.pallas_beam.build_packed).
    ``ef`` is a runtime scalar, as in single-chip fused serving."""
    assert graph.packed is not None, "graph has no packed arrays"
    mesh = mesh or make_mesh()
    S = mesh.devices.size
    q = np.asarray(queries, np.float32)
    q = pad_dim(q, graph.vectors.shape[1])
    B0 = q.shape[0]
    unit = S * qt  # each chip's slice must tile by qt
    pad = (-B0) % unit
    if pad:
        q = np.concatenate([q, np.zeros((pad, q.shape[1]), np.float32)])
    # reshape to (S, B/S, D): shard_map splits the leading axis per chip
    qs = q.reshape(S, -1, q.shape[1])
    q_sharded = jax.device_put(qs, NamedSharding(mesh, P(AXIS)))
    graph_rep = jax.device_put(graph, NamedSharding(mesh, P()))
    interpret = jax.default_backend() not in ("tpu", "axon")
    ids, _, _ = _replicated_fused_dp(
        graph_rep, q_sharded, jnp.asarray(ef, jnp.int32),
        k=k, ef_cap=ef_cap, expand=expand, cand=cand, qt=qt, seeds=seeds,
        mesh=mesh, precision=precision, interpret=interpret,
    )
    ids = np.asarray(ids).reshape(-1, k)
    return ids[:B0]


def replicated_query_dp(
    graph: GraphIndex,
    queries: np.ndarray,
    k: int,
    ef: int,
    mesh: Optional[Mesh] = None,
    precision: str = "highest",
) -> np.ndarray:
    """Data-parallel serving: replicated index, batch sharded over the mesh
    (max-QPS mode).  Plain jit with shardings — XLA partitions the batch.

    SUPERSEDED for throughput by ``replicated_fused_query_dp`` (the fused
    in-kernel traversal per chip); kept as the full-precision XLA-beam
    variant."""
    from expann_tpu.models.search import query_batch

    mesh = mesh or make_mesh()
    q = np.asarray(queries, np.float32)
    q = pad_dim(q, graph.vectors.shape[1])
    S = mesh.devices.size
    pad = (-q.shape[0]) % S
    if pad:
        q = np.concatenate([q, np.zeros((pad, q.shape[1]), np.float32)])
    q_sharded = jax.device_put(q, NamedSharding(mesh, P(AXIS)))
    rep = NamedSharding(mesh, P())
    graph_rep = jax.device_put(graph, rep)
    ids, _, _ = query_batch(graph_rep, q_sharded, k=k, ef=ef, precision=precision)
    ids = np.asarray(ids)
    return ids[: ids.shape[0] - pad] if pad else ids


# ---------------------------------------------------------------------------
# Sharded TPU-Flat: corpus-sharded fused brute-force fan-out
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ShardedFlat:
    """Row-sharded bf16 corpus for the fused Pallas flat-scan engine: each
    device streams its shard through the flat_topk kernel concurrently; one
    all-gather merges per-shard top-k (ICI), recall == single-chip flat."""

    x: jax.Array  # (S, n_shard_pad, D) bf16, device-sharded on axis 0
    n_shard: int  # real rows per shard (last shard may have fewer)
    n_total: int
    mesh: Mesh
    block: int = 1024  # corpus_block the shards were padded to


def build_sharded_flat(
    x: np.ndarray, mesh: Optional[Mesh] = None, block: int = 1024
) -> ShardedFlat:
    mesh = mesh or make_mesh()
    S = mesh.devices.size
    x = np.asarray(x, np.float32)
    n, d = x.shape
    d_pad = ((d + LANE - 1) // LANE) * LANE
    n_shard = (n + S - 1) // S
    n_shard_pad = ((n_shard + block - 1) // block) * block
    # padding ROWS get a large constant so their distances dominate any
    # real distance without inf/NaN arithmetic inside the kernel; feature
    # padding columns of real rows stay zero (distance-neutral)
    stacked = np.zeros((S, n_shard_pad, d_pad), np.float32)
    for s in range(S):
        part = x[s * n_shard : (s + 1) * n_shard]
        stacked[s, : part.shape[0], :d] = part
        stacked[s, part.shape[0] :, :] = 1e4
    sharding = NamedSharding(mesh, P(AXIS))
    return ShardedFlat(
        x=jax.device_put(jnp.asarray(stacked, jnp.bfloat16), sharding),
        n_shard=n_shard,
        n_total=n,
        mesh=mesh,
        block=block,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_shard", "n_total", "mesh", "interpret", "block"),
)
def _sharded_flat_query(
    xs, q, k: int, n_shard: int, n_total: int, mesh: Mesh, interpret: bool,
    block: int,
):
    from expann_tpu.ops.pallas_topk import flat_topk

    def per_shard(xs, q):
        xs = xs[0]  # (n_shard_pad, D)
        ids, d = flat_topk(
            q, xs, n_real=xs.shape[0], k=k, interpret=interpret,
            corpus_block=block,
        )
        shard = jax.lax.axis_index(AXIS)
        # mask ids beyond this shard's REAL row count (the last shard's
        # padding rows would otherwise surface as finite-distance ids when
        # k exceeds its real rows)
        real = jnp.clip(n_total - shard * n_shard, 0, n_shard)
        gids = jnp.where(ids >= real, -1, ids + shard * n_shard)
        d = jnp.where(ids >= real, jnp.inf, d)
        return gids[None], d[None]

    # check_vma=False: pallas_call outputs don't carry varying-mesh-axes
    # metadata, so shard_map's vma checker cannot type them
    gids, d = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,
    )(xs, q)
    S, B, _ = gids.shape
    all_d = jnp.transpose(d, (1, 0, 2)).reshape(B, S * k)
    all_i = jnp.transpose(gids, (1, 0, 2)).reshape(B, S * k)
    all_d, all_i = jax.lax.sort((all_d, all_i), num_keys=1)
    return all_i[:, :k], all_d[:, :k]


def sharded_flat_query(index: ShardedFlat, queries: np.ndarray, k: int) -> np.ndarray:
    """Replicated queries, per-shard fused flat scan, global top-k merge."""
    q = np.asarray(queries, np.float32)
    q = pad_dim(q, index.x.shape[-1])
    tile = 256
    pad = (-q.shape[0]) % tile
    if pad:
        q = np.concatenate([q, np.zeros((pad, q.shape[1]), np.float32)])
    interpret = jax.default_backend() not in ("tpu", "axon")
    ids, _ = _sharded_flat_query(
        index.x,
        jnp.asarray(q),
        k=k,
        n_shard=index.n_shard,
        n_total=index.n_total,
        mesh=index.mesh,
        interpret=interpret,
        block=index.block,
    )
    ids = np.asarray(ids)
    return ids[: ids.shape[0] - pad] if pad else ids
