"""Batched one-shot index construction.

The reference builds its HNSW-variant graph by inserting one vector at a
time: a beam search over the already-built prefix produces an
ef_construction-wide candidate list, the anti-topo prune selects edges, and
reverse edges are appended with lazy pruning
(reference: src/antitopo_engine.h:310-465 ``_store_vector``).  That loop is
inherently sequential — the canonical TPU answer is to restructure it as
dense batched passes (SURVEY.md section 7 step 4, "hard parts" item 2; the
acceptance test is recall/QPS parity, not graph isomorphism):

  1. draw every node's HNSW layer up front (same geometric law,
     floor(-ln U / ln M), src/antitopo_engine.h:323) — layer membership,
     max_layer and the starting vertex are then known in advance,
  2. per layer, generate candidates by *exact* batched k-NN among the
     layer's members (a streamed (W, n_l) MXU matmul with a running top-C
     merge) — a strictly better candidate set than the reference's
     approximate ef_construction beam search,
  3. run the batched anti-topo prune (models/prune.py) over all members,
  4. a single reverse pass adds back-edges (skipping ones already present,
     mirroring the edge_exists check at src/antitopo_engine.h:442-450):
     nodes that stay within the edge cap keep append order (the lazy branch
     of prune_edges, :270-273), overflowing nodes are re-pruned over the
     union of their forward and incoming edges.

This build is O(n_l^2) distance work per layer, which one MXU chews through
for corpora up to a few million vectors; the incremental wave builder (for
larger corpora) ships separately.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from expann_tpu.models.graph import GraphIndex, UpperLayer, make_corpus
from expann_tpu.models.prune import antitopo_prune, pairwise_co_dist
from expann_tpu.ops.distance import pairwise_dist2, squared_norms

INF = jnp.inf


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def draw_levels(n: int, M: int, seed: int = 0) -> Tuple[np.ndarray, int, int]:
    """Per-node geometric layer draws + resulting max_layer/starting_vertex.

    Same law as the reference (floor(-ln U / ln M),
    src/antitopo_engine.h:323) with a seeded counter-based PRNG instead of
    mt19937(0); starting_vertex tracking replays the sequential update rule
    (src/antitopo_engine.h:459-462): each node whose drawn level reaches the
    current max raises it and becomes the entry point.
    """
    rng = np.random.default_rng(seed)
    u = rng.random(n)
    u = np.clip(u, 1e-300, 1.0 - 1e-16)
    levels = np.floor(-np.log(u) / math.log(M)).astype(np.int32)
    max_layer = 0
    sv = 0
    for i in range(n):
        while levels[i] >= max_layer:
            max_layer += 1
            sv = i
    return levels, max_layer, sv


@functools.partial(jax.jit, static_argnames=("C", "precision"))
def _block_topk_merge(run_d, run_i, qv, qn, xv, xn, col_ids, self_ids, C: int, precision: str):
    """Score one column block against a row block and merge into the running
    top-C (sorted lexicographically by (d, id) to reproduce the reference's
    set-ordering tie-break)."""
    d2 = pairwise_dist2(qv, xv, x_norms=xn, q_norms=qn, precision=precision)
    d2 = jnp.where(col_ids[None, :] == self_ids[:, None], INF, d2)
    # top-C of the block first (top_k breaks ties by lower index, i.e.
    # ascending id within the block), then a short sorted merge with the
    # running list — avoids sorting the full block width.
    kk = min(C, d2.shape[1])
    neg_d, idx = jax.lax.top_k(-d2, kk)
    blk_d = -neg_d
    blk_i = col_ids[idx]
    all_d = jnp.concatenate([run_d, blk_d], axis=1)
    all_i = jnp.concatenate([run_i, blk_i], axis=1)
    all_d, all_i = jax.lax.sort((all_d, all_i), num_keys=2)
    return all_d[:, :C], all_i[:, :C]


def exact_knn(
    vecs: jax.Array,
    norms: jax.Array,
    C: int,
    row_block: int = 2048,
    col_block: int = 32768,
    precision: str = "highest",
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact C-nearest-neighbours of every row of ``vecs`` against all rows
    (self excluded), streamed in (row_block x col_block) MXU tiles.

    Returns host arrays ``(ids, d)`` of shape ``(n, C)`` sorted by (d, id);
    padding (when C >= n) is sentinel n / +inf.
    """
    n = vecs.shape[0]
    ids_out = np.empty((n, C), np.int32)
    d_out = np.empty((n, C), np.float32)
    for r0 in range(0, n, row_block):
        r1 = min(r0 + row_block, n)
        qv = vecs[r0:r1]
        qn = norms[r0:r1]
        self_ids = jnp.arange(r0, r1, dtype=jnp.int32)
        run_d = jnp.full((r1 - r0, C), INF, jnp.float32)
        run_i = jnp.full((r1 - r0, C), n, jnp.int32)
        for c0 in range(0, n, col_block):
            c1 = min(c0 + col_block, n)
            col_ids = jnp.arange(c0, c1, dtype=jnp.int32)
            run_d, run_i = _block_topk_merge(
                run_d,
                run_i,
                qv,
                qn,
                vecs[c0:c1],
                norms[c0:c1],
                col_ids,
                self_ids,
                C=C,
                precision=precision,
            )
        d_out[r0:r1] = np.asarray(run_d)
        ids_out[r0:r1] = np.asarray(run_i)
    return ids_out, d_out


@functools.partial(jax.jit, static_argnames=("A",))
def _incoming_edges(sel_ids, sel_d, n: jax.Array, A: int, sentinel: int):
    """Group the forward edge list by destination: returns per-node incoming
    (src, d) lists of width A, closest-first (the one-shot analogue of the
    reference's sequential reverse-edge appends,
    src/antitopo_engine.h:441-455)."""
    W, cap = sel_ids.shape
    src = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, cap)
    ).reshape(-1)
    dst = sel_ids.reshape(-1)
    d = sel_d.reshape(-1)
    dst = jnp.where(jnp.isfinite(d), dst, sentinel)
    dst_s, d_s, src_s = jax.lax.sort((dst, d, src), num_keys=3)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), dst_s[1:] != dst_s[:-1]]
    )
    idx = jnp.arange(dst_s.shape[0], dtype=jnp.int32)
    group_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
    pos = idx - group_start
    ok = (dst_s != sentinel) & (pos < A)
    scatter_rows = jnp.where(ok, dst_s, sentinel)
    inc_src = jnp.full((W + 1, A), sentinel, jnp.int32)
    inc_d = jnp.full((W + 1, A), INF, jnp.float32)
    inc_src = inc_src.at[scatter_rows, jnp.minimum(pos, A - 1)].set(
        jnp.where(ok, src_s, sentinel), mode="drop"
    )
    inc_d = inc_d.at[scatter_rows, jnp.minimum(pos, A - 1)].set(
        jnp.where(ok, d_s, INF), mode="drop"
    )
    return inc_src[:W], inc_d[:W]


@jax.jit
def _merge_lazy(sel_ids, sel_d, inc_src, inc_d):
    """Append incoming edges after forward edges (the reference's lazy
    prune branch keeps plain append order, src/antitopo_engine.h:270-273),
    dropping incoming edges already present in the forward list (the
    edge_exists check, :442-450).  Returns (ids, d, total_count)."""
    dup = (inc_src[:, :, None] == sel_ids[:, None, :]).any(-1)
    inc_d = jnp.where(dup, INF, inc_d)
    inc_src_m = jnp.where(dup, sel_ids.shape[0], inc_src)
    ids = jnp.concatenate([sel_ids, inc_src_m], axis=1)
    d = jnp.concatenate([sel_d, inc_d], axis=1)
    count = jnp.sum(jnp.isfinite(d), axis=1)
    return ids, d, count


def _compact_rows_vec(ids: np.ndarray, d: np.ndarray, width: int, sentinel: int):
    """Vectorized left-pack: stable-sort each row by validity (invalid last),
    preserving original order among valid entries."""
    invalid = ~np.isfinite(d)
    order = np.argsort(invalid, axis=1, kind="stable")
    packed = np.take_along_axis(ids, order, axis=1)
    packed_inv = np.take_along_axis(invalid, order, axis=1)
    packed = np.where(packed_inv, sentinel, packed)
    if packed.shape[1] < width:
        pad = np.full((ids.shape[0], width - packed.shape[1]), sentinel, np.int32)
        packed = np.concatenate([packed, pad], axis=1)
    return packed[:, :width].astype(np.int32)


@dataclasses.dataclass
class BuildConfig:
    M: int = 60
    M0: int = 0  # 0 -> 2 * M (reference constructor default)
    ef_construction: int = 500
    ortho_count: int = 1
    ortho_factor: float = 0.5
    ortho_bias: float = 0.0
    prune_overflow: int = 0
    prune_cand: int = 0  # 0 -> min(ef_construction, 256)
    seed: int = 0
    precision: str = "highest"
    row_block: int = 2048
    col_block: int = 32768
    prune_block: int = 256

    def __post_init__(self):
        if self.M0 == 0:
            self.M0 = 2 * self.M
        if self.prune_cand == 0:
            self.prune_cand = min(self.ef_construction, 256)


def _build_layer(
    member_vecs: jax.Array,
    member_norms: jax.Array,
    cap: int,
    cfg: BuildConfig,
) -> np.ndarray:
    """Build one layer's adjacency over its member set.

    All ids here are layer-local slots; sentinel is n_l.  Returns a host
    ``(n_l, R)`` int32 array (R = cap rounded up to 16) in final edge order.
    """
    n = member_vecs.shape[0]
    sentinel = n
    C = min(cfg.prune_cand, max(n - 1, 1))
    knn_ids, knn_d = exact_knn(
        member_vecs,
        member_norms,
        C,
        row_block=cfg.row_block,
        col_block=cfg.col_block,
        precision=cfg.precision,
    )

    # Corpus with sentinel row for gathers during prune.
    vec_s = jnp.concatenate(
        [member_vecs, jnp.zeros((1, member_vecs.shape[1]), jnp.float32)], 0
    )
    norm_s = jnp.concatenate([member_norms, jnp.array([INF], jnp.float32)], 0)

    # --- forward prune, chunked over nodes ---
    sel_ids = np.full((n, cap), sentinel, np.int32)
    sel_d = np.full((n, cap), np.inf, np.float32)
    pb = cfg.prune_block
    for r0 in range(0, n, pb):
        r1 = min(r0 + pb, n)
        cid = jnp.asarray(knn_ids[r0:r1])
        cd = jnp.asarray(knn_d[r0:r1])
        cvec = vec_s[cid]
        cnorm = jnp.where(jnp.isfinite(cd), norm_s[cid], INF)
        co = pairwise_co_dist(cvec, cnorm, cfg.precision)
        s_ids, s_d = antitopo_prune(
            cid,
            cd,
            co,
            cap=cap,
            ortho_factor=cfg.ortho_factor,
            ortho_bias=cfg.ortho_bias,
            prune_overflow=cfg.prune_overflow,
            sentinel=sentinel,
        )
        sel_ids[r0:r1] = np.asarray(s_ids)
        sel_d[r0:r1] = np.asarray(s_d)

    # --- reverse pass ---
    A = min(2 * cap, 4096)
    inc_src, inc_d = _incoming_edges(
        jnp.asarray(sel_ids), jnp.asarray(sel_d), n, A=A, sentinel=sentinel
    )
    merged_ids, merged_d, count = _merge_lazy(
        jnp.asarray(sel_ids), jnp.asarray(sel_d), inc_src, inc_d
    )
    merged_ids = np.asarray(merged_ids)
    merged_d = np.asarray(merged_d)
    count = np.asarray(count)

    R = _round_up(cap, 16)
    adj = np.full((n, R), sentinel, np.int32)

    # Nodes within cap: keep append order (lazy branch).
    lazy_mask = count <= cap
    lazy_rows = np.nonzero(lazy_mask)[0]
    if lazy_rows.size:
        adj[lazy_rows] = _compact_rows_vec(
            merged_ids[lazy_rows], merged_d[lazy_rows], R, sentinel
        )

    # Overflowing nodes: full anti-topo prune over the (d, id)-sorted union.
    over_rows = np.nonzero(~lazy_mask)[0]
    if over_rows.size:
        for r0 in range(0, over_rows.size, pb):
            rows = over_rows[r0 : r0 + pb]
            # sort each row's union by (d, id) — prune_edges sorts before
            # selecting (src/antitopo_engine.h:275-276)
            cd_j = jnp.asarray(merged_d[rows])
            cid_j = jnp.asarray(merged_ids[rows])
            cd_j, cid_j = jax.lax.sort((cd_j, cid_j), num_keys=2)
            cvec = vec_s[cid_j]
            cnorm = jnp.where(jnp.isfinite(cd_j), norm_s[cid_j], INF)
            co = pairwise_co_dist(cvec, cnorm, cfg.precision)
            s_ids, s_d = antitopo_prune(
                cid_j,
                cd_j,
                co,
                cap=cap,
                ortho_factor=cfg.ortho_factor,
                ortho_bias=cfg.ortho_bias,
                prune_overflow=cfg.prune_overflow,
                sentinel=sentinel,
            )
            s_ids_np = np.asarray(s_ids)
            s_d_np = np.asarray(s_d)
            block = np.full((rows.size, R), sentinel, np.int32)
            block[:, :cap] = s_ids_np
            adj[rows] = block

    return adj


def build_index(
    x: np.ndarray,
    cfg: Optional[BuildConfig] = None,
) -> GraphIndex:
    """Build a GraphIndex over corpus ``x`` (host ``(N, D)`` float array)."""
    cfg = cfg or BuildConfig()
    x = np.asarray(x, dtype=np.float32)
    n = x.shape[0]
    assert n > 0

    vectors, norms = make_corpus(x)
    sentinel = n

    levels, max_layer, sv = draw_levels(n, cfg.M, cfg.seed)

    # ---- bottom layer over all nodes ----
    adj0_local = _build_layer(vectors[:n], norms[:n], cap=cfg.M0, cfg=cfg)
    R0 = adj0_local.shape[1]
    adj_bottom = np.full((n + 1, R0), sentinel, np.int32)
    adj_bottom[:n] = np.where(adj0_local == n, sentinel, adj0_local)

    # ---- upper layers (1 .. max_layer - 1) ----
    upper: List[UpperLayer] = []
    for layer in range(1, max_layer):
        members = np.nonzero(levels >= layer)[0].astype(np.int32)
        n_l = members.size
        if n_l == 0:
            break
        mv = vectors[jnp.asarray(members)]
        mn = norms[jnp.asarray(members)]
        adj_local = _build_layer(mv, mn, cap=cfg.M, cfg=cfg)
        Ru = adj_local.shape[1]
        # local slots -> global ids; local sentinel n_l -> global sentinel n
        lut = np.concatenate([members, np.array([sentinel], np.int32)])
        adj_global = np.full((n_l + 1, Ru), sentinel, np.int32)
        adj_global[:n_l] = lut[np.minimum(adj_local, n_l)]
        slot = np.full(n + 1, n_l, np.int32)
        slot[members] = np.arange(n_l, dtype=np.int32)
        upper.append(
            UpperLayer(slot=jnp.asarray(slot), adj=jnp.asarray(adj_global))
        )

    return GraphIndex(
        vectors=vectors,
        norms=norms,
        adj_bottom=jnp.asarray(adj_bottom),
        layers=tuple(upper),
        starting_vertex=jnp.int32(sv),
    )
