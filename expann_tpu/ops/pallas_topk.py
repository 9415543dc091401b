"""Fused brute-force k-NN Pallas kernel: streamed matmul-distance + on-chip
top-k merge.

Replaces the reference's scalar linear scan + heap
(reference: src/brute_force_engine.h:29-46) AND the two-op XLA pipeline
(matmul then lax.top_k).  The XLA pipeline materializes the full (B, N)
distance matrix in HBM and then runs a sort-class op over it; on this
hardware sorts and large elementwise ops sustain only a few GB/s while the
MXU sustains tens of TFLOP/s, so the distance matrix round-trip dominates
end-to-end latency (and at N=1M the s32[B,N] sort buffers exceed HBM).

This kernel streams the corpus once:

    grid = (query tiles, corpus blocks)         # corpus minor
    per step: dot((Bt, D), (G, D)^T) on the MXU in VMEM,
              then a k-pass min-extraction merges the block's distances
              into a persistent (Bt, k) running top-k in VMEM scratch,
    writes only the final (Bt, k) ids + distances.

HBM traffic = corpus bytes (sequential) + query tiles; nothing N-sized is
ever written.  Ties broken by lower id (lexicographic (d, id)), matching
lax.top_k and the reference's set ordering.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = 3.0e38  # "knocked out / empty" marker (positive huge)


def _topk_merge_kernel(
    q_ref,  # (Bt, D) VMEM (storage dtype)
    x_ref,  # (G, D) VMEM (storage dtype)
    out_d_ref,  # (Bt, k) f32
    out_i_ref,  # (Bt, k) int32
    run_d,  # scratch (Bt, k) f32
    run_i,  # scratch (Bt, k) int32
    *,
    k: int,
    G: int,
    n_real: int,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        run_d[:] = jnp.full(run_d.shape, NEG_BIG, jnp.float32)
        # distinct sentinel ids per slot — worst-slot selection relies on
        # (d, id) uniqueness to replace exactly one slot
        slot_col = jax.lax.broadcasted_iota(jnp.int32, run_i.shape, 1)
        run_i[:] = jnp.int32(2**31 - 1) - slot_col

    q = q_ref[:]
    Bt = q.shape[0]
    x = x_ref[:]
    if q.dtype == jnp.int8:
        # s8 x s8 -> s32 MXU path (2x bf16 peak, half the HBM stream).
        # Max |code| 127 and D <= 512 keep dd < 2^24, so the f32
        # conversion below is EXACT and the extraction logic is shared.
        dots = jax.lax.dot_general(
            q,
            x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        qi = q.astype(jnp.int32)
        qn = jnp.sum(qi * qi, axis=1, keepdims=True)
        xi = x.astype(jnp.int32)
        xn = jnp.sum(xi * xi, axis=1)[None, :]
        dd = (qn + xn - 2 * dots).astype(jnp.float32)  # (Bt, G)
    else:
        dots = jax.lax.dot_general(
            q,
            x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qf = q.astype(jnp.float32)
        qn = jnp.sum(qf * qf, axis=1, keepdims=True)  # (Bt, 1)
        xf = x.astype(jnp.float32)
        xn = jnp.sum(xf * xf, axis=1)[None, :]  # (1, G)
        dd = qn + xn - 2.0 * dots  # (Bt, G)
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, G), 1)
    dd = jnp.where(j * G + col >= n_real, NEG_BIG, dd)

    # Pool the block's G distances down to LANES (=128) cells, tracking
    # which chunk attained each lane's min.  All subsequent reductions run
    # at 128-lane width, so the k extraction passes cost ~G/LANES less
    # than full-width extraction.  Cell semantics: a cell holds the
    # same lane across G/LANES chunks; losing a cell's second-best only
    # costs recall if two GLOBAL top-k members share (block, lane) —
    # probability ~ C(k,2) / (num_blocks * LANES), negligible.
    LANES = 128
    nch = G // LANES
    pooled_d = dd[:, :LANES]
    pooled_c = jnp.zeros((Bt, LANES), jnp.int32)
    for c in range(1, nch):
        ch = dd[:, c * LANES : (c + 1) * LANES]
        better_c = ch < pooled_d
        pooled_d = jnp.where(better_c, ch, pooled_d)
        pooled_c = jnp.where(better_c, c, pooled_c)

    lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, LANES), 1)
    for _ in range(k):
        m = jnp.min(pooled_d, axis=1, keepdims=True)  # (Bt, 1)
        is_min = pooled_d == m
        lane_id = jnp.min(
            jnp.where(is_min, lane, jnp.int32(2**31 - 1)),
            axis=1,
            keepdims=True,
        )
        sel = is_min & (lane == lane_id)  # exactly one lane per row
        chunk_sel = jnp.max(
            jnp.where(sel, pooled_c, jnp.int32(-1)), axis=1, keepdims=True
        )
        pos_id = j * G + chunk_sel * LANES + lane_id  # (Bt, 1) global id
        # insert into the running top-k: replace the worst slot if better
        w = jnp.max(run_d[:], axis=1, keepdims=True)
        is_w = run_d[:] == w
        w_id = jnp.max(
            jnp.where(is_w, run_i[:], jnp.int32(-1)), axis=1, keepdims=True
        )
        better = (m[:, 0] < w[:, 0]) | (
            (m[:, 0] == w[:, 0]) & (pos_id[:, 0] < w_id[:, 0])
        )
        take = is_w & (run_i[:] == w_id) & better[:, None]
        run_d[:] = jnp.where(take, m, run_d[:])
        run_i[:] = jnp.where(take, pos_id, run_i[:])
        # knock the extracted cell out
        pooled_d = jnp.where(sel, NEG_BIG, pooled_d)

    # flush the (unsorted) running top-k every step; the caller sorts the
    # tiny (B, k) result, so no write-only-on-last-step assumptions
    out_d_ref[:] = run_d[:]
    out_i_ref[:] = run_i[:]


def _topk_merge_kernel_count(
    q_ref,  # (Bt, D) VMEM (storage dtype)
    x_ref,  # (G, D) VMEM (storage dtype)
    out_d_ref,  # (Bt, k) f32
    out_i_ref,  # (Bt, k) int32
    run_k,  # scratch (Bt, k) f32 PACKED KEYS (value | slot index)
    run_i,  # scratch (Bt, k) int32
    *,
    k: int,
    G: int,
    n_real: int,
):
    """Count-then-loop top-k merge (the ``mode='count'`` kernel).

    The fixed-pass kernel above runs exactly ``k`` extract+insert passes
    per (query tile, corpus block) grid step — ~5 cross-lane reductions
    each — even though, with the corpus streamed in arbitrary order, a
    late block almost never contributes to the running top-k (expected
    insertions per block fall as k/j for block j).  This kernel:

      * packs each candidate's (chunk, lane) index into the distance's
        low mantissa bits (the packed-key trick from ops/pallas_fused.py:
        one f32 reduction returns the extreme value AND its position;
        <= 2^-13 relative clobber, below the bf16 corpus rounding),
      * counts, with ONE reduction, how many pooled candidates beat the
        running worst, and runs only ``min(count, k)`` extract+insert
        passes (a dynamic-bound fori_loop).  ``count`` is taken against
        the block-entry worst, which only tightens during insertion, so
        the prefix property holds: insertions stop at the first failed
        candidate (extraction is ascending), and at most k can succeed —
        the bound is exact, never short.

    Output distances carry the packed-key clobber (low bits zeroed) and
    ties break by (clobbered distance, slot/id) rather than the fixed
    kernel's exact (d, id) — both below the layer's documented bf16
    approximation; the exact oracle remains BruteForceEngine('exact').
    """
    j = pl.program_id(1)
    LANES = 128
    nch = G // LANES
    CB = max(1, (nch - 1).bit_length())
    LB = 7 + CB  # lane (7 bits) | chunk (CB bits); slots reuse the low 7
    LMASK = (1 << LB) - 1
    KEYM = ~LMASK
    INFP = float("inf")

    def pack(d, idx):
        db = jax.lax.bitcast_convert_type(
            jnp.clip(d, 1.0e-35, 3.0e38), jnp.int32
        )
        return jax.lax.bitcast_convert_type((db & KEYM) | idx, jnp.float32)

    def bits(v):
        return jax.lax.bitcast_convert_type(v, jnp.int32)

    @pl.when(j == 0)
    def _init():
        slot_col = jax.lax.broadcasted_iota(jnp.int32, run_k.shape, 1)
        run_k[:] = pack(jnp.full(run_k.shape, NEG_BIG, jnp.float32), slot_col)
        run_i[:] = jnp.int32(2**31 - 1) - slot_col

    q = q_ref[:]
    Bt = q.shape[0]
    x = x_ref[:]
    if q.dtype == jnp.int8:
        dots = jax.lax.dot_general(
            q, x, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        qi = q.astype(jnp.int32)
        qn = jnp.sum(qi * qi, axis=1, keepdims=True)
        xi = x.astype(jnp.int32)
        xn = jnp.sum(xi * xi, axis=1)[None, :]
        dd = (qn + xn - 2 * dots).astype(jnp.float32)
    else:
        dots = jax.lax.dot_general(
            q, x, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qf = q.astype(jnp.float32)
        qn = jnp.sum(qf * qf, axis=1, keepdims=True)
        xf = x.astype(jnp.float32)
        xn = jnp.sum(xf * xf, axis=1)[None, :]
        dd = qn + xn - 2.0 * dots
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, G), 1)
    dd = jnp.where(j * G + col >= n_real, NEG_BIG, dd)

    # pool to 128 lanes with the chunk index riding the key bits (same
    # lane-pooling approximation as the fixed kernel)
    lane7 = jax.lax.broadcasted_iota(jnp.int32, (Bt, LANES), 1)
    pooled_k = pack(dd[:, :LANES], lane7)
    for c in range(1, nch):
        pooled_k = jnp.minimum(
            pooled_k, pack(dd[:, c * LANES : (c + 1) * LANES], lane7 | (c << 7))
        )

    # one reduction each: the running worst and the insertable count
    w0 = jnp.max(run_k[:], axis=1, keepdims=True)  # (Bt, 1) packed
    cand_sat = jax.lax.bitcast_convert_type(
        bits(pooled_k) | LMASK, jnp.float32
    )  # ties lose to any slot (strict <)
    counts = jnp.sum((cand_sat < w0).astype(jnp.int32), axis=1)
    t = jnp.minimum(jnp.max(counts), k)  # scalar; prefix bound, see above

    slot_lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, k), 1)

    def body(_, pk):
        kmin = jnp.min(pk, axis=1, keepdims=True)  # packed: value+chunk+lane
        kb = bits(kmin)
        lane_id = kb & 127
        chunk_id = (kb & LMASK) >> 7
        pos_id = j * G + chunk_id * LANES + lane_id  # (Bt, 1)
        rk = run_k[:]
        w = jnp.max(rk, axis=1, keepdims=True)  # packed: value+slot
        ck_cmp = jax.lax.bitcast_convert_type(kb | LMASK, jnp.float32)
        better = ck_cmp < w  # strict on the clobbered value
        w_slot = bits(w) & LMASK
        take = (slot_lane == w_slot) & better
        new_k = jax.lax.bitcast_convert_type((kb & KEYM) | w_slot, jnp.float32)
        run_k[:] = jnp.where(take, new_k, rk)
        run_i[:] = jnp.where(take, pos_id, run_i[:])
        # knock the extracted lane out (whole lane, as the fixed kernel)
        return jnp.where(lane7 == lane_id, INFP, pk)

    jax.lax.fori_loop(0, t, body, pooled_k)

    # strip the slot bits: output distances are the clobbered values
    out_d_ref[:] = jax.lax.bitcast_convert_type(
        bits(run_k[:]) & KEYM, jnp.float32
    )
    out_i_ref[:] = run_i[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "n_real", "query_tile", "corpus_block", "interpret", "mode"
    ),
)
def flat_topk(
    q: jax.Array,  # (B, D) f32
    x: jax.Array,  # (N_pad, D) storage dtype (f32/bf16); row-padded
    n_real: int,
    k: int,
    query_tile: int = 256,
    corpus_block: int = 1024,
    interpret: bool = False,
    mode: str = "count",  # "count" (count-then-loop, default) | "fixed"
) -> Tuple[jax.Array, jax.Array]:
    """Near-exact k-NN of every query against the corpus: returns
    ``(ids, d2)`` of shape (B, k), ascending by (distance, id).  B must be
    a multiple of query_tile and N_pad of corpus_block.

    Two small approximations (measured recall@10 ~0.993, not 1.0): the
    extraction step pools each corpus block to 128 lanes first, so a
    block's second-best candidate sharing a lane with the best can be
    lost for that pass, and the serving corpus is typically stored bf16.
    Use BruteForceEngine(mode='exact') as the ground-truth oracle, never
    this kernel."""
    B, D = q.shape
    N_pad = x.shape[0]
    assert B % query_tile == 0 and N_pad % corpus_block == 0
    # the extraction pools each block to 128 lanes and knocks out one lane
    # per pass — beyond 128 passes there is nothing left to extract
    assert k <= 128, "flat_topk extraction supports k <= 128"
    if x.dtype == jnp.int8:
        # int8 corpora need properly quantized queries (round, not
        # truncate) — quantize with quantize_corpus_i8's scale upstream
        assert q.dtype == jnp.int8, "int8 corpus requires int8 queries"
        qc = q
    else:
        qc = q.astype(x.dtype)

    grid = (B // query_tile, N_pad // corpus_block)
    kfn = (
        _topk_merge_kernel_count if mode == "count" else _topk_merge_kernel
    )
    kernel = functools.partial(kfn, k=k, G=corpus_block, n_real=n_real)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (query_tile, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (corpus_block, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (query_tile, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (query_tile, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile, k), jnp.float32),
            pltpu.VMEM((query_tile, k), jnp.int32),
        ],
        interpret=interpret,
    )(qc, x)
    # empty-slot test below NEG_BIG: count mode's packed keys zero the low
    # mantissa bits, so the marker reads back slightly under 3e38; no real
    # (clamped) distance approaches 1e38
    out_d = jnp.where(out_d >= 1.0e38, jnp.inf, jnp.maximum(out_d, 0.0))
    # the kernel's running top-k is unsorted; (B, k) sort is negligible
    out_d, out_i = jax.lax.sort((out_d, out_i), num_keys=2)
    return out_i, out_d


def flat_topk_prepare(
    x: np.ndarray, dtype=jnp.bfloat16, corpus_block: int = 1024
) -> Tuple[jax.Array, int]:
    """Pad + upload a host corpus for flat_topk: returns (x_dev, n)."""
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    pad = (-n) % corpus_block
    if pad:
        x = np.concatenate([x, np.zeros((pad, x.shape[1]), np.float32)])
    return jnp.asarray(x, dtype), n


def quantize_corpus_i8(
    x: np.ndarray, corpus_block: int = 1024
) -> Tuple[jax.Array, np.ndarray, float, int]:
    """Symmetric centered int8 codes for the s8 MXU flat scan.

    Distances are shift-invariant, so centering by the corpus mean costs
    nothing; the common scale makes integer distances a monotonic
    s^2-multiple of true distances.  Returns
    ``(codes_dev, center, scale, n)``; quantize queries with
    ``quantize_query_i8(q, center, scale)``.
    """
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    center = x.mean(axis=0)
    xc = x - center
    absmax = float(np.abs(xc).max()) or 1.0
    scale = 127.0 / absmax
    codes = np.clip(np.rint(xc * scale), -127, 127).astype(np.int8)
    pad = (-n) % corpus_block
    if pad:
        codes = np.concatenate(
            [codes, np.zeros((pad, codes.shape[1]), np.int8)]
        )
    return jnp.asarray(codes), center, scale, n


def quantize_query_i8(q: np.ndarray, center: np.ndarray, scale: float) -> np.ndarray:
    return np.clip(
        np.rint((np.asarray(q, np.float32) - center) * scale), -127, 127
    ).astype(np.int8)
