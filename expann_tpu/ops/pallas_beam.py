"""Packed-neighbour beam expansion: indexed block-DMA + MXU scoring.

The graph query hot loop must, per iteration, fetch the neighbour vectors
of each expanded node and score them against the query (reference hot
loop: src/antitopo_engine.h:637-688 — pointer-chasing loads + AVX-512
distance batches).  Round-1 measured XLA's random-row gather at a flat
~24ns per row (~21GB/s) on this chip, which capped the graph engine at
~4k QPS.  tools/perf_pallas_gather.py shows explicit Pallas DMAs of
*contiguous packed blocks* reach 170-235GB/s (1-2ns/row) — so the fix is
a layout change plus a kernel:

  * ``packed``: ``(N+1, R, D)`` neighbour vectors stored contiguously per
    node (bf16 for serving; R× corpus duplication is the price of
    streaming-rate fetches).
  * ``aux``: ``(N+1, 2, R)`` f32 — row 0 the neighbours' squared norms
    (+inf at sentinel slots, so padding masks itself), row 1 the
    neighbour ids as BIASED int32 bit patterns in the f32 lanes (see
    ``encode_ids_f32`` — exact for ids < 2^29; the round-2 N < 2^24
    value-cast ceiling is gone).
  * kernel: grid over 8-query tiles (TPU sublane granularity); each step
    issues ``2*8*E`` async copies (the tile's expanded nodes' vector
    blocks + aux rows) with an NBUF-deep lookahead pipeline, then runs
    8E small MXU dots.

Output is ``nn - 2 q·x`` per neighbour; the caller adds ``|q|^2``
(cheaper than an in-kernel 128-lane reduction per step).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT = 8  # queries per grid step (sublane granularity)

# Ids ride the f32 aux tile as BIASED BIT PATTERNS: raw int32 bits of ids
# < 2^23 are f32 DENORMALS, which TPU float datapaths flush to zero (the
# XLA pack/copy side does — measured; Mosaic in-kernel bitcast does not).
# OR-ing bit 30 moves every id into the normal range [2.0, 4.0)·2^k — no
# denormals, no NaNs for ids < 2^29 — so the pattern survives any copy,
# fusion, or transfer.  Exact for any id < 2^29 (536M rows; HBM runs out
# long before).  Encode: bitcast(id | BIAS); decode: bitcast & ~BIAS.
ID_BIAS = 1 << 30
ID_CEIL = 1 << 29


def encode_ids_f32(ids):
    """int32 ids -> f32 carrier values (exact for ids < 2^29)."""
    return jax.lax.bitcast_convert_type(
        jnp.bitwise_or(ids.astype(jnp.int32), jnp.int32(ID_BIAS)), jnp.float32
    )


def decode_ids_f32(bits_f32):
    """f32 carrier values -> int32 ids (inverse of encode_ids_f32)."""
    return jnp.bitwise_and(
        jax.lax.bitcast_convert_type(bits_f32, jnp.int32),
        jnp.int32(ID_BIAS - 1),
    )


def _beam_score_kernel(
    sel_ref,  # (B*E,) int32 scalar-prefetch: nodes to expand
    q_ref,  # (QT, D) f32 query tile
    packed_ref,  # (N+1, Rs, D) storage dtype, HBM
    aux_ref,  # (N+1, 2, R) f32, HBM (R = lane-padded tile width >= Rs)
    out_d_ref,  # (QT*E, R or TOPT) f32: nn - 2 q.x
    out_i_ref,  # (QT*E, R or TOPT) int32 neighbour ids
    vbuf,  # VMEM (NBUF, QT, E, R, D)
    abuf,  # VMEM (NBUF, QT, E, 2, R) f32
    sems,  # DMA sems (NBUF, QT, E, 2)
    *,
    E: int,
    NBUF: int,
    TOPT: int,
    RS: int,  # stored rows per packed block (DMA size); R - RS rows are
    # zeroed once and masked by the aux pad lanes' +inf norms
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    R = vbuf.shape[3]

    def copies(step):
        slot = jax.lax.rem(step, NBUF)
        cs = []
        for qi in range(QT):
            for e in range(E):
                node = sel_ref[(step * QT + qi) * E + e]
                cs.append(
                    pltpu.make_async_copy(
                        packed_ref.at[node],
                        vbuf.at[slot, qi, e, pl.ds(0, RS)],
                        sems.at[slot, qi, e, 0],
                    )
                )
                cs.append(
                    pltpu.make_async_copy(
                        aux_ref.at[node],
                        abuf.at[slot, qi, e],
                        sems.at[slot, qi, e, 1],
                    )
                )
        return cs

    @pl.when(i == 0)
    def _prologue():
        if RS < R:
            # ghost rows (never DMA'd) must hold zeros, not garbage, so
            # their dots stay finite; the aux pad lanes' +inf norms then
            # push them to +inf distance
            for s in range(NBUF):
                for qi in range(QT):
                    for e in range(E):
                        vbuf[s, qi, e, RS:, :] = jnp.zeros(
                            (R - RS, vbuf.shape[4]), vbuf.dtype
                        )
        for s in range(NBUF - 1):
            for c in copies(s):
                c.start()

    @pl.when(i + NBUF - 1 < n)
    def _lookahead():
        for c in copies(i + NBUF - 1):
            c.start()

    for c in copies(i):
        c.wait()

    slot = jax.lax.rem(i, NBUF)
    q = q_ref[...].astype(vbuf.dtype)  # (QT, D)
    d_rows = []
    i_rows = []
    for qi in range(QT):
        qv = q[qi : qi + 1]  # (1, D), static slice
        for e in range(E):
            dot = jax.lax.dot_general(
                qv,
                vbuf[slot, qi, e],  # (R, D)
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, R)
            d_rows.append(abuf[slot, qi, e, 0:1, :] - 2.0 * dot)
            i_rows.append(abuf[slot, qi, e, 1:2, :])
    d_all = jnp.concatenate(d_rows, axis=0)  # (QT*E, R)
    # aux row 1 carries ids as biased int32 bit patterns in f32 lanes
    i_all = decode_ids_f32(jnp.concatenate(i_rows, axis=0))
    if TOPT == 0:
        out_d_ref[...] = d_all
        out_i_ref[...] = i_all
        return

    # Per-row top-TOPT extraction (same min-extract pattern as
    # ops/pallas_topk.py): each expanded node's R scored neighbours are
    # reduced to its best TOPT before leaving the kernel, shrinking the
    # caller's per-iteration merge sort by R/TOPT.  Row-wise 128-lane
    # reductions on a (QT*E, R) block are single-vreg ops — this hides
    # entirely under the DMA pipeline.
    R = d_all.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, d_all.shape, 1)
    BIG = jnp.int32(2**31 - 1)
    td, ti = [], []
    for _ in range(TOPT):
        m = jnp.min(d_all, axis=1, keepdims=True)  # (QT*E, 1)
        is_min = d_all == m  # +inf rows: all lanes (sentinel ids tie-break)
        lane_sel = jnp.min(jnp.where(is_min, lane, BIG), axis=1, keepdims=True)
        sel = lane == lane_sel
        td.append(m)
        ti.append(jnp.min(jnp.where(sel, i_all, BIG), axis=1, keepdims=True))
        d_all = jnp.where(sel, jnp.inf, d_all)
    out_d_ref[...] = jnp.concatenate(td, axis=1)
    out_i_ref[...] = jnp.concatenate(ti, axis=1)


@functools.partial(jax.jit, static_argnames=("nbuf", "topt", "interpret"))
def packed_score(
    packed: jax.Array,  # (N+1, R, D) storage dtype
    aux: jax.Array,  # (N+1, 2, R) f32
    sel: jax.Array,  # (B, E) int32 nodes to expand (sentinel ok)
    q: jax.Array,  # (B, D) f32
    nbuf: int = 2,
    topt: int = 0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Score the packed neighbours of each selected node against its
    query.  Returns ``(partial_d, ids)`` of shape ``(B, E*R)`` where
    ``partial_d = |x|^2 - 2 q·x`` (add ``|q|^2`` for the squared L2) and
    sentinel-padded slots carry ``+inf`` / the sentinel id.  ``R`` is the
    aux tile width (a multiple of 128); ``packed`` may store fewer rows
    per block (Rs < R, memory-economical at low graph degree) — the ghost
    rows are masked by the aux pad lanes' +inf norms.

    With ``topt=t > 0``, each expanded node contributes only its t best
    neighbours (extracted in-kernel): output shape ``(B, E*t)``, ascending
    per node — cuts the caller's merge width by R/t."""
    _, RS, D = packed.shape
    _, two, R = aux.shape
    assert two == 2 and R % 128 == 0 and RS <= R
    B, E = sel.shape
    K = topt if topt else R
    assert 0 <= topt <= R
    assert q.shape == (B, D), (q.shape, (B, D))
    assert B % QT == 0, f"query batch must be a multiple of {QT}"
    nbuf = max(1, min(nbuf, B // QT))  # pipeline no deeper than the grid
    vbuf_bytes = nbuf * QT * E * R * D * packed.dtype.itemsize
    # measured on v5e: 8MB vbuf + aux + pipeline buffers exceeds the
    # scoped-VMEM budget; 4MB (e.g. E=8, R=128, bf16, nbuf=2) fits
    assert vbuf_bytes <= 4 * 2**20, (
        f"VMEM scratch {vbuf_bytes} too large; lower expand/nbuf"
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // QT,),
        in_specs=[
            pl.BlockSpec((QT, D), lambda i, ids: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((QT * E, K), lambda i, ids: (i, 0)),
            pl.BlockSpec((QT * E, K), lambda i, ids: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((nbuf, QT, E, R, D), packed.dtype),
            pltpu.VMEM((nbuf, QT, E, 2, R), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf, QT, E, 2)),
        ],
    )
    out_d, out_i = pl.pallas_call(
        functools.partial(
            _beam_score_kernel, E=E, NBUF=nbuf, TOPT=topt, RS=RS
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * E, K), jnp.float32),
            jax.ShapeDtypeStruct((B * E, K), jnp.int32),
        ],
        interpret=interpret,
    )(sel.reshape(-1), q, packed, aux)
    return out_d.reshape(B, E * K), out_i.reshape(B, E * K)


def build_packed(
    vectors: jax.Array,  # (N+1, D) f32 corpus w/ sentinel row
    norms: jax.Array,  # (N+1,) f32, norms[N] = +inf
    adj: jax.Array,  # (N+1, R) int32, sentinel N padding
    dtype=jnp.bfloat16,
    chunk: int = 32768,
) -> Tuple[jax.Array, jax.Array]:
    """Materialize the packed-neighbour arrays from a built graph.

    Chunked so the f32 gather intermediate never exceeds
    ``chunk * R * D * 4`` bytes.  The aux tile is lane-padded to a
    multiple of 128 (sentinel slots: +inf norms, sentinel ids) while the
    vector blocks store only ``Rs = roundup(R, 16)`` rows — at low graph
    degree this keeps packed memory ~R/128 of the full-tile cost (e.g. an
    R=32 graph at N=1M: 8.2GB instead of 32GB).  Ids are stored as biased
    bit patterns in the f32 aux lanes (``encode_ids_f32`` — exact for ids
    < 2^29; no N < 2^24 value-cast ceiling)."""
    np1 = vectors.shape[0]
    sentinel = np1 - 1
    assert sentinel < ID_CEIL, "id encoding supports N < 2^29"
    r = adj.shape[1]
    rs = r + ((-r) % 16)  # bf16 sublane alignment for the DMA blocks
    r_tile = rs + ((-rs) % 128)
    adj_t = adj
    if r_tile > r:
        adj_t = jnp.concatenate(
            [adj, jnp.full((np1, r_tile - r), sentinel, adj.dtype)], axis=1
        )
    return _pack_chunks(vectors, norms, adj_t, rs, dtype, chunk)


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("rs",))
def _pack_write(packed, aux, vectors, norms, a, s, rs: int):
    """Gather one adjacency chunk's blocks and write them in place.

    ``donate_argnums`` makes the update truly in-place: a chunked
    ``jnp.concatenate`` assembly needs 2x the packed bytes transiently,
    which OOMs HBM at the million-row scale (packed is ~8GB at N=1M,
    R=32, bf16 on a 16GB chip)."""
    block = vectors[a[:, :rs]].astype(packed.dtype)
    packed = jax.lax.dynamic_update_slice(packed, block, (s, 0, 0))
    # ids ride in the f32 aux tile as BIASED int32 bit patterns (see
    # encode_ids_f32): exact for any id < 2^29, so the round-2 N < 2^24
    # ceiling is gone — the DMA copies bytes, kernels decode
    arow = jnp.stack([norms[a], encode_ids_f32(a)], axis=1)
    aux = jax.lax.dynamic_update_slice(aux, arow, (s, 0, 0))
    return packed, aux


def _pack_chunks(vectors, norms, adj_t, rs, dtype, chunk):
    np1, r_tile = adj_t.shape
    D = vectors.shape[1]
    packed = jnp.zeros((np1, rs, D), dtype)
    aux = jnp.zeros((np1, 2, r_tile), jnp.float32)
    for s in range(0, np1, chunk):
        a = adj_t[s : s + chunk]  # (c, r_tile); tail chunk is smaller
        packed, aux = _pack_write(
            packed, aux, vectors, norms, a, jnp.int32(s), rs=rs
        )
    return packed, aux


def build_packed_i8(
    vectors: jax.Array,  # (N+1, D) f32 corpus w/ sentinel row
    adj: jax.Array,  # (N+1, R) int32, sentinel N padding
    chunk: int = 32768,
):
    """Packed-neighbour arrays over CENTERED s8 codes: half the DMA bytes
    per expansion of the bf16 layout (the fused traversal is DMA
    bandwidth-bound, BENCH_NOTES), scored exactly on the s8 MXU path
    (|code| <= 127, D <= 512 keeps integer distances < 2^24 — exact in
    both s32 and f32).  The reference's analogous move is its packed-uint8
    compressed beam (src/antitopo_engine.h:710-851, dist2_compressed
    :38-61); centering + shared scale is the quantize_corpus_i8 recipe
    (ops/pallas_topk.py) — distances are shift-invariant, so centering
    costs nothing and minimizes clipping.

    Returns ``(packed, aux, codes, code_norms, center, scale)``:
      * ``packed`` (N+1, RS, D) int8 neighbour code blocks,
      * ``aux`` (N+1, 2, R_tile) f32 — CODE-SPACE squared norms (+inf at
        sentinel slots) and ids,
      * ``codes`` (N+1, D) int8 code corpus (entry-point scoring),
      * ``code_norms`` (N+1,) f32 (+inf sentinel),
      * ``center`` (D,) f32 / ``scale`` () f32: query transform
        ``qc = clip(round((q - center) * scale), -127, 127)``.
    """
    np1 = vectors.shape[0]
    sentinel = np1 - 1
    assert sentinel < ID_CEIL, "id encoding supports N < 2^29"
    vf = jnp.asarray(vectors, jnp.float32)
    center = jnp.mean(vf[:sentinel], axis=0)
    absmax = jnp.maximum(jnp.max(jnp.abs(vf[:sentinel] - center)), 1e-30)
    scale = 127.0 / absmax
    codes = jnp.clip(
        jnp.round((vf - center) * scale), -127, 127
    ).astype(jnp.int8)
    cf = codes.astype(jnp.float32)
    code_norms = jnp.sum(cf * cf, axis=1).at[sentinel].set(jnp.inf)

    r = adj.shape[1]
    rs = r + ((-r) % 32)  # int8 sublane alignment for the DMA blocks
    r_tile = rs + ((-rs) % 128)
    adj_t = adj
    if r_tile > r:
        adj_t = jnp.concatenate(
            [adj, jnp.full((np1, r_tile - r), sentinel, adj.dtype)], axis=1
        )
    packed, aux = _pack_chunks(codes, code_norms, adj_t, rs, jnp.int8, chunk)
    return packed, aux, codes, code_norms, center, scale
