"""Fully fused in-kernel beam-search traversal.

The round-2 packed path (ops/pallas_beam.py) made one Pallas dispatch per
traversal iteration and merged beams with an XLA ``lax.sort`` between
dispatches — at ~100ns expansions the sort and the relaunches dominate.
This kernel keeps the ENTIRE traversal of a query tile inside one Pallas
grid step (reference hot loop: src/antitopo_engine.h:637-688, the whole
``query_k_at_layer`` while-loop :584-688):

  * the beam ``(QT, EF)`` (distances, ids, expanded-flags) lives in
    vector registers across iterations — no HBM round-trips, no sort,
  * per iteration each query selects its best unexpanded beam entries
    (masked-min extraction), stages their ids to VMEM, reads them back as
    scalars, and issues the packed-block DMAs (data-dependent indices
    measured viable in tools/probe_fused.py),
  * all ``QT*E`` fetched blocks are scored with ONE MXU matmul
    ``q @ blocks^T`` (the QT× redundant rows are free — the MXU is never
    the bottleneck here),
  * merging is two-phase (measured in tools/probe_fused_cost.py: wide
    vector ops dominate a naive merge): each expansion's RS scored rows
    first reduce to their best TOPT via masked-min extraction on the
    narrow (QT, RS) segment, then the E*TOPT compact candidates enter the
    beam by replace-max insertion — ~12 single-vreg ops each, dedup against
    the beam by id equality.  Candidate-vs-candidate dedup is implicit:
    bf16 block scores of the same node are bitwise equal, so a duplicate
    of an inserted node hits the id check, and a duplicate of a rejected
    one is rejected by the same (monotonically decreasing) beam-max
    comparison,
  * termination is per query-tile (``jax.lax.while_loop`` on a scalar
    all-done reduction) — the reference's break condition
    (src/antitopo_engine.h:588-590) checked tile-locally, so one slow
    query stalls QT-1 neighbours instead of the whole batch.

Replace-max insertion keeps exactly the top-EF of everything ever offered
(heap property: replacing the max with any smaller element preserves the
top-k multiset), so the beam equals the reference's ``nearest`` heap over
the visited set.  Beam-dedup correctness argument is the same as
models/search.py: a node in the beam is never re-added, an evicted node
can never re-enter because the beam improves monotonically, so no cycles
are possible.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from expann_tpu.ops.pallas_beam import decode_ids_f32

QT = 8  # default queries per grid step (sublane granularity)
BIG = 2**31 - 1  # python ints/floats only: jnp values would be captured consts
INF = float("inf")


def _fused_kernel(
    lim_ref,  # (1, 2) int32 SMEM: [ef_live, max_iters] — RUNTIME scalars
    # so one compiled kernel serves every ef <= EF (set_ef_search must not
    # recompile: reference src/antitopo_engine.h:189-195 is free)
    q_ref,  # (QT, D) f32 query tile
    bd0_ref,  # (QT, EF) f32 initial beam distances (+inf padding)
    bi0_ref,  # (QT, EF) int32 initial beam ids (sentinel padding)
    packed_ref,  # (N+1, RS, D) storage dtype, HBM
    aux_ref,  # (N+1, 2, R) f32, HBM
    obd_ref,  # (QT, EF) f32 out beam distances (unsorted)
    obi_ref,  # (QT, EF) int32 out beam ids
    ost_ref,  # (QT, 128) int32 out stats block: col0 distcomps, col1 iters
    vbuf,  # VMEM (QT, E, RS, D) packed blocks
    abuf,  # VMEM (QT, E, 2, R) f32 aux rows
    selbuf,  # VMEM (QT, 128) int32 staged selections
    sems,  # DMA sems (2*QT,): per query one for packed, one for aux copies
    # (flattened 1D and shared across the E copies — the sflag space is
    # tiny and multi-dim semaphore arrays pad each minor dim)
    *,
    E: int,
    TOPT: int,
    RS: int,
    SENTINEL: int,
    DBG: str = "",  # dev cost-probes, see tools/probe_fused_cost.py
):
    T, D = q_ref.shape
    EF = bd0_ref.shape[1]
    ef_live = lim_ref[0, 0]
    max_iters = lim_ref[0, 1]
    q = q_ref[...]
    qn = jnp.sum(q * q, axis=1, keepdims=True)  # (T, 1)
    qc = q.astype(vbuf.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, EF), 1)
    live = lane < ef_live
    slane = jax.lax.broadcasted_iota(jnp.int32, (T, RS), 1)
    sent = SENTINEL

    # Round-2 attributed 68 of 93.5 us/tile-iter to the while_loop carry;
    # round-3 re-measurement with a "noop" body showed most of that was
    # the ~100-200ms per-DISPATCH wall overhead on this axon host
    # amortized over the iteration count — a VMEM-scratch state rewrite
    # (refs discharge back into the carry plus explicit load/stores) was
    # measurably SLOWER e2e (32.5k vs 40.7k QPS at identical work), so
    # the carry design stands and the amortization lever is batch size
    # (tools/perf_e2e_graph.py).  A bf16 distance carry remains blocked
    # on Mosaic mixed-bitwidth i1 relayouts ("Invalid relayout ...
    # vector<128x128xi1>"); "bf16carry" in DBG re-enables the experiment.
    CDT = jnp.bfloat16 if "bf16carry" in DBG else jnp.float32

    def body(carry):
        beam_d, beam_ids, beam_exp, done, it, ncomp = carry

        if "noop" in DBG:  # cost probe: loop skeleton + carry only
            return beam_d, beam_ids, beam_exp, done, it + 1, ncomp
        if "minimal" in DBG:  # cost probe: carry + one reduction only
            beam_d = beam_d + jnp.min(beam_d, axis=1, keepdims=True) * CDT(1e-3)
            return beam_d, beam_ids, beam_exp, done, it + 1, ncomp

        # --- select the E best unexpanded beam entries per query ---
        masked = jnp.where((beam_exp == 1) | ~live, INF, beam_d)
        worst = jnp.max(jnp.where(live, beam_d, -INF), axis=1, keepdims=True)
        sel_cols = []
        for e in range(E):
            m = jnp.min(masked, axis=1, keepdims=True)
            lsel = jnp.min(
                jnp.where(masked == m, lane, BIG), axis=1, keepdims=True
            )
            smask = lane == lsel
            sid = jnp.min(jnp.where(smask, beam_ids, BIG), axis=1, keepdims=True)
            # isfinite lowers through an f32-only Mosaic op; a threshold
            # compare works in any carry dtype (no NaNs are ever produced)
            fin = m < CDT(3e38)
            if e == 0 and "nodone" not in DBG:
                # reference break: best unexpanded worse than the beam's
                # worst member (full beams only: empty slots hold +inf so
                # worst == +inf keeps the query running)
                done = jnp.maximum(done, ((m > worst) | ~fin).astype(jnp.int32))
            sel_cols.append(jnp.where(fin & (done == 0), sid, sent))
            if "nodone" not in DBG:
                beam_exp = jnp.where(smask & fin, 1, beam_exp)
            masked = jnp.where(smask, CDT(INF), masked)
        sel = jnp.concatenate(sel_cols, axis=1)  # (T, E)
        if "selonly" in DBG:  # cost probe: selection ops, no staging store
            beam_d = beam_d + sel[:, :1].astype(CDT) * CDT(1e-6)
            return beam_d, beam_ids, beam_exp, done, it + 1, ncomp
        selbuf[...] = jnp.concatenate(
            [sel, jnp.full((T, 128 - E), sent, jnp.int32)], axis=1
        )
        # per-row counter: a scalar carry would force a vector->scalar sync
        # every iteration (measured ~microseconds in probe_fused_cost.py)
        ncomp = ncomp + RS * jnp.sum(
            (sel != sent).astype(jnp.int32), axis=1, keepdims=True
        )

        # --- fetch the selected nodes' packed blocks (data-dependent DMA) ---
        if "skip_dma" not in DBG:
            for qi in range(T):
                for e in range(E):
                    node = (
                        (it % 97) * (qi + e) if "static_sel" in DBG
                        else selbuf[qi, e]
                    )
                    pltpu.make_async_copy(
                        packed_ref.at[node], vbuf.at[qi, e], sems.at[2 * qi]
                    ).start()
                    pltpu.make_async_copy(
                        aux_ref.at[node], abuf.at[qi, e], sems.at[2 * qi + 1]
                    ).start()
            for qi in range(T):
                for e in range(E):
                    pltpu.make_async_copy(
                        packed_ref.at[0], vbuf.at[qi, e], sems.at[2 * qi]
                    ).wait()
                    pltpu.make_async_copy(
                        aux_ref.at[0], abuf.at[qi, e], sems.at[2 * qi + 1]
                    ).wait()

        # --- score all T*E blocks with one MXU matmul ---
        if "skip_score" in DBG:
            itf = it.astype(jnp.float32)
            segs = [
                (slane.astype(jnp.float32) * 0.125 + itf + e, slane + it)
                for e in range(E)
            ]
        else:
            # one (8, D) x (D, 8*E*RS) matmul per 8-query subgroup: the 8x
            # row redundancy is free on the MXU, and grouping bounds the
            # VMEM intermediate at O(8 * T * E * RS) instead of O(T^2)
            # s8 blocks take the s8 MXU path (s32 accumulate, exact — codes
            # bound |dot| < 2^24); bf16/f32 accumulate in f32
            acc_t = (
                jnp.int32 if vbuf.dtype == jnp.int8 else jnp.float32
            )
            if RS % 128 == 0:
                # one (8, D) x (D, 8*E*RS) matmul per 8-query subgroup:
                # the 8x row redundancy is free on the MXU, and grouping
                # bounds the VMEM intermediate at O(8 * T * E * RS)
                bigs = []
                for g in range(T // 8):
                    Vg = vbuf[8 * g : 8 * (g + 1)].reshape(8 * E * RS, D)
                    bigs.append(
                        jax.lax.dot_general(
                            qc[8 * g : 8 * (g + 1)], Vg,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=acc_t,
                        ).astype(jnp.float32)
                    )  # (8, 8*E*RS); row r only needs its own E*RS segment
                dots = [
                    jnp.concatenate(
                        [
                            bigs[qi // 8][
                                qi % 8 : qi % 8 + 1,
                                ((qi % 8) * E + e) * RS
                                : ((qi % 8) * E + e + 1) * RS,
                            ]
                            for qi in range(T)
                        ],
                        axis=0,
                    )  # (T, RS)
                    for e in range(E)
                ]
            else:
                # RS < 128: the subgroup extraction above would slice the
                # matmul output at non-128-aligned lane offsets, which
                # Mosaic rejects ("offset mismatch on non-concat
                # dimension"), and batched matvec dot_generals fail to
                # lower.  Score each query against ITS OWN blocks with a
                # broadcast multiply + lane reduction instead — exact in
                # f32 for both bf16 vectors and s8 codes (|products| and
                # sums stay < 2^24), and low-degree graphs are DMA bound,
                # not FLOP bound, so skipping the MXU costs little.
                del acc_t
                qf32 = qc.astype(jnp.float32)
                dots = [
                    jnp.sum(
                        qf32[:, None, :] * vbuf[:, e].astype(jnp.float32),
                        axis=-1,
                    )
                    for e in range(E)
                ]
            segs = []
            for e in range(E):
                nrm_e = abuf[:, e, 0, :RS]  # +inf at sentinel/pad slots
                # aux row 1: ids as biased bit patterns (pallas_beam)
                ids_e = decode_ids_f32(abuf[:, e, 1, :RS])
                segs.append((nrm_e + qn - 2.0 * dots[e], ids_e))

        if "skip_merge" not in DBG:
            # --- merge: per-segment extract-min, immediate replace-max
            # insertion (interleaved to keep register pressure low — a
            # materialized candidate list spills) ---
            for seg_d, seg_i in segs:
                for _ in range(TOPT):
                    m = jnp.min(seg_d, axis=1, keepdims=True)
                    lsel = jnp.min(
                        jnp.where(seg_d == m, slane, BIG), axis=1, keepdims=True
                    )
                    smask = slane == lsel
                    cid = jnp.min(
                        jnp.where(smask, seg_i, BIG), axis=1, keepdims=True
                    )
                    seg_d = jnp.where(smask, INF, seg_d)
                    dup = jnp.max(
                        ((beam_ids == cid) & live).astype(jnp.int32),
                        axis=1,
                        keepdims=True,
                    )
                    wmax = jnp.max(
                        jnp.where(live, beam_d, -INF), axis=1, keepdims=True
                    )
                    wlsel = jnp.min(
                        jnp.where((beam_d == wmax) & live, lane, BIG),
                        axis=1,
                        keepdims=True,
                    )
                    # compare and insert in carry precision: a candidate
                    # admitted on an f32 compare could round UP past the
                    # evicted max after the bf16 store, breaking the
                    # monotone-beam argument
                    mc = m.astype(CDT)
                    ok = (mc < wmax) & (dup == 0) & (done == 0)
                    repl = (lane == wlsel) & ok
                    beam_d = jnp.where(repl, mc, beam_d)
                    beam_ids = jnp.where(repl, cid, beam_ids)
                    beam_exp = jnp.where(repl, 0, beam_exp)

        return beam_d, beam_ids, beam_exp, done, it + 1, ncomp

    def cond(carry):
        _, _, _, done, it, _ = carry
        if "fori" in DBG:  # cost probe: pure-scalar condition, no early exit
            return it < max_iters
        return (it < max_iters) & (jnp.min(done) == 0)

    beam_d, beam_ids, _, _, it, ncomp = jax.lax.while_loop(
        cond,
        body,
        (
            bd0_ref[...].astype(CDT),
            bi0_ref[...],
            jnp.zeros((T, EF), jnp.int32),
            jnp.zeros((T, 1), jnp.int32),
            jnp.int32(0),
            jnp.zeros((T, 1), jnp.int32),
        ),
    )
    obd_ref[...] = jnp.where(live, beam_d, CDT(INF)).astype(jnp.float32)
    obi_ref[...] = jnp.where(live, beam_ids, sent)
    stat_lane = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
    # col0: per-row distcomp counts (sum over rows outside); col1: iters
    ost_ref[...] = jnp.where(
        stat_lane == 0, ncomp, jnp.where(stat_lane == 1, it, 0)
    )


@functools.partial(
    jax.jit,
    static_argnames=("expand", "cand", "qt", "interpret", "dbg"),
)
def fused_search(
    packed: jax.Array,  # (N+1, RS, D) storage dtype
    aux: jax.Array,  # (N+1, 2, R) f32
    q: jax.Array,  # (B, D) f32
    beam_d0: jax.Array,  # (B, EF) f32, +inf padding
    beam_ids0: jax.Array,  # (B, EF) int32, sentinel padding
    ef,  # int or int32 scalar — RUNTIME value, no recompile across ef
    expand: int = 2,
    cand: int = 32,
    max_iters=0,  # int or int32 scalar; <=0 means 8*ef+16
    qt: int = QT,
    interpret: bool = False,
    dbg: str = "",
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run the whole bottom-layer beam search in one Pallas kernel.

    Returns ``(beam_ids, beam_d, ncomps, iters)``: UNSORTED beams of width
    ``EF = beam_d0.shape[1]`` (lanes >= ef carry +inf / sentinel), plus a
    per-query distance-computation counter ``(B,)`` and a per-tile
    iteration counter ``(B // qt,)``.  ``cand`` is rounded to a multiple of ``expand``: each
    of the ``expand`` fetched blocks contributes its best ``cand/expand``
    neighbours per iteration.  Scores are computed against the packed
    (bf16) blocks; callers should rerank the final beam in exact f32
    (models/search.py does).

    ``ef`` and ``max_iters`` are runtime scalars (SMEM operands): one
    compiled kernel serves every ef <= EF, so sweeping ef_search — the
    reference's free set_ef_search knob (src/antitopo_engine.h:189-195) —
    does not touch the (minutes-slow on this host) compile server
    *within one EF bucket*: EF is the static beam width (a multiple of
    128), so an ef sweep crossing a 128 boundary (e.g. 120 -> 160)
    compiles the wider-beam kernel once per bucket.
    """
    _, RS, D = packed.shape
    _, two, R = aux.shape
    B, EF = beam_d0.shape
    assert two == 2 and EF % 128 == 0
    if isinstance(ef, int):
        assert 0 < ef <= EF
    assert q.shape == (B, D) and beam_ids0.shape == (B, EF)
    assert qt % 8 == 0 or qt == 8, f"tile height {qt} must be a multiple of 8"
    assert B % qt == 0, f"query batch must be a multiple of {qt}"
    sentinel = packed.shape[0] - 1
    E = max(1, expand)
    TOPT = max(1, min((cand + E - 1) // E, RS))
    ef_s = jnp.asarray(ef, jnp.int32).reshape(())
    mi_s = jnp.asarray(max_iters, jnp.int32).reshape(())
    mi_s = jnp.where(mi_s > 0, mi_s, 8 * ef_s + 16)
    lim = jnp.stack([ef_s, mi_s]).reshape(1, 2)

    grid = (B // qt,)
    obd, obi, ost = pl.pallas_call(
        functools.partial(
            _fused_kernel,
            E=E,
            TOPT=TOPT,
            RS=RS,
            SENTINEL=sentinel,
            DBG=dbg,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qt, D), lambda i: (i, 0)),
            pl.BlockSpec((qt, EF), lambda i: (i, 0)),
            pl.BlockSpec((qt, EF), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((qt, EF), lambda i: (i, 0)),
            pl.BlockSpec((qt, EF), lambda i: (i, 0)),
            pl.BlockSpec((qt, 128), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, EF), jnp.float32),
            jax.ShapeDtypeStruct((B, EF), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qt, E, RS, D), packed.dtype),
            pltpu.VMEM((qt, E, 2, R), jnp.float32),
            pltpu.VMEM((qt, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * qt,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # the default 16MB scoped-vmem budget undercounts tall tiles
            # (qt=128 + the subgroup matmul intermediates); the chip has
            # 128MB of VMEM
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(lim, q.astype(jnp.float32), beam_d0, beam_ids0, packed, aux)
    # col0 is a per-row (per-query) distcomp count; col1 a per-tile iter count
    return obi, obd, ost[:, 0], ost[::qt, 1]
