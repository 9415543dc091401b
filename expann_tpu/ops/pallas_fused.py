"""Fully fused in-kernel beam-search traversal.

The round-2 packed path (ops/pallas_beam.py) made one Pallas dispatch per
traversal iteration and merged beams with an XLA ``lax.sort`` between
dispatches — at ~100ns expansions the sort and the relaunches dominate.
This kernel keeps the ENTIRE traversal of a query tile inside one Pallas
grid step (reference hot loop: src/antitopo_engine.h:637-688, the whole
``query_k_at_layer`` while-loop :584-688):

  * the beam ``(QT, EF)`` (distances + ids, with the per-entry expanded
    flag packed into the id's sign as ``~id`` — a separate flag array
    costs 16 live vregs of carry that Mosaic spills every iteration)
    lives in vector registers across iterations — no HBM round-trips,
    no sort,
  * per iteration each query selects its best unexpanded beam entries
    (masked-min extraction), stages their ids to VMEM, reads them back as
    scalars, and issues the packed-block DMAs (data-dependent indices
    measured viable in tools/probe_fused.py),
  * all ``QT*E`` fetched blocks are scored with ONE MXU matmul
    ``q @ blocks^T`` (the QT× redundant rows are free — the MXU is never
    the bottleneck here),
  * merging works on f32 PACKED KEYS (the entry's lane index replaces the
    distance's low mantissa bits, so one f32 min/max reduction yields the
    extreme value AND its lane): each expansion's RS scored rows reduce
    to their best TOPT via packed-key extract-min, then each candidate
    replace-max-inserts with ONE reduction, with the dup checks hoisted
    OFF the serial insertion chain and BIT-PACKED into one reduction per
    segment (beam ids are unique, so each id-equality hits at most one
    lane and a lane-sum of (1<<t)-weighted equalities returns every
    candidate's dup flag at once).  A naive replace-max's per-insertion
    chain of (wmax, wlsel, dup) reductions measured 13.5 of 22
    us/tile-iter (tools/probe_fused_slope.py); per-candidate dup
    max-reductions measured 8.8 of 21.3 (tools/probe_trav_cost.py); a
    sorted-beam lane-roll insertion measured worse still (rolls lower
    expensively),
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
are possible.  Off-chain dup checks stay exhaustive because the live max
is non-increasing across insertions: a candidate bitwise-equal to an
earlier-rejected one is rejected again by the same compare.
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
    MERGE: str = "topt",  # "topt" (top-cand/E per segment) | "count"
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

    # --- f32 packed keys ---
    # Every distance the kernel keeps (beam carry AND candidate segments)
    # is an f32 whose low LB mantissa bits are replaced by the entry's
    # lane index.  For non-negative finite floats the f32 order equals
    # the order of their bit patterns, so one hardware f32 min/max
    # reduction yields BOTH the extreme value and its lane — the lane
    # needs no second reduction.  The replace-max merge's serial chain of
    # per-insertion (wmax, wlsel, dup) reductions measured 13.5 of 22
    # us/tile-iter (tools/probe_fused_slope.py); packed keys cut it to
    # one reduction per insertion, and duplicates of a node keep bitwise-
    # equal keys (same clobber), preserving the dedup argument.  The
    # <= 2^-15-relative clobber is far below the bf16 block-score
    # precision; callers rerank the final beam in exact f32 anyway.
    # +inf distances are clamped to 3e38 first (0x7f800000 | lane would
    # be a NaN pattern and poison the f32 compares), and zero/near-zero
    # distances are clamped UP to a small normal: pack_keys(0.0, lane)
    # would be a subnormal whose lane bits an FTZ-flushing VPU min/max
    # could zero out, corrupting the argmin lane (exact-zero distances
    # are routine in i8 code space).
    LB = max((EF - 1).bit_length(), (max(RS, 2) - 1).bit_length())
    LMASK = (1 << LB) - 1
    KEYM = ~LMASK
    FINTH = 1.0e38  # "finite" threshold: real distances are far below

    def pack_keys(d, lanes):
        db = jax.lax.bitcast_convert_type(
            jnp.clip(d, 1.0e-35, 3.0e38), jnp.int32
        )
        return jax.lax.bitcast_convert_type((db & KEYM) | lanes, jnp.float32)

    def key_lane(k):
        return jax.lax.bitcast_convert_type(k, jnp.int32) & LMASK

    def key_val(k):  # strip the lane bits back out
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(k, jnp.int32) & KEYM, jnp.float32
        )

    def body(carry):
        # beam_k: packed keys (clobbered distance | beam lane).  beam_ids
        # encode the reference's per-entry "expanded" flag in the sign:
        # an expanded entry stores ~id (bitwise NOT, always < 0 for real
        # ids >= 0) — a separate (T, EF) int32 flag array costs 16 more
        # live carry vregs.
        beam_k, beam_ids, done, it, ncomp = carry

        if "noop" in DBG:  # cost probe: loop skeleton + carry only
            return beam_k, beam_ids, done, it + 1, ncomp
        if "minimal" in DBG:  # cost probe: carry + one reduction only
            beam_k = beam_k + jnp.min(beam_k, axis=1, keepdims=True) * 1e-3
            return beam_k, beam_ids, done, it + 1, ncomp

        # --- select the E best unexpanded beam entries per query ---
        masked = jnp.where((beam_ids < 0) | ~live, INF, beam_k)
        worst = jnp.max(jnp.where(live, beam_k, -INF), axis=1, keepdims=True)
        sel_cols = []
        for e in range(E):
            m = jnp.min(masked, axis=1, keepdims=True)
            smask = lane == key_lane(m)  # the key IS the argmin
            sid = jnp.min(jnp.where(smask, beam_ids, BIG), axis=1, keepdims=True)
            fin = m < FINTH
            if e == 0 and "nodone" not in DBG:
                # reference break: best unexpanded worse than the beam's
                # worst member (full beams only: empty slots hold clamped
                # +inf so worst >= FINTH keeps the query running).  Compare
                # with lane bits STRIPPED: ties on the clobbered distance
                # must keep searching (the reference's strict >), not
                # terminate on a lane-index technicality.
                done = jnp.maximum(
                    done,
                    ((key_val(m) > key_val(worst)) | ~fin).astype(jnp.int32),
                )
            sel_cols.append(jnp.where(fin & (done == 0), sid, sent))
            if "nodone" not in DBG:
                # mark expanded: flip the selected lane's id to ~id
                beam_ids = jnp.where(smask & fin, ~beam_ids, beam_ids)
            masked = jnp.where(smask, INF, masked)
        sel = jnp.concatenate(sel_cols, axis=1)  # (T, E)
        if "selonly" in DBG:  # cost probe: selection ops, no staging store
            beam_k = beam_k + sel[:, :1].astype(jnp.float32) * 1e-6
            return beam_k, beam_ids, done, it + 1, ncomp
        selbuf[...] = jnp.concatenate(
            [sel, jnp.full((T, 128 - E), sent, jnp.int32)], axis=1
        )
        # per-row counter: a scalar carry would force a vector->scalar sync
        # every iteration (measured ~microseconds in probe_fused_cost.py)
        ncomp = ncomp + RS * jnp.sum(
            (sel != sent).astype(jnp.int32), axis=1, keepdims=True
        )

        # --- fetch the selected nodes' packed blocks (data-dependent DMA) ---
        # All copies are started, then ALL are waited before scoring.
        # The "obvious" refinement — wait per 8-query subgroup just
        # before that subgroup's matmul so later groups' DMA tails hide
        # under earlier groups' MXU time — measured 24% SLOWER, twice,
        # on the chained device-side probe (group 13.98/14.07 us/query
        # vs eager 11.32/11.37; tools/perf_latency.py + EXPANN_FUSED_DBG,
        # 56k i8 ef=100 B=512, 2026-08-19): interleaving semaphore waits
        # into the unrolled matmul sequence serializes MXU issue against
        # the scalar core, costing more than the DMA tail it hides.
        # Kept as the opt-in dbg="group_wait" variant (parity-tested in
        # tests/test_fused.py); see BENCH_NOTES "DMA-wait placement".
        def _wait_qi(qi):
            for e in range(E):
                pltpu.make_async_copy(
                    packed_ref.at[0], vbuf.at[qi, e], sems.at[2 * qi]
                ).wait()
                pltpu.make_async_copy(
                    aux_ref.at[0], abuf.at[qi, e], sems.at[2 * qi + 1]
                ).wait()

        group_wait = (
            "group_wait" in DBG
            and "skip_dma" not in DBG
            and "skip_score" not in DBG
            and "skip_matmul" not in DBG
            and "vpu_score" not in DBG
            and RS % 128 == 0
        )
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
            if not group_wait:
                for qi in range(T):
                    _wait_qi(qi)

        # --- score all T*E blocks with one MXU matmul ---
        if "skip_score" in DBG:
            itf = it.astype(jnp.float32)
            segs = [
                (slane.astype(jnp.float32) * 0.125 + itf + e, slane + it)
                for e in range(E)
            ]
        elif "skip_matmul" in DBG:  # cost probe: real DMA+aux, fake dots
            segs = []
            for e in range(E):
                dfake = vbuf[:, e, :, 0].astype(jnp.float32)
                nrm_e = abuf[:, e, 0, :RS]
                ids_e = decode_ids_f32(abuf[:, e, 1, :RS])
                segs.append((nrm_e + qn - 2.0 * dfake, ids_e))
        else:
            # s8 blocks take the s8 MXU path (s32 accumulate, exact — codes
            # bound |dot| < 2^24); bf16/f32 accumulate in f32
            acc_t = (
                jnp.int32 if vbuf.dtype == jnp.int8 else jnp.float32
            )
            if RS % 128 == 0 and "vpu_score" not in DBG:
                # one (8, D) x (D, 8*E*RS) matmul per 8-query subgroup:
                # the 8x row redundancy is free on the MXU, and grouping
                # bounds the VMEM intermediate at O(8 * T * E * RS)
                #
                # Grouping wider does NOT help: a (G, D) x (D, G*E*RS)
                # group does G*T*E*RS*D MACs at G/128 MXU row
                # utilization, so time ~ T*E*RS*D*128/peak for EVERY G —
                # the systolic array streams 128 rows per pass no matter
                # how few are live.  The alternative engine is the VPU
                # broadcast-multiply path below (dbg="vpu_score", the
                # RS<128 path): same exact f32 sums, no block-diagonal
                # extraction, ~T*E*RS*D*2 VPU ops — A/B'd on device
                # (BENCH_NOTES round 4).
                bigs = []
                for g in range(T // 8):
                    if group_wait and "skip_dma" not in DBG:
                        for qi in range(8 * g, 8 * (g + 1)):
                            _wait_qi(qi)
                    Vg = vbuf[8 * g : 8 * (g + 1)].reshape(8 * E * RS, D)
                    bigs.append(
                        jax.lax.dot_general(
                            qc[8 * g : 8 * (g + 1)], Vg,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=acc_t,
                        ).astype(jnp.float32)
                    )  # (8, 8*E*RS); row r only needs its own E*RS segment
                # Row r of each group's product needs only its own E*RS
                # block-diagonal segment: shift each 128-aligned segment
                # into place and row-mask-sum (8 aligned lane-slices +
                # selects per group; measured equal to per-row slicing —
                # Mosaic handles both — but this form keeps the slices
                # aligned for any E*RS multiple of 128).
                W = E * RS
                row8 = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
                accs = []
                for g in range(T // 8):
                    if "skip_diag" in DBG:  # cost probe: no block-diag
                        # extraction (wrong data, right shapes)
                        accs.append(bigs[g][:, :W])
                        continue
                    acc = jnp.zeros((8, W), jnp.float32)
                    for j in range(8):
                        acc = acc + jnp.where(
                            row8 == j, bigs[g][:, j * W : (j + 1) * W], 0.0
                        )
                    accs.append(acc)
                acc_all = jnp.concatenate(accs, axis=0)  # (T, E*RS)
                dots = [acc_all[:, e * RS : (e + 1) * RS] for e in range(E)]
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
                if "skip_aux" in DBG:  # cost probe: real dots, fake aux
                    segs.append((dots[e] + qn, slane + it))
                    continue
                nrm_e = abuf[:, e, 0, :RS]  # +inf at sentinel/pad slots
                # aux row 1: ids as biased bit patterns (pallas_beam)
                ids_e = decode_ids_f32(abuf[:, e, 1, :RS])
                segs.append((nrm_e + qn - 2.0 * dots[e], ids_e))

        if "skip_merge" not in DBG and MERGE == "count":
            # --- count-then-loop merge (the flat kernel's trick, applied
            # to the traversal): instead of unconditionally extracting the
            # top TOPT candidates per segment (2 reductions each) and
            # running E*TOPT insertion passes (~2 more reductions each),
            # count with ONE reduction how many of the segment's RS
            # candidates beat the segment-entry beam worst, and run only
            # min(count, ef_live) extract+insert passes.  Prefix bound:
            # counted candidates are exactly those below the entry worst,
            # extraction is ascending so they come out first, the running
            # worst only tightens, and (flat-kernel argument) at most
            # ef_live insertions can succeed per segment.
            #
            # MEASURED SLOWER than "topt" on v5e (56k i8, ef=100, equal
            # recall 0.9495/0.9497): 46.2k vs 77.4k QPS at qt=128, 37.7k
            # vs 83.6k at qt=32 — unlike the flat scan (where most
            # corpus blocks have count=0 and the dynamic loop almost
            # never runs), every traversal iteration inserts for SOME
            # query in the tile, so the dynamic-bound fori_loop's serial
            # per-pass overhead is paid constantly while the unrolled
            # "topt" chain pipelines.  Kept as a tested option because it
            # implements the reference's uncapped-offer heap semantics;
            # the identical measured recall shows the cand=16 quota
            # loses nothing at reference scale (BENCH_NOTES round 3).
            #
            # This mode offers ALL RS neighbours of each expanded node —
            # the REFERENCE's semantics (every neighbour is pushed to the
            # heap, src/antitopo_engine.h:645-688) — whereas "topt" caps
            # offers at cand/E per segment (COMPONENTS.md extraction-quota
            # divergence, now only in the legacy mode).  Dup checks run
            # against the RUNNING beam ids, which is exhaustive here: an
            # inserted duplicate is caught by the id compare; a candidate
            # equal to an earlier REJECTED one fails the same strict-<
            # (the running worst is non-increasing); and an evicted id can
            # never re-enter (its value equalled the then-worst, and the
            # worst only got smaller).
            b_abs = jnp.where(beam_ids < 0, ~beam_ids, beam_ids)
            for seg_d, seg_i in segs:
                skey = pack_keys(seg_d, slane)
                w0 = jnp.max(
                    jnp.where(live, beam_k, -INF), axis=1, keepdims=True
                )
                sat = jax.lax.bitcast_convert_type(
                    jax.lax.bitcast_convert_type(skey, jnp.int32) | LMASK,
                    jnp.float32,
                )
                counts = jnp.sum(
                    ((sat < w0) & (done == 0)).astype(jnp.int32), axis=1
                )
                trip = jnp.minimum(jnp.max(counts), ef_live)

                def _pass(_, st, seg_i=seg_i):
                    skey, beam_k, beam_ids, b_abs = st
                    kmin = jnp.min(skey, axis=1, keepdims=True)
                    smask = slane == key_lane(kmin)
                    cid = jnp.min(
                        jnp.where(smask, seg_i, BIG), axis=1, keepdims=True
                    )
                    skey = jnp.where(smask, INF, skey)
                    dup = jnp.max(
                        (b_abs == cid).astype(jnp.int32),
                        axis=1,
                        keepdims=True,
                    )
                    kmax = jnp.max(
                        jnp.where(live, beam_k, -INF), axis=1, keepdims=True
                    )
                    w_lane = key_lane(kmax)
                    mci = (
                        jax.lax.bitcast_convert_type(kmin, jnp.int32) & KEYM
                    )
                    ck_cmp = jax.lax.bitcast_convert_type(
                        mci | LMASK, jnp.float32
                    )
                    new_k = jax.lax.bitcast_convert_type(
                        mci | w_lane, jnp.float32
                    )
                    repl = (
                        (lane == w_lane)
                        & (ck_cmp < kmax)
                        & (dup == 0)
                        & (done == 0)
                    )
                    beam_k = jnp.where(repl, new_k, beam_k)
                    beam_ids = jnp.where(repl, cid, beam_ids)
                    b_abs = jnp.where(repl, cid, b_abs)
                    return skey, beam_k, beam_ids, b_abs

                skey, beam_k, beam_ids, b_abs = jax.lax.fori_loop(
                    0, trip, _pass, (skey, beam_k, beam_ids, b_abs)
                )
        elif "skip_merge" not in DBG and MERGE == "pair":
            # --- pairwise top-k merge: the serial replace-max chain goes ---
            # Classic fixed-size top-k update (the heart of GPU warp-select
            # kernels, here on 128-lane vregs): per segment, extract the
            # TOPT best candidates ASCENDING (the serial min chain below,
            # unchanged), extract the beam's TOPT worst live lanes
            # DESCENDING (TOPT serial max reductions), then replace
            # PAIRWISE — candidate i displaces worst i iff cand_i < worst_i
            # — as pure elementwise selects on distinct lanes.
            #
            # Correctness (top-EF multiset of beam ∪ candidates): with C
            # ascending and W descending under one comparator, successes
            # C[i] < W[i] form a PREFIX (C rises while W falls), so the
            # evicted set is exactly the c' largest beam members and the
            # inserted set the c' smallest candidates; max(kept) <=
            # min(evicted ∪ rejected) follows lane-for-lane, which is
            # precisely the top-EF partition.  Ties reject (strict <, the
            # reference heap's behavior), enforced by saturating the
            # candidate key's lane bits before the compare.
            #
            # vs the "topt" chain this removes BOTH per-insertion serial
            # reductions (dup max-reduce and live-worst max-reduce): dup
            # checks run as TOPT INDEPENDENT reductions against the
            # running membership (exhaustive by the same monotone-worst
            # argument as "count" mode — an id rejected once can only be
            # rejected again, an inserted one is caught by b_abs), and
            # the worst extraction is the only serial chain left.
            b_abs = jnp.where(beam_ids < 0, ~beam_ids, beam_ids)
            for seg_d, seg_i in segs:
                skey = pack_keys(seg_d, slane)
                # candidate extraction (ascending), as in "topt"
                mcs, cids = [], []
                for _t in range(TOPT):
                    kmin = jnp.min(skey, axis=1, keepdims=True)
                    smask = slane == key_lane(kmin)
                    skey = jnp.where(smask, INF, skey)
                    mcs.append(kmin)
                    cids.append(
                        jnp.min(
                            jnp.where(smask, seg_i, BIG),
                            axis=1, keepdims=True,
                        )
                    )
                # independent dup checks vs the RUNNING membership (updated
                # after the previous segment's merge); within a segment an
                # adjacency row is duplicate-free by builder invariant
                dups = [
                    jnp.max((b_abs == cid).astype(jnp.int32), axis=1,
                            keepdims=True)
                    for cid in cids
                ]
                # beam worst extraction: TOPT live-max reductions, desc
                masked_b = jnp.where(live, beam_k, -INF)
                wks, wls = [], []
                for _t in range(TOPT):
                    kmax = jnp.max(masked_b, axis=1, keepdims=True)
                    wl = key_lane(kmax)
                    masked_b = jnp.where(lane == wl, -INF, masked_b)
                    wks.append(kmax)
                    wls.append(wl)
                # Pairwise replacement.  A dup-suppressed candidate must
                # NOT consume a worst slot (candidate i+1 would then face
                # the tighter W[i+1] and could be wrongly rejected), so
                # non-suppressed candidate i pairs with
                # W[i - #suppressed-before-i] — the shift is a per-row
                # prefix sum of the dup flags, and the pairing index is
                # strictly increasing over surviving candidates, so the
                # TOPT replacement selects still hit distinct lanes and
                # commute — no serial dependence.
                prefix = jnp.zeros_like(dups[0])
                for t in range(TOPT):
                    idx = t - prefix  # (T, 1) slot in the worst list
                    wk_t = wks[0]
                    wl_t = wls[0]
                    for j in range(1, min(t + 1, TOPT)):
                        pickj = idx == j
                        wk_t = jnp.where(pickj, wks[j], wk_t)
                        wl_t = jnp.where(pickj, wls[j], wl_t)
                    mci = (
                        jax.lax.bitcast_convert_type(mcs[t], jnp.int32)
                        & KEYM
                    )
                    ck_cmp = jax.lax.bitcast_convert_type(
                        mci | LMASK, jnp.float32
                    )
                    new_k = jax.lax.bitcast_convert_type(
                        mci | wl_t, jnp.float32
                    )
                    repl = (
                        (lane == wl_t)
                        & (ck_cmp < wk_t)
                        & (dups[t] == 0)
                        & (done == 0)
                    )
                    beam_k = jnp.where(repl, new_k, beam_k)
                    beam_ids = jnp.where(repl, cids[t], beam_ids)
                    b_abs = jnp.where(repl, cids[t], b_abs)
                    prefix = prefix + dups[t]
        elif "skip_merge" not in DBG:
            # --- merge: packed-key extract-min, packed-key replace-max ---
            # Extraction: one f32 min reduction per candidate gives value
            # AND lane (packed key); a second gives its id.  Insertion:
            # one f32 max reduction gives the live-worst's value AND lane
            # — no wlsel reduction — and the dup checks are BIT-PACKED
            # into one reduction per segment (see the dup block below),
            # OFF the serial insertion chain.  Off-chain dup is
            # exhaustive: the live max is non-increasing across
            # insertions, so a candidate equal to an earlier-rejected one
            # (bitwise-equal key) would be rejected again, and one equal
            # to an earlier-admitted one must be suppressed regardless
            # (reference visited-set semantics,
            # src/antitopo_engine.h:574-607).
            cands = []  # per segment: ([(T,1) key...], [(T,1) cid...])
            for seg_d, seg_i in segs:
                skey = pack_keys(seg_d, slane)
                mcs, cids = [], []
                for _t in range(TOPT):
                    kmin = jnp.min(skey, axis=1, keepdims=True)
                    smask = slane == key_lane(kmin)
                    skey = jnp.where(smask, INF, skey)
                    mcs.append(kmin)
                    cids.append(
                        jnp.min(
                            jnp.where(smask, seg_i, BIG),
                            axis=1, keepdims=True,
                        )
                    )
                cands.append((mcs, cids))
            if "extract_only" in DBG:  # cost probe: no insertions
                for mcs, cids in cands:
                    for mc, cid in zip(mcs, cids):
                        done = jnp.minimum(done, 1 + 0 * cid)
                        beam_k = jnp.where(mc < 0.0, mc, beam_k)
            else:
                for e, (mcs, cids) in enumerate(cands):
                    # --- bit-packed dup detection: ONE reduction/segment ---
                    # The per-candidate dup max-reduce was 8.8 of 21.3
                    # us/tile-iter (41% of the whole kernel) on the chained
                    # cost ladder (tools/probe_trav_cost.py, 2026-08-19).
                    # Beam ids are UNIQUE (beam-dedup invariant), so each
                    # equality (b_cmp == cid_t) hits at most one lane, and
                    # the lane-sum of sum_t (1<<t)*(b_cmp == cid_t) packs
                    # every candidate's dup flag into one int32 bitmask —
                    # one reduction for all TOPT candidates instead of
                    # TOPT reductions plus O(TOPT^2) cross-segment scalar
                    # compares.  Sentinel lanes (beam padding and unseeded
                    # live lanes) are remapped to per-lane-unique negatives
                    # so a sentinel candidate cannot multi-match and carry
                    # into higher bits.  Membership is the RUNNING beam
                    # (recomputed per segment): an id evicted earlier this
                    # iteration is no longer suppressed, but its re-offer
                    # carries its old key value >= the (monotonically
                    # tightened) live worst, so the strict-< value test
                    # rejects it identically — same final beam as checking
                    # the iteration-start membership plus earlier
                    # candidates pairwise (the scheme this replaces).
                    if "skip_dup" in DBG:  # cost probe: no dedup
                        dups = [jnp.zeros_like(cids[t]) for t in range(TOPT)]
                    else:
                        bid_abs = jnp.where(beam_ids < 0, ~beam_ids, beam_ids)
                        b_cmp = jnp.where(bid_abs == sent, -(lane + 2), bid_abs)
                        dups = []
                        for g0 in range(0, TOPT, 16):  # 16 bits per mask:
                            # int32 sum stays exact for any EF
                            g1 = min(g0 + 16, TOPT)
                            bits = jnp.zeros((T, EF), jnp.int32)
                            for t in range(g0, g1):
                                bits = bits + jnp.where(
                                    b_cmp == cids[t], jnp.int32(1 << (t - g0)), 0
                                )
                            dmask = jnp.sum(bits, axis=1, keepdims=True)
                            dups += [dmask & (1 << (t - g0)) for t in range(g0, g1)]
                    for t in range(TOPT):
                        mc, cid = mcs[t], cids[t]
                        supp = (dups[t] > 0) | (done == 1)
                        kmax = jnp.max(
                            jnp.where(live, beam_k, -INF),
                            axis=1, keepdims=True,
                        )
                        w_lane = key_lane(kmax)
                        mci = (
                            jax.lax.bitcast_convert_type(mc, jnp.int32)
                            & KEYM
                        )
                        # tie -> reject (strict <, as the reference's
                        # heap): compare with the lane bits saturated
                        ck_cmp = jax.lax.bitcast_convert_type(
                            mci | LMASK, jnp.float32
                        )
                        new_k = jax.lax.bitcast_convert_type(
                            mci | w_lane, jnp.float32
                        )
                        repl = (lane == w_lane) & (ck_cmp < kmax) & ~supp
                        beam_k = jnp.where(repl, new_k, beam_k)
                        # cid >= 0: the inserted entry is unexpanded
                        beam_ids = jnp.where(repl, cid, beam_ids)

        return beam_k, beam_ids, done, it + 1, ncomp

    def cond(carry):
        _, _, done, it, _ = carry
        if "fori" in DBG:  # cost probe: pure-scalar condition, no early exit
            return it < max_iters
        return (it < max_iters) & (jnp.min(done) == 0)

    beam_k, beam_ids, _, it, ncomp = jax.lax.while_loop(
        cond,
        body,
        (
            pack_keys(bd0_ref[...], lane),
            bi0_ref[...],
            jnp.zeros((T, 1), jnp.int32),
            jnp.int32(0),
            jnp.zeros((T, 1), jnp.int32),
        ),
    )
    # strip the lane bits: output distances are the clobbered values
    # (<= 2^-15 relative; callers rerank in exact f32)
    obd_ref[...] = jnp.where(live, key_val(beam_k), INF)
    # strip the expanded flag (~id < 0 -> id) from the output
    beam_ids = jnp.where(beam_ids < 0, ~beam_ids, beam_ids)
    obi_ref[...] = jnp.where(live, beam_ids, sent)
    stat_lane = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
    # col0: per-row distcomp counts (sum over rows outside); col1: iters
    ost_ref[...] = jnp.where(
        stat_lane == 0, ncomp, jnp.where(stat_lane == 1, it, 0)
    )


@functools.partial(
    jax.jit,
    static_argnames=("expand", "cand", "qt", "interpret", "merge", "dbg"),
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
    merge: str = "topt",  # "topt" | "count" (see _fused_kernel)
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
            MERGE=merge,
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
