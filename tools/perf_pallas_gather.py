"""Micro-benchmark: indexed block-gather bandwidth via Pallas DMA.

Round-1 finding (tools/perf_gather.py): XLA random gathers sustain ~21GB/s
on this chip regardless of row size — 2.5% of HBM peak — which caps the
graph engine's beam search.  Hypothesis: the fix is a *packed-neighbour*
layout ((N+1, R, D): each node's neighbour vectors stored contiguously) so
one beam expansion is ONE large (R*D*2B) DMA instead of R random row
gathers, issued from a Pallas kernel with a multi-buffer pipeline.

This tool measures achievable GB/s for that access pattern as a function
of block size (R) and pipeline depth (NBUF), subtracting the per-dispatch
wall overhead by timing two grid sizes and using the slope.

Usage: python tools/perf_pallas_gather.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ids_ref, q_ref, packed_ref, out_ref, buf, sems, *, NBUF):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(step):
        slot = jax.lax.rem(step, NBUF) if not isinstance(step, int) else step % NBUF
        return pltpu.make_async_copy(
            packed_ref.at[ids_ref[step]], buf.at[slot], sems.at[slot]
        )

    @pl.when(i == 0)
    def _():
        for s in range(NBUF - 1):
            dma(s).start()

    @pl.when(i + NBUF - 1 < n)
    def _():
        dma(i + NBUF - 1).start()

    dma(i).wait()
    slot = jax.lax.rem(i, NBUF)
    x = buf[slot]  # (R, D) bf16
    out_ref[...] = jax.lax.dot_general(
        q_ref[...], x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("G", "NBUF"))
def run_block_gather(packed, ids, q, G: int, NBUF: int):
    NB, R, D = packed.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, D), lambda i, ids: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, R), lambda i, ids: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, R, D), packed.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, NBUF=NBUF),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
    )(ids, q, packed)


def main():
    NB, D = 8192, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, D)).astype(np.float32), jnp.bfloat16)

    for R in [16, 32, 64, 128]:
        packed = jnp.asarray(
            rng.standard_normal((NB, R, D)).astype(np.float32), jnp.bfloat16
        )
        blk = R * D * 2
        for NBUF in [2, 4, 8]:
            try:
                # ids live in SMEM (1MB): keep G*4B well under it.
                # CLAUDE.md: identical repeated dispatches get dedup/cached on
                # this host — every timed call must use FRESH ids.  And
                # block_until_ready alone under-reports on the axon tunnel
                # (async RPC): force a host copy of the tiny output to get a
                # true completion time; the ~25ms RPC overhead cancels in the
                # two-grid-size slope.
                G_LO, G_HI = 16384, 98304
                times = {}
                for G in [G_LO, G_HI]:
                    mk = lambda: jnp.asarray(
                        rng.integers(0, NB, (G,)).astype(np.int32)
                    )
                    np.asarray(run_block_gather(packed, mk(), q, G=G, NBUF=NBUF))
                    best = float("inf")
                    for _ in range(4):
                        ids = mk()
                        np.asarray(ids)
                        t0 = time.perf_counter()
                        np.asarray(run_block_gather(packed, ids, q, G=G, NBUF=NBUF))
                        best = min(best, time.perf_counter() - t0)
                    times[G] = best
                dt = times[G_HI] - times[G_LO]
                nblk = G_HI - G_LO
                gbs = nblk * blk / dt / 1e9
                ns_per_blk = dt / nblk * 1e9
                print(
                    f"R={R:4d} ({blk//1024:3d}KB/blk) NBUF={NBUF}: "
                    f"{gbs:7.1f} GB/s  {ns_per_blk:8.1f} ns/blk  "
                    f"(t_lo={times[G_LO]*1e3:.0f}ms t_hi={times[G_HI]*1e3:.0f}ms)",
                    flush=True,
                )
            except Exception as e:
                print(f"R={R} NBUF={NBUF}: FAILED {type(e).__name__}: {e}", flush=True)
                break


if __name__ == "__main__":
    main()
