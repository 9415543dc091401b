"""Probe Mosaic capabilities needed by the fused in-kernel traversal:

  1. scalar read from a VMEM scratch at static indices (value data-dependent)
  2. that scalar driving a DMA source index (HBM -> VMEM)
  3. jax.lax.while_loop with a data-dependent scalar condition in-kernel
  4. vector -> scalar reduction (jnp.min over a VMEM block) feeding control flow

Run on the real TPU: python tools/probe_fused.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_kernel(tab_ref, x_ref, o_ref, w_ref, vscr, sem):
    # x_ref: (8, 128) f32; tab_ref: (64, 8, 128) HBM
    # 1. vector compute -> per-row argmin id
    x = x_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    m = jnp.min(x, axis=1, keepdims=True)
    sel_lane = jnp.min(jnp.where(x == m, lane, 2**31 - 1), axis=1, keepdims=True)
    # write the selected lane (as int32) to VMEM scratch, col-broadcast
    vscr[...] = jnp.broadcast_to(sel_lane, (8, 128)).astype(jnp.int32)

    # 2. scalar read from VMEM at static index, mod table size
    idx0 = vscr[0, 0] % 64

    # 3. DMA tab[idx0] -> output block via scratch... direct to o_ref
    cp = pltpu.make_async_copy(tab_ref.at[idx0], o_ref, sem)
    cp.start()
    cp.wait()

    # 4. while_loop with data-dependent scalar condition
    def cond(c):
        return c[0] < jnp.min(x[0:1, 0:8])

    def body(c):
        return (c[0] + 1.0, c[1] + 1)

    total = jax.lax.while_loop(cond, body, (jnp.float32(-100.0), jnp.int32(0)))
    w_ref[...] = jnp.full((8, 128), total[1], jnp.float32)


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((64, 8, 128)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))

    out, wout = pl.pallas_call(
        probe_kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(tab, x)
    out = np.asarray(out)
    wout = np.asarray(wout)
    expect_idx = int(np.argmin(np.asarray(x)[0])) % 64
    ok_dma = np.allclose(out, np.asarray(tab)[expect_idx])
    expect_iters = int(np.ceil(np.min(np.asarray(x)[0, :8]) - (-100.0)))
    ok_while = np.allclose(wout, expect_iters)
    print("dma-by-in-kernel-scalar:", "OK" if ok_dma else f"FAIL {out[0, :4]}")
    print(
        "while-loop:",
        "OK" if ok_while else f"FAIL got {wout[0, 0]} want {expect_iters}",
    )


if __name__ == "__main__":
    main()
