"""Isolate the fixed per-grid-step overhead of a fused-traversal-shaped
pallas_call: same grid (1024 steps), same block specs, with kernel-body
features added one at a time.

Usage: python tools/probe_step_overhead.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from expann_tpu.utils import runtime  # noqa: F401

T, EF, D, E, RS, R = 8, 128, 128, 4, 128, 128
B = 8192
ITERS = 24


def make(feat):
    has_scratch = "scratch" in feat or "dma" in feat

    def kernel(*refs):
        if has_scratch:
            q_ref, bd0_ref, packed_ref, aux_ref, obd_ref, vbuf, abuf, selbuf, sems = refs
        else:
            q_ref, bd0_ref, packed_ref, aux_ref, obd_ref = refs

        def inner(i, d):
            d = d + jnp.min(d, axis=1, keepdims=True) * 1e-6
            if "dma" in feat:
                for qi in range(T):
                    for e in range(E):
                        node = (i * 131 + qi * E + e) % 4096
                        pltpu.make_async_copy(
                            packed_ref.at[node], vbuf.at[qi, e],
                            sems.at[qi, e, 0],
                        ).start()
                for qi in range(T):
                    for e in range(E):
                        pltpu.make_async_copy(
                            packed_ref.at[0], vbuf.at[qi, e],
                            sems.at[qi, e, 0],
                        ).wait()
                d = d + vbuf[0, 0, 0, :].astype(jnp.float32) * 1e-9
            return d

        if "while6" in feat:
            def wbody(c):
                d, ids, ex, dn, it, nc = c
                d = inner(it, d)
                return d, ids ^ 1, ex ^ 1, dn ^ 1, it + 1, nc + 1

            def wcond(c):
                return c[4] < ITERS

            zi = jnp.zeros((T, EF), jnp.int32)
            z1 = jnp.zeros((T, 1), jnp.int32)
            out, ids, ex, dn, _, nc = jax.lax.while_loop(
                wcond, wbody, (bd0_ref[...], zi, zi, z1, jnp.int32(0), z1)
            )
            out = out + (ids[:, :1] + ex[:, :1] + dn + nc).astype(
                jnp.float32
            ) * 0.0
        elif "while1" in feat:
            def wbody(c):
                d, it = c
                return inner(it, d), it + 1

            def wcond(c):
                return c[1] < ITERS

            out, _ = jax.lax.while_loop(
                wcond, wbody, (bd0_ref[...], jnp.int32(0))
            )
        else:
            out = jax.lax.fori_loop(0, ITERS, inner, bd0_ref[...])
        obd_ref[...] = out + q_ref[0, 0] * 0.0

    scratch = []
    if has_scratch:
        scratch = [
            pltpu.VMEM((T, E, RS, D), jnp.bfloat16),
            pltpu.VMEM((T, E, 2, R), jnp.float32),
            pltpu.VMEM((T, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((T, E, 2)),
        ]
    return pl.pallas_call(
        kernel,
        grid=(B // T,),
        in_specs=[
            pl.BlockSpec((T, D), lambda i: (i, 0)),
            pl.BlockSpec((T, EF), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((T, EF), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, EF), jnp.float32),
        scratch_shapes=scratch,
    )


def run(feat):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    bd0 = jnp.asarray(rng.standard_normal((B, EF)).astype(np.float32))
    packed = jnp.asarray(
        rng.standard_normal((4097, RS, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    aux = jnp.asarray(rng.standard_normal((4097, 2, R)).astype(np.float32))
    f = jax.jit(make(feat))
    f(q, bd0, packed, aux).block_until_ready()
    best = float("inf")
    for _ in range(3):
        bd0 = jnp.asarray(
            rng.standard_normal((B, EF)).astype(np.float32)
        )  # fresh input: identical dispatches dedup on this host
        t0 = time.perf_counter()
        f(q, bd0, packed, aux).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    per_step = best / (B // T)
    print(f"{feat:>10s}: {best*1e3:7.1f} ms -> {per_step*1e6:7.2f} us/step",
          flush=True)


def run_fused(dbg, iters):
    from expann_tpu.ops.pallas_fused import fused_search

    rng = np.random.default_rng(0)
    packed = jnp.asarray(
        rng.standard_normal((4097, RS, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    aux = jnp.asarray(np.abs(rng.standard_normal((4097, 2, R))).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    def call():
        bd0 = jnp.asarray(
            np.abs(rng.standard_normal((B, EF))).astype(np.float32)
        )
        bi0 = jnp.zeros((B, EF), jnp.int32)
        ids, _, _, it = fused_search(
            packed, aux, q, bd0, bi0, ef=120, expand=4, cand=32,
            max_iters=iters, dbg=dbg,
        )
        return ids

    call().block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        call().block_until_ready()
        best = min(best, time.perf_counter() - t0)
    per_step = best / (B // T)
    print(f"fused[{dbg}] iters={iters}: {best*1e3:7.1f} ms ->"
          f" {per_step*1e6:7.2f} us/step", flush=True)


if __name__ == "__main__":
    run_fused("nodone,fori", 24)
    run_fused("nodone,fori", 96)
    run_fused("nodone,fori,skip_merge", 96)
    run_fused("nodone,fori,skip_dma", 96)
    run_fused("nodone,fori,static_sel", 96)
