"""Micro-probe: cost of cross-lane reductions vs bitonic compare-exchange
stages vs lane-broadcast loops inside a Pallas TPU kernel.

Each probe runs ITERS repetitions of the op-under-test inside one kernel
(fori_loop, data-dependent chaining so nothing folds), grid=G steps, and
reports ns per repetition.

Usage: python tools/probe_lanes.py
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

T = 8
ITERS = 512
G = 64


def bitonic_stage(d, i, s, W):
    """One compare-exchange at lane distance s with direction from bit
    log2(2s) of the lane index (standard bitonic network stage)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    partner = jnp.roll(d, s, axis=1)  # partner values (rotate; mask fixes dir)
    up = (lane & s) == 0
    keep_min = up
    mn = jnp.minimum(d, partner)
    mx = jnp.maximum(d, partner)
    return jnp.where(keep_min, mn, mx)


def make_kernel(mode, W):
    def kernel(x_ref, o_ref):
        x = x_ref[...]

        if mode.startswith("carry"):
            import functools as ft
            T_ = x.shape[0]
            ids0 = jnp.zeros(x.shape, jnp.int32)
            exp0 = jnp.zeros(x.shape, jnp.int32)
            d1 = jnp.zeros((T_, 1), jnp.int32)
            nc1 = jnp.zeros((T_, 1), jnp.int32)

            def red(d):
                return d + jnp.min(d, axis=1, keepdims=True) * 1e-6

            if mode == "carry2":
                def b2(i, c):
                    d, ids = c
                    return red(d), ids ^ 1
                d, ids = jax.lax.fori_loop(0, ITERS, b2, (x, ids0))
                o_ref[...] = d + ids.astype(jnp.float32) * 0.0
                return
            if mode == "carry3":
                def b3(i, c):
                    d, ids, ex = c
                    return red(d), ids ^ 1, ex ^ 1
                d, ids, ex = jax.lax.fori_loop(0, ITERS, b3, (x, ids0, exp0))
                o_ref[...] = d + (ids + ex).astype(jnp.float32) * 0.0
                return
            if mode == "carry_n1":
                def bn(i, c):
                    d, dn = c
                    return red(d), dn ^ 1
                d, dn = jax.lax.fori_loop(0, ITERS, bn, (x, d1))
                o_ref[...] = d + dn.astype(jnp.float32) * 0.0
                return
            if mode == "carry6":
                def b6(i, c):
                    d, ids, ex, dn, nc = c
                    return red(d), ids ^ 1, ex ^ 1, dn ^ 1, nc + 1
                d, ids, ex, dn, nc = jax.lax.fori_loop(
                    0, ITERS, b6, (x, ids0, exp0, d1, nc1)
                )
                o_ref[...] = d + (ids + ex).astype(jnp.float32) * 0.0 + (
                    dn + nc
                ).astype(jnp.float32) * 0.0
                return
            raise ValueError(mode)

        def body(i, d):
            if mode == "reduce":
                m = jnp.min(d, axis=1, keepdims=True)
                return d + m * 1e-6
            if mode == "reduce3":
                m = jnp.min(d, axis=1, keepdims=True)
                lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
                ls = jnp.min(
                    jnp.where(d == m, lane, 2**31 - 1), axis=1, keepdims=True
                )
                v = jnp.min(
                    jnp.where(lane == ls, d, jnp.inf), axis=1, keepdims=True
                )
                return d + v * 1e-6
            if mode == "stage":
                return bitonic_stage(d, i, 1, W) + 1e-7
            if mode == "stage64":
                return bitonic_stage(d, i, 64, W) + 1e-7
            if mode == "bcast":
                # lane-broadcast compare (dedup building block)
                c = d[:, 3:4]
                return d + jnp.where(d == c, 1e-6, 0.0)
            if mode == "matmul_cumsum":
                tri = (
                    jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
                    <= jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
                ).astype(jnp.float32)
                s = jax.lax.dot_general(
                    d, tri, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return d + s * 1e-9
            raise ValueError(mode)

        o_ref[...] = jax.lax.fori_loop(0, ITERS, body, x)

    return kernel


def run(mode, W):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T * G, W)).astype(np.float32))
    f = pl.pallas_call(
        make_kernel(mode, W),
        grid=(G,),
        in_specs=[pl.BlockSpec((T, W), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((T, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((T * G, W), jnp.float32),
    )
    jf = jax.jit(f)
    jf(x).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jf(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    per = best / G / ITERS
    print(f"{mode:>14s} W={W:4d}: {per*1e9:8.1f} ns/op", flush=True)


if __name__ == "__main__":
    for mode in ("reduce", "carry2", "carry3", "carry_n1", "carry6"):
        run(mode, 128)
