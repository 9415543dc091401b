"""Break the TPU-Flat end-to-end per-call cost into host->device transfer,
device compute, and dispatch overhead.

Round-1 measured ~48.5k QPS e2e at B=65536 while the device-side kernel
sustained ~281k QPS — i.e. >1s of per-call overhead.  This probe times
each stage separately (fresh random inputs per rep; identical dispatches
dedup on this host).

Usage: python tools/probe_flat_overhead.py [n=56000] [B=65536]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from expann_tpu.utils import runtime  # noqa: F401


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 56000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

    import jax
    import jax.numpy as jnp

    from expann_tpu.ops.pallas_topk import flat_topk, flat_topk_prepare

    d, k = 128, 10
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, d)).astype(np.float32)
    xf, n_real = flat_topk_prepare(jnp.asarray(x))
    jax.block_until_ready(xf)

    def fresh():
        return rng.standard_normal((B, d)).astype(np.float32)

    # --- host->device transfer alone ---
    jax.block_until_ready(jnp.asarray(fresh()))
    ts = []
    for _ in range(3):
        h = fresh()
        t0 = time.perf_counter()
        dev = jnp.asarray(h)
        jax.block_until_ready(dev)
        ts.append(time.perf_counter() - t0)
    mb = B * d * 4 / 2**20
    t = min(ts)
    print(f"h2d f32 {mb:.0f}MB: {t*1e3:.1f}ms ({mb/t/1024:.2f} GB/s)")

    # bf16 halves the bytes
    jax.block_until_ready(jnp.asarray(fresh().astype(jnp.bfloat16)))
    ts = []
    for _ in range(3):
        h = fresh().astype(jnp.bfloat16)
        t0 = time.perf_counter()
        dev = jnp.asarray(h)
        jax.block_until_ready(dev)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"h2d bf16 {mb/2:.0f}MB: {t*1e3:.1f}ms ({mb/2/t/1024:.2f} GB/s)")

    # --- device compute alone (input already resident) ---
    def run(dev_q):
        ids, dd = flat_topk(dev_q, xf, n_real=n_real, k=k, query_tile=256)
        return ids

    devq = jnp.asarray(fresh())
    jax.block_until_ready(run(devq))
    ts = []
    for _ in range(3):
        devq = jnp.asarray(fresh())
        jax.block_until_ready(devq)
        t0 = time.perf_counter()
        jax.block_until_ready(run(devq))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"device-resident flat_topk: {t*1e3:.1f}ms ({B/t:,.0f} QPS)")

    # --- d2h of the result ---
    ids = run(jnp.asarray(fresh()))
    jax.block_until_ready(ids)
    t0 = time.perf_counter()
    np.asarray(ids)
    print(f"d2h ids ({B}x{k} i32): {(time.perf_counter()-t0)*1e3:.1f}ms")

    # --- e2e, one call ---
    ts = []
    for _ in range(3):
        h = fresh()
        t0 = time.perf_counter()
        np.asarray(run(jnp.asarray(h)))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"e2e single call: {t*1e3:.1f}ms ({B/t:,.0f} QPS)")

    # --- e2e, chunked with async overlap (dispatch all, then fetch) ---
    for nchunk in (2, 4, 8):
        cs = B // nchunk
        ts = []
        for _ in range(3):
            h = fresh()
            t0 = time.perf_counter()
            outs = [run(jnp.asarray(h[i * cs : (i + 1) * cs])) for i in range(nchunk)]
            for o in outs:
                np.asarray(o)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"e2e {nchunk}x{cs} overlap: {t*1e3:.1f}ms ({B/t:,.0f} QPS)")


if __name__ == "__main__":
    main()
