"""Debug probe for the zero-slope 1M flat latency chains.

The salted operand-passing flat chains (tools/perf_latency.py) return a
~zero reps-slope at 1M on TPU — run(6144) walls the same as run(4) —
while the graph chains (same operand style) measure sane.  This probe
times the bf16 flat chain directly at several reps with fresh salts and
ALSO checks the accumulator value: acc must grow ~linearly with reps if
the loop executes (each iteration adds a data-dependent c2 in [0, 1.023]),
so a constant acc means the loop is broken while rising acc with flat
wall time means the TIMING is broken (async/dedup).

Usage: python tools/probe_chain_debug.py [n=1000000] [reps list]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from expann_tpu.utils import runtime  # noqa: F401

import jax
import jax.numpy as jnp

from expann_tpu.ops.pallas_topk import flat_topk, flat_topk_prepare

D = 128


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps_list = [int(v) for v in sys.argv[2:]] or [4, 64, 512]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, D)).astype(np.float32)
    xdev, n_real = flat_topk_prepare(x)
    qb = jnp.asarray(rng.standard_normal((32, D)).astype(np.float32))
    k, qt = 10, 32

    @functools.partial(jax.jit, static_argnames=("qt_",))
    def chain(reps, salt, xdev_, qb_, qt_):
        def body(_, carry):
            c, acc = carry
            q = qb_ + c * 1e-6
            ids, _ = flat_topk(
                q.astype(jnp.bfloat16), xdev_, n_real=n_real, k=k,
                query_tile=qt_,
            )
            c2 = (ids.sum() % 1024).astype(jnp.float32) * 1e-3
            return (c2, acc + c2)

        _, acc = jax.lax.fori_loop(
            0, reps, body, (salt, jnp.float32(0.0))
        )
        return acc

    salt_i = [0]

    def run(reps):
        salt_i[0] += 1
        return chain(reps, np.float32(salt_i[0] * 1e-4), xdev, qb, qt_=qt)

    print("compile ...", flush=True)
    t0 = time.perf_counter()
    a = run(1).block_until_ready()
    print(f"compile+first: {time.perf_counter() - t0:.2f}s acc={float(a):.4f}",
          flush=True)

    for reps in reps_list:
        for trial in range(2):
            t0 = time.perf_counter()
            a = run(reps).block_until_ready()
            dt = time.perf_counter() - t0
            print(
                f"reps={reps:5d} trial={trial}: wall={dt * 1e3:9.2f} ms "
                f"acc={float(a):10.4f} ({dt / reps * 1e6:8.1f} us/iter)",
                flush=True,
            )


if __name__ == "__main__":
    main()
