"""A/B the flat_topk merge modes ("fixed" k-passes vs "count"
count-then-loop packed-key passes) on the real device.

Measures, for each mode, the device-side flat-scan QPS (queries generated
on device, one dispatch per rep — the flat ceiling bench.py reports) at
k=10 (serving) and k=128 (the build-candidate shape), n=56000 d=128.

Usage: python tools/perf_flat_mode.py [n] [Q]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from expann_tpu.utils import runtime  # noqa: F401  (compile cache)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 56000
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

    import jax
    import jax.numpy as jnp

    from expann_tpu.ops.pallas_topk import flat_topk, flat_topk_prepare

    D = 128
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, D)).astype(np.float32)
    xdev, n_real = flat_topk_prepare(x)

    # recall sanity at k=10 on 400 host queries
    q_host = rng.standard_normal((400, D)).astype(np.float32)
    d2 = ((q_host[:, None] - x[None]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (Q, D), jnp.bfloat16)

    for mode in ("fixed", "count"):
        qh = jnp.asarray(
            np.concatenate([q_host, np.zeros((112, D), np.float32)])
        )
        ids, _ = flat_topk(qh, xdev, n_real=n_real, k=10, mode=mode)
        ids = np.asarray(ids)[:400]
        rec = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(ids, gt)])
        print(f"mode={mode}: recall@10={rec:.4f}", flush=True)
        for k in (10, 128):
            def run(key):
                ids, _ = flat_topk(gen(key), xdev, n_real=n_real, k=k,
                                   mode=mode)
                return ids

            run(jax.random.PRNGKey(0)).block_until_ready()  # compile
            times = []
            for r in range(5):
                t0 = time.perf_counter()
                run(jax.random.PRNGKey(r + 1)).block_until_ready()
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            print(
                f"mode={mode} k={k:3d}: device {Q/med:9.0f} QPS "
                f"(median {med*1e3:7.1f} ms, best {Q/min(times):9.0f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
