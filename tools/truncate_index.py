"""Truncate a saved index's bottom-layer adjacency to a smaller R0.

The packed serving layout duplicates each vector once per adjacency slot
(RS = roundup(R0, 16) blocks of D bytes each in s8), so HBM caps the
servable R0 at a given N: at N=2M, R0=48 packs to 12.3GB and OOMs a
16GB chip alongside the rerank vectors, while R0=32 packs to 8.2GB and
fits.  Forward rows come out of the anti-topo prune roughly best-first,
so keeping the first R0' slots of a wider-built graph approximates a
graph built at M0=R0' but with the richer candidate sets of the wider
build (reference analogy: serving an M=24-built graph at M0=32 degree).

Host-side numpy only — no TPU needed.

Usage:
  python tools/truncate_index.py --in /tmp/idx_M24.npz --r0 32 \
      --out /tmp/idx_M24_r32.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--r0", type=int, required=True)
    args = ap.parse_args()

    z = np.load(args.inp)
    out = {k: z[k] for k in z.files}
    adj = out["adj_bottom"]
    assert args.r0 < adj.shape[1], (adj.shape, args.r0)
    out["adj_bottom"] = np.ascontiguousarray(adj[:, : args.r0])
    np.savez(args.out, **out)
    print(f"wrote {args.out}: adj_bottom {adj.shape} -> "
          f"{out['adj_bottom'].shape}")


if __name__ == "__main__":
    main()
