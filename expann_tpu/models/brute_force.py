"""Exact k-NN by one MXU matmul + top-k.

TPU-native counterpart of the reference's linear-scan + size-k max-heap
brute force engine (reference: src/brute_force_engine.h:29-46).  The scan
becomes a single ``(B, N)`` matmul-distance and the heap becomes
``lax.top_k``; it doubles as the ground-truth oracle for synthetic datasets
(reference: src/dataset_loader.h:27-39) and as the recall oracle in tests.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from expann_tpu.models.base import Engine, ParamList, _concat_pending
from expann_tpu.ops.distance import pad_dim, pairwise_dist2, squared_norms


@functools.partial(jax.jit, static_argnames=("k", "precision"))
def _exact_topk(q, x, x_norms, k: int, precision: str = "highest"):
    d2 = pairwise_dist2(q, x, x_norms=x_norms, precision=precision)
    neg_d, idx = jax.lax.top_k(-d2, k)
    return idx, -neg_d


def _rerank_body(q, x, x_norms, cand_ids, k: int):
    n = x.shape[0]
    safe = jnp.clip(cand_ids, 0, n - 1)
    # rerank_store='bf16' keeps the corpus at 2 B/dim; score in f32
    cv = x[safe].astype(jnp.float32)  # (B, m, D)
    cn = jnp.where((cand_ids >= 0) & (cand_ids < n), x_norms[safe], jnp.inf)
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    d2 = qn + cn - 2.0 * jnp.einsum(
        "bd,bmd->bm", q, cv, preferred_element_type=jnp.float32
    )
    d2, ids = jax.lax.sort((d2, cand_ids), num_keys=1)
    return ids[:, :k], d2[:, :k]


@functools.partial(jax.jit, static_argnames=("k",))
def _rerank_exact(q, x, x_norms, cand_ids, k: int):
    """Exact f32 rerank of per-query candidate ids: gather, score, top-k.
    Out-of-range ids (kernel sentinels) score +inf."""
    return _rerank_body(q, x, x_norms, cand_ids, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _rerank_dequant(qk, center, inv_scale, x, x_norms, cand_ids, k: int):
    """Rerank against the DEQUANTIZED i8 query (``query_wire='i8'``): the
    host ships 1 B/dim and the f32 rerank query is reconstructed on device
    as ``codes * inv_scale + center``.  The rerank corpus stays exact, so
    the only error vs ``_rerank_exact`` is the query's quantization noise
    (|err| <= 0.5/scale per dim) — measured recall parity at k=10 on the
    canonical synthetic config (BENCH_NOTES)."""
    qd = qk.astype(jnp.float32) * inv_scale + center[None, :]
    return _rerank_body(qd, x, x_norms, cand_ids, k)


class BruteForceEngine(Engine):
    """Exact nearest neighbours over an in-device corpus.

    Three serving modes:
      * ``mode='exact'``: XLA matmul + lax.top_k in full precision — the
        ground-truth oracle (used for synthetic dataset GT).
      * ``mode='fused'``: the streamed Pallas matmul + on-chip top-k merge
        kernel (ops/pallas_topk.py) over a bf16 corpus — the serving path
        ('TPU-Flat'); never materializes the (B, N) distance matrix, scales
        to corpora where lax.top_k's sort buffers exceed HBM.  Near-exact
        (recall@10 ~0.993: bf16 rounding + the kernel's 128-lane pooling) —
        NOT a ground-truth oracle; use mode='exact' for GT.
      * ``mode='fused_i8'``: the same kernel over centered int8 codes
        (s8 MXU at 2x bf16 peak, half the HBM stream), scanning for
        ``rerank_mult * k`` candidates which are then exactly reranked in
        f32 — recall comparable to 'fused' at higher device throughput.
        ``rerank_store='bf16'`` keeps the rerank corpus in bf16 (2 B/dim
        instead of 4): a near-exact rerank that fits i8 codes + rerank
        corpus for 20M x 128 in under 8GB HBM (tools/bench_bigflat.py).
    """

    def __init__(
        self,
        batch_size: int = 1024,
        precision: str = "highest",
        mode: str = "exact",
        rerank_mult: int = 3,
        rerank_store: str = "f32",
        topk_mode: str = "",
        query_wire: str = "bf16",
    ):
        import os

        # in-kernel merge strategy for the fused modes: "count"
        # (count-then-loop packed-key passes, the default — measured 9.3x
        # at k=10 / 70x at k=128 over "fixed" on v5e, recall parity) or
        # "fixed" (k passes per corpus block); empty -> env override
        # EXPANN_TOPK_MODE or "count"
        self.topk_mode = (
            topk_mode or os.environ.get("EXPANN_TOPK_MODE", "count")
        )
        self.rerank_store = rerank_store
        # fused_i8 wire format for queries: "bf16" ships codes + a bf16
        # copy for the exact-query rerank (3 B/dim); "i8" ships codes only
        # (1 B/dim) and reranks against the on-device dequantized query —
        # the e2e choice when the host<->device link is the bottleneck
        self.query_wire = query_wire
        self._pending: List[np.ndarray] = []
        self._x = None
        self._x_norms = None
        self._x_fused = None
        self._n_fused = 0
        self._i8_center = None
        self._i8_scale = 1.0
        self._i8_center_dev = None
        self._i8_inv_scale = None
        self.n = 0
        self.dim = 0
        self.batch_size = batch_size
        self.precision = precision
        self.mode = mode
        self.rerank_mult = rerank_mult

    def name(self) -> str:
        return "Brute-Force Engine"

    def param_list(self) -> ParamList:
        return {}

    def store_vector(self, v: np.ndarray) -> None:
        self._pending.append(
            np.asarray(v, dtype=np.float32).reshape(1, -1)
        )

    def store_many_vectors(self, vs: np.ndarray, take_norms: bool = False) -> None:
        vs = np.asarray(vs, dtype=np.float32)
        if vs.ndim != 2:
            raise ValueError("Input should be a 2D array")
        if take_norms:
            norms = np.linalg.norm(vs, axis=1, keepdims=True)
            vs = vs / np.maximum(norms, 1e-30)
        # keep 2D blocks intact: extending row-by-row costs ~100B of
        # array-object overhead per vector (gigabytes at 10M+ rows)
        # and makes the build-time stack a 20M-element python loop
        self._pending.append(vs)

    def build(self) -> None:
        assert self._pending or self._x is not None, "no vectors stored"
        if self._pending:
            x = _concat_pending(self._pending)
            self._pending = []
            self.n, self.dim = x.shape
            x = pad_dim(x)
            if self.mode == "fused":
                from expann_tpu.ops.pallas_topk import flat_topk_prepare

                self._x_fused, self._n_fused = flat_topk_prepare(x)
            elif self.mode == "fused_i8":
                from expann_tpu.ops.pallas_topk import quantize_corpus_i8

                (
                    self._x_fused,
                    self._i8_center,
                    self._i8_scale,
                    self._n_fused,
                ) = quantize_corpus_i8(x)
                self._i8_center_dev = jnp.asarray(
                    self._i8_center, jnp.float32
                )
                self._i8_inv_scale = jnp.float32(1.0 / self._i8_scale)
                # rerank corpus: exact f32, or near-exact bf16 at half
                # the HBM (rerank_store='bf16' — the 10M+ row regime)
                if self.rerank_store == "bf16":
                    self._x = jnp.asarray(x, jnp.bfloat16)
                    # norms on host: uploading the f32 corpus just to
                    # square it would transiently double device memory
                    self._x_norms = jnp.asarray((x * x).sum(axis=1))
                else:
                    self._x = jnp.asarray(x)
                    self._x_norms = squared_norms(self._x)
            else:
                self._x = jnp.asarray(x)
                self._x_norms = squared_norms(self._x)

    def _query_fused(self, q: np.ndarray, k: int) -> np.ndarray:
        import jax
        import ml_dtypes

        from expann_tpu.ops.pallas_topk import flat_topk, quantize_query_i8

        interpret = jax.default_backend() not in ("tpu", "axon")
        i8 = self.mode == "fused_i8"
        scan_k = min(self.rerank_mult * k, 128) if i8 else k
        tile = 256
        # The per-call cost is dominated by the host<->device query
        # transfer, not dispatch (tools/probe_flat_overhead.py: 632ms h2d
        # for a 32MB f32 batch vs 554ms device compute at B=65536).  Two
        # countermeasures: (1) ship queries as bf16 — the kernel casts to
        # the corpus dtype (bf16/i8) anyway, so the scan is unchanged and
        # only the i8-mode exact rerank sees a bf16-rounded query; (2)
        # split the batch into chunks and dispatch them all before the
        # first host read-back, so JAX's async dispatch overlaps each
        # chunk's transfer with the previous chunk's scan.
        bs = max(self.batch_size, min(q.shape[0], 16384))

        def _prep(start):
            """Chunk pad + quantize + device upload.  Runs on a single
            prefetch worker: device_put BLOCKS on this runtime (the axon
            client transfers synchronously inside the call — measured
            2026-08-20), so uploading from the dispatch thread serializes
            the wire against the scan."""
            chunk = q[start : start + bs]
            real = chunk.shape[0]
            pad = (-real) % tile
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, q.shape[1]), np.float32)]
                )
            if i8:
                qk = jnp.asarray(
                    quantize_query_i8(chunk, self._i8_center, self._i8_scale)
                )
            else:
                qk = jnp.asarray(chunk.astype(ml_dtypes.bfloat16))
            return chunk, qk, real

        from concurrent.futures import ThreadPoolExecutor

        starts = list(range(0, q.shape[0], bs))
        ex = ThreadPoolExecutor(max_workers=1) if len(starts) > 1 else None
        pending = []
        fut = None
        for idx_s, start in enumerate(starts):
            chunk, qk, real = fut.result() if fut is not None else _prep(start)
            if ex is not None and idx_s + 1 < len(starts):
                fut = ex.submit(_prep, starts[idx_s + 1])
            ids, _ = flat_topk(
                qk,
                self._x_fused,
                n_real=self._n_fused,
                k=scan_k,
                query_tile=tile,
                interpret=interpret,
                mode=self.topk_mode,
            )
            if i8:
                if self.query_wire == "i8":
                    ids, _ = _rerank_dequant(
                        qk, self._i8_center_dev, self._i8_inv_scale,
                        self._x, self._x_norms, ids, k=k,
                    )
                else:
                    qd = jnp.asarray(
                        chunk.astype(ml_dtypes.bfloat16)
                    ).astype(jnp.float32)
                    ids, _ = _rerank_exact(
                        qd, self._x, self._x_norms, ids, k=k
                    )
            pending.append((ids, real))
        if ex is not None:
            ex.shutdown(wait=True)
        return np.concatenate(
            [np.asarray(ids)[:real] for ids, real in pending], axis=0
        )

    def query_k_batch(self, queries: np.ndarray, k: int) -> np.ndarray:
        assert (
            self._x is not None or self._x_fused is not None
        ), "build() must be called before queries"
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim != 2:
            raise ValueError("queries must be 2D")
        width = (self._x if self._x is not None else self._x_fused).shape[-1]
        q = pad_dim(q, width)
        if q.shape[-1] != width:
            raise ValueError("query dim exceeds corpus dim")
        if self.mode in ("fused", "fused_i8"):
            return self._query_fused(q, k)
        out = []
        bs = self.batch_size
        for start in range(0, q.shape[0], bs):
            chunk = jnp.asarray(q[start : start + bs])
            idx, _ = _exact_topk(
                chunk, self._x, self._x_norms, k, precision=self.precision
            )
            out.append(np.asarray(idx))
        return np.concatenate(out, axis=0)
