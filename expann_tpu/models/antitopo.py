"""The Anti-Topo engine: public API.

TPU-native engine with the same surface as the reference's
``antitopo_engine<float>`` and its pybind11 bindings
(reference: src/antitopo_engine.h:103-260, src/pyrunner.cpp:55-91):
constructor params ``(M, ef_construction, ortho_count, prune_overflow,
use_compression)``, plus ``store_vector`` / ``store_many_vectors`` /
``build`` / ``query_k`` / ``query_k_numpy`` / ``set_ef_search`` / ``name`` /
``param_list``.  Internally everything is batched and device-resident; the
one-at-a-time methods are conveniences over the batched paths.

Stats parity: ``num_distcomps`` counts full-precision distance evaluations
performed by queries and ``num_distcomps_compressed`` the quantized ones,
mirroring the RECORD_STATS counters (reference:
src/antitopo_engine.h:125-129); both reset on ``build`` and on
``set_ef_search`` (:189-195, :488-492).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from expann_tpu.models.base import (
    Engine,
    ParamList,
    _concat_pending,
    format_param,
)
from expann_tpu.models.build import BuildConfig, build_index
from expann_tpu.models.graph import GraphIndex
from expann_tpu.models.search import fused_query_batch, query_batch
from expann_tpu.ops.distance import pad_dim
from expann_tpu.ops.quantize import quantize_simple


@dataclasses.dataclass
class AntitopoConfig:
    """Full parameter set, mirroring antitopo_engine_config
    (reference: src/antitopo_engine.h:72-101)."""

    M: int = 60
    M0: int = 0  # 0 -> 2 * M
    ef_search_mult: int = 1
    ef_search: Optional[int] = None
    ef_construction: int = 500
    ortho_count: int = 1
    ortho_factor: float = 0.5
    ortho_bias: float = 0.0
    prune_overflow: int = 0
    use_compression: bool = False
    use_largest_direction_filtering: bool = False  # no-op, as in reference
    index_filename: str = ""
    read_index: bool = False
    write_index: bool = False
    # TPU-specific knobs (no reference counterpart):
    seed: int = 0
    precision: str = "highest"
    prune_cand: int = 0  # candidate-list cap fed to the prune; 0 -> auto
    query_block: int = 1024
    query_expand: int = 1  # beam entries expanded per traversal iteration
    builder: str = "auto"  # "oneshot" | "wave" | "auto"
    wave_size: int = 1024
    wave_expand: int = 4  # wave-builder beam expansion rows per iteration
    wave_overflow_rows: int = 128  # fullest rows repruned per wave
    refine_frac: float = 0.0  # two-pass refinement fraction after wave builds
    # quantization mode for use_compression: "simple" (uint8 cast, the
    # reference's live path) or "ranged" (min/max affine q8, the principled
    # variant the reference defines but never instantiates)
    quant_mode: str = "simple"
    # packed-neighbour serving layout (ops/pallas_beam.py): "auto" enables
    # it on TPU backends for uncompressed queries; True forces it (interpret
    # mode off-TPU, for tests); False disables.  Costs ~Rp x corpus bytes of
    # HBM for ~20x faster beam expansions.
    use_packed: object = "auto"
    # in-kernel per-expansion top-t extraction (0 = keep all R neighbour
    # scores): shrinks the per-iteration beam merge by R/t at a small
    # recall cost from discarded per-node tails
    packed_topt: int = 8
    # fully fused traversal (ops/pallas_fused.py): the whole bottom-layer
    # beam search in one Pallas kernel.  "auto" enables it on TPU backends
    # (requires the packed layout); True forces it (interpret mode
    # off-TPU, for tests); False falls back to the per-iteration packed
    # path.  fused_qt queries traverse per kernel grid step; fused_cand
    # candidates total are kept per iteration, split across the
    # query_expand expansions.  Defaults are the round-4 re-sweep's best
    # operating point (tools/perf_oppoint.py: expand=2/cand=8/qt=128 —
    # post-dup-fix, cand=8 gives identical recall to the round-2 cand=16
    # at 8-9% lower device time; BENCH_NOTES "operating-point re-sweep").
    use_fused: object = "auto"
    fused_cand: int = 8
    fused_qt: int = 128
    # in-kernel merge mode for the fused traversal: "topt" (top-cand/E
    # candidates per segment offered, the default) or "count"
    # (count-then-loop: ALL RS neighbours of each expanded node offered —
    # the reference's uncapped heap semantics — but only min(count, ef)
    # insertion passes actually run; measured SLOWER at equal recall on
    # v5e, see ops/pallas_fused.py).  Empty -> EXPANN_FUSED_MERGE env
    # or "topt".
    fused_merge: str = ""
    # order queries within a batch by entry-seed distance before tiling
    # (a tile runs until its slowest query converges; grouping similar-
    # difficulty queries cuts the per-tile straggler max — results are
    # unpermuted, so output order is unchanged).  tools/probe_straggler.py
    # measures the win; off by default until it clears >15% there.
    fused_sort_tiles: bool = False
    # packed block storage: "bf16" (default) or "i8" (centered s8 codes,
    # build_packed_i8 — half the DMA bytes per expansion; the fused
    # traversal is DMA-bound, so ~2x QPS at a small in-kernel ranking
    # coarsening that the exact f32 rerank mostly recovers)
    packed_dtype: str = "bf16"
    # fused-path query wire format: "bf16" (2 B/dim, kernel scores bf16/s8
    # blocks anyway) or "i8" (1 B/dim codes + a per-query absmax scale,
    # dequantized to f32 in-trace — models/search.fused_query_batch).  The
    # graph analogue of the flat engine's query_wire: e2e serving on this
    # host is host<->device-link-bound, so halving query upload bytes is
    # pure e2e headroom at recall parity (the corpus side is untouched).
    query_wire: str = "bf16"
    # >0: seed the fused beam with the top-entry_seeds members of the
    # largest upper layer (<= 65536 members) by one dense MXU scan instead
    # of single-path greedy descent — escapes wrong-basin entries on
    # clustered/multi-modal corpora (measured recall plateau at 1M,
    # BENCH_NOTES); 0 keeps the reference's greedy descent semantics
    entry_seeds: int = 0

    def __post_init__(self):
        if self.M0 == 0:
            self.M0 = 2 * self.M


class AntitopoEngine(Engine):
    """Anti-Topo Engine+ rebuilt TPU-first."""

    def __init__(
        self,
        M: int = 60,
        ef_construction: int = 500,
        ortho_count: int = 1,
        prune_overflow: int = 0,
        use_compression: bool = False,
        config: Optional[AntitopoConfig] = None,
    ):
        if config is None:
            config = AntitopoConfig(
                M=M,
                ef_construction=ef_construction,
                ortho_count=ortho_count,
                prune_overflow=prune_overflow,
                use_compression=use_compression,
            )
        self.cfg = config
        self._pending: List[np.ndarray] = []
        self.graph: Optional[GraphIndex] = None
        self.n = 0
        self.dim = 0
        self.num_distcomps = 0
        self.num_distcomps_compressed = 0
        # RECORD_STATS counterpart: accumulated wall-clock of query calls
        # (reference: total_query_time, src/antitopo_engine.h:128,855-856)
        self.total_query_time_ns = 0.0

    # --- identity / params -------------------------------------------------
    def name(self) -> str:
        return "Anti-Topo Engine+"

    def param_list(self) -> ParamList:
        c = self.cfg
        pl: ParamList = {
            "M": format_param(c.M),
            "M0": format_param(c.M0),
            "ef_search_mult": format_param(c.ef_search_mult),
            "ef_construction": format_param(c.ef_construction),
            "ortho_count": format_param(c.ortho_count),
            "ortho_factor": format_param(c.ortho_factor),
            "ortho_bias": format_param(c.ortho_bias),
            "prune_overflow": format_param(c.prune_overflow),
            "use_compression": format_param(c.use_compression),
            "use_largest_direction_filtering": format_param(
                c.use_largest_direction_filtering
            ),
            "num_distcomps": format_param(self.num_distcomps),
            "num_distcomps_compressed": format_param(
                self.num_distcomps_compressed
            ),
        }
        return pl

    # --- ingest ------------------------------------------------------------
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

    # --- build -------------------------------------------------------------
    def build(self) -> None:
        c = self.cfg
        if c.index_filename and (c.read_index or c.write_index):
            # auto-resolve read vs write by file existence, like the
            # reference constructor (src/antitopo_engine.h:137-155)
            from expann_tpu.utils.persist import index_exists

            if c.read_index:
                if index_exists(c.index_filename):
                    c.write_index = False
                else:
                    c.read_index = False
        if c.read_index and c.index_filename:
            from expann_tpu.utils.persist import load_index

            self.graph, meta = load_index(c.index_filename)
            self.n = self.graph.n
            self.dim = int(meta.get("dim", self.graph.vectors.shape[1]))
        elif self.graph is not None and self._pending:
            # store -> build -> store -> build ACCUMULATES, matching the
            # reference whose construction is insert-at-a-time into the
            # live graph (src/antitopo_engine.h:310-330): continue
            # wave-batched inserts over the existing index.
            from expann_tpu.models.wavebuild import extend_index_wave

            new_x = _concat_pending(self._pending)
            self._pending = []
            assert new_x.shape[1] == self.dim, "dim mismatch on extend"
            bc = self._build_config()
            self.graph = extend_index_wave(
                self.graph, new_x, bc, wave_size=self.cfg.wave_size
            )
            self.n = self.graph.n
        else:
            assert self._pending, "no vectors stored"
            x = _concat_pending(self._pending)
            self._pending = []
            self.n, self.dim = x.shape
            self.graph = build_index(x, self._build_config())
            if c.write_index and c.index_filename:
                from expann_tpu.utils.persist import save_index

                save_index(c.index_filename, self.graph, {"dim": self.dim})
        if c.use_compression and self.graph.codes is None:
            self._attach_codes()
        # reset stats before queries (src/antitopo_engine.h:488-492)
        self.num_distcomps = 0
        self.num_distcomps_compressed = 0

    def _build_config(self) -> BuildConfig:
        c = self.cfg
        return BuildConfig(
            M=c.M,
            M0=c.M0,
            ef_construction=c.ef_construction,
            ortho_count=c.ortho_count,
            ortho_factor=c.ortho_factor,
            ortho_bias=c.ortho_bias,
            prune_overflow=c.prune_overflow,
            prune_cand=c.prune_cand,
            seed=c.seed,
            precision=c.precision,
            builder=c.builder,
            wave_size=c.wave_size,
            wave_expand=c.wave_expand,
            wave_overflow_rows=c.wave_overflow_rows,
            refine_frac=c.refine_frac,
        )

    def _attach_codes(self) -> None:
        """Quantize the corpus per cfg.quant_mode (reference: build-time
        quant->build call, src/antitopo_engine.h:485-486)."""
        import jax.numpy as _jnp

        if self.cfg.quant_mode == "ranged":
            from expann_tpu.ops.quantize import (
                quantize_ranged,
                ranged_scale_offset,
            )

            real = np.asarray(self.graph.vectors[: self.n, : self.dim])
            scale, offset = ranged_scale_offset(real)
            codes, code_norms = quantize_ranged(self.graph.vectors, scale, offset)
            self.graph = dataclasses.replace(
                self.graph,
                codes=codes,
                code_norms=code_norms,
                quant_scale=_jnp.float32(scale),
                quant_offset=_jnp.float32(offset),
            )
        else:
            codes, code_norms = quantize_simple(self.graph.vectors)
            self.graph = dataclasses.replace(
                self.graph, codes=codes, code_norms=code_norms
            )

    # --- query -------------------------------------------------------------
    def set_ef_search(self, ef_search: int) -> None:
        self.cfg.ef_search = int(ef_search)
        self.num_distcomps = 0
        self.num_distcomps_compressed = 0
        self.total_query_time_ns = 0.0

    def set_packed_dtype(self, dtype: str) -> None:
        """Switch the packed serving layout ("bf16" | "i8") on a built
        index; the packed arrays are dropped and lazily rebuilt on the
        next query (no graph rebuild)."""
        assert dtype in ("bf16", "i8"), dtype
        if dtype == self.cfg.packed_dtype:
            return
        self.cfg.packed_dtype = dtype
        if self.graph is not None:
            self.graph = dataclasses.replace(
                self.graph,
                packed=None,
                packed_aux=None,
                packed_codes=None,
                packed_code_norms=None,
                packed_center=None,
                packed_scale=None,
            )

    def _ef(self, k: int) -> int:
        if self.cfg.ef_search is not None:
            return max(int(self.cfg.ef_search), k)
        return max(k * self.cfg.ef_search_mult, k)

    def _resolve_packed(self) -> bool:
        """Decide whether queries run the packed-neighbour Pallas path and
        lazily materialize the packed arrays on first use."""
        import jax as _jax

        c = self.cfg
        if c.use_packed == "auto":
            on = _jax.default_backend() in ("tpu", "axon")
        else:
            on = bool(c.use_packed)
        if c.use_compression:
            if not on:
                # XLA uint8-gather compressed beam (CPU / parity path)
                return False
            # Quantized serving on the FAST path: the centered-s8 packed
            # layout is the quantized serving mode — packed codes scored
            # in code space in-kernel + exact f32 rerank, the same
            # packed-uint8-beam + rerank structure as the reference's
            # use_compression path (src/antitopo_engine.h:710-851,
            # :845-848) mapped to the TPU block-DMA layout.  Half the DMA
            # bytes of bf16 — compression is a *performance* feature here
            # too, not just a memory one.
            if c.packed_dtype != "i8":
                self.set_packed_dtype("i8")
        if on and self.graph.packed is None:
            # HBM guard: the packed-neighbour layout duplicates each
            # node's vector into every neighbour block (RS x D per node).
            # At e.g. N=1M, M0=120 (the reference's canonical M=60 grid)
            # that is 16.4GB i8 — over a v5e chip's 16GB.  Fall back to
            # the XLA gather beam (any-size, reference-semantics path)
            # instead of OOMing; override via EXPANN_PACKED_BUDGET_GB.
            np1, d_pack = self.graph.vectors.shape
            r_adj = self.graph.adj_bottom.shape[1]
            if c.packed_dtype == "i8":
                rs_pack = r_adj + ((-r_adj) % 32)
                bytes_est = np1 * rs_pack * d_pack
            else:
                rs_pack = r_adj + ((-r_adj) % 16)
                bytes_est = np1 * rs_pack * d_pack * 2
            budget = float(
                os.environ.get("EXPANN_PACKED_BUDGET_GB", "10")
            ) * 2**30
            if bytes_est > budget:
                return False
            if c.packed_dtype == "i8":
                from expann_tpu.ops.pallas_beam import build_packed_i8

                packed, aux, codes, code_norms, center, scale = (
                    build_packed_i8(self.graph.vectors, self.graph.adj_bottom)
                )
                self.graph = dataclasses.replace(
                    self.graph,
                    packed=packed,
                    packed_aux=aux,
                    packed_codes=codes,
                    packed_code_norms=code_norms,
                    packed_center=center,
                    packed_scale=scale,
                )
            else:
                from expann_tpu.ops.pallas_beam import build_packed

                packed, aux = build_packed(
                    self.graph.vectors, self.graph.norms, self.graph.adj_bottom
                )
                self.graph = dataclasses.replace(
                    self.graph, packed=packed, packed_aux=aux
                )
        if (
            on
            and c.entry_seeds > 0
            and self.graph.entry_members is None
            and self.graph.layers
        ):
            # largest upper layer within the dense-scan budget
            pick = None
            for L in self.graph.layers:  # bottom-up: decreasing size
                if L.adj.shape[0] - 1 <= 65536:
                    pick = L
                    break
            if pick is not None:
                slot = np.asarray(pick.slot)
                n_l = pick.adj.shape[0] - 1
                mem = np.nonzero(slot[:-1] != n_l)[0].astype(np.int32)
                n_real = int(mem.size)
                pad = (-mem.size) % 128
                if pad:
                    mem = np.concatenate(
                        [mem, np.full(pad, self.graph.sentinel, np.int32)]
                    )
                self.graph = dataclasses.replace(
                    self.graph,
                    entry_members=jnp.asarray(mem),
                    entry_members_n=jnp.int32(n_real),
                )
        return on

    def query_k_batch(self, queries: np.ndarray, k: int) -> np.ndarray:
        import time as _time
        import jax as _jax

        assert self.graph is not None, "build() must be called before queries"
        use_packed = self._resolve_packed()
        if self.cfg.use_fused == "auto":
            use_fused = use_packed and _jax.default_backend() in ("tpu", "axon")
        else:
            use_fused = bool(self.cfg.use_fused) and use_packed
        interpret = _jax.default_backend() not in ("tpu", "axon")
        t_begin = _time.perf_counter_ns()
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim != 2:
            raise ValueError("queries must be 2D")
        q = pad_dim(q, self.graph.vectors.shape[1])
        ef = self._ef(k)
        out = []
        bs = self.cfg.query_block
        nq = q.shape[0]
        # quantized serving runs the fused i8 packed path when packed
        # codes exist (i8 forced by _resolve_packed on TPU); off the
        # packed path it runs the XLA uint8-gather compressed beam
        compressed = bool(
            self.cfg.use_compression and self.graph.codes is not None
        )

        def _prep(start):
            """Host-side chunk prep + device upload (thread-safe: numpy +
            device_put only)."""
            chunk = q[start : start + bs]
            real = chunk.shape[0]
            # Bucket the batch dimension to the next power of two so each
            # (B, ef) kernel shape compiles once and is reused (jit shapes
            # are static; unbounded shape variety would mean unbounded
            # recompiles).
            bucket = 8
            while bucket < real:
                bucket *= 2
            bucket = min(bucket, bs)
            # in "auto" mode small buckets take the per-iteration packed
            # path: they are latency-bound (the fused kernel's win is
            # throughput batches) and each distinct tile height qt costs
            # minutes on this host's compile server
            fused_this = use_fused and (
                bucket >= self.cfg.fused_qt or self.cfg.use_fused is True
            )
            qt = 0
            if fused_this:
                qt = min(self.cfg.fused_qt, bucket)
                # the kernel requires bucket % qt == 0; a user-set
                # query_block that isn't a power of two (e.g. 3000) caps
                # bucket at a non-multiple — pad up to the next multiple
                bucket += (-bucket) % qt
            if real < bucket:
                chunk = np.concatenate(
                    [chunk, np.zeros((bucket - real, q.shape[1]), np.float32)]
                )
            fused_path = fused_this and (
                not compressed or self.graph.packed_codes is not None
            )
            if not fused_path:
                return (False, chunk, None, qt, real)
            # Queries ship as bf16 (2 B/dim — the kernel scores bf16/s8
            # blocks anyway and the host->device link is the dominant
            # per-call cost, tools/probe_flat_overhead.py) or, with
            # query_wire="i8", as 1 B/dim absmax codes dequantized to
            # f32 in-trace; either wire is upcast to f32 on device for
            # descent/rerank.
            import ml_dtypes

            if self.cfg.query_wire == "i8":
                a = np.maximum(
                    np.abs(chunk).max(axis=1, keepdims=True), 1e-30
                )
                q_op = jnp.asarray(
                    np.clip(
                        np.round(chunk * (127.0 / a)), -127, 127
                    ).astype(np.int8)
                )
                q_inv = jnp.asarray((a / 127.0).astype(np.float32))
            else:
                q_op = jnp.asarray(chunk.astype(ml_dtypes.bfloat16))
                q_inv = None
            return (True, q_op, q_inv, qt, real)

        starts = list(range(0, nq, bs))
        # device_put BLOCKS on this runtime (the axon client transfers
        # synchronously inside the put call — measured 2026-08-20, 8-50ms
        # per production block, load-dependent), so uploading chunk i+1
        # from the dispatch thread serializes the wire against compute.
        # One prefetch worker overlaps the next chunk's quantize+upload
        # with the current chunk's kernel time; a single worker keeps the
        # puts ordered and results order unchanged.
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(max_workers=1) if len(starts) > 1 else None
        try:
            fut = None
            for idx, start in enumerate(starts):
                item = fut.result() if fut is not None else _prep(start)
                if ex is not None and idx + 1 < len(starts):
                    fut = ex.submit(_prep, starts[idx + 1])
                fused_path, q_op, q_inv, qt, real = item
                if fused_path:
                    # ef is a runtime scalar here: sweeping ef_search
                    # reuses one compile per 128-wide ef_cap bucket
                    # (crossing a bucket boundary, e.g. 120 -> 160,
                    # compiles the wider beam once —
                    # models/search.fused_query_batch).
                    ids, _, ncomp = fused_query_batch(
                        self.graph,
                        q_op,
                        ef=np.int32(ef),
                        k=k,
                        ef_cap=ef + ((-ef) % 128),
                        expand=self.cfg.query_expand,
                        cand=self.cfg.fused_cand,
                        qt=qt,
                        seeds=self.cfg.entry_seeds,
                        precision=self.cfg.precision,
                        interpret=interpret,
                        sort_tiles=self.cfg.fused_sort_tiles,
                        merge=self.cfg.fused_merge
                        or os.environ.get("EXPANN_FUSED_MERGE", "topt"),
                        q_inv_scale=q_inv,
                    )
                else:
                    # the per-iteration packed kernel scores raw blocks
                    # against the raw query — it has no code-space
                    # transform, so i8 packed layouts fall back to the
                    # plain XLA-gather path
                    packed_ok = use_packed and self.cfg.packed_dtype != "i8"
                    ids, _, ncomp = query_batch(
                        self.graph,
                        jnp.asarray(q_op),
                        k=k,
                        ef=ef,
                        precision=self.cfg.precision,
                        compressed=compressed,
                        expand=self.cfg.query_expand,
                        use_packed=packed_ok,
                        packed_topt=self.cfg.packed_topt,
                        interpret=bool(packed_ok and interpret),
                    )
                # defer host conversion: converting inside the loop would
                # block each chunk and serialize transfer against compute
                # (JAX dispatch is async; the flat engine does the same)
                out.append((ids, ncomp, real))
        finally:
            if ex is not None:
                ex.shutdown(wait=True)
        res = []
        for ids, ncomp, real in out:
            res.append(np.asarray(ids)[:real])
            # per-query counts: padded batch rows are excluded, mirroring
            # how they are excluded from results (RECORD_STATS exactness)
            nc = int(np.asarray(ncomp)[:real].sum())
            if self.cfg.use_compression:
                # traversal scores quantized codes; the final beam is
                # reranked in exact f32 (ef full-precision comps/query),
                # split across the two reference counters
                # (src/antitopo_engine.h:125-128, :845-848)
                self.num_distcomps_compressed += nc
                self.num_distcomps += real * ef
            else:
                self.num_distcomps += nc
        self.total_query_time_ns += _time.perf_counter_ns() - t_begin
        return np.concatenate(res, axis=0)

    def query_k(self, v: np.ndarray, k: int) -> List[int]:
        ids = self.query_k_batch(np.asarray(v, np.float32)[None, :], k)[0]
        return [int(i) for i in ids if i < self.n][:k]

    # reference pybind alias (src/pyrunner.cpp:84-90)
    def query_k_numpy(self, v: np.ndarray, k: int) -> List[int]:
        return self.query_k(v, k)
