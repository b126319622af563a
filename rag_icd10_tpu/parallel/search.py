"""Corpus-sharded flat search over a device mesh.

Scaling axis for retrieval is the CORPUS dimension: each device holds an
N/n_devices row shard in HBM, scans it with the same fused weighted-score
kernel, takes a per-shard top-k, and ONE all_gather of (k values, k
indices) per query merges the results — k*n rows instead of N cross
the interconnect.

The reference has no distributed search at all (single Milvus-Lite file);
this design keeps the 40k corpus single-chip (it is tiny) but scales the
same code to 100M+ rows on a pod slice.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.flat_topk import pad_corpus


class ShardedFlatSearcher:
    """Flat scan with the corpus row dimension sharded over a mesh axis."""

    def __init__(
        self,
        corpus: np.ndarray,
        weights: np.ndarray,
        mesh: Mesh,
        axis: str = "dp",
        store_dtype: str = "fp32",
    ):
        self.mesh = mesh
        self.axis = axis
        n_shards = mesh.shape[axis]
        # pad so rows divide evenly into shards of tile-aligned size;
        # TPU shards align to the streaming kernel's 2048-row tiles
        try:
            tile = 2048 if jax.default_backend() == "tpu" else 128
        except Exception:
            tile = 128
        multiple = tile * n_shards
        cp, wp, mask = pad_corpus(corpus, weights, multiple=multiple)
        self.n_padded = cp.shape[0]
        row_sharding = NamedSharding(mesh, P(axis, None))
        vec_sharding = NamedSharding(mesh, P(axis))
        # multihost-aware placement: under jax.distributed each process
        # materializes only its addressable shards (multihost.py)
        from .multihost import global_device_put

        assert store_dtype in ("fp32", "int8"), store_dtype
        self.store_dtype = store_dtype
        if store_dtype == "int8":
            # capacity tier: each shard holds int8 rows + one fp32 scale
            # per row (ops/quantized.py law — the ONE quantization
            # spelling every consumer shares), 4x the rows per HBM byte.
            # Padding rows are zeros -> scale 1.0; the additive mask
            # already excludes them.
            from ..ops.quantized import quantize_rows

            cq, cscale = quantize_rows(cp)
            self.corpus = global_device_put(cq, row_sharding)
            self.scales = global_device_put(cscale, vec_sharding)
        else:
            self.corpus = global_device_put(cp, row_sharding)
            self.scales = None
        self.weights = global_device_put(wp, vec_sharding)
        self.mask = global_device_put(mask, vec_sharding)
        # certificate scale for the per-shard chunkstream method
        norms = np.linalg.norm(corpus, axis=1) if corpus.size else np.ones(1)
        wmax = float(np.max(weights)) if np.asarray(weights).size else 1.0
        self._bound_scale = float(norms.max()) * wmax or 1.0
        self._fn_cache = {}

    def _build(self, k: int, method: str = "auto"):
        axis = self.axis
        n_shards = self.mesh.shape[axis]
        shard_rows = self.n_padded // n_shards
        # per-request method knobs are honored PER SHARD (VERDICT r2 #7:
        # they used to be silently ignored under sharding):
        #   auto      — in-kernel streaming top-k on TPU, XLA scan on CPU
        #   streaming — force the slot-stream kernel (TPU) / XLA on CPU
        #   fast      — certified chunk-select over a HIGH scan per shard
        #               (in-program exact fallback; guarantee=True)
        #   chunkstream — streaming chunk-select v2 per shard: fused
        #               chunk-max pass 1 + exact block re-score pass 2,
        #               certified with in-program exact fallback
        #   approx    — lax.approx_max_k per shard
        #   exact     — materialized scan + lax.top_k
        on_tpu = jax.default_backend() == "tpu"
        use_streaming = (
            method in ("auto", "streaming") and on_tpu and k <= 128
        )

        def shard_fn(q, corpus, weights, mask):
            tile_n = 0
            if use_streaming:
                from ..ops.pallas_score import streaming_tile_n

                try:  # VMEM-budgeted tile for the streaming live set
                    tile_n = streaming_tile_n(
                        q.shape[0], corpus.shape[0],
                        corpus.dtype.itemsize, dim=corpus.shape[1], k=k,
                    )
                except ValueError:
                    tile_n = 0
            if tile_n:
                from ..ops.pallas_score import streaming_topk

                vals, idx = streaming_topk(
                    q, corpus, weights, mask, k=k, tile_n=tile_n
                )
            elif method in ("fast", "chunk"):
                from ..ops.rerank import chunk_select_search

                vals, idx, _ = chunk_select_search(
                    q, corpus, weights, mask, k=k,
                    scan_precision="high", guarantee=True,
                )
            elif method == "chunkstream":
                # per-shard streaming chunk-select v2 (ops/chunk_stream
                # design, pure-XLA spelling so it lowers inside shard_map
                # on any backend): pass 1 is a fp32 HIGHEST dot whose
                # 128-column chunk-max reduce XLA fuses into the matmul
                # epilogue (nothing (B, rows)-sized is kept), pass 2
                # re-scores only the selected 128-row blocks. Certified
                # per query; an uncertified batch recomputes the full
                # materialized scan INSIDE the program (the untaken
                # branch of lax.cond costs nothing at runtime).
                from ..ops.chunk_stream import EPS_FP32_DOT

                b = q.shape[0]
                rows = corpus.shape[0]
                nc = rows // 128
                mc = min(max(2 * k, k + 16), nc)
                prec = jax.lax.Precision.HIGHEST
                s = jnp.dot(
                    q, corpus.T, preferred_element_type=jnp.float32,
                    precision=prec,
                ) * weights[None, :] + mask[None, :]
                cm = jnp.max(s.reshape(b, nc, 128), axis=2)
                cvals, cidx = jax.lax.top_k(cm, mc)
                # pass 2 scans the mc selected chunk slots: each step
                # gathers one (b, 128, D) block set and re-scores it —
                # a single jnp.take over all slots would materialize
                # (b, mc, 128, D), ~1.6 GB fp32 at b=64 mc=64 d=768,
                # next to the shard corpus in HBM on exactly the
                # huge-corpus deployments this method targets
                corpus3 = corpus.reshape(nc, 128, -1)
                w2 = weights.reshape(nc, 128)
                m2 = mask.reshape(nc, 128)

                def rescore_slot(_, ci):
                    blocks = jnp.take(corpus3, ci, axis=0)  # (b, 128, D)
                    raw = jnp.einsum(
                        "bd,brd->br", q, blocks, precision=prec,
                        preferred_element_type=jnp.float32,
                    )
                    return None, raw * jnp.take(w2, ci, axis=0) + jnp.take(
                        m2, ci, axis=0
                    )

                _, sc = jax.lax.scan(rescore_slot, None, cidx.T)
                scores = jnp.transpose(sc, (1, 0, 2)).reshape(b, mc * 128)
                vals, sel = jax.lax.top_k(scores, k)
                cols = (
                    cidx[:, :, None] * 128
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (b, mc, 128), 2)
                ).reshape(b, mc * 128)
                idx = jnp.take_along_axis(cols, sel, axis=1).astype(
                    jnp.int32
                )
                q_norms = jnp.sqrt(
                    jnp.sum(q * q, axis=1, dtype=jnp.float32)
                )
                eps = EPS_FP32_DOT * self._bound_scale * q_norms
                if mc >= nc:
                    # every chunk of this shard was fetched and re-scored
                    # exactly — trivially exact (tiny shards)
                    certified = jnp.ones((b,), bool)
                else:
                    certified = vals[:, k - 1] >= cvals[:, mc - 1] + eps

                def _keep(_):
                    return vals, idx

                def _fallback(_):
                    s2 = jnp.dot(
                        q, corpus.T, preferred_element_type=jnp.float32,
                        precision=prec,
                    ) * weights[None, :] + mask[None, :]
                    v, i = jax.lax.top_k(s2, k)
                    return v, i.astype(jnp.int32)

                vals, idx = jax.lax.cond(
                    jnp.all(certified), _keep, _fallback, None
                )
            elif method == "approx":
                scores = jnp.dot(
                    q, corpus.T, preferred_element_type=jnp.float32
                ) * weights[None, :] + mask[None, :]
                vals, idx = jax.lax.approx_max_k(
                    scores, k, recall_target=0.99
                )
                idx = idx.astype(jnp.int32)
            else:
                scores = jnp.dot(
                    q, corpus.T, preferred_element_type=jnp.float32
                ) * weights[None, :] + mask[None, :]
                vals, idx = jax.lax.top_k(scores, k)
            # localize -> globalize indices
            shard_id = jax.lax.axis_index(axis)
            idx = idx + shard_id * shard_rows
            # gather all shards' candidates: (B, n_shards*k)
            all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
            all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
            fvals, fpos = jax.lax.top_k(all_vals, k)
            fidx = jnp.take_along_axis(all_idx, fpos, axis=1)
            return fvals, fidx

        in_specs = (P(), P(axis, None), P(axis), P(axis))
        out_specs = (P(), P())
        try:
            from jax import shard_map

            fn = shard_map(
                shard_fn, mesh=self.mesh, in_specs=in_specs,
                out_specs=out_specs, check_vma=False,
            )
        except ImportError:  # older jax spelling
            from jax.experimental.shard_map import shard_map

            fn = shard_map(
                shard_fn, mesh=self.mesh, in_specs=in_specs,
                out_specs=out_specs, check_rep=False,
            )
        return jax.jit(fn)

    def _build_int8(self, k: int, method: str = "exact"):
        """Per-shard search over the int8-resident corpus (capacity
        tier: 4x the rows per HBM byte vs fp32).

        Queries quantize per-row on device (ops/quantized.py int8_search
        law); int8 x int8 contractions accumulate in int32 — EXACT
        integer arithmetic — so the chunkstream pass-2 block re-score
        reproduces the pass-1 scores bit-for-bit and the chunk-select
        certificate needs NO epsilon margin (unlike the fp32/bf16
        scans). Selection is approximate only w.r.t. the original fp32
        rows (the inherent int8 rounding); callers that need exact
        served scores re-rank the merged top-k against host fp32 rows,
        exactly like the single-device int8 store path."""
        axis = self.axis
        n_shards = self.mesh.shape[axis]
        shard_rows = self.n_padded // n_shards

        def shard_fn(q, corpus_q, scales, weights, mask):
            b = q.shape[0]
            rows = corpus_q.shape[0]
            qf = q.astype(jnp.float32)
            q_absmax = jnp.max(jnp.abs(qf), axis=1)
            q_scale = jnp.where(q_absmax > 0, q_absmax / 127.0, 1.0)
            q_i8 = jnp.clip(
                jnp.round(qf / q_scale[:, None]), -127, 127
            ).astype(jnp.int8)
            colw = scales * weights  # fold both per-row factors

            def full_scores():
                acc = jax.lax.dot_general(
                    q_i8, corpus_q,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return (
                    acc.astype(jnp.float32)
                    * q_scale[:, None]
                    * colw[None, :]
                    + mask[None, :]
                )

            if method == "chunkstream":
                nc = rows // 128
                mc = min(max(2 * k, k + 16), nc)
                s = full_scores()
                # XLA fuses this reduce into the dot epilogue; nothing
                # (B, rows)-sized survives to HBM (same shape as the
                # fp32 chunkstream spelling above)
                cm = jnp.max(s.reshape(b, nc, 128), axis=2)
                cvals, cidx = jax.lax.top_k(cm, mc)
                corpus3 = corpus_q.reshape(nc, 128, -1)
                cw2 = colw.reshape(nc, 128)
                m2 = mask.reshape(nc, 128)

                def rescore_slot(_, ci):
                    blocks = jnp.take(corpus3, ci, axis=0)  # (b,128,D) i8
                    raw = jnp.einsum(
                        "bd,brd->br", q_i8, blocks,
                        preferred_element_type=jnp.int32,
                    )
                    return None, (
                        raw.astype(jnp.float32)
                        * q_scale[:, None]
                        * jnp.take(cw2, ci, axis=0)
                        + jnp.take(m2, ci, axis=0)
                    )

                _, sc = jax.lax.scan(rescore_slot, None, cidx.T)
                scores = jnp.transpose(sc, (1, 0, 2)).reshape(b, mc * 128)
                vals, sel = jax.lax.top_k(scores, k)
                cols = (
                    cidx[:, :, None] * 128
                    + jax.lax.broadcasted_iota(jnp.int32, (b, mc, 128), 2)
                ).reshape(b, mc * 128)
                idx = jnp.take_along_axis(cols, sel, axis=1).astype(
                    jnp.int32
                )
                if mc >= nc:
                    certified = jnp.ones((b,), bool)
                else:
                    # int32 accumulation is exact and the fp32 rescale
                    # is the identical expression in both passes: the
                    # bound needs no rounding margin
                    certified = vals[:, k - 1] >= cvals[:, mc - 1]

                def _keep(_):
                    return vals, idx

                def _fallback(_):
                    v, i = jax.lax.top_k(full_scores(), k)
                    return v, i.astype(jnp.int32)

                vals, idx = jax.lax.cond(
                    jnp.all(certified), _keep, _fallback, None
                )
            else:  # exact (w.r.t. the int8 score law)
                vals, idx = jax.lax.top_k(full_scores(), k)
                idx = idx.astype(jnp.int32)
            shard_id = jax.lax.axis_index(axis)
            idx = idx + shard_id * shard_rows
            all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
            all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
            fvals, fpos = jax.lax.top_k(all_vals, k)
            fidx = jnp.take_along_axis(all_idx, fpos, axis=1)
            return fvals, fidx

        in_specs = (P(), P(axis, None), P(axis), P(axis), P(axis))
        out_specs = (P(), P())
        try:
            from jax import shard_map

            fn = shard_map(
                shard_fn, mesh=self.mesh, in_specs=in_specs,
                out_specs=out_specs, check_vma=False,
            )
        except ImportError:  # older jax spelling
            from jax.experimental.shard_map import shard_map

            fn = shard_map(
                shard_fn, mesh=self.mesh, in_specs=in_specs,
                out_specs=out_specs, check_rep=False,
            )
        return jax.jit(fn)

    def search(
        self, queries: np.ndarray, k: int, method: str = "auto"
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, D) queries -> (values (B,k), global indices (B,k)).

        ``method`` selects the per-shard kernel (see _build); unknown
        methods raise ValueError so callers can surface a 400 instead of
        silently falling back."""
        if method in (None, ""):
            method = "auto"
        if self.store_dtype == "int8":
            if method == "auto":
                method = "exact"
            if method not in ("exact", "chunkstream"):
                raise ValueError(
                    f"search method {method!r} is not available on an "
                    "int8-sharded store (supported: exact, chunkstream)"
                )
            key = (k, method, "int8")
            if key not in self._fn_cache:
                self._fn_cache[key] = self._build_int8(k, method)
            q = jnp.asarray(np.atleast_2d(queries), dtype=jnp.float32)
            vals, idx = self._fn_cache[key](
                q, self.corpus, self.scales, self.weights, self.mask
            )
            return np.asarray(vals), np.asarray(idx)
        if method not in ("auto", "exact", "streaming", "fast", "chunk",
                          "chunkstream", "approx"):
            raise ValueError(
                f"search method {method!r} is not available on a sharded "
                "store (supported: exact, streaming, fast, chunkstream, "
                "approx)"
            )
        key = (k, method)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build(k, method)
        q = jnp.asarray(np.atleast_2d(queries), dtype=self.corpus.dtype)
        vals, idx = self._fn_cache[key](q, self.corpus, self.weights, self.mask)
        return np.asarray(vals), np.asarray(idx)
