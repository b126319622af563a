"""Fully-fused query path: tokenized text -> embeddings -> weighted scores
-> top-k in ONE jitted device program.

This realizes the BASELINE north star end-to-end: the reference's
per-request chain (torch encoder forward, then a separate Milvus scan,
each a host round-trip) becomes a single XLA executable. Besides kernel
fusion, it halves the per-batch tunnel RPCs (~30 ms each through axon).

Used by MultiDiagnosisService when the encoder is the native TextEncoder
and the store is device-resident; duck-typed mocks and HNSW stores fall
back to the two-step path.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FusedQueryEngine:
    """Binds an encoder's model/params with a store's device arrays."""

    def __init__(self, encoder, store):
        self.encoder = encoder
        self.store = store
        self._jit_cache = {}

    @staticmethod
    def supports(encoder, store) -> bool:
        dev = getattr(store, "_dev", None)
        return (
            hasattr(encoder, "model")
            and hasattr(encoder, "params")
            and hasattr(encoder, "tokenizer")
            and dev is not None
            and "corpus" in dev  # fp32/bf16 residency (int8 has its own path)
            and store.config.index_type.upper() == "FLAT"
        )

    def _fn(self, k: int, method: str):
        key = (k, method)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model = self.encoder.model
        on_tpu = jax.default_backend() == "tpu"
        from .pallas_score import (
            default_tile_n,
            fused_weighted_scores,
            streaming_tile_n,
            streaming_topk,
        )

        @jax.jit
        def fused(params, ids, mask, types, corpus, weights, maskv):
            emb = model.apply({"params": params}, ids, mask, types)  # (B, D)
            if on_tpu and method == "streaming" and k <= 128:
                # tokens -> BERT -> in-kernel top-k, one program, the
                # (B, N) score matrix never exists anywhere. Tile size
                # honors the streaming kernel's larger VMEM live set.
                try:
                    tile_n = streaming_tile_n(
                        ids.shape[0], corpus.shape[0],
                        corpus.dtype.itemsize, dim=corpus.shape[1], k=k,
                    )
                except ValueError:
                    tile_n = 0  # no dividing tile: materialized path below
                if tile_n:
                    vals, idx = streaming_topk(
                        emb.astype(corpus.dtype), corpus, weights, maskv,
                        k=k, tile_n=tile_n,
                    )
                    return emb, vals, idx
            if on_tpu:
                tile_n = default_tile_n(
                    ids.shape[0],
                    corpus.shape[0],
                    corpus.dtype.itemsize,
                    dim=corpus.shape[1],
                )
                scores = fused_weighted_scores(
                    emb.astype(corpus.dtype), corpus, weights, maskv, tile_n=tile_n
                )
            else:
                scores = jnp.dot(
                    emb.astype(corpus.dtype),
                    corpus.T,
                    preferred_element_type=jnp.float32,
                )
                scores = scores * weights[None, :] + maskv[None, :]
            if method == "approx":
                vals, idx = jax.lax.approx_max_k(scores, k, recall_target=0.99)
            else:
                vals, idx = jax.lax.top_k(scores, k)
            return emb, vals, idx.astype(jnp.int32)

        self._jit_cache[key] = fused
        return fused

    def query(
        self, texts, k: int, method: str = "exact"
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """texts -> (embeddings (B,D), values (B,k), indices (B,k)).

        One host->device dispatch for tokenized ids; one device->host
        readback. Shapes are bucketed like the separate paths.
        """
        enc = self.encoder
        cfg = enc.config
        texts = enc._prefixed(list(texts), "query")
        pad_rows = 8
        while pad_rows < len(texts):
            pad_rows *= 2
        ids, mask, types = enc.tokenizer.encode_batch(
            texts,
            max_length=cfg.max_length,
            buckets=cfg.length_buckets,
            pad_batch_to=pad_rows,
        )
        dev = self.store._dev
        emb, vals, idx = self._fn(k, method)(
            enc.params, ids, mask, types, dev["corpus"], dev["weights"], dev["mask"]
        )
        n = len(texts)
        return (
            np.asarray(emb[:n], dtype=np.float32),
            np.asarray(vals[:n]),
            np.asarray(idx[:n]),
        )
