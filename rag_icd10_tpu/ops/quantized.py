"""Int8 symmetric-quantized corpus scanning (FAISS-SQ8 analog, TPU-native).

For corpora where even bf16 residency is too much HBM (768-d fp32 ≈
3 GB/M rows), the corpus quantizes to int8 with one fp32 scale per row;
queries quantize per-row at search time. The scan contracts int8×int8 on
the MXU with int32 accumulation, then rescales to fp32 and applies the
level weights + padding mask in the epilogue — 4× less corpus HBM
traffic than fp32, 2× less than bf16, at ~1e-2 relative score error.
Accuracy tests live in tests/test_store_dtype.py (TestInt8Residency);
the measured recall@10 vs the true fp32 ranking at 4M x 768 is recorded
by benchmarks/run.py config 7 (BENCH_CONFIGS_r04.json).

Enabled with STORE_DEVICE_DTYPE=int8.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_rows(x, xp=np) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization: x ≈ q * scale[:, None].

    ``xp`` selects the array backend (numpy host / jax.numpy device) so
    ONE quantization law serves every consumer — int8 store residency,
    the sketch screen, and the chunk-store build. The chunk-stream
    certificates measure the build-time residual against exactly this
    law; a second spelling drifting (clip range, zero guard, rounding
    mode) would silently unsound them."""
    x = xp.asarray(x, xp.float32)
    absmax = xp.abs(x).max(axis=1)
    scale = xp.where(absmax > 0, absmax / 127.0, 1.0).astype(xp.float32)
    q = xp.clip(xp.rint(x / scale[:, None]), -127, 127).astype(xp.int8)
    return q, scale


@partial(jax.jit, static_argnames=("k", "method"))
def int8_search(
    queries: jnp.ndarray,  # (B, D) fp32
    corpus_q: jnp.ndarray,  # (N, D) int8
    corpus_scale: jnp.ndarray,  # (N,) fp32
    weights: jnp.ndarray,  # (N,) fp32
    mask: jnp.ndarray,  # (N,) additive fp32
    k: int,
    method: str = "exact",
):
    """Weighted top-k over the quantized corpus. Queries quantize
    per-row on device (their scale folds into the epilogue)."""
    q = queries.astype(jnp.float32)
    q_absmax = jnp.max(jnp.abs(q), axis=1)
    q_scale = jnp.where(q_absmax > 0, q_absmax / 127.0, 1.0)
    q_i8 = jnp.clip(jnp.round(q / q_scale[:, None]), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q_i8, corpus_q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, N) int32 on the MXU
    scores = (
        acc.astype(jnp.float32)
        * q_scale[:, None]
        * (corpus_scale * weights)[None, :]
        + mask[None, :]
    )
    if method == "approx":
        vals, idx = jax.lax.approx_max_k(scores, k, recall_target=0.99)
    else:
        vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "m", "method"))
def int8_search_device_rerank(
    queries: jnp.ndarray,  # (B, D) fp32
    corpus_q: jnp.ndarray,  # (N, D) int8
    corpus_scale: jnp.ndarray,  # (N,) fp32
    weights: jnp.ndarray,  # (N,) fp32
    mask: jnp.ndarray,  # (N,) additive fp32
    k: int,
    m: int = 0,
    method: str = "exact",
):
    """int8 scan + ON-DEVICE re-rank of the top-m candidates with the
    FULL-PRECISION query against the dequantized rows.

    The plain int8 scan quantizes BOTH operands; this removes the query's
    quantization error entirely (only the per-row corpus rounding
    remains, inherent to int8 residency) without any host fp32 matrix —
    the whole search runs on device with the int8 corpus as the ONLY
    corpus-sized array, which is the 1/4-memory serving story
    (the reference can only estimate memory, milvus_service.py:497-522;
    this path demonstrates it). Returns (values, indices (B, k))."""
    b = queries.shape[0]
    n = corpus_q.shape[0]
    if m <= 0:
        m = max(4 * k, k + 16)
    m = min(m, n)
    _, cand = int8_search(
        queries, corpus_q, corpus_scale, weights, mask, k=m, method=method
    )
    safe = jnp.clip(cand, 0, n - 1)
    rows = jnp.take(corpus_q, safe, axis=0).astype(jnp.float32)  # (B, m, D)
    rows = rows * corpus_scale[safe][:, :, None]
    exact_q = jnp.einsum(
        "bd,bmd->bm",
        queries.astype(jnp.float32),
        rows,
        precision=jax.lax.Precision.HIGHEST,
    ) * weights[safe] + mask[safe]
    vals, sel = jax.lax.top_k(exact_q, k)
    idx = jnp.take_along_axis(cand, sel, axis=1).astype(jnp.int32)
    return vals, idx
