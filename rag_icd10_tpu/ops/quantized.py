"""Int8 symmetric-quantized corpus scanning (FAISS-SQ8 analog, TPU-native).

For corpora where even bf16 residency is too much HBM (768-d fp32 ≈
3 GB/M rows), the corpus quantizes to int8 with one fp32 scale per row;
queries quantize per-row at search time. The scan contracts int8×int8 on
the MXU with int32 accumulation, then rescales to fp32 and applies the
level weights + padding mask in the epilogue — 4× less corpus HBM
traffic than fp32, 2× less than bf16, at ~1e-2 relative score error
(recall@10 stays ≥0.99 on normalized embeddings; measured in
tests/test_quantized.py).

Enabled with STORE_DEVICE_DTYPE=int8.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_rows(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization: x ≈ q * scale[:, None]."""
    x = np.asarray(x, np.float32)
    absmax = np.abs(x).max(axis=1)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(x / scale[:, None]), -127, 127).astype(np.int8)
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
