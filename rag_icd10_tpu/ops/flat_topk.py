"""Exact flat-scan search: batched weighted cosine top-k.

This is the TPU replacement for Milvus FLAT/IP search + level weighting
(reference: services/milvus_service.py:271-316 — raw IP distances are
multiplied by level weights {1: 1.2, 2: 1.0, 3: 0.8} and re-sorted,
:550-558). Queries and corpus are L2-normalized, so IP == cosine.

The whole batch of sub-queries is served by ONE device program
(the reference loops queries sequentially in Python,
services/multi_diagnosis_service.py:98-103).

Numerics: scores fp32. Padding rows carry weight 0 and an additive -inf
mask so they can never enter the top-k.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# NB: no module-level jnp values here — materializing one initializes the
# JAX backend at import time, which (a) defeats the entry points'
# device-acquisition watchdogs (init starts before main() can arm them)
# and (b) hangs library importers for the duration of a tunnel outage.


def pad_corpus(
    corpus: np.ndarray,
    weights: np.ndarray,
    multiple: int = 1024,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad corpus rows to a tile multiple.

    Returns (corpus_padded, weights_padded, mask) where mask is 0 for real
    rows and -1e30 for padding rows.
    """
    n, d = corpus.shape
    n_pad = ((n + multiple - 1) // multiple) * multiple
    corpus_p = np.zeros((n_pad, d), dtype=corpus.dtype)
    corpus_p[:n] = corpus
    weights_p = np.zeros((n_pad,), dtype=np.float32)
    weights_p[:n] = weights
    mask = np.full((n_pad,), -1e30, dtype=np.float32)
    mask[:n] = 0.0
    return corpus_p, weights_p, mask


def weighted_scores_reference(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    weights: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, D) x (N, D) -> (B, N) weighted scores. Pure jnp ground truth.

    precision=HIGHEST keeps fp32 inputs exact — JAX otherwise feeds the MXU
    bf16-rounded inputs for f32 matmuls (~3e-3 relative error).
    """
    scores = jnp.dot(
        queries.astype(corpus.dtype),
        corpus.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    scores = scores * weights[None, :].astype(jnp.float32)
    if mask is not None:
        scores = scores + mask[None, :]
    return scores


def topk_reference(scores: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy exact top-k (descending, stable ties by index). Host-side
    ground truth for kernel tests."""
    idx = np.argsort(-scores, axis=-1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, idx, axis=-1)
    return vals, idx


@partial(jax.jit, static_argnames=("k", "method"))
def flat_search_jax(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    weights: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    method: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-call batched search: weighted scores + top-k.

    method:
      "exact"  - lax.top_k (exact, XLA TopK)
      "approx" - lax.approx_max_k (TPU PartialReduce; ~1.0 recall for small
                 k with default recall_target 0.95, much faster for large N)
    Returns (values (B,k) fp32, indices (B,k) int32).
    """
    scores = weighted_scores_reference(queries, corpus, weights, mask)
    if method == "approx":
        vals, idx = jax.lax.approx_max_k(scores, k, recall_target=0.99)
    else:
        vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)
