"""Certified-exact search from a bf16 scan + fp32 re-rank.

The exact flat path scores with fp32 ``Precision.HIGHEST`` — on TPU that
is SIX bf16 MXU passes per fp32 matmul plus a full-width fp32 corpus
read, and the following ``lax.top_k`` over the full (B, N) scores costs
as much as the scan itself (measured 0.78 ms each at B=256, N=40960 on
v5e). This module gets the same exact weighted top-k from:

1. ONE bf16 MXU pass over a bf16-resident corpus (half the HBM read),
   reduced in-kernel to running slot-top-S candidates
   (``ops.pallas_score.streaming_candidates``) so the (B, N) score
   matrix never reaches HBM and the merge top-k runs over 128·S columns
   instead of N;
2. an fp32 re-rank of the top-``m`` candidates at HIGHEST precision
   (a (B, m, D) gather + tiny einsum); and
3. a per-query **certificate**: bf16 rounding of both operands with fp32
   accumulation perturbs a dot product by at most

       |ŝ - s| ≤ (2⁻⁸ + 2⁻¹⁸ + d·2⁻²⁴·1.01) · ‖q‖₂ · ‖c‖₂   (d = 768)

   (half-ulp operand rounding 2⁻⁹ each, product cross-term, fp32
   accumulation), so every row OUTSIDE the fetched candidate set has
   exact weighted score ≤ scan_bound + w_max·ε·‖q‖·max‖c‖ where
   scan_bound folds the slot-selection miss bound and the m-th scan
   value. If the re-ranked k-th beats that, the exact top-k is provably
   complete; otherwise ONE ``lax.cond`` fallback inside the same program
   re-runs the materialized fp32 HIGHEST scan — the result is exact
   unconditionally.

This replaces the reference's Milvus FLAT/IP + Python re-weighting
(services/milvus_service.py:271-316) at identical results.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Sound (slightly conservative) bf16-dot error coefficient for d ≤ 1024:
# operand rounding 2*2^-9 + cross term + fp32 accumulation drift.
EPS_BF16_DOT = 4.2e-3


def bf16_scan_bound(
    q_norms: jnp.ndarray, w_max: float, c_norm_max: float = 1.0
) -> jnp.ndarray:
    """Per-query upper bound on |bf16 weighted score - exact weighted
    score| for any corpus row: w_max · ε · ‖q‖ · max‖c‖."""
    return (EPS_BF16_DOT * w_max * c_norm_max) * q_norms


@partial(
    jax.jit,
    static_argnames=("k", "m", "tile_n", "scan", "guarantee", "interpret"),
)
def bf16_rerank_search(
    queries: jnp.ndarray,  # (B, D) fp32
    corpus_bf16: jnp.ndarray,  # (N, D) bf16
    corpus_f32: jnp.ndarray,  # (N, D) fp32 (same rows)
    weights: jnp.ndarray,  # (N,) fp32 level weights
    mask: jnp.ndarray,  # (N,) additive fp32 (-1e30 padding)
    k: int,
    m: int = 0,
    tile_n: int = 0,
    scan: str = "auto",
    bound_scale: Optional[float] = None,
    guarantee: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact weighted top-k via bf16 scan + certified fp32 re-rank.

    Returns (values (B,k) fp32, indices (B,k) int32, certified (B,) bool).
    With ``guarantee=True`` (default) an uncertified batch transparently
    falls back to the materialized fp32 HIGHEST scan inside the same
    program, so the result is ALWAYS exact; ``certified`` then only
    reports whether the fast path was taken. With ``guarantee=False`` the
    caller handles uncertified queries (requires near-ties within the
    scan error at the candidate boundary — never observed on real
    embeddings).

    m: candidate over-fetch (default max(2k, k+8), capped at N).
    scan: "pallas" (slot-candidates kernel, TPU), "xla", or "auto"
    (pallas on TPU).
    bound_scale: precomputed w_max·max‖c‖ product; None derives it
    in-graph (one extra corpus pass — precompute for the hot path).
    """
    b, d = queries.shape
    n = corpus_bf16.shape[0]
    if m <= 0:
        m = max(2 * k, k + 8)
    m = min(m, n)

    use_pallas = scan == "pallas" or (
        scan == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from .pallas_score import (
            slot_depth,
            streaming_candidates,
            streaming_tile_n,
        )

        S = slot_depth(m)
        if tile_n == 0:
            tile_n = streaming_tile_n(
                b, n, corpus_bf16.dtype.itemsize, dim=d, k=m
            )
        cand_vals, cand_idx, bounds = streaming_candidates(
            queries, corpus_bf16, weights, mask, S, tile_n, exact=False,
            interpret=interpret,
        )
        mm = min(m, cand_vals.shape[1])
        svals, sel = jax.lax.top_k(cand_vals, mm)
        sidx = jnp.take_along_axis(cand_idx, sel, axis=1)
        # rows never admitted to a lane slot's top-S are bounded by the
        # slot miss bound; admitted-but-not-fetched rows by the m-th value
        scan_bound = jnp.maximum(jnp.max(bounds, axis=1), svals[:, mm - 1])
    else:
        from .flat_topk import flat_search_jax

        svals, sidx = flat_search_jax(
            queries, corpus_bf16, weights, mask, k=m
        )
        scan_bound = svals[:, m - 1]

    # exact fp32 re-rank of the fetched candidates
    safe_idx = jnp.clip(sidx, 0, n - 1)
    cand = jnp.take(corpus_f32, safe_idx, axis=0)  # (B, m, D)
    exact = jnp.einsum(
        "bd,bmd->bm",
        queries.astype(jnp.float32),
        cand,
        precision=jax.lax.Precision.HIGHEST,
    )
    exact = exact * weights[safe_idx] + mask[safe_idx]
    vals, sel2 = jax.lax.top_k(exact, k)
    idx = jnp.take_along_axis(sidx, sel2, axis=1).astype(jnp.int32)

    # certificate: any unfetched row's exact weighted score is bounded by
    # its scan-score bound plus the bf16 error bound
    if bound_scale is None:
        w_max = jnp.max(weights)
        c_norm_max = jnp.sqrt(
            jnp.max(
                jnp.sum(corpus_f32 * corpus_f32, axis=1, dtype=jnp.float32)
            )
        )
        bscale = w_max * c_norm_max
    else:
        bscale = jnp.float32(bound_scale)
    q_norms = jnp.sqrt(jnp.sum(queries * queries, axis=1, dtype=jnp.float32))
    bound = EPS_BF16_DOT * bscale * q_norms  # (B,)
    certified = vals[:, k - 1] >= scan_bound + bound

    if not guarantee:
        return vals, idx, certified

    def keep(_):
        return vals, idx

    def fallback(_):
        from .flat_topk import weighted_scores_reference

        s = weighted_scores_reference(queries, corpus_f32, weights, mask)
        v, i = jax.lax.top_k(s, k)
        return v, i.astype(jnp.int32)

    vals_g, idx_g = jax.lax.cond(jnp.all(certified), keep, fallback, None)
    return vals_g, idx_g, certified


@partial(
    jax.jit,
    static_argnames=(
        "k", "mc", "m", "chunk", "tile_n", "scan_exact", "guarantee"
    ),
)
def chunk_select_search(
    queries: jnp.ndarray,  # (B, D) fp32
    corpus: jnp.ndarray,  # (N, D) fp32 or bf16 (the scan operand)
    weights: jnp.ndarray,  # (N,) fp32
    mask: jnp.ndarray,  # (N,) additive fp32 (-1e30 padding)
    k: int,
    corpus_f32: Optional[jnp.ndarray] = None,  # fp32 rows for the re-rank
    mc: int = 0,
    m: int = 0,
    chunk: int = 128,
    tile_n: int = 0,
    scan_exact: bool = True,
    guarantee: bool = True,
    bound_scale: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Certified top-k via chunk-max candidate selection.

    ``lax.top_k`` over the full (B, N) scores costs as much as the scan
    itself (0.78 ms each at B=256, N=40960, v5e). This path reduces the
    scores to per-128-column chunk maxima (ONE cheap max sweep), selects
    the top ``mc`` chunks, and runs the exact top-k over the fetched
    mc·chunk candidate columns — certified per query: every row in an
    unfetched chunk is bounded by the mc-th chunk max.

    scan_exact=True (fp32 HIGHEST scan): the certificate is exact as-is;
    certified ⇔ the k-th value beats the mc-th chunk max (fails only on
    near-ties across ≥ mc chunks).
    scan_exact=False (bf16 scan, pass ``corpus_f32``): the top ``m``
    candidates re-rank at fp32 HIGHEST and the certificate adds the bf16
    error bound (see module docstring).
    guarantee=True: an uncertified batch falls back to the materialized
    exact top-k inside the same program — results are ALWAYS exact.

    Returns (values (B,k) fp32, indices (B,k) int32, certified (B,)).
    """
    b, d = queries.shape
    n = corpus.shape[0]
    assert n % chunk == 0, (n, chunk)
    nc = n // chunk
    if mc <= 0:
        mc = max(4 * k, k + 30)
    mc = min(mc, nc)
    if m <= 0:
        m = max(2 * k, k + 8)
    m = min(m, mc * chunk)

    if jax.default_backend() == "tpu":
        from .pallas_score import default_tile_n, fused_weighted_scores

        if tile_n == 0:
            tile_n = default_tile_n(b, n, corpus.dtype.itemsize, dim=d)
        scores = fused_weighted_scores(
            queries, corpus, weights, mask, tile_n=tile_n, exact=scan_exact
        )
    else:
        from .flat_topk import weighted_scores_reference

        qq = queries if scan_exact else queries.astype(corpus.dtype)
        scores = weighted_scores_reference(qq, corpus, weights, mask)

    s3 = scores.reshape(b, nc, chunk)
    cm = jnp.max(s3, axis=2)  # (B, nc) chunk maxima
    cvals, cidx = jax.lax.top_k(cm, mc)
    blocks = jnp.take_along_axis(s3, cidx[:, :, None], axis=1)
    flat = blocks.reshape(b, mc * chunk)
    cols = (
        cidx[:, :, None] * chunk
        + jax.lax.broadcasted_iota(jnp.int32, (b, mc, chunk), 2)
    ).reshape(b, mc * chunk)
    chunk_bound = cvals[:, mc - 1]  # rows in unfetched chunks are <= this

    if scan_exact:
        vals, sel = jax.lax.top_k(flat, k)
        idx = jnp.take_along_axis(cols, sel, axis=1).astype(jnp.int32)
        certified = vals[:, k - 1] >= chunk_bound
    else:
        assert corpus_f32 is not None, "bf16 chunk select needs fp32 rows"
        svals, sel = jax.lax.top_k(flat, m)
        sidx = jnp.take_along_axis(cols, sel, axis=1)
        safe_idx = jnp.clip(sidx, 0, n - 1)
        cand = jnp.take(corpus_f32, safe_idx, axis=0)  # (B, m, D)
        exact = jnp.einsum(
            "bd,bmd->bm",
            queries.astype(jnp.float32),
            cand,
            precision=jax.lax.Precision.HIGHEST,
        ) * weights[safe_idx] + mask[safe_idx]
        vals, sel2 = jax.lax.top_k(exact, k)
        idx = jnp.take_along_axis(sidx, sel2, axis=1).astype(jnp.int32)
        if bound_scale is None:
            w_max = jnp.max(weights)
            c_norm_max = jnp.sqrt(
                jnp.max(
                    jnp.sum(
                        corpus_f32 * corpus_f32, axis=1, dtype=jnp.float32
                    )
                )
            )
            bscale = w_max * c_norm_max
        else:
            bscale = jnp.float32(bound_scale)
        q_norms = jnp.sqrt(
            jnp.sum(queries * queries, axis=1, dtype=jnp.float32)
        )
        eps = EPS_BF16_DOT * bscale * q_norms
        certified = vals[:, k - 1] >= (
            jnp.maximum(chunk_bound, svals[:, m - 1]) + eps
        )

    if not guarantee:
        return vals, idx, certified

    def keep(_):
        return vals, idx

    def fallback(_):
        if scan_exact:
            v, i = jax.lax.top_k(scores, k)  # scores already exact
        else:
            from .flat_topk import weighted_scores_reference

            s = weighted_scores_reference(
                queries, corpus_f32, weights, mask
            )
            v, i = jax.lax.top_k(s, k)
        return v, i.astype(jnp.int32)

    vals_g, idx_g = jax.lax.cond(jnp.all(certified), keep, fallback, None)
    return vals_g, idx_g, certified
