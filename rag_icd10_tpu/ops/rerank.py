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

# Error coefficient for Precision.HIGH (bf16x3): x splits into bf16 hi+lo
# with residual ≤ 2^-18|x|; the dropped lo·lo term and split residuals
# contribute ~2^-16·‖q‖·‖c‖, and fp32 accumulation of d ≤ 1024 terms adds
# up to d·2^-24·1.01 ≈ 6.2e-5·‖q‖·‖c‖ in the worst (sequential) case —
# TPU tree accumulation only uses log2(d)·2^-24, but soundness must not
# assume the reduction order. Measured max on the real 40k corpus at
# B=256: 6.7e-6 (a 12x margin under the sequential-worst-case bound).
EPS_HIGH_DOT = 8.0e-5


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
        "k", "mc", "m", "chunk", "tile_n", "scan_precision", "guarantee"
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
    scan_precision: str = "highest",
    guarantee: bool = True,
    bound_scale: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Certified top-k via chunk-max candidate selection.

    ``lax.top_k`` over the full (B, N) scores costs as much as the scan
    itself (0.78 ms each at B=256, N=40960, v5e). This path reduces the
    scores to per-128-column chunk maxima (ONE cheap max sweep that XLA
    fuses into the scan epilogue), selects the top ``mc`` chunks, and
    runs the top-k over the fetched mc·chunk candidate columns —
    certified per query: every row in an unfetched chunk is bounded by
    the mc-th chunk max (+ the scan's certified error bound).

    scan_precision:
      "highest" — fp32 HIGHEST scan (Pallas on TPU); certificate is
        exact as-is: certified ⇔ the k-th value beats the mc-th chunk
        max (fails only on near-ties across ≥ mc chunks).
      "high" — XLA bf16x3 scan (3 MXU passes instead of 6, values
        within EPS_HIGH_DOT·‖q‖·max‖c‖ ≈ 8e-5 of fp32 — measured
        1.5x the HIGHEST path at B=256/N=40k). The certificate adds a
        2ε margin (ε = EPS_HIGH_DOT = 8e-5) on the chunk bound, so no
        row outside the fetched
        candidates can beat the returned k-th; within the window,
        pairs whose true scores differ by < 2ε (duplicate-grade ties)
        may permute across the k boundary. Returned values carry the
        ≤8e-5 scan rounding.
      "bf16" — bf16 scan over a bf16-resident corpus (half the HBM;
        pass ``corpus_f32``): the top ``m`` candidates re-rank at fp32
        HIGHEST and the certificate uses the bf16 error bound.
    guarantee=True: an uncertified batch falls back to a materialized
    exact top-k inside the same program. For "highest" and "bf16" the
    result SET is then always exact; for "high" it is exact up to
    pairs whose true scores differ by < 2·EPS_HIGH_DOT·‖q‖·max‖c‖
    (duplicate-grade ties) permuting across the k boundary — the
    certificate bounds unfetched rows, not in-window HIGH rounding.

    Returns (values (B,k) fp32, indices (B,k) int32, certified (B,)).
    """
    assert scan_precision in ("highest", "high", "bf16"), scan_precision
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

    if scan_precision == "high":
        # Mosaic has no HIGH lowering; XLA fuses the epilogue + chunkmax
        # into the dot just as well
        scores = jnp.dot(
            queries.astype(jnp.float32),
            corpus.T.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH,
        ) * weights[None, :] + mask[None, :]
    elif jax.default_backend() == "tpu":
        from .pallas_score import default_tile_n, fused_weighted_scores

        if tile_n == 0:
            tile_n = default_tile_n(b, n, corpus.dtype.itemsize, dim=d)
        scores = fused_weighted_scores(
            queries, corpus, weights, mask, tile_n=tile_n,
            exact=scan_precision == "highest",
        )
    else:
        from .flat_topk import weighted_scores_reference

        qq = (
            queries
            if scan_precision == "highest"
            else queries.astype(corpus.dtype)
        )
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

    def _eps(coeff):
        if bound_scale is None:
            w_max = jnp.max(weights)
            ref = corpus_f32 if corpus_f32 is not None else corpus
            c_norm_max = jnp.sqrt(
                jnp.max(
                    jnp.sum(
                        ref.astype(jnp.float32) ** 2, axis=1,
                        dtype=jnp.float32,
                    )
                )
            )
            bscale = w_max * c_norm_max
        else:
            bscale = jnp.float32(bound_scale)
        q_norms = jnp.sqrt(
            jnp.sum(queries * queries, axis=1, dtype=jnp.float32)
        )
        return coeff * bscale * q_norms  # (B,)

    if scan_precision == "highest":
        vals, sel = jax.lax.top_k(flat, k)
        idx = jnp.take_along_axis(cols, sel, axis=1).astype(jnp.int32)
        certified = vals[:, k - 1] >= chunk_bound
    elif scan_precision == "high":
        # The certificate covers the REAL failure mode: rows in
        # unfetched chunks (true score <= chunk_bound + eps) must not
        # beat the k-th (true >= k-th - eps), hence the 2eps margin.
        # WITHIN the fetched window the ranking is by HIGH scores, so a
        # pair of rows whose true scores differ by < 2eps (~1e-4 on unit
        # embeddings — duplicate-grade ties) may permute across the k
        # boundary; demanding a strict (k+1)-th gap instead would
        # de-certify ~10% of random queries over a 40k corpus for a
        # distinction below embedding noise.
        vals, sel = jax.lax.top_k(flat, k)
        idx = jnp.take_along_axis(cols, sel, axis=1).astype(jnp.int32)
        eps = _eps(EPS_HIGH_DOT)
        certified = vals[:, k - 1] >= chunk_bound + 2 * eps
    else:  # bf16 scan + fp32 re-rank
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
        eps = _eps(EPS_BF16_DOT)
        certified = vals[:, k - 1] >= (
            jnp.maximum(chunk_bound, svals[:, m - 1]) + eps
        )

    if not guarantee:
        return vals, idx, certified

    def keep(_):
        return vals, idx

    def fallback(_):
        if scan_precision == "highest":
            v, i = jax.lax.top_k(scores, k)  # scores already exact
        else:
            from .flat_topk import weighted_scores_reference

            ref = corpus_f32 if corpus_f32 is not None else corpus
            s = weighted_scores_reference(
                queries, ref.astype(jnp.float32), weights, mask
            )
            v, i = jax.lax.top_k(s, k)
        return v, i.astype(jnp.int32)

    vals_g, idx_g = jax.lax.cond(jnp.all(certified), keep, fallback, None)
    return vals_g, idx_g, certified
