"""Streaming chunk-select search v2 — the huge-corpus scaling path.

Replaces the reference's Milvus FLAT scan (services/milvus_service.py:271-316)
for corpora where the (B, N) score matrix must never materialize in HBM.

Two passes, both Pallas:

1. **Chunk-max scan** over a PRE-TRANSPOSED, weight-folded corpus
   ``C_t = (C · diag(w))ᵀ`` of shape (D, N): each grid step computes the
   (B, T) tile scores with the MXU in its natural (B,D)x(D,T) layout and
   reduces them in VMEM to per-128-column chunk maxima. The kernel
   adapts to C_t's stored dtype — fp32 (HIGHEST, exact), bf16
   (single-pass MXU, 2x less HBM) or int8 + per-column scales (4x less
   HBM). The (D, N) layout matters: an (N, D)-layout kernel pays a
   fixed per-grid-step relayout cost because Mosaic re-lays the rhs
   tile for a dim-1 contraction.
2. **Block gather + exact re-score**: the top ``mc`` chunks per query are
   fetched as CONTIGUOUS 128-row blocks from the fp32 (N, D) corpus with
   double-buffered DMAs (128 KB block DMAs run near HBM bandwidth,
   where element-gathers crawl) and re-scored at fp32 HIGHEST.

Measured on v5e (config 6, 1M x 256, B=64, k=16, single process A/B vs
the materialized fp32 scan at 7.0 ms): pallas/fp32 3.97 ms (1.8-2.0x,
270-293 GB/s), pallas/bf16 3.22 ms (2.2x, 334 GB/s effective,
cert 0.98), pallas/int8 3.02 ms (2.3x, 356 GB/s effective), all with
exact top-k. The Pallas scan beats the XLA-dot spelling at every dtype
(BENCH_CONFIGS_r04.json).

Exactness is certified per query (streaming_chunk_topk's argument,
ops/pallas_score.py): every row in an unfetched chunk is bounded by the
mc-th chunk max plus a scan-dependent rounding epsilon; padding rows
score 0 in pass 1 (weight-folded zeros), which only OVERestimates a
partially-padded chunk's bound (sound) and fully-padded chunks are masked
post-hoc. Even the fp32 HIGHEST scans carry a (tiny) epsilon: pass 1
scores fold weights into the corpus rows (fp32_dot(q, w*c)) while pass 2
computes fp32_dot(q, c)*w — the two roundings can differ by ~d*2^-24
ulp-scale error on duplicate-grade ties, so the bound widens by
EPS_FP32_DOT*bound_scale*||q|| rather than claiming bit-exact zero.

Reduced-precision pass-1 scans ("bf16", "int8") store the transposed
corpus at 2x/4x less HBM and widen the certificate by the EXACT
build-time quantization residual (Cauchy-Schwarz:
|dot(q, c_hat - c)| <= ||q|| * max_row ||c_hat - c||, measured per build,
no modeling assumptions) plus the query-cast term. Pass-2 re-scoring is
always fp32 HIGHEST over raw fp32 rows, so scan rounding only ever
affects the chunk BOUND and chunk SELECTION — certified results are
exact regardless of scan dtype.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------- pass 1


def _chunkmax_t_kernel(q_ref, ct_ref, o_ref):
    # q: (B, D) resident; ct: (D, T) tile of the transposed corpus.
    # fp32 tiles use HIGHEST (6-pass exact); bf16 tiles are a single MXU
    # pass with fp32 accumulation (the MXU's native mode)
    prec = (
        jax.lax.Precision.HIGHEST
        if ct_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    s = jax.lax.dot_general(
        q_ref[:], ct_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (B, T)
    b, t = s.shape
    cm = jnp.max(s.reshape(b, t // 128, 128), axis=2)  # (B, e)
    # minor block dim must be 128-divisible or full-size -> write (e, B)
    o_ref[:] = cm.T


def _chunkmax_t_scaled_kernel(q_ref, ct_ref, sc_ref, o_ref):
    # int8 tile: bf16 convert is exact for |v| <= 127, single MXU pass
    # with fp32 accumulation, then the per-COLUMN (= per-row of the
    # untransposed corpus) dequant scale before the chunk max
    s = jax.lax.dot_general(
        q_ref[:], ct_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, T)
    s = s * sc_ref[:]  # (1, T) broadcast
    b, t = s.shape
    cm = jnp.max(s.reshape(b, t // 128, 128), axis=2)
    o_ref[:] = cm.T


def transposed_tile_n(batch: int, n: int, dim: int, cap: int = 2048,
                      itemsize: int = 4) -> int:
    """Largest T with (D, T) double-buffered tiles + (B, T) scores + the
    (B, D) query block within ~13 MB of VMEM. itemsize is the stored
    corpus_t element width (4 fp32, 2 bf16, 1 int8).

    Delegates to pallas_score.default_tile_n — ONE VMEM-budget model for
    every kernel: 2 double-buffered (D, T) corpus tiles at itemsize,
    2 (B, T) fp32 temporaries (scores + chunk max), and a query block
    that is always fp32 (fixed_bytes compensates default_tile_n's
    corpus-width query accounting when the stored dtype is narrower)."""
    from .pallas_score import default_tile_n

    return default_tile_n(
        batch, n, dtype_bytes=itemsize, cap=cap, dim=dim,
        temporaries=2, fixed_bytes=batch * dim * (4 - itemsize),
    )


def chunk_maxima_transposed(
    queries: jnp.ndarray,  # (B, D) fp32
    corpus_t: jnp.ndarray,  # (D, N) weight-folded: fp32, bf16 or int8
    tile_n: int,
    scales: Optional[jnp.ndarray] = None,  # (N,) fp32 — int8 only
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N/128) weighted chunk maxima; (B, N) stays in VMEM. Exact
    (fp32 HIGHEST) for fp32 corpus_t; bf16/int8 tiles stream at 2x/4x
    less HBM with the measured-residual certificate widening handled by
    the caller."""
    b, d = queries.shape
    d2, n = corpus_t.shape
    assert d == d2, (d, d2)
    assert n % tile_n == 0 and tile_n % 128 == 0, (n, tile_n)
    e = tile_n // 128
    itemsize = jnp.dtype(corpus_t.dtype).itemsize
    q = queries.astype(
        jnp.float32 if corpus_t.dtype == jnp.float32 else jnp.bfloat16
    )

    if corpus_t.dtype == jnp.int8:
        assert scales is not None
        cm_t = pl.pallas_call(
            _chunkmax_t_scaled_kernel,
            grid=(n // tile_n,),
            in_specs=[
                pl.BlockSpec((b, d), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, tile_n), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((e, b), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n // 128, b), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n * d,
                bytes_accessed=n * d + n * 4 + b * (n // 128) * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(q, corpus_t, scales.reshape(1, n).astype(jnp.float32))
        return cm_t.T

    cm_t = pl.pallas_call(
        _chunkmax_t_kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((e, b), lambda j: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // 128, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * itemsize + b * (n // 128) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, corpus_t)
    return cm_t.T


# --------------------------------------------------------------- pass 2


QB = 8  # queries per grid step: the fp32 sublane tile, so every VMEM
# block is Mosaic-legal (a (1, d) query block over a (B, d) array violates
# the divisible-by-8-or-full sublane rule for B > 1 — the round-3 version
# failed Mosaic lowering on hardware for exactly that reason)


def _make_rescore_kernel(mc: int, d: int):
    """Fused block gather + exact re-score, QB queries per grid step.

    grid (B/QB,): for each of the step's QB queries, DMA its selected
    chunks' 128 fp32 rows from HBM (double-buffered across the flattened
    (chunk, query) loop) and re-score at fp32 HIGHEST. The dot is
    (QB, d) x (d, 128) — identical MXU cycles to the (1, d) matvec it
    replaces (the MXU pads sublanes to 8 anyway), and only query j's row
    is kept via a one-hot mask so every o_ref store is a full-sublane
    (QB, 128) aligned block (unaligned/dynamic sublane stores are slow
    on Mosaic)."""

    def kernel(ids_ref, q_ref, corpus_hbm, o_ref):
        step = pl.program_id(0)
        total = mc * QB

        def body(scratch, sem):
            def start_dma(t, slot):
                i, j = divmod(t, QB)  # chunk-rank i of query j
                row0 = ids_ref[step * QB + j, i] * 128
                return pltpu.make_async_copy(
                    corpus_hbm.at[pl.ds(row0, 128), :],
                    scratch.at[slot],
                    sem.at[slot],
                )

            start_dma(0, 0).start()
            for i in range(mc):
                acc = jnp.zeros((QB, 128), jnp.float32)
                for j in range(QB):
                    t = i * QB + j
                    slot = t & 1
                    if t + 1 < total:
                        start_dma(t + 1, (t + 1) & 1).start()
                    start_dma(t, slot).wait()
                    s = jax.lax.dot_general(
                        q_ref[:], scratch[slot],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (QB, 128): row j is query j vs ITS chunk i
                    onehot = jax.lax.broadcasted_iota(
                        jnp.int32, (QB, 1), 0
                    ) == j
                    acc = acc + jnp.where(onehot, s, 0.0)
                o_ref[:, i * 128:(i + 1) * 128] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2, 128, d), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


def gather_rescore(
    queries: jnp.ndarray,  # (B, D) fp32, B % QB == 0
    corpus: jnp.ndarray,  # (N, D) fp32 (raw rows, NOT weight-folded)
    chunk_ids: jnp.ndarray,  # (B, mc) int32
    mc: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, mc*128) fp32 HIGHEST raw scores of the selected chunks' rows."""
    b, d = queries.shape
    assert b % QB == 0, (b, QB)

    return pl.pallas_call(
        _make_rescore_kernel(mc, d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // QB,),
            in_specs=[
                pl.BlockSpec((QB, d), lambda i, ids: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # corpus stays in HBM
            ],
            out_specs=pl.BlockSpec((QB, mc * 128), lambda i, ids: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, mc * 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * QB * mc * 128 * d,
            bytes_accessed=b * mc * 128 * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(chunk_ids.astype(jnp.int32), queries.astype(jnp.float32), corpus)


# ---------------------------------------------------------------- state


# fp32 HIGHEST dot rounding gap between pass 1 (weight-folded rows) and
# pass 2 (raw-dot x weight): both are fp32 roundings of the same real
# value; d*2^-24 sequential-accumulation worst case at d<=768 is ~4.6e-5,
# doubled for the two conventions
EPS_FP32_DOT = 1e-4
# worst-case relative l2 error of casting the query to bf16: round-to-
# nearest is <= half-ulp 2^-9 per element, so ||q - bf16(q)|| <=
# 2^-9 ||q||; 1.25x margin absorbs any non-RN edge (ties, subnormals)
EPS_BF16_VEC = 1.25 * 2.0 ** -9


@dataclass
class ChunkStore:
    """Device state for the streaming chunk-select path.

    corpus_t: (D, N_pad) weight-folded transposed corpus (pass 1) in
              scan_dtype: fp32, bf16 (2x less HBM) or int8 (4x; per-row
              scales in ``scales``)
    corpus:   (N_pad, D) fp32 raw rows (pass 2 exact re-score)
    weights / mask: (N_pad,) fp32 (pass-2 epilogue + padding)
    bound_scale: max ‖w_i·c_i‖ over folded rows — the certificate scale
    resid_max: max over rows of ‖fold_i − dequant(quant(fold_i))‖₂,
    measured EXACTLY at build — the Cauchy-Schwarz certificate term for
    reduced-precision scans
    """

    corpus_t: jnp.ndarray
    corpus: jnp.ndarray
    weights: jnp.ndarray
    mask: jnp.ndarray
    n_real: int
    tile_n: int
    bound_scale: float = 1.2
    scan_dtype: str = "fp32"
    scales: Optional[jnp.ndarray] = None  # (N_pad,) fp32, int8 only
    resid_max: float = 0.0

    @classmethod
    def build(
        cls,
        vectors: np.ndarray,
        weights: np.ndarray,
        batch_hint: int = 64,
        tile_cap: int = 2048,
        scan_dtype: str = "fp32",
    ) -> "ChunkStore":
        """Host-convenience wrapper: device_put the inputs and delegate
        to build_device, so exactly ONE implementation of the pad/fold/
        quantize/residual math exists — the exactness certificates are
        only sound if the build-side residual measurement matches the
        stored corpus bit-for-bit, and a second hand-maintained host
        spelling of the same pipeline is where such drift starts."""
        v = jax.device_put(np.asarray(vectors, np.float32))
        w = jax.device_put(np.asarray(weights, np.float32))
        return build_device(
            v, w, batch_hint=batch_hint, tile_cap=tile_cap,
            scan_dtype=scan_dtype,
        )


@partial(jax.jit, static_argnames=("n_pad", "scan_dtype"))
def _build_device_arrays(v, w, n_pad: int, scan_dtype: str):
    """Device-side ChunkStore array prep: pad, fold, transpose, quantize,
    and measure the exact quantization residual — all under one jit so a
    large corpus never round-trips to the host."""
    n, d = v.shape
    cp = jnp.pad(v.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    wp = jnp.pad(w.astype(jnp.float32), (0, n_pad - n))
    mask = jnp.where(jnp.arange(n_pad) < n, 0.0, -1e30).astype(jnp.float32)
    folded = cp * wp[:, None]
    bscale = jnp.sqrt(jnp.max(jnp.sum(folded * folded, axis=1)))
    scales = jnp.zeros((n_pad,), jnp.float32)
    if scan_dtype == "bf16":
        ct = folded.T.astype(jnp.bfloat16)
        deq = ct.astype(jnp.float32).T
        resid = jnp.sqrt(jnp.max(jnp.sum((folded - deq) ** 2, axis=1)))
    elif scan_dtype == "int8":
        from .quantized import quantize_rows

        q8, s = quantize_rows(folded, xp=jnp)  # the ONE quantization law
        ct = q8.T
        deq = q8.astype(jnp.float32) * s[:, None]
        resid = jnp.sqrt(jnp.max(jnp.sum((folded - deq) ** 2, axis=1)))
        scales = s
    else:
        ct = folded.T
        resid = jnp.float32(0.0)
    return cp, wp, mask, ct, scales, bscale, resid


def build_device(
    vectors: jnp.ndarray,  # (N, D) device-resident
    weights: jnp.ndarray,  # (N,) device-resident
    batch_hint: int = 64,
    tile_cap: int = 2048,
    scan_dtype: str = "fp32",
) -> ChunkStore:
    """ChunkStore.build for DEVICE-resident inputs: all heavy prep runs
    on device (one jit), so building a 1M-row store costs no host
    transfer. Inputs are jit ARGUMENTS, not closures — closure-captured
    device arrays become lowering constants, which the axon
    remote-compile rejects above ~1 GB."""
    assert scan_dtype in ("fp32", "bf16", "int8"), scan_dtype
    n, d = vectors.shape
    n_pad = _cdiv(n, tile_cap) * tile_cap
    tile_n = transposed_tile_n(
        batch_hint, n_pad, d, cap=tile_cap,
        itemsize={"fp32": 4, "bf16": 2, "int8": 1}[scan_dtype],
    )
    cp, wp, mask, ct, scales, bscale, resid = _build_device_arrays(
        vectors, weights, n_pad=n_pad, scan_dtype=scan_dtype
    )
    return ChunkStore(
        corpus_t=ct,
        corpus=cp,
        weights=wp,
        mask=mask,
        n_real=n,
        tile_n=tile_n,
        bound_scale=float(bscale) or 1.0,
        scan_dtype=scan_dtype,
        scales=scales if scan_dtype == "int8" else None,
        resid_max=float(resid),
    )


@partial(jax.jit, static_argnames=("k", "mc", "tile_n", "n_real",
                                   "scan", "guarantee", "interpret"))
def chunk_stream_search(
    queries: jnp.ndarray,
    corpus_t: jnp.ndarray,
    corpus: jnp.ndarray,
    weights: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    mc: int = 0,
    tile_n: int = 0,
    n_real: int = 0,
    scan: str = "pallas",
    bound_scale: float = 1.2,
    scales: Optional[jnp.ndarray] = None,
    resid_max: float = 0.0,
    guarantee: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact weighted top-k over a ChunkStore. Returns (values, indices,
    certified). See module docstring for the certificate argument.

    scan — how pass 1 computes the chunk maxima:
      "pallas"   — the streaming Pallas kernel: (B, N) provably never
                   reaches HBM. Adapts to corpus_t's stored dtype (fp32
                   HIGHEST / bf16 single-pass / int8+scales), streaming
                   2x/4x less HBM for the reduced dtypes. Measured
                   fastest on v5e (config 6 round-4 A/B).
      "xla"      — plain XLA dot + fused chunk-max in corpus_t's dtype:
                   XLA may or may not materialize (B, N) (it tiles the
                   matmul itself and fuses reductions where it can).
      "xla_high" — XLA bf16x3 dot over fp32 corpus_t (3 MXU passes
                   instead of 6); certificate widens by
                   EPS_HIGH_DOT·bound_scale·‖q‖.
      "bf16"/"int8" — back-compat aliases for "xla" on a store of that
                   dtype.
    The certificate epsilon follows the STORED dtype: fp32 scans carry
    EPS_FP32_DOT (fold-vs-multiply rounding); bf16/int8 scans widen by
    the exact build-time residual ‖fold−dequant(quant(fold))‖
    (resid_max) plus the query-cast term. Pass-2 re-scoring is fp32
    HIGHEST for every mode, so certified results are exact regardless
    of scan dtype.
    """
    assert scan in ("pallas", "xla", "xla_high", "bf16", "int8"), scan
    b, d = queries.shape
    n = corpus.shape[0]
    nc = n // 128
    if mc <= 0:
        mc = max(2 * k, k + 16)
    mc = min(mc, nc)
    if tile_n == 0:
        tile_n = transposed_tile_n(
            b, n, d, itemsize=jnp.dtype(corpus_t.dtype).itemsize
        )
    if n_real == 0:
        n_real = n
    ct_dtype = corpus_t.dtype
    if scan == "bf16":
        assert ct_dtype == jnp.bfloat16, ct_dtype
        scan = "xla"
    elif scan == "int8":
        assert ct_dtype == jnp.int8, ct_dtype
        scan = "xla"
    if scan == "xla_high":
        assert ct_dtype == jnp.float32, ct_dtype

    if scan == "pallas":
        cm = chunk_maxima_transposed(queries, corpus_t, tile_n,
                                     scales=scales,
                                     interpret=interpret)  # (B, nc)
    elif ct_dtype == jnp.bfloat16:
        s = jnp.dot(
            queries.astype(jnp.bfloat16), corpus_t,
            preferred_element_type=jnp.float32,
        )
        cm = jnp.max(s.reshape(b, nc, 128), axis=2)
    elif ct_dtype == jnp.int8:
        assert scales is not None
        # int8 -> bf16 is exact for |v| <= 127; the fp32-accumulated MXU
        # dot then carries only the build-time quantization residual
        s = jnp.dot(
            queries.astype(jnp.bfloat16), corpus_t.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) * scales[None, :]
        cm = jnp.max(s.reshape(b, nc, 128), axis=2)
    else:
        precision = (
            jax.lax.Precision.HIGHEST if scan == "xla"
            else jax.lax.Precision.HIGH
        )
        s = jnp.dot(
            queries.astype(jnp.float32), corpus_t,
            preferred_element_type=jnp.float32, precision=precision,
        )
        cm = jnp.max(s.reshape(b, nc, 128), axis=2)
    # fully-padded chunks can never win; partially-padded chunks keep
    # their (possibly 0 from zero-padding) max — a sound upper bound
    nc_real = _cdiv(n_real, 128)
    if nc_real < nc:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, nc), 1)
        cm = jnp.where(col < nc_real, cm, -jnp.inf)
    cvals, cidx = jax.lax.top_k(cm, mc)

    # pass 2 processes QB queries per grid step; pad B up (padding rows
    # gather chunk 0 — valid DMAs, results sliced away)
    b_pad = _cdiv(b, QB) * QB
    if b_pad != b:
        q2 = jnp.pad(queries.astype(jnp.float32), ((0, b_pad - b), (0, 0)))
        cidx2 = jnp.pad(cidx, ((0, b_pad - b), (0, 0)))
    else:
        q2, cidx2 = queries, cidx
    raw = gather_rescore(q2, corpus, cidx2, mc, interpret=interpret)[:b]
    wb = jnp.take(weights.reshape(nc, 128), cidx, axis=0).reshape(b, mc * 128)
    mb = jnp.take(mask.reshape(nc, 128), cidx, axis=0).reshape(b, mc * 128)
    scores = raw * wb + mb

    vals, sel = jax.lax.top_k(scores, k)
    cols = (
        cidx[:, :, None] * 128
        + jax.lax.broadcasted_iota(jnp.int32, (b, mc, 128), 2)
    ).reshape(b, mc * 128)
    idx = jnp.take_along_axis(cols, sel, axis=1).astype(jnp.int32)
    # an unfetched row's TRUE weighted score can exceed its measured
    # chunk max by the scan rounding; pass-2 values are exact, so ONE
    # epsilon per scan mode suffices
    q_norms = jnp.sqrt(
        jnp.sum(queries * queries, axis=1, dtype=jnp.float32)
    )
    if ct_dtype in (jnp.bfloat16, jnp.int8):
        # Cauchy-Schwarz on the measured quantization residual, plus the
        # query bf16-cast term and the fp32 accumulation gap
        eps = (
            resid_max + (EPS_BF16_VEC + EPS_FP32_DOT) * bound_scale
        ) * q_norms
    elif scan == "xla_high":
        from .rerank import EPS_HIGH_DOT

        eps = EPS_HIGH_DOT * bound_scale * q_norms
    else:
        # fold-vs-multiply fp32 rounding gap (see module docstring)
        eps = EPS_FP32_DOT * bound_scale * q_norms
    chunk_bound = cvals[:, mc - 1] + eps
    if mc >= _cdiv(n_real, 128):
        # every real chunk was fetched and re-scored exactly: the result
        # is trivially exact, and the bound test (k-th vs the SMALLEST
        # fetched chunk max) would spuriously de-certify tiny corpora
        certified = jnp.ones((b,), bool)
    else:
        certified = vals[:, k - 1] >= chunk_bound

    if not guarantee:
        return vals, idx, certified

    def keep(_):
        return vals, idx

    def fallback(_):
        s = jnp.dot(
            queries, corpus.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * weights[None, :] + mask[None, :]
        v, i = jax.lax.top_k(s, k)
        return v, i.astype(jnp.int32)

    vals_g, idx_g = jax.lax.cond(jnp.all(certified), keep, fallback, None)
    return vals_g, idx_g, certified


def search(store: ChunkStore, queries, k: int, mc: int = 0,
           scan: Optional[str] = None, guarantee: bool = False,
           interpret: bool = False):
    """Convenience wrapper binding a ChunkStore's device state. scan
    defaults to the Pallas kernel, which adapts to the store's residency
    dtype (measured fastest on-chip for every dtype, config 6 r4)."""
    if scan is None:
        scan = "pallas"
    return chunk_stream_search(
        jnp.asarray(queries, jnp.float32), store.corpus_t, store.corpus,
        store.weights, store.mask, k=k, mc=mc, tile_n=store.tile_n,
        n_real=store.n_real, scan=scan, bound_scale=store.bound_scale,
        scales=store.scales, resid_max=store.resid_max,
        guarantee=guarantee, interpret=interpret,
    )
