"""Beyond-HBM capacity tier: device int8 sketch screen + host-RAM rows.

Regime: corpora too large for single-chip HBM even at int8 residency
(>~10.5M 768-d rows, benchmarks/run.py config 8). The reference's answer
at this scale is a Milvus *server* scanning its own RAM
(services/milvus_service.py:57-118, MILVUS_MODE=server); the TPU-native
answer keeps the screening math on the MXU:

- each corpus row is projected to ``d_sketch`` dims (PCA basis fit on a
  corpus sample, or a seeded orthonormal JL map) and quantized to int8
  with one fp32 scale per row → device residency is
  ``N x (d_sketch + 12)`` bytes (sketch + scale + weight + mask):
  100M x 768-d fp32 rows (307 GB) screen from a ~14 GB sketch;
- a query projects on device and int8-scans the sketch
  (ops/quantized.int8_search — same MXU int8 contraction as the
  quarter-memory path) for the top-``m`` candidates;
- only those ``m`` candidate ROWS are gathered from the host-resident
  fp32 matrix and re-ranked exactly (fp32 weighted inner product).

Contract: candidate SELECTION is approximate (screen recall is measured,
not asserted — bench config 9 / tests/test_sketch.py); returned SCORES
are exact fp32 weighted scores of the true rows — the same
selection-approximate / score-exact contract as the HNSW path
(index/vector_store.py _search_hnsw).

Steady-state transfer per batch: one (B, D) query up, one (B, m) index
down + (B, k) results — corpus-sized traffic never crosses the host link
after the one-time sketch upload. Enabled per-store with
STORE_DEVICE_DTYPE=host (the host matrix is the ONLY full-width copy) or
per-request with search(method="sketch") on any resident store (A/B).

NB: module import stays device-free (no module-level jnp values) so the
entry-point device-acquisition guards can arm first.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


def fit_projection(
    vectors: np.ndarray,
    d_sketch: int,
    kind: str = "pca",
    seed: int = 0,
    sample: int = 65536,
) -> np.ndarray:
    """Fit a (D, d_sketch) orthonormal projection on the host.

    kind="pca": top right-singular vectors of an (up to ``sample``-row,
    evenly strided) corpus sample — uncentered, because the metric is
    inner product and centering would shift scores. Concentrates the
    screen's 8 bits on the directions the corpus actually uses.
    kind="random": QR-orthonormalized gaussian (JL map) — data-free,
    used when rows stream past once (synthetic benches).
    """
    n, d = vectors.shape
    d_sketch = min(d_sketch, d)
    if kind == "random":
        rng = np.random.default_rng(seed)
        g = rng.standard_normal((d, d_sketch)).astype(np.float32)
        q, _ = np.linalg.qr(g)
        return np.ascontiguousarray(q[:, :d_sketch], dtype=np.float32)
    if kind != "pca":
        raise ValueError(f"unknown sketch projection kind {kind!r}")
    step = max(1, n // max(1, min(sample, n)))
    sub = np.asarray(vectors[::step][:sample], dtype=np.float32)
    # right-singular vectors of the sample row space
    _, _, vt = np.linalg.svd(sub, full_matrices=False)
    basis = vt[:d_sketch].T  # (D, d_sketch)
    if basis.shape[1] < d_sketch:  # degenerate sample rank < d_sketch
        pad = np.zeros((d, d_sketch - basis.shape[1]), dtype=np.float32)
        basis = np.concatenate([basis, pad], axis=1)
    return np.ascontiguousarray(basis, dtype=np.float32)


@dataclass
class SketchStore:
    """Device-resident screen state. ``proj`` also kept host-side so a
    rebuilt store can verify pairing without a device pull."""

    proj: np.ndarray  # (D, d_sketch) fp32 host copy
    proj_dev: object  # same, device
    sketch_q: object  # (N_pad, d_sketch) int8 device
    sketch_scale: object  # (N_pad,) fp32 device
    weights: object  # (N_pad,) fp32 device
    mask: object  # (N_pad,) additive fp32 device (0 real / -1e30 pad)
    n_real: int
    d_sketch: int
    # rows per screen step: 0 = one materializing int8 scan (fine up to
    # ~1M rows); >0 = lax.scan over chunks with a running top-m merge,
    # so the screen's transient is (B, chunk) instead of (B, N) — the
    # (B, N) int32+fp32 pair is ~2 GB/M-rows at B=256 and would OOM at
    # exactly the beyond-HBM sizes this tier exists for
    screen_chunk: int = 0

    @property
    def device_bytes(self) -> int:
        n_pad = int(self.sketch_q.shape[0])
        return n_pad * (self.d_sketch + 12)


def build_sketch(
    vectors: np.ndarray,
    weights: np.ndarray,
    d_sketch: int = 128,
    kind: str = "pca",
    seed: int = 0,
    pad_multiple: int = 1024,
    proj: Optional[np.ndarray] = None,
    chunk_rows: int = 1_048_576,
    screen_chunk: int = -1,
) -> SketchStore:
    """Project + quantize the corpus (chunked — the full (N, d_sketch)
    fp32 intermediate never materializes for huge N) and upload the
    screen arrays. ``proj`` overrides the fit (pairing a prebuilt basis).

    ``screen_chunk``: rows per search-time screen step (SketchStore
    field); -1 auto-selects — 65536 once the corpus is big enough that
    a materializing (B, N) screen would dominate HBM (>= 2^20 rows),
    else 0 (single scan). When chunked, padding rounds up to a multiple
    of the chunk so the scan reshape is exact (<= chunk-1 extra rows,
    <=6.5% at the 2^20 threshold, vanishing at the scales that matter).
    """
    import math

    import jax

    from .quantized import quantize_rows

    vectors = np.asarray(vectors)
    n, d = vectors.shape
    if proj is None:
        proj = fit_projection(vectors, d_sketch, kind=kind, seed=seed)
    d_sketch = proj.shape[1]
    if screen_chunk < 0:
        screen_chunk = 65536 if n >= (1 << 20) else 0
    granule = (
        math.lcm(pad_multiple, screen_chunk) if screen_chunk
        else pad_multiple
    )
    n_pad = ((n + granule - 1) // granule) * granule
    q8 = np.zeros((n_pad, d_sketch), dtype=np.int8)
    scale = np.ones((n_pad,), dtype=np.float32)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        s = np.asarray(vectors[lo:hi], dtype=np.float32) @ proj
        q8[lo:hi], scale[lo:hi] = quantize_rows(s)
    wp = np.zeros((n_pad,), dtype=np.float32)
    wp[:n] = np.asarray(weights, dtype=np.float32)
    mask = np.full((n_pad,), -1e30, dtype=np.float32)
    mask[:n] = 0.0
    return SketchStore(
        proj=proj,
        proj_dev=jax.device_put(proj),
        sketch_q=jax.device_put(q8),
        sketch_scale=jax.device_put(scale),
        weights=jax.device_put(wp),
        mask=jax.device_put(mask),
        n_real=n,
        d_sketch=d_sketch,
        screen_chunk=screen_chunk,
    )


def _project(q, p):
    import jax
    import jax.numpy as jnp

    return jnp.dot(
        q.astype(jnp.float32), p,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


_project_jit = None


def _projector():
    """Module-level jitted projection (lazy so import stays device-free).
    A nested @jax.jit would be a FRESH callable per search — retrace +
    compile-cache lookup on every hot-path call."""
    global _project_jit
    if _project_jit is None:
        import jax

        _project_jit = jax.jit(_project)
    return _project_jit


_screen_chunked_jit = None


def _screen_chunked():
    """Lazily jitted chunked int8 screen (import stays device-free).

    Same math as quantized.int8_search (one int8 MXU contraction per
    chunk, identical query quantization and score epilogue) but scanned
    over row chunks with an exact running top-m merge: the transient is
    (B, chunk) int32+fp32 instead of (B, N) — at the beyond-HBM sizes
    this tier advertises (100M rows), the materializing screen's
    transients alone (~800 GB at B=256) exceed any HBM. The running
    merge is exact: after every step the carry holds the true top-m of
    all rows scanned so far (concat + top_k is a monotone refinement).
    """
    global _screen_chunked_jit
    if _screen_chunked_jit is None:
        import jax
        import jax.numpy as jnp
        from functools import partial

        @partial(jax.jit, static_argnames=("m", "chunk"))
        def screen(z, q8, scale, w, mask, m: int, chunk: int):
            b = z.shape[0]
            n_pad = q8.shape[0]
            nc = n_pad // chunk
            q_absmax = jnp.max(jnp.abs(z), axis=1)
            q_scale = jnp.where(q_absmax > 0, q_absmax / 127.0, 1.0)
            q_i8 = jnp.clip(
                jnp.round(z / q_scale[:, None]), -127, 127
            ).astype(jnp.int8)
            q8c = q8.reshape(nc, chunk, -1)
            swc = (scale * w).reshape(nc, chunk)
            mc = mask.reshape(nc, chunk)
            base = jnp.arange(nc, dtype=jnp.int32) * chunk
            kc = min(m, chunk)

            def step(carry, xs):
                cv, ci = carry
                q8_c, sw_c, m_c, b0 = xs
                acc = jax.lax.dot_general(
                    q_i8, q8_c,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (B, chunk) int32
                s = (
                    acc.astype(jnp.float32)
                    * q_scale[:, None]
                    * sw_c[None, :]
                    + m_c[None, :]
                )
                v, i = jax.lax.top_k(s, kc)
                i = i.astype(jnp.int32) + b0
                nv, sel = jax.lax.top_k(
                    jnp.concatenate([cv, v], axis=1), m
                )
                ni = jnp.take_along_axis(
                    jnp.concatenate([ci, i], axis=1), sel, axis=1
                )
                return (nv, ni), None

            init = (
                jnp.full((b, m), -jnp.inf, jnp.float32),
                jnp.zeros((b, m), jnp.int32),
            )
            (vals, idx), _ = jax.lax.scan(step, init, (q8c, swc, mc, base))
            return vals, idx

        _screen_chunked_jit = screen
    return _screen_chunked_jit


def sketch_screen(store: SketchStore, queries, m: int):
    """Device screen: project the (B, D) fp32 queries onto the sketch
    basis and int8-scan for the top-m candidate indices (B, m).
    Accepts host or device query arrays; returns a device array.
    screen_chunk > 0 routes to the chunked scan (the materializing
    (B, N) screen cannot exist at beyond-HBM corpus sizes)."""
    from .quantized import int8_search

    m = min(m, store.n_real)
    z = _projector()(queries, store.proj_dev)
    if store.screen_chunk:
        _, idx = _screen_chunked()(
            z, store.sketch_q, store.sketch_scale, store.weights,
            store.mask, m=m, chunk=int(store.screen_chunk),
        )
        return idx
    _, idx = int8_search(
        z, store.sketch_q, store.sketch_scale, store.weights, store.mask,
        k=m,
    )
    return idx


def sketch_search_host_rerank(
    store: SketchStore,
    host_vectors: np.ndarray,
    host_weights: np.ndarray,
    queries,
    k: int,
    m: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full capacity-tier search: device screen → host gather of the m
    candidate rows → exact fp32 weighted re-rank. Returns (vals, idx)
    of shape (B, k); scores are exact fp32 — only selection can miss
    (screen recall, measured per corpus geometry).

    ``m`` defaults to max(8k, 64): the screen over-fetch that buys
    recall back from the 8-bit, d_sketch-dim selection.
    """
    if m <= 0:
        m = max(8 * k, 64)
    # an operator-configured fetch (SKETCH_FETCH) below k would silently
    # truncate results to m rows — the fetch must at least cover k
    m = max(m, k)
    m = min(m, store.n_real)
    idx_m = np.asarray(sketch_screen(store, queries, m))  # (B, m)
    q = np.asarray(queries, dtype=np.float32)
    safe = np.clip(idx_m, 0, store.n_real - 1)
    cand = host_vectors[safe]  # (B, m, D) host gather
    exact = np.einsum("bd,bmd->bm", q, cand) * host_weights[safe]
    exact = np.where((idx_m >= 0) & (idx_m < store.n_real), exact, -np.inf)
    k = min(k, m)
    order = np.argsort(-exact, axis=1)[:, :k]
    vals = np.take_along_axis(exact, order, axis=1)
    idx = np.take_along_axis(safe, order, axis=1)
    return vals.astype(np.float32), idx.astype(np.int32)
