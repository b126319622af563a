"""Streaming in-kernel top-k: exactness parity vs the materialized path.

The kernel keeps the running (B, K) top-k in VMEM across corpus tiles —
the (B, N) score matrix never reaches HBM (SURVEY §7.1). Exactness is
certified in-kernel per tile (slot-3rd-max bound) with an exact re-merge
fallback, so these tests assert FULL parity, including an adversarial
case engineered to force the fallback. CPU runs use interpret mode; the
compiled Mosaic path is exercised by bench.py / benchmarks on the real
chip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rag_icd10_tpu.ops.pallas_score import streaming_topk


def _ref(q, c, w, m, k):
    scores = (q @ c.T) * w[None, :] + m[None, :]
    idx = np.argsort(-scores, axis=1)[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx


def _run(q, c, w, m, k, tile_n=2048):
    return streaming_topk(
        jnp.array(q), jnp.array(c), jnp.array(w), jnp.array(m),
        k=k, tile_n=tile_n, interpret=True,
    )


class TestStreamingTopK:
    @pytest.mark.parametrize("k", [1, 5, 10, 32])
    def test_random_parity(self, k):
        rng = np.random.default_rng(k)
        q = rng.standard_normal((8, 128)).astype(np.float32)
        c = rng.standard_normal((4096, 128)).astype(np.float32)
        w = rng.choice([0.8, 1.0, 1.2], 4096).astype(np.float32)
        m = np.zeros(4096, np.float32)
        vals, idx = _run(q, c, w, m, k)
        rv, ri = _ref(q, c, w, m, k)
        np.testing.assert_allclose(np.asarray(vals), rv, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), ri)

    def test_slot_collision_forces_exact_fallback(self):
        """8 of the global top values share one 128-stride lane slot —
        more than the slot-state depth S (5 at k=16), so the slot pass
        provably misses some; the certified bound must trigger the exact
        fallback."""
        from rag_icd10_tpu.ops.pallas_score import slot_depth

        rng = np.random.default_rng(99)
        n, d, k = 4096, 128, 16
        assert slot_depth(k) < 8
        c = (rng.standard_normal((n, d)) * 0.01).astype(np.float32)
        t = rng.standard_normal(d).astype(np.float32)
        t /= np.linalg.norm(t)
        cols = [3 + 128 * i for i in range(8)]  # all in lane slot 3
        for rank, col in enumerate(cols):
            c[col] = t * (10.0 - rank)
        q = np.tile(t, (8, 1)).astype(np.float32)
        w = np.ones(n, np.float32)
        m = np.zeros(n, np.float32)
        vals, idx = _run(q, c, w, m, k)
        rv, ri = _ref(q, c, w, m, k)
        np.testing.assert_allclose(np.asarray(vals), rv, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), ri)

    def test_padding_mask_respected(self):
        rng = np.random.default_rng(7)
        q = rng.standard_normal((8, 128)).astype(np.float32)
        c = rng.standard_normal((2048, 128)).astype(np.float32)
        w = np.ones(2048, np.float32)
        m = np.zeros(2048, np.float32)
        m[1500:] = -1e9
        _, idx = _run(q, c, w, m, 10, tile_n=2048)
        assert np.asarray(idx).max() < 1500

    def test_small_tile_many_merges(self):
        """Many tiles exercise the running-state merge across grid steps
        (state carried in VMEM-resident output blocks)."""
        rng = np.random.default_rng(21)
        q = rng.standard_normal((8, 128)).astype(np.float32)
        c = rng.standard_normal((4096, 128)).astype(np.float32)
        w = rng.choice([0.8, 1.0, 1.2], 4096).astype(np.float32)
        m = np.zeros(4096, np.float32)
        vals, idx = _run(q, c, w, m, 10, tile_n=256)
        rv, ri = _ref(q, c, w, m, 10)
        np.testing.assert_allclose(np.asarray(vals), rv, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), ri)

    def test_slot_depth_scales_with_k(self):
        from rag_icd10_tpu.ops.pallas_score import slot_depth

        assert slot_depth(1) == 4
        assert slot_depth(32) == 8
        assert slot_depth(64) == 14
        assert slot_depth(128) == 16

    def test_fused_search_streaming_method(self):
        """fused_search(method='streaming') routes into the kernel and
        agrees with the exact materialized path."""
        from rag_icd10_tpu.ops.pallas_score import fused_search

        rng = np.random.default_rng(11)
        q = rng.standard_normal((8, 128)).astype(np.float32)
        c = rng.standard_normal((2048, 128)).astype(np.float32)
        w = np.ones(2048, np.float32)
        m = np.zeros(2048, np.float32)
        sv, si = streaming_topk(
            jnp.array(q), jnp.array(c), jnp.array(w), jnp.array(m),
            k=8, tile_n=2048, interpret=True)
        rv, ri = _ref(q, c, w, m, 8)
        np.testing.assert_array_equal(np.asarray(si), ri)
        np.testing.assert_allclose(np.asarray(sv), rv, rtol=1e-5)
