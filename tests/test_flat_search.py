"""Flat-scan search kernel tests: exactness vs numpy ground truth,
level-weight fusion, padding mask, Pallas kernel parity (interpret mode
on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_icd10_tpu.ops.flat_topk import (
    flat_search_jax,
    pad_corpus,
    topk_reference,
    weighted_scores_reference,
)
from rag_icd10_tpu.ops.pallas_score import fused_weighted_scores


def make_problem(b=8, n=4096, d=128, seed=0, n_real=None):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    n_real = n_real or n
    c = rng.standard_normal((n_real, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    levels = rng.integers(1, 4, size=n_real)
    w = np.array([1.2, 1.0, 0.8], dtype=np.float32)[levels - 1]
    return q, c, w


class TestReferenceSearch:
    def test_matches_numpy(self):
        q, c, w = make_problem()
        cp, wp, m = pad_corpus(c, w, multiple=1024)
        vals, idx = flat_search_jax(q, cp, wp, m, k=10)
        expected = (q @ c.T) * w[None, :]
        evals, eidx = topk_reference(expected, 10)
        np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-5, atol=1e-5)
        # indices may differ on exact ties; verify score-equivalence
        got_scores = np.take_along_axis(expected, np.asarray(idx), axis=-1)
        np.testing.assert_allclose(got_scores, evals, rtol=1e-5, atol=1e-5)

    def test_padding_never_returned(self):
        q, c, w = make_problem(n_real=1000)
        cp, wp, m = pad_corpus(c, w, multiple=1024)
        assert cp.shape[0] == 1024
        vals, idx = flat_search_jax(q, cp, wp, m, k=50)
        assert int(np.asarray(idx).max()) < 1000
        assert np.asarray(vals).min() > -1e29

    def test_level_weights_change_ranking(self):
        """A slightly-worse cosine with weight 1.2 must outrank a slightly-
        better cosine with weight 0.8 (milvus_service.py:292-316 behavior)."""
        d = 128
        q = np.zeros((1, d), dtype=np.float32)
        q[0, 0] = 1.0
        c = np.zeros((2, d), dtype=np.float32)
        c[0, 0] = 0.95  # level 3 -> 0.95*0.8 = 0.76
        c[1, 0] = 0.85  # level 1 -> 0.85*1.2 = 1.02
        w = np.array([0.8, 1.2], dtype=np.float32)
        cp, wp, m = pad_corpus(c, w, multiple=8)
        vals, idx = flat_search_jax(q, cp, wp, m, k=2)
        assert np.asarray(idx)[0, 0] == 1
        np.testing.assert_allclose(np.asarray(vals)[0, 0], 1.02, rtol=1e-5)

    def test_weighted_scores_can_exceed_one(self):
        q, c, w = make_problem(b=1, n=8, d=128)
        c[0] = q[0]
        w[0] = 1.2
        cp, wp, m = pad_corpus(c, w, multiple=8)
        scores = weighted_scores_reference(
            jnp.asarray(q), jnp.asarray(cp), jnp.asarray(wp), jnp.asarray(m)
        )
        assert float(scores[0, 0]) == pytest.approx(1.2, rel=1e-5)


class TestPallasKernel:
    """Pallas kernel parity (interpret mode — tests run on CPU)."""

    def _fused(self, q, cp, wp, m, tile_n):
        import jax.experimental.pallas as pl
        from unittest import mock

        orig = pl.pallas_call

        def interp(*args, **kwargs):
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        with mock.patch.object(pl, "pallas_call", interp):
            # bypass the jit wrapper so the mock is seen
            return fused_weighted_scores.__wrapped__(
                jnp.asarray(q), jnp.asarray(cp), jnp.asarray(wp),
                jnp.asarray(m), tile_n=tile_n,
            )

    def test_matches_reference_fp32(self):
        q, c, w = make_problem(b=8, n=2048, d=128)
        cp, wp, m = pad_corpus(c, w, multiple=512)
        got = self._fused(q, cp, wp, m, tile_n=512)
        want = weighted_scores_reference(
            jnp.asarray(q), jnp.asarray(cp), jnp.asarray(wp), jnp.asarray(m)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_matches_reference_bf16(self):
        q, c, w = make_problem(b=8, n=1024, d=128)
        cp, wp, m = pad_corpus(c, w, multiple=512)
        got = self._fused(
            q.astype(jnp.bfloat16), cp.astype(jnp.bfloat16), wp, m, tile_n=512
        )
        want = weighted_scores_reference(
            jnp.asarray(q),
            jnp.asarray(cp).astype(jnp.bfloat16),
            jnp.asarray(wp),
            jnp.asarray(m),
        )
        # bf16 tolerance
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
        )

    def test_padding_masked(self):
        q, c, w = make_problem(b=8, n_real=700, n=1024, d=128)
        cp, wp, m = pad_corpus(c, w, multiple=512)
        got = np.asarray(self._fused(q, cp, wp, m, tile_n=512))
        assert (got[:, 700:] < -1e29).all()


class TestApproxTopK:
    def test_approx_recall_at_10(self):
        """approx_max_k recall@10 vs exact on realistic sizes (>= 0.99
        target from BASELINE.json)."""
        q, c, w = make_problem(b=16, n=40960, d=128, seed=3)
        cp, wp, m = pad_corpus(c, w, multiple=2048)
        _, exact_idx = flat_search_jax(q, cp, wp, m, k=10, method="exact")
        _, approx_idx = flat_search_jax(q, cp, wp, m, k=10, method="approx")
        exact_idx, approx_idx = np.asarray(exact_idx), np.asarray(approx_idx)
        recall = np.mean(
            [
                len(set(exact_idx[i]) & set(approx_idx[i])) / 10
                for i in range(len(exact_idx))
            ]
        )
        assert recall >= 0.99, recall
