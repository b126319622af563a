"""bf16-scan + certified fp32 re-rank: exactness vs numpy ground truth,
certificate soundness (adversarial near-ties must de-certify), full-fetch
degenerate case."""

import numpy as np
import pytest

from rag_icd10_tpu.ops.flat_topk import pad_corpus, topk_reference
from rag_icd10_tpu.ops.rerank import (
    EPS_BF16_DOT,
    bf16_rerank_search,
    bf16_scan_bound,
)


def make_problem(b=8, n_real=3000, d=128, seed=0, multiple=1024):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    c = rng.standard_normal((n_real, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    levels = rng.integers(1, 4, size=n_real)
    w = np.array([1.2, 1.0, 0.8], dtype=np.float32)[levels - 1]
    cp, wp, m = pad_corpus(c, w, multiple=multiple)
    expected = (q @ c.T) * w[None, :]
    return q, c, w, cp, wp, m, expected


class TestBf16RerankExactness:
    def test_certified_and_exact_vs_numpy(self):
        q, c, w, cp, wp, m, expected = make_problem()
        cb = cp.astype(np.float32)  # cast happens inside via corpus dtype
        import jax.numpy as jnp

        vals, idx, cert = bf16_rerank_search(
            q, jnp.asarray(cp).astype(jnp.bfloat16), cp, wp, m, k=10
        )
        vals, idx, cert = np.asarray(vals), np.asarray(idx), np.asarray(cert)
        assert cert.all(), "random spread data must certify"
        evals, eidx = topk_reference(expected, 10)
        np.testing.assert_allclose(vals, evals, rtol=1e-5, atol=1e-5)
        # compare sets (exact ties may permute)
        for row_got, row_exp in zip(idx, eidx):
            assert set(row_got.tolist()) == set(row_exp.tolist())

    def test_full_fetch_degenerate(self):
        """m >= N fetches everything; certificate must hold trivially and
        the result is exact regardless of scan noise."""
        q, c, w, cp, wp, m, expected = make_problem(n_real=500, multiple=512)
        import jax.numpy as jnp

        vals, idx, cert = bf16_rerank_search(
            q, jnp.asarray(cp).astype(jnp.bfloat16), cp, wp, m,
            k=5, m=cp.shape[0],
        )
        assert np.asarray(cert).all()
        evals, eidx = topk_reference(expected, 5)
        np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-5, atol=1e-5)

    def test_pallas_interpret_parity(self):
        """The slot-candidates kernel path (interpret mode on CPU) must
        agree with ground truth and certify on spread data."""
        q, c, w, cp, wp, m, expected = make_problem(b=8, n_real=3000, d=128)
        import jax.numpy as jnp

        vals, idx, cert = bf16_rerank_search(
            q, jnp.asarray(cp).astype(jnp.bfloat16), cp, wp, m,
            k=10, tile_n=1024, scan="pallas", interpret=True,
        )
        vals, idx, cert = np.asarray(vals), np.asarray(idx), np.asarray(cert)
        assert cert.all()
        evals, eidx = topk_reference(expected, 10)
        np.testing.assert_allclose(vals, evals, rtol=1e-5, atol=1e-5)
        for row_got, row_exp in zip(idx, eidx):
            assert set(row_got.tolist()) == set(row_exp.tolist())

    def test_adversarial_ties_decertify(self):
        """Rows k..m within the bf16 error of each other: the certificate
        must refuse (the scan order is untrustworthy there)."""
        d, n_real = 128, 2048
        rng = np.random.default_rng(3)
        base = rng.standard_normal(d).astype(np.float32)
        base /= np.linalg.norm(base)
        # corpus = tiny perturbations of one direction -> all scores within
        # ~1e-5 of each other, far below the bf16 bound
        c = base[None, :] + 1e-6 * rng.standard_normal((n_real, d)).astype(
            np.float32
        )
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        w = np.ones(n_real, dtype=np.float32)
        cp, wp, m = pad_corpus(c, w, multiple=1024)
        q = base[None, :].copy()
        import jax.numpy as jnp

        vals, idx, cert = bf16_rerank_search(
            q, jnp.asarray(cp).astype(jnp.bfloat16), cp, wp, m, k=10
        )
        assert not np.asarray(cert).any()
        # guarantee=True: the in-program fallback must still deliver the
        # exact fp32 result despite the failed certificate
        expected = (q @ c.T) * w[None, :]
        evals, _ = topk_reference(expected, 10)
        np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-5,
                                   atol=1e-5)

    def test_guarantee_false_returns_raw(self):
        """guarantee=False skips the in-program fallback; the caller sees
        the uncertified flag and handles it."""
        q, c, w, cp, wp, m, _ = make_problem(b=4, n_real=1500, d=128)
        import jax.numpy as jnp

        vals, idx, cert = bf16_rerank_search(
            q, jnp.asarray(cp).astype(jnp.bfloat16), cp, wp, m,
            k=5, guarantee=False,
        )
        assert np.asarray(cert).all()
        assert np.asarray(vals).shape == (4, 5)

    def test_bound_is_sound(self):
        """Measured |bf16 dot - fp32 dot| must sit below the certified
        bound for random unit vectors."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        q = rng.standard_normal((16, 768)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        c = rng.standard_normal((4096, 768)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        exact = q @ c.T
        approx = np.asarray(
            jnp.dot(
                jnp.asarray(q).astype(jnp.bfloat16),
                jnp.asarray(c).astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32,
            )
        )
        err = np.abs(approx - exact).max()
        bound = float(bf16_scan_bound(jnp.ones(1), w_max=1.0)[0])
        assert err < bound, (err, bound)
        # and the bound is not absurdly loose (within ~20x of observed)
        assert bound < max(err, 1e-4) * 20


class TestChunkSelectSearch:
    def test_exact_mode_parity_and_certificate(self):
        from rag_icd10_tpu.ops.rerank import chunk_select_search

        q, c, w, cp, wp, m, expected = make_problem()
        vals, idx, cert = chunk_select_search(q, cp, wp, m, k=10)
        vals, idx, cert = np.asarray(vals), np.asarray(idx), np.asarray(cert)
        assert cert.all()
        evals, eidx = topk_reference(expected, 10)
        np.testing.assert_allclose(vals, evals, rtol=1e-5, atol=1e-5)
        for row_got, row_exp in zip(idx, eidx):
            assert set(row_got.tolist()) == set(row_exp.tolist())

    def test_bf16_mode_parity(self):
        import jax.numpy as jnp

        from rag_icd10_tpu.ops.rerank import chunk_select_search

        q, c, w, cp, wp, m, expected = make_problem(seed=5)
        vals, idx, cert = chunk_select_search(
            q, jnp.asarray(cp).astype(jnp.bfloat16), wp, m, k=10,
            corpus_f32=jnp.asarray(cp), scan_precision="bf16",
        )
        vals, idx = np.asarray(vals), np.asarray(idx)
        evals, eidx = topk_reference(expected, 10)
        np.testing.assert_allclose(vals, evals, rtol=1e-5, atol=1e-5)
        for row_got, row_exp in zip(idx, eidx):
            assert set(row_got.tolist()) == set(row_exp.tolist())

    def test_ties_fall_back_exactly(self):
        """All-identical rows decertify every chunk boundary; the
        guarantee fallback must still return the exact fp32 result."""
        import jax.numpy as jnp

        from rag_icd10_tpu.ops.rerank import chunk_select_search

        d, n_real = 128, 2048
        rng = np.random.default_rng(9)
        base = rng.standard_normal(d).astype(np.float32)
        base /= np.linalg.norm(base)
        c = base[None, :] + 1e-7 * rng.standard_normal((n_real, d)).astype(
            np.float32
        )
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        w = np.ones(n_real, np.float32)
        cp, wp, m = pad_corpus(c, w, multiple=1024)
        q = base[None, :].copy()
        vals, idx, cert = chunk_select_search(
            q, jnp.asarray(cp).astype(jnp.bfloat16), wp, m, k=10,
            corpus_f32=jnp.asarray(cp), scan_precision="bf16",
        )
        expected = (q @ c.T) * w[None, :]
        evals, _ = topk_reference(expected, 10)
        np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-5,
                                   atol=1e-5)

    def test_padding_never_selected(self):
        from rag_icd10_tpu.ops.rerank import chunk_select_search

        q, c, w, cp, wp, m, _ = make_problem(n_real=1100, multiple=1024)
        _, idx, _ = chunk_select_search(q, cp, wp, m, k=10)
        assert np.asarray(idx).max() < 1100

    def test_high_mode_set_exact(self):
        """scan_precision='high' (bf16x3): the returned SET must equal
        the exact top-k and certify on spread data (on CPU the HIGH
        scan is plain fp32, so values match too)."""
        from rag_icd10_tpu.ops.rerank import chunk_select_search

        q, c, w, cp, wp, m, expected = make_problem(seed=7)
        vals, idx, cert = chunk_select_search(
            q, cp, wp, m, k=10, scan_precision="high",
        )
        vals, idx, cert = np.asarray(vals), np.asarray(idx), np.asarray(cert)
        assert cert.all()
        evals, eidx = topk_reference(expected, 10)
        np.testing.assert_allclose(vals, evals, rtol=1e-4, atol=1e-4)
        for row_got, row_exp in zip(idx, eidx):
            assert set(row_got.tolist()) == set(row_exp.tolist())

    def test_high_mode_ties_fall_back(self):
        """Near-identical rows decertify the HIGH margin; the guarantee
        fallback must still deliver the exact set."""
        import jax.numpy as jnp

        from rag_icd10_tpu.ops.rerank import chunk_select_search

        d, n_real = 128, 2048
        rng = np.random.default_rng(13)
        base = rng.standard_normal(d).astype(np.float32)
        base /= np.linalg.norm(base)
        c = base[None, :] + 1e-8 * rng.standard_normal((n_real, d)).astype(
            np.float32
        )
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        w = np.ones(n_real, np.float32)
        cp, wp, m = pad_corpus(c, w, multiple=1024)
        q = base[None, :].copy()
        vals, idx, cert = chunk_select_search(
            q, cp, wp, m, k=10, scan_precision="high",
        )
        assert not np.asarray(cert).any()
        expected = (q @ c.T) * w[None, :]
        evals, _ = topk_reference(expected, 10)
        np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-4,
                                   atol=1e-4)
