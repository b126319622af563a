"""Multi-chip sharding tests on the virtual 8-device CPU mesh:
TP/DP train step, corpus-sharded search, graft entry points."""

import numpy as np
import optax
import pytest

import jax

from rag_icd10_tpu.models.bert import BertArch, SentenceBert, init_params
from rag_icd10_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
)
from rag_icd10_tpu.parallel.search import ShardedFlatSearcher
from rag_icd10_tpu.parallel.train import (
    contrastive_loss,
    contrastive_loss_masked,
    init_train_state,
    make_sharded_train_step,
    make_train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

TINY = BertArch(
    vocab_size=128,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    intermediate_size=128,
    max_position_embeddings=32,
)


def tiny_batch(b=8, seq=16, seed=0):
    r = np.random.default_rng(seed)

    def side(s):
        ids = r.integers(1, 128, size=(b, seq)).astype(np.int32)
        return ids, np.ones_like(ids), np.zeros_like(ids)

    a_ids, a_mask, a_types = side(1)
    b_ids, b_mask, b_types = side(2)
    return {
        "a_ids": a_ids, "a_mask": a_mask, "a_types": a_types,
        "b_ids": b_ids, "b_mask": b_mask, "b_types": b_types,
    }


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(n_devices=8, dp=2, tp=4)
        assert mesh.shape == {"dp": 2, "tp": 4}

    def test_param_shardings_cover_tree(self):
        params = init_params(TINY, seed=0)
        mesh = make_mesh(n_devices=8, dp=2, tp=4)
        shardings = param_shardings(mesh, params)
        flat_p = jax.tree_util.tree_leaves(params)
        flat_s = jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec")
        )
        assert len(flat_p) == len(flat_s)

    def test_tp_actually_shards_attention(self):
        params = init_params(TINY, seed=0)
        mesh = make_mesh(n_devices=8, dp=2, tp=4)
        shardings = param_shardings(mesh, params)
        q_spec = shardings["bert"]["layer_0"]["attention"]["query"]["kernel"].spec
        assert q_spec == jax.sharding.PartitionSpec(None, "tp")
        out_spec = shardings["bert"]["layer_0"]["attention"]["out"]["kernel"].spec
        assert out_spec == jax.sharding.PartitionSpec("tp", None)


class TestTraining:
    def test_contrastive_loss_perfect_alignment(self):
        z = np.eye(4, 8, dtype=np.float32)
        loss, acc = contrastive_loss(z, z, temperature=0.05)
        assert float(acc) == 1.0
        assert float(loss) < 0.01

    def test_single_device_step_reduces_loss(self):
        params = init_params(TINY, seed=0)
        optimizer = optax.adamw(1e-3)
        opt_state = optimizer.init(params)
        step = jax.jit(make_train_step(TINY, optimizer))
        batch = tiny_batch()
        losses = []
        for _ in range(5):
            params, opt_state, metrics = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]

    def test_sharded_init_keeps_warm_started_state(self):
        """--dp --init-from must resume from the checkpoint: passing
        params/opt_state into init_train_state shards the existing host
        trees instead of re-initializing (this used to silently discard
        the warm start and train — and eval-gate — fresh random weights)."""
        host_params = init_params(TINY, seed=123)
        optimizer = optax.adamw(1e-4)
        host_opt = optimizer.init(host_params)
        mesh = make_mesh(n_devices=8, dp=2, tp=4)
        params, opt_state, optimizer = init_train_state(
            TINY, mesh=mesh, seed=0, optimizer=optimizer,
            params=host_params, opt_state=host_opt,
        )
        fresh = init_params(TINY, seed=0)
        flat_got = jax.tree_util.tree_leaves(jax.device_get(params))
        flat_want = jax.tree_util.tree_leaves(host_params)
        flat_fresh = jax.tree_util.tree_leaves(fresh)
        assert any(
            not np.allclose(g, f)
            for g, f in zip(flat_want, flat_fresh)
        ), "seeds 123 vs 0 should differ — test is vacuous otherwise"
        for got, want in zip(flat_got, flat_want):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # the sharded state must still drive a step
        step = make_sharded_train_step(TINY, mesh, optimizer)
        batch = tiny_batch(b=8)
        b_shard = batch_sharding(mesh)
        batch = {k: jax.device_put(v, b_shard) for k, v in batch.items()}
        params, opt_state, metrics = step(params, opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_step_runs_and_matches_semantics(self):
        mesh = make_mesh(n_devices=8, dp=2, tp=4)
        params, opt_state, optimizer = init_train_state(TINY, mesh=mesh)
        step = make_sharded_train_step(TINY, mesh, optimizer)
        batch = tiny_batch(b=8)
        b_shard = batch_sharding(mesh)
        batch = {k: jax.device_put(v, b_shard) for k, v in batch.items()}
        params, opt_state, metrics = step(params, opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert 0.0 <= float(metrics["accuracy"]) <= 1.0


class TestWeightedLoss:
    """--weighted-loss semantics: logits rank by the SERVED score w·cos
    (store level weights fused into search), so a gold row whose raw
    cosine wins but whose weighted score loses to a level-advantaged
    rival must register as a ranking error — that is the weight-inversion
    miss class scripts/analyze_misses.py measured at 97% of exact-tier
    raw recall@1 misses."""

    def _rows(self):
        # row 0: gold cos .9 (w .8) vs rival cos .8 (w 1.2):
        #   raw .9 > .8 but weighted .72 < .96 — the inversion case
        # row 1: orthogonal to row 0's columns, unambiguous either way
        za = np.array([[1, 0, 0, 0], [0, 0, 0, 1]], np.float32)
        zb = np.array(
            [[0.9, np.sqrt(1 - 0.81), 0, 0], [0.8, 0, 0, 0.6]], np.float32
        )
        ga = np.array([0, 1], np.int32)
        gb = np.array([2, 3], np.int32)
        return za, zb, ga, gb

    def test_unweighted_ranks_raw_cosine(self):
        za, zb, ga, gb = self._rows()
        _, acc = contrastive_loss_masked(za, zb, ga, gb)
        assert float(acc) == 1.0

    def test_weight_folding_exposes_inversion(self):
        za, zb, ga, gb = self._rows()
        w_b = np.array([0.8, 1.2], np.float32)
        loss_w, acc = contrastive_loss_masked(za, zb, ga, gb, w_b=w_b)
        assert float(acc) == 0.5  # row 0 now loses to the x1.2 rival
        loss_u, _ = contrastive_loss_masked(za, zb, ga, gb)
        assert float(loss_w) > float(loss_u)

    def test_weighted_hard_negative_column(self):
        za, _, ga, gb = self._rows()
        # positives pose no rivalry (col1 orthogonal to row0) so the
        # flip below is attributable to the weighted hn column alone
        zb = np.array(
            [[0.9, np.sqrt(1 - 0.81), 0, 0], [0, 0, 0.8, 0.6]], np.float32
        )
        # hard negatives: row0's column has raw cos .8 < gold's .9 but
        # weight 1.2 folds it to .96 > .72
        zh = np.array([[0.8, 0, 0.6, 0], [0, 1, 0, 0]], np.float32)
        hg = np.array([4, 5], np.int32)
        _, acc_u = contrastive_loss_masked(za, zb, ga, gb, zh, hg)
        assert float(acc_u) == 1.0
        w_b = np.array([0.8, 1.2], np.float32)
        w_h = np.array([1.2, 1.0], np.float32)
        _, acc_w = contrastive_loss_masked(
            za, zb, ga, gb, zh, hg, w_b=w_b, w_h=w_h
        )
        assert float(acc_w) == 0.5

    def test_train_step_accepts_weight_columns(self):
        params = init_params(TINY, seed=0)
        optimizer = optax.adamw(1e-3)
        opt_state = optimizer.init(params)
        step = jax.jit(make_train_step(TINY, optimizer))
        b = 8
        batch = tiny_batch(b=b)
        r = np.random.default_rng(3)
        h_ids = r.integers(1, 128, size=(b, 16)).astype(np.int32)
        batch.update(
            h_ids=h_ids, h_mask=np.ones_like(h_ids),
            h_types=np.zeros_like(h_ids),
            group_a=np.arange(b, dtype=np.int32),
            group_b=np.arange(b, b * 2, dtype=np.int32),
            h_group=np.arange(b * 2, b * 3, dtype=np.int32),
            w_b=r.choice([0.8, 1.0, 1.2], b).astype(np.float32),
            w_h=r.choice([0.8, 1.0, 1.2], b).astype(np.float32),
        )
        losses = []
        for _ in range(5):
            params, opt_state, m = step(params, opt_state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all() and losses[-1] < losses[0]

    def test_sharded_step_accepts_weight_columns(self):
        mesh = make_mesh(n_devices=8, dp=2, tp=4)
        params, opt_state, optimizer = init_train_state(TINY, mesh=mesh)
        step = make_sharded_train_step(TINY, mesh, optimizer)
        b = 8
        batch = tiny_batch(b=b)
        r = np.random.default_rng(4)
        h_ids = r.integers(1, 128, size=(b, 16)).astype(np.int32)
        batch.update(
            h_ids=h_ids, h_mask=np.ones_like(h_ids),
            h_types=np.zeros_like(h_ids),
            group_a=np.arange(b, dtype=np.int32),
            group_b=np.arange(b, b * 2, dtype=np.int32),
            h_group=np.arange(b * 2, b * 3, dtype=np.int32),
            w_b=r.choice([0.8, 1.0, 1.2], b).astype(np.float32),
            w_h=r.choice([0.8, 1.0, 1.2], b).astype(np.float32),
        )
        b_shard = batch_sharding(mesh)
        batch = {k: jax.device_put(v, b_shard) for k, v in batch.items()}
        params, opt_state, m = step(params, opt_state, batch)
        assert np.isfinite(float(m["loss"]))


class TestShardedSearch:
    def test_matches_single_device_exact(self):
        rng = np.random.default_rng(0)
        n, d, b, k = 1000, 64, 4, 10
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        weights = np.array([1.2, 1.0, 0.8], dtype=np.float32)[
            rng.integers(0, 3, size=n)
        ]
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)

        mesh = make_mesh(n_devices=8, dp=8, tp=1, axis_names=("dp", "tp"))
        searcher = ShardedFlatSearcher(corpus, weights, mesh, axis="dp")
        vals, idx = searcher.search(q, k)

        expected = (q @ corpus.T) * weights[None, :]
        eidx = np.argsort(-expected, axis=1)[:, :k]
        evals = np.take_along_axis(expected, eidx, axis=1)
        np.testing.assert_allclose(vals, evals, rtol=1e-4, atol=1e-5)
        # indices may differ only on exact ties
        got_scores = np.take_along_axis(expected, idx, axis=1)
        np.testing.assert_allclose(got_scores, evals, rtol=1e-4, atol=1e-5)

    def test_method_knobs_honored_per_shard(self):
        """Per-request search methods route into the per-shard kernel
        instead of being silently ignored (VERDICT r2 #7): exact/fast
        return the exact weighted top-k, approx stays high-recall, and
        unsupported methods raise for the API to surface as 400."""
        rng = np.random.default_rng(2)
        n, d, b, k = 1536, 64, 4, 10
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        weights = np.array([1.2, 1.0, 0.8], dtype=np.float32)[
            rng.integers(0, 3, size=n)
        ]
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        expected = (q @ corpus.T) * weights[None, :]
        eidx = np.argsort(-expected, axis=1)[:, :k]
        evals = np.take_along_axis(expected, eidx, axis=1)

        mesh = make_mesh(n_devices=8, dp=8, tp=1)
        searcher = ShardedFlatSearcher(corpus, weights, mesh, axis="dp")
        for method in ("exact", "fast", "streaming", "auto"):
            vals, idx = searcher.search(q, k, method=method)
            np.testing.assert_allclose(
                vals, evals, rtol=1e-4, atol=1e-5, err_msg=method
            )
            got = np.take_along_axis(expected, idx, axis=1)
            np.testing.assert_allclose(
                got, evals, rtol=1e-4, atol=1e-5, err_msg=method
            )
        # approx: recall >= 0.9 against the exact set per query
        vals, idx = searcher.search(q, k, method="approx")
        for row_idx, row_eidx in zip(idx, eidx):
            assert len(set(row_idx) & set(row_eidx)) >= int(0.9 * k)
        with pytest.raises(ValueError, match="not available"):
            searcher.search(q, k, method="hnsw")

    def test_padding_not_returned(self):
        rng = np.random.default_rng(1)
        corpus = rng.standard_normal((777, 64)).astype(np.float32)
        weights = np.ones(777, dtype=np.float32)
        mesh = make_mesh(n_devices=8, dp=8, tp=1)
        searcher = ShardedFlatSearcher(corpus, weights, mesh, axis="dp")
        _, idx = searcher.search(rng.standard_normal((2, 64)).astype(np.float32), 20)
        assert idx.max() < 777


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent.parent))
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)

    def test_entry_compiles_tiny(self):
        """entry() returns full BERT-base (driver compile-checks on real
        TPU); here only validate the callable contract shape-wise by
        jitting a tiny clone."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent.parent))
        import __graft_entry__

        fn, args = __graft_entry__.entry()
        assert callable(fn) and len(args) == 4


class TestStoreShardedBackend:
    """VectorStore serves through the sharded backend when forced on
    (auto mode only activates on multi-TPU; tests run the 8-device CPU
    mesh)."""

    def _store(self, n=640, d=64):
        from rag_icd10_tpu.config import StoreConfig
        from rag_icd10_tpu.data.corpus import synthetic_corpus
        from rag_icd10_tpu.index.vector_store import VectorStore

        corpus = synthetic_corpus(n, seed=21)
        rng = np.random.default_rng(21)
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        store = VectorStore(
            dim=d, config=StoreConfig(pad_multiple=128, sharded="on")
        )
        store.insert_records(list(corpus.records()), vecs)
        return store, corpus, vecs

    def test_sharded_matches_exact(self):
        store, corpus, vecs = self._store()
        assert store.load_collection()
        assert store._sharded is not None and store._dev is None
        q = vecs[:5]
        hits = store.search(q, top_k=10)
        weighted = (q @ vecs.T) * corpus.level_weights()[None, :]
        for i, row in enumerate(hits):
            expect = np.argsort(-weighted[i])[:10].tolist()
            assert [h.id for h in row] == expect

    def test_release_reload_cycle(self):
        store, _, vecs = self._store(n=256)
        store.load_collection()
        assert store._sharded is not None
        store.release_collection()
        assert store._sharded is None and not store.is_loaded
        hits = store.search(vecs[:1], top_k=3)  # auto-reload
        assert len(hits[0]) == 3 and store._sharded is not None

    def test_off_mode_keeps_single_device(self):
        from rag_icd10_tpu.config import StoreConfig
        from rag_icd10_tpu.data.corpus import synthetic_corpus
        from rag_icd10_tpu.index.vector_store import VectorStore

        corpus = synthetic_corpus(128, seed=22)
        rng = np.random.default_rng(22)
        vecs = rng.standard_normal((128, 32)).astype(np.float32)
        store = VectorStore(
            dim=32, config=StoreConfig(pad_multiple=128, sharded="off")
        )
        store.insert_records(list(corpus.records()), vecs)
        store.load_collection()
        assert store._sharded is None and store._dev is not None

    def test_sharded_int8_serves_exact_scores(self):
        """STORE_DEVICE_DTYPE=int8 + sharded: int8 shards select, the
        host re-ranks the merged over-fetch against fp32 rows — served
        SCORES are exact (recomputable from the fp32 matrix) even
        though the selection is approximate."""
        from rag_icd10_tpu.config import StoreConfig
        from rag_icd10_tpu.data.corpus import synthetic_corpus
        from rag_icd10_tpu.index.vector_store import VectorStore

        n, d, k = 1024, 64, 5
        corpus = synthetic_corpus(n, seed=23)
        rng = np.random.default_rng(23)
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        store = VectorStore(
            dim=d,
            config=StoreConfig(
                pad_multiple=128, sharded="on", device_dtype="int8"
            ),
        )
        store.insert_records(list(corpus.records()), vecs)
        assert store.load_collection()
        assert store._sharded is not None
        assert store._sharded.store_dtype == "int8"

        q = vecs[:6] + 0.05 * rng.standard_normal((6, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        hits = store.search(q, top_k=k)
        weighted = (q @ vecs.T) * corpus.level_weights()[None, :]
        recalls = []
        for i, row in enumerate(hits):
            assert len(row) == k
            # exact-score contract: every served score recomputes from
            # the fp32 matrix at the served index
            for h in row:
                np.testing.assert_allclose(
                    h.score, weighted[i, h.id], rtol=1e-5, atol=1e-6
                )
            expect = set(np.argsort(-weighted[i])[:k].tolist())
            recalls.append(len(expect & {h.id for h in row}) / k)
        assert np.mean(recalls) >= 0.9, recalls

        # a configured fp32-kernel default must not 400 the tier...
        hits2 = store.search(q[:1], top_k=3, method="chunkstream")
        assert len(hits2[0]) == 3
        # ...but an explicit unsupported override still raises
        with pytest.raises(ValueError, match="int8-sharded"):
            store.search(q[:1], top_k=3, method="fast")


class TestInt8ShardedSearch:
    """Capacity tier x sharding (round-5 stretch): the int8-resident
    corpus shards over the mesh and both per-shard kernels (exact /
    chunkstream) reproduce the single-device int8 score law exactly —
    int8 x int8 accumulates in int32 (exact integer arithmetic), so the
    sharded merge must be bit-identical to ops/quantized.int8_search
    over the whole corpus, not merely close."""

    def _setup(self, n=2048, d=64, b=4, seed=5):
        rng = np.random.default_rng(seed)
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        weights = np.array([1.2, 1.0, 0.8], dtype=np.float32)[
            rng.integers(0, 3, size=n)
        ]
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return corpus, weights, q

    def test_matches_single_device_int8_law(self):
        from rag_icd10_tpu.ops.quantized import int8_search, quantize_rows

        corpus, weights, q = self._setup()
        n, k = corpus.shape[0], 10
        mesh = make_mesh(n_devices=8, dp=8, tp=1)
        searcher = ShardedFlatSearcher(
            corpus, weights, mesh, axis="dp", store_dtype="int8"
        )
        assert searcher.n_padded == n  # no padding at this size

        q8, sc = quantize_rows(corpus)
        ref_vals, ref_idx = int8_search(
            q, q8, sc, weights, np.zeros(n, np.float32), k=k
        )
        ref_vals, ref_idx = np.asarray(ref_vals), np.asarray(ref_idx)

        for method in ("exact", "chunkstream", "auto"):
            vals, idx = searcher.search(q, k, method=method)
            np.testing.assert_array_equal(vals, ref_vals, err_msg=method)
            # indices may permute only on exact score ties
            for row_i, row_ref in zip(idx, ref_idx):
                assert set(row_i) == set(row_ref), method

    def test_recall_vs_fp32_truth(self):
        corpus, weights, q = self._setup(seed=6)
        k = 10
        mesh = make_mesh(n_devices=8, dp=8, tp=1)
        searcher = ShardedFlatSearcher(
            corpus, weights, mesh, axis="dp", store_dtype="int8"
        )
        vals, idx = searcher.search(q, k, method="chunkstream")
        expected = (q @ corpus.T) * weights[None, :]
        eidx = np.argsort(-expected, axis=1)[:, :k]
        recalls = [
            len(set(i) & set(e)) / k for i, e in zip(idx, eidx)
        ]
        assert np.mean(recalls) >= 0.9, recalls

    def test_unsupported_method_raises(self):
        corpus, weights, q = self._setup(n=1024)
        mesh = make_mesh(n_devices=8, dp=8, tp=1)
        searcher = ShardedFlatSearcher(
            corpus, weights, mesh, axis="dp", store_dtype="int8"
        )
        with pytest.raises(ValueError, match="int8-sharded"):
            searcher.search(q, 5, method="fast")
