"""JAX BERT encoder tests: shapes, normalization, determinism, and numeric
parity vs torch HF BertModel (random weights, converted)."""

import numpy as np
import pytest

from rag_icd10_tpu.config import EncoderConfig
from rag_icd10_tpu.models.bert import BertArch, SentenceBert, init_params
from rag_icd10_tpu.models.encoder import TextEncoder
from rag_icd10_tpu.models.tokenizer import WordPieceTokenizer

TINY = dict(
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    intermediate_size=128,
    max_position_embeddings=64,
    vocab_size=128,
    dtype="float32",
    max_length=64,
    length_buckets=(16, 32, 64),
)


@pytest.fixture(scope="module")
def tiny_encoder():
    texts = ["急性胃肠炎", "高血压病3级", "2型糖尿病", "肺部感染"]
    tok = WordPieceTokenizer.from_corpus(texts)
    cfg = EncoderConfig(**TINY)
    return TextEncoder(cfg, tokenizer=tok)


class TestEncoderBasics:
    def test_output_shape_and_norm(self, tiny_encoder):
        vecs = tiny_encoder.encode_batch(["急性胃肠炎", "高血压病3级"])
        assert vecs.shape == (2, 64)
        np.testing.assert_allclose(
            np.linalg.norm(vecs, axis=1), 1.0, atol=1e-5
        )

    def test_deterministic(self, tiny_encoder):
        a = tiny_encoder.encode_single("急性胃肠炎")
        b = tiny_encoder.encode_single("急性胃肠炎")
        np.testing.assert_array_equal(a, b)

    def test_padding_invariance(self, tiny_encoder):
        """Embedding of a text must not depend on what else is in the batch
        (mask correctness)."""
        solo = tiny_encoder.encode_batch(["急性胃肠炎"])[0]
        batched = tiny_encoder.encode_batch(
            ["急性胃肠炎", "高血压病3级伴慢性心功能不全急性加重"]
        )[0]
        np.testing.assert_allclose(solo, batched, atol=2e-5)

    def test_empty_batch(self, tiny_encoder):
        assert tiny_encoder.encode_batch([]).shape == (0, 64)

    def test_self_check(self, tiny_encoder):
        assert tiny_encoder.test_embedding()

    def test_model_info(self, tiny_encoder):
        info = tiny_encoder.get_model_info()
        assert info["embedding_dimension"] == 64
        assert info["num_layers"] == 2


class TestE5Prefixing:
    def test_e5_applies_prefixes(self):
        texts = ["急性胃肠炎"]
        tok = WordPieceTokenizer.from_corpus(texts + ["query: passage: "])
        cfg = EncoderConfig(**{**TINY, "model_name": "intfloat/multilingual-e5-large"})
        enc = TextEncoder(cfg, tokenizer=tok)
        q = enc.encode_query("急性胃肠炎")
        p = enc.encode_single("急性胃肠炎")
        assert not np.allclose(q, p)  # different prefixes -> different vecs

    def test_text2vec_ignores_prefixes(self, tiny_encoder):
        q = tiny_encoder.encode_query("急性胃肠炎")
        p = tiny_encoder.encode_single("急性胃肠炎")
        np.testing.assert_allclose(q, p, atol=1e-6)


class TestHFNumericParity:
    """Convert a randomly-initialized torch BertModel and check our forward
    reproduces HF's mean-pooled, L2-normalized sentence embeddings."""

    def test_parity_vs_torch_bert(self):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from rag_icd10_tpu.models.convert_hf import convert_state_dict

        hf_cfg = transformers.BertConfig(
            vocab_size=64,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=64,
            max_position_embeddings=32,
            hidden_act="gelu",
            attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0,
        )
        torch.manual_seed(0)
        hf_model = transformers.BertModel(hf_cfg).eval()

        arch = BertArch(
            vocab_size=64,
            hidden_size=32,
            num_layers=2,
            num_heads=2,
            intermediate_size=64,
            max_position_embeddings=32,
            compute_dtype=np.float32,
        )
        sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
        params = convert_state_dict(sd, arch)

        rng = np.random.default_rng(0)
        ids = rng.integers(1, 64, size=(3, 16)).astype(np.int32)
        mask = np.ones_like(ids)
        mask[1, 10:] = 0
        mask[2, 5:] = 0
        ids = ids * mask
        types = np.zeros_like(ids)

        with torch.no_grad():
            hf_out = hf_model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
                token_type_ids=torch.tensor(types, dtype=torch.long),
            ).last_hidden_state.numpy()
        m = mask[:, :, None].astype(np.float32)
        hf_pooled = (hf_out * m).sum(1) / m.sum(1)
        hf_sent = hf_pooled / np.linalg.norm(hf_pooled, axis=1, keepdims=True)

        model = SentenceBert(arch)
        ours = np.asarray(model.apply({"params": params}, ids, mask, types))

        cos = np.sum(ours * hf_sent, axis=1)
        np.testing.assert_allclose(cos, 1.0, atol=1e-5)
        np.testing.assert_allclose(ours, hf_sent, atol=1e-4)

    def test_param_save_load_roundtrip(self, tmp_path):
        from rag_icd10_tpu.models.convert_hf import load_params, save_params

        arch = BertArch(
            vocab_size=32, hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=32, max_position_embeddings=16,
        )
        params = init_params(arch, seed=1)
        p = tmp_path / "params.npz"
        save_params(params, str(p))
        back = load_params(str(p))

        import jax

        flat_a = jax.tree_util.tree_leaves(params)
        flat_b = jax.tree_util.tree_leaves(back)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
