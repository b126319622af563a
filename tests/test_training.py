"""Encoder training tool tests (pure-python pieces + tiny train sanity)."""

import numpy as np
import pytest

from rag_icd10_tpu.data.corpus import ICDCorpus
from rag_icd10_tpu.tools.train_encoder import make_pairs


class TestMakePairs:
    def test_title_semantic_and_hierarchy_pairs(self):
        corpus = ICDCorpus.from_rows(
            [
                {"code": "A00", "disease": "霍乱"},
                {"code": "A00.0", "disease": "古典霍乱"},
                {"code": "A00.001", "disease": "某种霍乱"},
            ]
        )
        pairs = make_pairs(corpus)
        # 3 title<->semantic + 2 child<->parent
        assert ("霍乱", "霍乱 | ICD-10: A00") in pairs
        assert ("古典霍乱", "霍乱") in pairs  # child -> parent title
        # A00.001's parent is A00.0
        assert ("某种霍乱", "古典霍乱") in pairs
        assert len(pairs) == 5

    def test_no_self_pairs_for_duplicate_titles(self):
        corpus = ICDCorpus.from_rows(
            [
                {"code": "B00", "disease": "同名"},
                {"code": "B00.1", "disease": "同名"},
            ]
        )
        pairs = make_pairs(corpus)
        assert ("同名", "同名") not in pairs


class TestDocsEndpointSpec:
    def test_openapi_spec_shape(self):
        from rag_icd10_tpu.api.docs import docs_html, openapi_spec

        spec = openapi_spec()
        assert spec["openapi"].startswith("3.")
        assert "/query" in spec["paths"]
        assert "post" in spec["paths"]["/query"]
        assert "QueryRequest" in spec["components"]["schemas"]
        # nested models hoisted
        assert "Candidate" in spec["components"]["schemas"]
        html = docs_html()
        assert "/standardize" in html and "text/html"


class TestConvertVerify:
    """--verify proves end-to-end (tokenizer included) parity between the
    HF torch forward and the converted JAX encoder; exercised offline
    with a random-init checkpoint of the real architecture shape."""

    def test_convert_and_verify_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")

        # small BERT + a vocab that covers the verify texts
        chars = sorted(set("".join([
            "急性胃肠炎", "高血压病3级，2型糖尿病", "疑似急性心肌梗死",
            "慢性阻塞性肺疾病急性加重期伴呼吸衰竭",
        ])))
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + chars
        src = tmp_path / "hf"
        src.mkdir()
        (src / "vocab.txt").write_text("\n".join(vocab), encoding="utf-8")
        cfg = transformers.BertConfig(
            vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64,
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        )
        torch.manual_seed(0)
        model = transformers.BertModel(cfg).eval()
        model.save_pretrained(str(src))

        out = tmp_path / "converted"
        from rag_icd10_tpu.tools.convert_weights import (
            convert_encoder,
            verify_encoder_parity,
        )

        convert_encoder(str(src), str(out))
        worst = verify_encoder_parity(str(src), str(out))
        assert worst >= 0.999


class TestCousinFrac:
    """--cousin-frac 0 must reproduce the r2 recipe (sibling-only hard
    negatives): the ablation for the paraphrase-vs-uncertainty trade
    recorded in EVAL_GATE_r04.json has to be a CLI flag, not a code
    edit. Drawn negatives are observable through title_ids interning."""

    def _draw(self, cousin_frac):
        from rag_icd10_tpu.models.tokenizer import WordPieceTokenizer
        from rag_icd10_tpu.tools.train_encoder import Example, draw_batch

        corpus_titles = ["胃炎", "肠炎"]
        ex = Example(
            anchor="霍乱", positive="霍乱 | ICD-10: A00",
            ga=0, gb=0,
            sib_titles=(),                 # no siblings ...
            cousin_titles=("副霍乱",),      # ... so cousins win any frac>0
            augment=False,
        )
        tok = WordPieceTokenizer.from_corpus(
            ["霍乱", "副霍乱", "霍乱 | ICD-10: A00"] + corpus_titles
        )
        title_ids = {}
        draw_batch(
            [ex], np.zeros(8, dtype=int), corpus_titles, title_ids,
            np.random.default_rng(0), tok, seq_a=16, seq_b=24,
            augment_prob=0.0, marker_prob=0.0, cousin_frac=cousin_frac,
        )
        return title_ids

    def test_zero_frac_never_draws_cousins(self):
        assert "副霍乱" not in self._draw(0.0)

    def test_positive_frac_uses_cousins_when_no_siblings(self):
        assert "副霍乱" in self._draw(0.3)


class TestWeightedLossData:
    """build_examples/draw_batch plumbing for --weighted-loss and
    --ancestor-frac: served level weights ride the batch, ancestor
    titles are drawable hard negatives, parent pairs are droppable."""

    def _corpus(self):
        return ICDCorpus.from_rows(
            [
                {"code": "A00", "disease": "霍乱"},
                {"code": "A00.0", "disease": "古典霍乱"},
                {"code": "A00.001", "disease": "某种霍乱"},
            ]
        )

    def test_pos_weight_follows_level(self):
        from rag_icd10_tpu.tools.train_encoder import build_examples

        examples, _ = build_examples(self._corpus())
        by_anchor = {
            (e.anchor, e.positive): e.pos_weight for e in examples
        }
        c = self._corpus()
        assert by_anchor[("霍乱", c.semantic_texts[0])] == pytest.approx(1.2)
        assert by_anchor[("古典霍乱", c.semantic_texts[1])] == pytest.approx(1.0)
        assert by_anchor[("某种霍乱", c.semantic_texts[2])] == pytest.approx(0.8)
        # parent-pair positive carries the PARENT record's weight
        assert by_anchor[("某种霍乱", c.semantic_texts[1])] == pytest.approx(1.0)

    def test_ancestor_titles_collected(self):
        from rag_icd10_tpu.tools.train_encoder import build_examples

        examples, _ = build_examples(self._corpus())
        leaf = [e for e in examples if e.anchor == "某种霍乱"][0]
        assert set(leaf.anc_titles) == {"古典霍乱", "霍乱"}

    def test_no_parent_pairs_flag(self):
        from rag_icd10_tpu.tools.train_encoder import build_examples

        with_pairs, _ = build_examples(self._corpus())
        without, _ = build_examples(self._corpus(), parent_pairs=False)
        assert len(without) == 3  # one per record
        assert len(with_pairs) == 5  # + two child->parent pairs

    def test_title_weight_map_takes_max_over_duplicates(self):
        from rag_icd10_tpu.tools.train_encoder import title_weight_map

        corpus = ICDCorpus.from_rows(
            [
                {"code": "B00", "disease": "同名"},
                {"code": "B00.1", "disease": "同名"},
            ]
        )
        assert title_weight_map(corpus)["同名"] == pytest.approx(1.2)

    def test_draw_batch_carries_weight_columns(self):
        from rag_icd10_tpu.models.tokenizer import WordPieceTokenizer
        from rag_icd10_tpu.tools.train_encoder import (
            build_examples,
            draw_batch,
            title_weight_map,
        )

        corpus = self._corpus()
        examples, title_ids = build_examples(corpus)
        tok = WordPieceTokenizer.from_corpus(
            list(corpus.titles) + list(corpus.semantic_texts)
        )
        tw = title_weight_map(corpus)
        batch = draw_batch(
            examples, np.arange(len(examples)), corpus.titles, title_ids,
            np.random.default_rng(0), tok, seq_a=16, seq_b=32,
            augment_prob=0.0, marker_prob=0.0, cousin_frac=0.0,
            ancestor_frac=1.0, title_weights=tw,
        )
        assert batch["w_b"].shape == (len(examples),)
        assert batch["w_h"].shape == (len(examples),)
        assert np.isclose(
            batch["w_b"][:, None], [0.8, 1.0, 1.2]
        ).any(axis=1).all()
        # without title_weights the keys stay absent (plain objective)
        plain = draw_batch(
            examples, np.arange(len(examples)), corpus.titles, title_ids,
            np.random.default_rng(0), tok, seq_a=16, seq_b=32,
            augment_prob=0.0, marker_prob=0.0, cousin_frac=0.0,
        )
        assert "w_b" not in plain and "w_h" not in plain

    def test_ancestor_frac_draws_ancestor_negatives(self):
        from rag_icd10_tpu.models.tokenizer import WordPieceTokenizer
        from rag_icd10_tpu.tools.train_encoder import (
            build_examples,
            draw_batch,
        )

        corpus = self._corpus()
        examples, title_ids = build_examples(corpus, parent_pairs=False)
        leaf_idx = [
            i for i, e in enumerate(examples) if e.anchor == "某种霍乱"
        ][0]
        tok = WordPieceTokenizer.from_corpus(
            list(corpus.titles) + list(corpus.semantic_texts)
        )
        batch = draw_batch(
            examples, np.full(8, leaf_idx), corpus.titles, title_ids,
            np.random.default_rng(0), tok, seq_a=16, seq_b=32,
            augment_prob=0.0, marker_prob=0.0, cousin_frac=0.0,
            ancestor_frac=1.0,
        )
        ancestor_ids = {title_ids["霍乱"], title_ids["古典霍乱"]}
        assert set(np.asarray(batch["h_group"]).tolist()) <= ancestor_ids


class TestSelectVocab:
    """Resume runs must tokenize exactly like the original run — a
    charset/synonym-table edit between runs would otherwise shift token
    ids under the checkpoint's frozen embedding rows."""

    def _tok(self, texts):
        from rag_icd10_tpu.models.tokenizer import WordPieceTokenizer

        return WordPieceTokenizer.from_corpus(texts)

    def test_resume_adopts_checkpoint_vocab(self, tmp_path):
        from rag_icd10_tpu.tools.train_encoder import select_vocab

        ckpt_tok = self._tok(["霍乱", "肺炎"])
        ckpt_dir = tmp_path / "trained"
        ckpt_dir.mkdir()
        ckpt_tok.save_vocab(str(ckpt_dir / "vocab.txt"))
        fresh_tok = self._tok(["霍乱", "肺炎", "新字"])  # charset grew

        tok = select_vocab(None, str(ckpt_dir / "params.npz"),
                           lambda: fresh_tok)
        assert tok.vocab_size == ckpt_tok.vocab_size
        assert tok.encode("霍乱") == ckpt_tok.encode("霍乱")

    def test_explicit_vocab_wins_over_checkpoint(self, tmp_path):
        from rag_icd10_tpu.tools.train_encoder import select_vocab

        a, b = self._tok(["甲"]), self._tok(["甲", "乙"])
        (tmp_path / "ck").mkdir()
        b.save_vocab(str(tmp_path / "ck" / "vocab.txt"))
        a.save_vocab(str(tmp_path / "explicit.txt"))
        tok = select_vocab(str(tmp_path / "explicit.txt"),
                           str(tmp_path / "ck" / "params.npz"),
                           lambda: b)
        assert tok.vocab_size == a.vocab_size

    def test_fresh_build_when_no_checkpoint_vocab(self, tmp_path):
        from rag_icd10_tpu.tools.train_encoder import select_vocab

        fresh = self._tok(["丙"])
        (tmp_path / "ck").mkdir()  # no vocab.txt inside
        tok = select_vocab(None, str(tmp_path / "ck" / "params.npz"),
                           lambda: fresh)
        assert tok is fresh
