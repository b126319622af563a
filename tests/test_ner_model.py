"""JAX token-classifier tests: conversion from HF BertForTokenClassification
and span-aggregation parity vs the HF 'simple' pipeline."""

import json
from pathlib import Path

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from rag_icd10_tpu.models.tokenizer import WordPieceTokenizer  # noqa: E402
from rag_icd10_tpu.pipeline.ner_model import (  # noqa: E402
    JaxTokenClassifier,
    convert_hf_token_classifier,
)

LABELS = ["O", "B-Symptom", "I-Symptom", "B-DiseaseNameOrComprehensiveCertificate",
          "I-DiseaseNameOrComprehensiveCertificate"]


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    """Randomly-initialized tiny HF token classifier saved to disk."""
    d = tmp_path_factory.mktemp("hf_ner")
    # vocab covering our test text
    texts = ["急性胃肠炎伴腹痛发热", "高血压病"]
    tok = WordPieceTokenizer.from_corpus(texts)
    # write an HF-compatible vocab ordered by id
    vocab_path = d / "vocab.txt"
    tok.save_vocab(str(vocab_path))

    cfg = transformers.BertConfig(
        vocab_size=tok.vocab_size,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        num_labels=len(LABELS),
        id2label={i: l for i, l in enumerate(LABELS)},
        label2id={l: i for i, l in enumerate(LABELS)},
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(3)
    model = transformers.BertForTokenClassification(cfg).eval()
    model.save_pretrained(str(d), safe_serialization=False)
    return d


class TestConversionAndParity:
    def test_logits_match_hf(self, hf_checkpoint, tmp_path):
        out = tmp_path / "converted"
        convert_hf_token_classifier(str(hf_checkpoint), str(out))
        clf = JaxTokenClassifier.from_weights(str(out))

        hf_model = transformers.BertForTokenClassification.from_pretrained(
            str(hf_checkpoint)
        ).eval()
        ids = np.array([[2, 5, 6, 7, 3]], dtype=np.int32)  # arbitrary valid ids
        mask = np.ones_like(ids)
        with torch.no_grad():
            hf_logits = hf_model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).logits.numpy()
        import jax.numpy as jnp

        ours = np.asarray(
            clf.model.apply({"params": clf.params}, ids, mask, np.zeros_like(ids))
        )
        np.testing.assert_allclose(ours, hf_logits, atol=1e-4)

    def test_span_aggregation_matches_hf_pipeline(self, hf_checkpoint, tmp_path):
        out = tmp_path / "converted2"
        convert_hf_token_classifier(str(hf_checkpoint), str(out))
        clf = JaxTokenClassifier.from_weights(str(out))

        hf_tok = transformers.BertTokenizerFast(
            vocab_file=str(hf_checkpoint / "vocab.txt"), do_lower_case=True
        )
        hf_model = transformers.BertForTokenClassification.from_pretrained(
            str(hf_checkpoint)
        ).eval()
        pipe = transformers.pipeline(
            "ner", model=hf_model, tokenizer=hf_tok,
            aggregation_strategy="simple", device=-1,
        )
        text = "急性胃肠炎伴腹痛发热"
        hf_spans = [
            (e["word"].replace(" ", ""), e["entity_group"], e["start"], e["end"])
            for e in pipe(text)
        ]
        our_spans = [(t, l, s, e) for (t, l, _, s, e) in clf.predict(text)]
        assert our_spans == hf_spans

    def test_service_model_mode(self, hf_checkpoint, tmp_path, monkeypatch):
        out = tmp_path / "converted3"
        convert_hf_token_classifier(str(hf_checkpoint), str(out))
        monkeypatch.setenv("NER_WEIGHTS_PATH", str(out))
        from rag_icd10_tpu.config import NERConfig
        from rag_icd10_tpu.pipeline.ner import MedicalNERService

        svc = MedicalNERService(NERConfig(use_model=True))
        assert svc.use_model and svc._model is not None
        ents = svc.extract_medical_entities("急性胃肠炎伴腹痛发热", filter_drugs=False)
        # random weights -> arbitrary labels, but the plumbing must produce
        # well-formed entities mapped through ENTITY_TYPE_MAPPING
        for etype, elist in ents.items():
            for e in elist:
                assert e["source"] == "model"
                assert 0.0 <= e["confidence"] <= 1.0


class TestTrainNerTool:
    """The distillation tool must produce a directory that
    JaxTokenClassifier.from_weights loads and MedicalNERService uses in
    model mode (tiny run: correctness of the plumbing, not quality)."""

    def test_train_save_load_roundtrip(self, tmp_path, monkeypatch):
        from rag_icd10_tpu.tools.train_ner import main

        out = tmp_path / "ner"
        rc = main(["--steps", "5", "--batch", "8", "--seq", "32",
                   "--hidden", "32", "--layers", "1", "--out", str(out),
                   "--log-every", "5"])
        assert rc == 0
        assert (out / "params.npz").exists()
        assert (out / "config.json").exists()
        assert (out / "vocab.txt").exists()

        # model mode end-to-end through the service
        import json
        cfg = json.loads((out / "config.json").read_text())
        assert set(cfg["id2label"].values()) >= {"O", "B-Disease", "I-Disease"}
        monkeypatch.setenv("NER_WEIGHTS_PATH", str(out))
        from rag_icd10_tpu.config import NERConfig
        from rag_icd10_tpu.pipeline.ner import MedicalNERService

        svc = MedicalNERService(NERConfig(use_model=True))
        assert svc.use_model and svc._model is not None
        ents = svc.extract_medical_entities("患者急性胃肠炎伴发热", filter_drugs=True)
        assert isinstance(ents, dict)  # spans may be junk at 5 steps
