"""Eval-gate tests (tools/train_encoder.run_eval_gate).

Round-3 lesson, twice over: (a) 5 h of chip time shipped an unevaluated
encoder regression because nothing forced an eval; (b) machinery that
exists but never executes is indistinguishable from broken (the
interpret-mode-only chunk-stream tests). The gate is the guard against
(a), so it must not itself suffer (b): these tests drive run_eval_gate
end-to-end — real TextEncoder forward (tiny arch), real store insert,
real matcher pipeline, real tiered eval — and pin both verdicts plus
both baseline-argument forms (float literal and incumbent-JSON path).
"""

import json
from types import SimpleNamespace

import pytest

from rag_icd10_tpu.config import EncoderConfig, StoreConfig
from rag_icd10_tpu.data.corpus import synthetic_corpus
from rag_icd10_tpu.models.bert import BertArch, init_params
from rag_icd10_tpu.models.tokenizer import WordPieceTokenizer
from rag_icd10_tpu.tools.train_encoder import run_eval_gate


@pytest.fixture(scope="module")
def gate_env(tmp_path_factory):
    corpus = synthetic_corpus(40, seed=3)
    tok = WordPieceTokenizer.from_corpus(
        list(corpus.titles) + list(corpus.semantic_texts)
    )
    enc_cfg = EncoderConfig(
        model_name="tiny-test",
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        vocab_size=tok.vocab_size,
        dtype="float32",
        weights_path=None,
        vocab_path=None,
    )
    arch = BertArch(
        vocab_size=tok.vocab_size,
        hidden_size=32,
        num_layers=2,
        num_heads=2,
        intermediate_size=64,
        max_position_embeddings=enc_cfg.max_position_embeddings,
    )
    params = init_params(arch, seed=0)
    cfg = SimpleNamespace(
        encoder=enc_cfg,
        store=StoreConfig(db_path=str(tmp_path_factory.mktemp("store") / "s")),
    )
    return params, tok, corpus, cfg


class TestRunEvalGate:
    def test_blesses_at_or_above_float_baseline(self, gate_env, tmp_path):
        params, tok, corpus, cfg = gate_env
        blessed = run_eval_gate(params, tok, corpus, tmp_path, "0.0", cfg)
        assert blessed is True
        gate = json.loads((tmp_path / "eval_gate.json").read_text())
        assert gate["blessed"] is True
        assert gate["gate_metric"] == "paraphrase.pipeline_top1"
        assert gate["baseline"] == 0.0
        # the eval actually ran: real tier scores in [0, 1], real case counts
        assert 0.0 <= gate["candidate"] <= 1.0
        para = gate["tiers"]["paraphrase"]
        assert para["n"] > 0
        assert gate["candidate"] == pytest.approx(para["pipeline_top1"])

    def test_rejects_below_unreachable_baseline(self, gate_env, tmp_path):
        params, tok, corpus, cfg = gate_env
        # pipeline_top1 <= 1.0 by construction, so 1.01 must reject
        blessed = run_eval_gate(params, tok, corpus, tmp_path, "1.01", cfg)
        assert blessed is False
        gate = json.loads((tmp_path / "eval_gate.json").read_text())
        assert gate["blessed"] is False

    def test_reads_baseline_from_incumbent_json(self, gate_env, tmp_path):
        """The production form: --eval-gate EVAL_r02.json (the incumbent
        artifact's paraphrase pipeline top-1 is the bar)."""
        params, tok, corpus, cfg = gate_env
        incumbent = tmp_path / "incumbent.json"
        incumbent.write_text(json.dumps(
            {"tiers": {"paraphrase": {"pipeline_top1": 1.01}}}
        ))
        assert run_eval_gate(
            params, tok, corpus, tmp_path, str(incumbent), cfg
        ) is False
        gate = json.loads((tmp_path / "eval_gate.json").read_text())
        assert gate["baseline"] == 1.01

    def test_checked_in_incumbent_artifact_parses(self, gate_env, tmp_path):
        """EVAL_r02.json (what reproduce.sh and the r4 chain pass) must
        keep the shape the gate reads, or the gate crashes post-training."""
        with open("EVAL_r02.json") as f:
            incumbent = json.load(f)
        bar = float(incumbent["tiers"]["paraphrase"]["pipeline_top1"])
        assert 0.5 < bar <= 1.0  # a real, demanding bar

    def test_blend_metric_gate(self, gate_env, tmp_path):
        """--gate-metric blend: 4-tier mean on both sides of the bar."""
        params, tok, corpus, cfg = gate_env
        blessed = run_eval_gate(params, tok, corpus, tmp_path, "0.0", cfg,
                                metric="blend")
        assert blessed is True
        gate = json.loads((tmp_path / "eval_gate.json").read_text())
        assert gate["gate_metric"] == "blend(4-tier mean)"
        t = gate["tiers"]
        expected = (
            t["exact_title"]["pipeline_top1"]
            + t["paraphrase"]["pipeline_top1"]
            + t["uncertainty"]["pipeline_top1"]
            + t["multi_diagnosis"]["sub_diagnosis_top1"]
        ) / 4
        assert gate["candidate"] == pytest.approx(expected)


class TestGateMetricValue:
    def test_blend_on_real_artifacts(self):
        """The r4 candidate loses the paraphrase bar but the blend is a
        near-tie — exactly the trade the blend metric exists to expose.
        Pin both computations on the committed artifacts."""
        from rag_icd10_tpu.tools.train_encoder import gate_metric_value

        with open("EVAL_r02.json") as f:
            incumbent = json.load(f)["tiers"]
        with open("EVAL_GATE_r04.json") as f:
            candidate = json.load(f)["tiers"]
        assert gate_metric_value(incumbent, "paraphrase") == pytest.approx(
            0.9125)
        assert gate_metric_value(candidate, "paraphrase") == pytest.approx(
            0.8825)
        # incumbent blend (.9875+.9125+.9667+.96)/4, candidate
        # (.9825+.8825+.9533+.9867)/4 — candidate still loses, narrowly
        assert gate_metric_value(incumbent, "blend") == pytest.approx(
            0.956675, abs=1e-4)
        assert gate_metric_value(candidate, "blend") == pytest.approx(
            0.95125, abs=1e-4)

    def test_unknown_metric_raises(self):
        from rag_icd10_tpu.tools.train_encoder import gate_metric_value

        with pytest.raises(ValueError):
            gate_metric_value({}, "qps")
