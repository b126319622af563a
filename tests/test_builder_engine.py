"""Integration tests: builder CLI end-to-end (synthetic corpus) and Engine
startup from the persisted artifacts — the serving bootstrap path."""

import json
import os
from pathlib import Path

import pytest

from rag_icd10_tpu.config import Config
from rag_icd10_tpu.index.vector_store import VectorStore


@pytest.fixture()
def tiny_env(tmp_path, monkeypatch):
    """Small synthetic environment: no CSV, tiny encoder, tmp store."""
    monkeypatch.setenv("MILVUS_DB_PATH", str(tmp_path / "store"))
    monkeypatch.delenv("ICD_DATA_PATH", raising=False)
    monkeypatch.delenv("EMBEDDING_WEIGHTS_PATH", raising=False)
    monkeypatch.delenv("EMBEDDING_VOCAB_PATH", raising=False)
    # shrink the encoder so the test runs in seconds on CPU
    import dataclasses

    from rag_icd10_tpu import config as config_mod

    tiny = dict(
        hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        max_position_embeddings=64, vocab_size=4096, dtype="float32",
        max_length=64, length_buckets=(16, 32, 64),
    )
    orig = config_mod.EncoderConfig

    def tiny_encoder_config(**kw):
        merged = {**tiny, **kw}
        return orig(**merged)

    monkeypatch.setattr(config_mod, "EncoderConfig", tiny_encoder_config)
    # Config() captures field defaults at class creation; build explicitly
    cfg = Config(encoder=tiny_encoder_config(), data_path=None)
    return tmp_path, cfg


class TestBuilderEngineRoundtrip:
    def test_build_then_serve(self, tiny_env, monkeypatch):
        tmp_path, cfg = tiny_env
        import dataclasses

        from rag_icd10_tpu.tools.build_database import DatabaseBuilder

        cfg = dataclasses.replace(
            cfg,
            store=dataclasses.replace(cfg.store, db_path=str(tmp_path / "store"),
                                      pad_multiple=128),
        )
        builder = DatabaseBuilder(cfg)
        assert builder.build_full_database(rebuild=True)
        base = str(tmp_path / "store")
        assert VectorStore.exists(base)
        assert Path(base + ".vocab.txt").exists()
        sidecar = json.loads(Path(base + ".encoder.json").read_text())
        assert "vocab_path" in sidecar

        # engine startup from the artifacts
        from rag_icd10_tpu.runtime import Engine

        engine = Engine(cfg)
        engine.startup(warmup=False)
        matcher = engine.init_matcher()
        assert engine.store.num_entities > 0
        # query one of the synthetic titles through the full pipeline
        title = engine.store.corpus.titles[0]
        result = matcher.match_multiple_diagnoses(title, top_k=3)
        assert result["total_matches"] > 0
        engine.shutdown()

    def test_warmup_extra_methods(self, tiny_env):
        """WARMUP_SEARCH_METHODS pre-builds the HNSW graph and pre-compiles
        the streaming buckets at startup (STATUS known-gap: first
        per-request `search_method` use used to pay the build/compile)."""
        tmp_path, cfg = tiny_env
        import dataclasses

        from rag_icd10_tpu.tools.build_database import DatabaseBuilder

        cfg = dataclasses.replace(
            cfg,
            store=dataclasses.replace(
                cfg.store, db_path=str(tmp_path / "store"), pad_multiple=128
            ),
            api=dataclasses.replace(
                cfg.api, warmup_methods="streaming,fast,hnsw", max_batch=2
            ),
        )
        assert DatabaseBuilder(cfg).build_full_database(rebuild=True)

        from rag_icd10_tpu.runtime import Engine

        engine = Engine(cfg)
        engine.startup(warmup=False)
        engine.init_matcher()
        engine.warmup()
        # the graph was pre-built, so a per-request hnsw search is warm
        assert engine.store._hnsw is not None
        title = engine.store.corpus.titles[0]
        result = engine.matcher.match_multiple_diagnoses(
            title, top_k=3, search_method="hnsw"
        )
        assert result["total_matches"] > 0
        engine.shutdown()

    def test_verify_only_without_store_fails_cleanly(self, tiny_env):
        tmp_path, cfg = tiny_env
        import dataclasses

        from rag_icd10_tpu.tools.build_database import DatabaseBuilder

        cfg = dataclasses.replace(
            cfg,
            store=dataclasses.replace(
                cfg.store, db_path=str(tmp_path / "missing")
            ),
        )
        assert DatabaseBuilder(cfg).verify_database() is False
