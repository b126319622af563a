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

    def test_warmup_on_host_tier_serves_sketch(self, tiny_env):
        """A host-resident store rejects full-precision methods, so the
        default WARMUP_SEARCH_METHODS ('fast,streaming') used to raise in
        the warmup sweep and abort it. The sweep must instead skip the
        unservable methods and warm the sketch path the tier will serve."""
        tmp_path, cfg = tiny_env
        import dataclasses

        from rag_icd10_tpu.tools.build_database import DatabaseBuilder

        cfg = dataclasses.replace(
            cfg,
            store=dataclasses.replace(
                cfg.store, db_path=str(tmp_path / "store_host"),
                pad_multiple=128, device_dtype="host", sketch_dim=32,
            ),
            api=dataclasses.replace(
                cfg.api, warmup_methods="fast,streaming", max_batch=2
            ),
        )
        assert DatabaseBuilder(cfg).build_full_database(rebuild=True)

        from rag_icd10_tpu.runtime import Engine

        engine = Engine(cfg)
        engine.startup(warmup=False)
        engine.init_matcher()
        engine.warmup()  # must not raise
        assert engine.store._sketch is not None  # sketch path warmed
        engine.shutdown()

    def test_incremental_append(self, tiny_env):
        """build_full_database without --rebuild appends new CSV rows to
        the existing store (reference tools/build_database.py:297-310
        incremental mode), removes a stale persisted HNSW graph, and a
        reloaded store's search sees the appended rows."""
        tmp_path, cfg = tiny_env
        import dataclasses

        from rag_icd10_tpu.tools.build_database import DatabaseBuilder

        base = str(tmp_path / "store")
        cfg = dataclasses.replace(
            cfg,
            store=dataclasses.replace(
                cfg.store, db_path=base, pad_multiple=128
            ),
        )
        csv_v1 = tmp_path / "icd_v1.csv"
        csv_v1.write_text(
            "code,disease\n"
            "A01.0,伤寒\nA01.1,副伤寒甲\nB01.9,水痘\n"
            "C34.9,肺恶性肿瘤\nE11.9,2型糖尿病\n",
            encoding="utf-8",
        )
        builder = DatabaseBuilder(cfg)
        assert builder.build_full_database(str(csv_v1), rebuild=True)
        store = VectorStore.load(base, config=cfg.store)
        n1 = store.num_entities
        assert "J18.9" not in store.corpus.codes
        # persist a graph so the append has something stale to invalidate
        store.build_hnsw()
        store._hnsw.save(base + ".hnsw")
        assert Path(base + ".hnsw").exists()

        csv_v2 = tmp_path / "icd_v2.csv"
        csv_v2.write_text(
            csv_v1.read_text(encoding="utf-8")
            + "J18.9,肺炎\nI10,特发性高血压\n",
            encoding="utf-8",
        )
        # no rebuild flag -> incremental append of the two new rows
        assert builder.build_full_database(str(csv_v2), rebuild=False)
        assert not Path(base + ".hnsw").exists()  # stale graph removed

        store2 = VectorStore.load(base, config=cfg.store)
        assert store2.num_entities == n1 + 2
        assert "J18.9" in store2.corpus.codes
        # appended rows are searchable end to end
        enc = builder._init_encoder(store2.corpus)
        hits = store2.search(enc.encode_query("肺炎"), top_k=store2.num_entities)[0]
        assert any(h.code == "J18.9" for h in hits)
        # idempotent: a third run with the same CSV appends nothing
        assert builder.build_full_database(str(csv_v2), rebuild=False)
        store3 = VectorStore.load(base, config=cfg.store)
        assert store3.num_entities == n1 + 2

    def test_append_adopts_sidecar_weights(self, tiny_env):
        """Appending must embed new rows with the encoder that BUILT the
        store (the sidecar pairing, like serving does) — otherwise the
        appended vectors land in a different embedding space and the new
        codes are silently unretrievable."""
        tmp_path, cfg = tiny_env
        import dataclasses

        import numpy as np

        from rag_icd10_tpu.models.bert import BertArch, init_params
        from rag_icd10_tpu.models.convert_hf import save_params
        from rag_icd10_tpu.tools.build_database import DatabaseBuilder

        base = str(tmp_path / "store")
        # persist a deterministic weights file and build the store with it
        arch = BertArch(
            vocab_size=4096, hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, max_position_embeddings=64,
        )
        wpath = tmp_path / "w" / "params.npz"
        save_params(init_params(arch, seed=7), str(wpath))
        cfg_w = dataclasses.replace(
            cfg,
            store=dataclasses.replace(
                cfg.store, db_path=base, pad_multiple=128
            ),
            encoder=dataclasses.replace(
                cfg.encoder, weights_path=str(wpath)
            ),
        )
        csv_v1 = tmp_path / "v1.csv"
        csv_v1.write_text(
            "code,disease\nA01.0,伤寒\nB01.9,水痘\nE11.9,2型糖尿病\n",
            encoding="utf-8",
        )
        assert DatabaseBuilder(cfg_w).build_full_database(
            str(csv_v1), rebuild=True
        )

        # a naive operator appends WITHOUT the env vars set
        cfg_plain = dataclasses.replace(
            cfg,
            store=dataclasses.replace(
                cfg.store, db_path=base, pad_multiple=128
            ),
        )
        csv_v2 = tmp_path / "v2.csv"
        csv_v2.write_text(
            csv_v1.read_text(encoding="utf-8") + "J18.9,肺炎\n",
            encoding="utf-8",
        )
        builder = DatabaseBuilder(cfg_plain)
        assert builder.build_full_database(str(csv_v2), rebuild=False)
        # the builder adopted the sidecar weights for the append
        assert builder.config.encoder.weights_path == str(wpath.resolve())
        # the appended row is retrievable in the SAME embedding space:
        # its own title query must rank it first
        store = VectorStore.load(base, config=cfg_plain.store)
        enc = builder._init_encoder(store.corpus)
        hits = store.search(enc.encode_query("肺炎"), top_k=1)[0]
        assert hits[0].code == "J18.9"

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
