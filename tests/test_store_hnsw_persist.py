"""HNSW persistence through VectorStore save/load."""

import numpy as np
import pytest

from rag_icd10_tpu.config import StoreConfig
from rag_icd10_tpu.data.corpus import synthetic_corpus

pytest.importorskip("rag_icd10_tpu.index.hnsw_index")
from rag_icd10_tpu.index.vector_store import VectorStore  # noqa: E402


def test_hnsw_persists_with_store(tmp_path):
    corpus = synthetic_corpus(256, seed=5)
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((256, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    store = VectorStore(dim=64, config=StoreConfig(pad_multiple=128, index_type="HNSW"))
    store.insert_records(list(corpus.records()), vecs)
    hits_before = store.search(vecs[:2], top_k=5)  # builds graph lazily
    base = str(tmp_path / "s")
    store.save(base)
    assert (tmp_path / "s.hnsw").exists()

    back = VectorStore.load(base, config=StoreConfig(pad_multiple=128, index_type="HNSW"))
    assert back._hnsw is not None and len(back._hnsw) == 256  # no rebuild
    hits_after = back.search(vecs[:2], top_k=5)
    for a, b in zip(hits_before, hits_after):
        assert [h.code for h in a] == [h.code for h in b]
