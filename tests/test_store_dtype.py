"""bf16 device-residency option: results stay rank-correct within bf16
tolerance of the fp32 path."""

import numpy as np

from rag_icd10_tpu.config import StoreConfig
from rag_icd10_tpu.data.corpus import synthetic_corpus
from rag_icd10_tpu.index.vector_store import VectorStore


def test_bf16_residency_matches_fp32_ranking():
    corpus = synthetic_corpus(256, seed=11)
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((256, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    s32 = VectorStore(dim=64, config=StoreConfig(pad_multiple=128))
    s32.insert_records(list(corpus.records()), vecs)
    s16 = VectorStore(
        dim=64, config=StoreConfig(pad_multiple=128, device_dtype="bfloat16")
    )
    s16.insert_records(list(corpus.records()), vecs)

    q = vecs[:4]
    r32 = s32.search(q, top_k=5)
    r16 = s16.search(q, top_k=5)
    for a, b in zip(r32, r16):
        # same candidate set at bf16 tolerance; scores within 1e-2
        assert {h.code for h in a} & {h.code for h in b}
        np.testing.assert_allclose(
            [h.score for h in a], [h.score for h in b], atol=2e-2, rtol=2e-2
        )
    stats = s16.get_memory_usage()
    assert stats["device_dtype"] == "bfloat16"
