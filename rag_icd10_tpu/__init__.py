"""rag_icd10_tpu — TPU-native ICD-10 index-and-query engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
ICD-10 medical-diagnosis standardization RAG system (yilane/rag-project-icd10):

- A batched JAX (flax) BERT-family sentence encoder (text2vec-base-chinese
  architecture) replacing the torch sentence-transformers path
  (reference: services/embedding_service.py).
- An HBM-resident vector store with a fused Pallas cosine-similarity +
  level-weighted top-k kernel replacing Milvus-Lite FLAT/IP search
  (reference: services/milvus_service.py).
- A vectorized rescoring + 12-dim confidence stack replacing the per-candidate
  Python loops (reference: services/hierarchical_similarity_service.py,
  services/multidimensional_confidence_service.py).
- Rule-based medical NER, entity filtering, semantic boundary detection and
  enhanced multi-diagnosis text processing (reference: services/medical_ner_
  service.py, services/diagnosis_entity_filter.py, services/semantic_boundary_
  service.py, services/enhanced_text_processor.py, tools/text_processor.py).
- An OpenAI-compatible LLM standardization client (reference:
  services/llm_service.py).
- An aiohttp API service preserving the reference FastAPI request/response
  contracts (reference: main.py, models/icd_models.py) plus a web UI.
- A C++ HNSW index path for corpora too large to brute-force, and
  jax.sharding-based multi-chip scaling of the flat-scan path.

Design stance: one jitted device program over batches — N sub-queries x 40k
corpus in a single device call — instead of the reference's sequential Python
loops (reference: services/multi_diagnosis_service.py:98-103).
"""

__version__ = "0.1.0"
