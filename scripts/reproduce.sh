#!/bin/bash
# Reproduce every checked-in artifact from scratch on a TPU host.
# Gitignored outputs (db/, trained weights) do not survive workspace
# resets; this is the full chain that produced EVAL_r03.json,
# BENCH_CONFIGS_r03.json, SERVING_r03.json and the bench.py headline.
#
# Wall-clock on 1x v5e through the axon tunnel: ~6.5 h total
# (training dominates). Every step is individually resumable.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== 1. contrastive encoder training (~5 h; checkpoints every 2k steps)"
timeout 22000 python -m rag_icd10_tpu.tools.train_encoder \
  --steps 48000 --batch 256 --out db/trained_r3

echo "=== 2. distilled NER model (~3 min)"
timeout 2000 python -m rag_icd10_tpu.tools.train_ner --out db/ner

echo "=== 3. store rebuild with the trained encoder (~6 min warm)"
EMBEDDING_WEIGHTS_PATH=db/trained_r3/params.npz \
EMBEDDING_VOCAB_PATH=db/trained_r3/vocab.txt \
timeout 3000 python -m rag_icd10_tpu.tools.build_database --rebuild

echo "=== 4. tiered retrieval eval (~10 min)"
timeout 3000 python -m rag_icd10_tpu.tools.eval_retrieval --out EVAL_r03.json

echo "=== 5. headline benchmark"
timeout 1200 python bench.py

echo "=== 6. BASELINE benchmark configs (~10 min)"
timeout 5000 python -m benchmarks.run --config 0 --out BENCH_CONFIGS_r03.json

echo "=== 7. serving benchmark (starts its own server if none running)"
timeout 3000 python -m benchmarks.serving --clients 32 --requests 600 \
  --out SERVING_r03.json

echo "=== done — artifacts: EVAL_r03.json BENCH_CONFIGS_r03.json SERVING_r03.json"
