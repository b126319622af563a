"""Convert HF checkpoints into this framework's format.

Encoder (sentence embedder):
    python -m rag_icd10_tpu.tools.convert_weights \
        --model-dir /path/to/text2vec-base-chinese --out db/encoder
    -> writes db/encoder/params.npz + vocab.txt; point
       EMBEDDING_WEIGHTS_PATH / EMBEDDING_VOCAB_PATH at them.

Token-classification NER model:
    python -m rag_icd10_tpu.tools.convert_weights \
        --model-dir /path/to/chinese-medical-ner --out db/ner --ner
    -> writes params.npz + config.json + vocab.txt; point
       NER_WEIGHTS_PATH at the directory.

Works entirely offline from a local directory holding pytorch_model.bin /
model.safetensors + config.json + vocab.txt (the reference downloads these
at runtime through sentence-transformers/HF hub,
services/embedding_service.py:47-66).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path


def convert_encoder(model_dir: str, out_dir: str) -> None:
    from ..models.bert import BertArch
    from ..models.convert_hf import convert_model_dir, save_params

    d, out = Path(model_dir), Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    config = json.loads((d / "config.json").read_text())
    arch = BertArch(
        vocab_size=config.get("vocab_size", 21128),
        hidden_size=config.get("hidden_size", 768),
        num_layers=config.get("num_hidden_layers", 12),
        num_heads=config.get("num_attention_heads", 12),
        intermediate_size=config.get("intermediate_size", 3072),
        max_position_embeddings=config.get("max_position_embeddings", 512),
    )
    params = convert_model_dir(str(d), arch)
    save_params(params, str(out / "params.npz"))
    shutil.copy(d / "vocab.txt", out / "vocab.txt")
    (out / "config.json").write_text(json.dumps(config))
    print(f"encoder converted -> {out}/params.npz")
    print(f"export EMBEDDING_WEIGHTS_PATH={out}/params.npz")
    print(f"export EMBEDDING_VOCAB_PATH={out}/vocab.txt")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-dir", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument(
        "--ner", action="store_true", help="convert a token-classification model"
    )
    args = parser.parse_args(argv)
    if args.ner:
        from ..pipeline.ner_model import convert_hf_token_classifier

        convert_hf_token_classifier(args.model_dir, args.out)
        print(f"NER model converted -> {args.out}")
        print(f"export NER_WEIGHTS_PATH={args.out}")
    else:
        convert_encoder(args.model_dir, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
