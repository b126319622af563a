"""Convert HuggingFace BERT weights -> rag_icd10_tpu flax params.

Lets a real ``shibing624/text2vec-base-chinese`` (or any BERT-base)
checkpoint drop into the JAX encoder (reference loads it through
sentence-transformers, services/embedding_service.py:47-66). Works from a
local directory containing ``pytorch_model.bin``/``model.safetensors`` +
``vocab.txt`` — no network access required.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

from .bert import BertArch


def convert_state_dict(state_dict: Dict[str, "np.ndarray"], arch: BertArch) -> Dict:
    """Map an HF BertModel state_dict (numpy arrays) to our param tree."""

    def npy(key):
        t = state_dict[key]
        return np.asarray(t, dtype=np.float32)

    def dense(prefix):
        return {"kernel": npy(f"{prefix}.weight").T, "bias": npy(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": npy(f"{prefix}.weight"), "bias": npy(f"{prefix}.bias")}

    # tolerate a leading "bert." (BertModel inside BertForX) prefix
    if not any(k.startswith("embeddings.") for k in state_dict):
        state_dict = {
            k.split(".", 1)[1]: v for k, v in state_dict.items() if "." in k
        }

    bert: Dict = {
        "word_embeddings": {"embedding": npy("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": npy("embeddings.position_embeddings.weight")
        },
        "token_type_embeddings": {
            "embedding": npy("embeddings.token_type_embeddings.weight")
        },
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(arch.num_layers):
        p = f"encoder.layer.{i}"
        bert[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{p}.attention.self.query"),
                "key": dense(f"{p}.attention.self.key"),
                "value": dense(f"{p}.attention.self.value"),
                "out": dense(f"{p}.attention.output.dense"),
            },
            "attention_ln": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "output_ln": ln(f"{p}.output.LayerNorm"),
        }
    return {"bert": bert}


def load_torch_state_dict(model_dir: str) -> Dict[str, "np.ndarray"]:
    """Read pytorch_model.bin or model.safetensors from a local dir."""
    d = Path(model_dir)
    st_path = d / "model.safetensors"
    if st_path.exists():
        try:
            from safetensors.numpy import load_file

            return load_file(str(st_path))
        except ImportError:
            pass
    bin_path = d / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        sd = torch.load(str(bin_path), map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model weights found under {model_dir}")


def convert_model_dir(model_dir: str, arch: BertArch) -> Dict:
    return convert_state_dict(load_torch_state_dict(model_dir), arch)


def save_params(params: Dict, path: str) -> None:
    """Persist a param tree as a flat npz (keys joined with '/')."""
    flat: Dict[str, np.ndarray] = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_params(path: str) -> Dict:
    flat = np.load(path)
    tree: Dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree
