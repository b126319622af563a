"""JAX token-classification NER model (model mode of MedicalNERService).

The reference runs an HF token-classification pipeline
(lixin12345/chinese-medical-ner) with aggregation_strategy="simple"
(reference: services/medical_ner_service.py:68-101, :177-229). Here the
same architecture — BERT encoder + per-token linear head — runs through
this framework's flax BERT on TPU, with converted weights.

Weight source: a local HF checkpoint directory converted by
tools/convert_weights.py (config.json supplies id2label). Without weights
the service falls back to rule mode upstream.

Span aggregation reproduces HF's "simple" strategy: argmax per token,
strip B-/I- prefixes, merge adjacent tokens sharing an entity label,
score = mean softmax probability over the span.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from ..models.bert import BertArch


def build_token_classifier(arch: BertArch, num_labels: int):
    """The BERT + per-token linear head module. SINGLE definition shared
    by inference (JaxTokenClassifier) and training (tools/train_ner) so
    the flax param tree ('bert', 'classifier' submodules) can never
    drift between saved checkpoints and the loader."""
    import jax.numpy as jnp
    from flax import linen as nn

    from ..models.bert import BertEncoder

    class TokenClassifier(nn.Module):
        arch: BertArch
        num_labels: int

        @nn.compact
        def __call__(self, ids, mask, types):
            hidden = BertEncoder(self.arch, name="bert")(ids, mask, types)
            logits = nn.Dense(
                self.num_labels, dtype=jnp.float32, name="classifier"
            )(hidden)
            return logits

    return TokenClassifier(arch, num_labels=num_labels)


class JaxTokenClassifier:
    """BERT + token-classification head, jitted, with span aggregation."""

    def __init__(self, arch: BertArch, params: Dict, id2label: Dict[int, str],
                 tokenizer=None):
        import jax

        self.arch = arch
        self.id2label = {int(k): v for k, v in id2label.items()}
        self.tokenizer = tokenizer
        self.model = build_token_classifier(arch, num_labels=len(self.id2label))
        self.params = jax.device_put(params)
        self._jit = jax.jit(
            lambda p, ids, mask, types: jax.nn.softmax(
                self.model.apply({"params": p}, ids, mask, types), axis=-1
            )
        )

    # ------------------------------------------------------------ loading

    @classmethod
    def from_weights(cls, weights_dir: str) -> "JaxTokenClassifier":
        """Load from a converted checkpoint dir: params.npz + config.json +
        vocab.txt (produced by tools/convert_weights.py --ner)."""
        from ..models.convert_hf import load_params
        from ..models.tokenizer import WordPieceTokenizer

        d = Path(weights_dir)
        config = json.loads((d / "config.json").read_text())
        arch = BertArch(
            vocab_size=config.get("vocab_size", 21128),
            hidden_size=config.get("hidden_size", 768),
            num_layers=config.get("num_hidden_layers", 12),
            num_heads=config.get("num_attention_heads", 12),
            intermediate_size=config.get("intermediate_size", 3072),
            max_position_embeddings=config.get("max_position_embeddings", 512),
        )
        params = load_params(str(d / "params.npz"))
        tokenizer = WordPieceTokenizer.from_vocab_file(str(d / "vocab.txt"))
        return cls(arch, params, config["id2label"], tokenizer)

    # ---------------------------------------------------------- inference

    def predict(
        self, text: str, max_length: int = 512
    ) -> List[Tuple[str, str, float, int, int]]:
        """-> [(span_text, label, score, start, end)] using HF 'simple'
        aggregation over per-CHARACTER tokens (Chinese WordPiece)."""
        if not text or self.tokenizer is None:
            return []
        # never index positions the checkpoint wasn't trained for:
        # flax nn.Embed clamps out-of-range lookups silently, which would
        # produce garbage tags instead of an error
        max_length = min(max_length, self.arch.max_position_embeddings)
        from ..models.tokenizer import basic_tokenize

        # char-level tokens with source offsets
        tokens: List[str] = []
        offsets: List[Tuple[int, int]] = []
        pos = 0
        for tok in basic_tokenize(text):
            for piece in self.tokenizer.wordpiece(tok):
                raw = piece[2:] if piece.startswith("##") else piece
                start = text.find(raw, pos) if raw != "[UNK]" else pos
                if start < 0:
                    start = pos
                tokens.append(piece)
                offsets.append((start, start + max(len(raw), 1)))
                pos = start + len(raw) if raw != "[UNK]" else pos + 1
        if not tokens:
            return []
        tokens = tokens[: max_length - 2]
        offsets = offsets[: max_length - 2]
        ids = (
            [self.tokenizer.cls_id]
            + [self.tokenizer.vocab.get(t, self.tokenizer.unk_id) for t in tokens]
            + [self.tokenizer.sep_id]
        )
        seq = len(ids)
        pad_to = 1
        while pad_to < seq:
            pad_to *= 2
        # pow2 padding must not exceed the trained position table either
        pad_to = min(pad_to, self.arch.max_position_embeddings)
        arr = np.full((1, pad_to), self.tokenizer.pad_id, dtype=np.int32)
        arr[0, :seq] = ids
        mask = np.zeros((1, pad_to), dtype=np.int32)
        mask[0, :seq] = 1
        probs = np.asarray(self._jit(self.params, arr, mask, np.zeros_like(arr)))
        probs = probs[0, 1 : 1 + len(tokens)]  # strip CLS, PAD, SEP

        label_ids = probs.argmax(axis=-1)
        scores = probs.max(axis=-1)

        # 'simple' aggregation: merge adjacent tokens with same entity label
        spans: List[Tuple[str, str, float, int, int]] = []
        cur_label, cur_start, cur_end, cur_scores = None, 0, 0, []
        for i, (lid, sc) in enumerate(zip(label_ids, scores)):
            raw = self.id2label.get(int(lid), "O")
            entity = raw.split("-", 1)[-1] if raw != "O" else None
            begins = raw.startswith("B-")
            if entity is None:
                if cur_label is not None:
                    spans.append(
                        (
                            text[cur_start:cur_end],
                            cur_label,
                            float(np.mean(cur_scores)),
                            cur_start,
                            cur_end,
                        )
                    )
                    cur_label = None
                continue
            if cur_label == entity and not begins:
                cur_end = offsets[i][1]
                cur_scores.append(sc)
            else:
                if cur_label is not None:
                    spans.append(
                        (
                            text[cur_start:cur_end],
                            cur_label,
                            float(np.mean(cur_scores)),
                            cur_start,
                            cur_end,
                        )
                    )
                cur_label = entity
                cur_start, cur_end = offsets[i]
                cur_scores = [sc]
        if cur_label is not None:
            spans.append(
                (
                    text[cur_start:cur_end],
                    cur_label,
                    float(np.mean(cur_scores)),
                    cur_start,
                    cur_end,
                )
            )
        return spans


def convert_hf_token_classifier(model_dir: str, out_dir: str) -> None:
    """Convert an HF BertForTokenClassification checkpoint directory into
    this framework's format (params.npz + config.json + vocab.txt)."""
    import shutil

    from ..models.convert_hf import convert_state_dict, load_torch_state_dict, save_params

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
    sd = load_torch_state_dict(str(d))
    params = convert_state_dict(sd, arch)
    # classifier head
    cls_w = None
    for key in ("classifier.weight",):
        if key in sd:
            cls_w = np.asarray(sd[key], dtype=np.float32)
            cls_b = np.asarray(sd["classifier.bias"], dtype=np.float32)
    if cls_w is None:
        raise ValueError("no classifier head found in state dict")
    params["classifier"] = {"kernel": cls_w.T, "bias": cls_b}
    save_params(params, str(out / "params.npz"))
    (out / "config.json").write_text(json.dumps(config))
    shutil.copy(d / "vocab.txt", out / "vocab.txt")
