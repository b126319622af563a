"""Batched TPU sentence encoder — the EmbeddingService replacement.

API parity with the reference (services/embedding_service.py:75-149):
``encode_single``, ``encode_batch``, ``encode_query``, ``encode_icd_record``,
``get_model_info``, ``test_embedding`` — same semantics (L2-normalized
vectors; E5-style "query: "/"passage: " prefixes applied only for e5-family
models; 512-token cap).

TPU-first differences:
- the forward is a single jitted XLA program; texts are tokenized to static
  (rows, seq) shapes drawn from a small bucket grid, so the whole corpus
  build and any request batch reuse a handful of compiled programs;
- one device call encodes a whole batch (the reference loops per text at
  build time, tools/build_database.py:217-233);
- weights live on device once; nothing is re-transferred per call.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderConfig
from .bert import BertArch, SentenceBert, init_params
from .tokenizer import WordPieceTokenizer


def _next_pow2(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


class TextEncoder:
    """JAX BERT sentence encoder with length/batch bucketing."""

    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        tokenizer: Optional[WordPieceTokenizer] = None,
        params: Optional[Dict] = None,
        seed: int = 0,
    ):
        self.config = config or EncoderConfig()
        cfg = self.config

        if tokenizer is not None:
            self.tokenizer = tokenizer
        elif cfg.vocab_path:
            self.tokenizer = WordPieceTokenizer.from_vocab_file(cfg.vocab_path)
        else:
            # corpus-independent deterministic fallback: built lazily from
            # first encodes would break determinism, so default to a vocab
            # over the configured corpus when available.
            from ..data.corpus import load_corpus
            from ..config import get_config

            corpus = load_corpus(get_config().data_path)
            self.tokenizer = WordPieceTokenizer.from_corpus(
                corpus.titles + corpus.semantic_texts
            )

        self.arch = BertArch(
            vocab_size=max(cfg.vocab_size, self.tokenizer.vocab_size),
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            type_vocab_size=cfg.type_vocab_size,
            layer_norm_eps=cfg.layer_norm_eps,
            compute_dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
        )
        self.model = SentenceBert(self.arch)

        if params is not None:
            self.params = params
        elif cfg.weights_path:
            from .convert_hf import load_params

            self.params = load_params(cfg.weights_path)
        else:
            self.params = init_params(self.arch, seed=seed)
        # pin params on the default device once
        self.params = jax.device_put(self.params)

        self._jit_forward = jax.jit(
            lambda params, ids, mask, types: self.model.apply(
                {"params": params}, ids, mask, types
            )
        )
        self._num_encodes = 0

    # ----------------------------------------------------------- internals

    def _prefixed(self, texts: Sequence[str], kind: str) -> List[str]:
        """E5 prefixes only for e5-family models (reference:
        embedding_service.py:68-73,117-120); text2vec ignores prefixes."""
        if not self.config.is_e5:
            return list(texts)
        prefix = (
            self.config.query_prefix if kind == "query" else self.config.passage_prefix
        )
        return [t if t.startswith(prefix) else prefix + t for t in texts]

    def _forward(self, texts: Sequence[str]) -> np.ndarray:
        cfg = self.config
        ids, mask, types = self.tokenizer.encode_batch(
            texts,
            max_length=cfg.max_length,
            buckets=cfg.length_buckets,
            pad_batch_to=_next_pow2(len(texts)),
        )
        out = self._jit_forward(self.params, ids, mask, types)
        self._num_encodes += len(texts)
        return np.asarray(out[: len(texts)], dtype=np.float32)

    # ------------------------------------------------------------- public

    @property
    def dim(self) -> int:
        return self.config.hidden_size

    def encode_batch(
        self, texts: Sequence[str], kind: str = "passage", batch_size: Optional[int] = None
    ) -> np.ndarray:
        """Encode many texts -> (n, dim) float32, L2-normalized.

        Device-batched; ``batch_size`` bounds a single device call (default
        256 — the reference uses 32 on CPU/GPU, embedding_service.py:27).
        """
        if len(texts) == 0:
            return np.zeros((0, self.dim), dtype=np.float32)
        texts = self._prefixed(texts, kind)
        step = batch_size or 256
        outs = [
            self._forward(texts[i : i + step]) for i in range(0, len(texts), step)
        ]
        return np.concatenate(outs, axis=0)

    def encode_batch_device(
        self,
        texts: Sequence[str],
        kind: str = "query",
        batch_size: Optional[int] = None,
    ):
        """Like ``encode_batch`` but returns the DEVICE array without
        forcing a host transfer — callers that feed the embeddings
        straight into a device-side search (VectorStore.search accepts
        jax arrays) skip a host->device round trip per batch (~30 ms
        through the axon tunnel; the serving hot path uses this)."""
        import jax.numpy as jnp

        if len(texts) == 0:
            return jnp.zeros((0, self.dim), dtype=jnp.float32)
        cfg = self.config
        texts = self._prefixed(texts, kind)
        step = batch_size or 256
        outs = []
        for i in range(0, len(texts), step):
            chunk = texts[i : i + step]
            ids, mask, types = self.tokenizer.encode_batch(
                chunk,
                max_length=cfg.max_length,
                buckets=cfg.length_buckets,
                pad_batch_to=_next_pow2(len(chunk)),
            )
            out = self._jit_forward(self.params, ids, mask, types)
            outs.append(out[: len(chunk)].astype(jnp.float32))
            self._num_encodes += len(chunk)
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def encode_queries_device(self, texts: Sequence[str]):
        return self.encode_batch_device(texts, kind="query")

    def encode_single(self, text: str) -> np.ndarray:
        return self.encode_batch([text], kind="passage")[0]

    def encode_query(self, text: str) -> np.ndarray:
        return self.encode_batch([text], kind="query")[0]

    def encode_queries(self, texts: Sequence[str]) -> np.ndarray:
        return self.encode_batch(texts, kind="query")

    def encode_icd_record(self, record) -> np.ndarray:
        """Embed an ICD record's preferred_zh title (reference:
        embedding_service.py:106-115)."""
        title = record.preferred_zh if hasattr(record, "preferred_zh") else str(record)
        return self.encode_batch([title], kind="passage")[0]

    def get_model_info(self) -> Dict:
        return {
            "model_name": self.config.model_name,
            "embedding_dimension": self.dim,
            "max_seq_length": self.config.max_length,
            "device": str(jax.devices()[0]),
            "dtype": self.config.dtype,
            "vocab_size": self.tokenizer.vocab_size,
            "num_layers": self.arch.num_layers,
            "texts_encoded": self._num_encodes,
        }

    def test_embedding(self) -> bool:
        """Runtime self-check (reference: embedding_service.py:135-149)."""
        try:
            vec = self.encode_single("测试文本")
            return vec.shape == (self.dim,) and bool(
                np.isfinite(vec).all() and abs(np.linalg.norm(vec) - 1.0) < 1e-3
            )
        except Exception:
            return False
