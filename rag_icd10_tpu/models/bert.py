"""BERT-base encoder in flax — the TPU replacement for the reference's torch
SentenceTransformer forward (reference: services/embedding_service.py:47-104).

text2vec-base-chinese is a standard post-LayerNorm BERT-base (12 layers,
768 hidden, 12 heads) with mean pooling + L2 normalization on top
(sentence-transformers' `normalize_embeddings=True`,
reference: embedding_service.py:81,101,120).

TPU design notes:
- All shapes static; attention mask is an additive bias so padding never
  contributes (compare HF's extended_attention_mask).
- Matmuls run in ``compute_dtype`` (bf16 by default) with fp32 accumulation
  via ``preferred_element_type``-equivalent dot settings; LayerNorm, softmax,
  pooling and the final L2 normalize stay fp32 for encoder parity.
- Mean pooling is a masked matmul-free reduction fused by XLA into the last
  layer's epilogue.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class BertArch:
    vocab_size: int = 21128
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    compute_dtype: Any = jnp.bfloat16


class BertSelfAttention(nn.Module):
    arch: BertArch

    @nn.compact
    def __call__(self, hidden, attn_bias):
        a = self.arch
        head_dim = a.hidden_size // a.num_heads
        dense = lambda name: nn.Dense(
            a.hidden_size, dtype=a.compute_dtype, param_dtype=jnp.float32, name=name
        )
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)

        def split(x):  # (B, S, H) -> (B, heads, S, head_dim)
            b, s, _ = x.shape
            return x.reshape(b, s, a.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(head_dim))
        scores = scores + attn_bias  # (B, 1, 1, S) additive mask
        probs = jax.nn.softmax(scores, axis=-1).astype(a.compute_dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, h, s, d = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return dense("out")(ctx)


class BertLayer(nn.Module):
    arch: BertArch

    @nn.compact
    def __call__(self, hidden, attn_bias):
        a = self.arch
        attn_out = BertSelfAttention(a, name="attention")(hidden, attn_bias)
        hidden = nn.LayerNorm(
            epsilon=a.layer_norm_eps, dtype=jnp.float32, name="attention_ln"
        )(hidden + attn_out)
        inter = nn.Dense(
            a.intermediate_size,
            dtype=a.compute_dtype,
            param_dtype=jnp.float32,
            name="intermediate",
        )(hidden.astype(a.compute_dtype))
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(
            a.hidden_size,
            dtype=a.compute_dtype,
            param_dtype=jnp.float32,
            name="output",
        )(inter)
        return nn.LayerNorm(
            epsilon=a.layer_norm_eps, dtype=jnp.float32, name="output_ln"
        )(hidden + out)


class BertEncoder(nn.Module):
    """Token ids -> token-level hidden states (fp32)."""

    arch: BertArch

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids):
        a = self.arch
        b, s = input_ids.shape
        word = nn.Embed(
            a.vocab_size, a.hidden_size, param_dtype=jnp.float32, name="word_embeddings"
        )(input_ids)
        pos_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
        pos = nn.Embed(
            a.max_position_embeddings,
            a.hidden_size,
            param_dtype=jnp.float32,
            name="position_embeddings",
        )(pos_ids)
        typ = nn.Embed(
            a.type_vocab_size,
            a.hidden_size,
            param_dtype=jnp.float32,
            name="token_type_embeddings",
        )(token_type_ids)
        hidden = nn.LayerNorm(
            epsilon=a.layer_norm_eps, dtype=jnp.float32, name="embeddings_ln"
        )(word + pos + typ)

        attn_bias = (1.0 - attention_mask.astype(jnp.float32)) * jnp.finfo(
            jnp.float32
        ).min
        attn_bias = attn_bias[:, None, None, :]

        for i in range(a.num_layers):
            hidden = BertLayer(a, name=f"layer_{i}")(hidden, attn_bias)
        return hidden.astype(jnp.float32)


class SentenceBert(nn.Module):
    """BERT + masked mean pooling + L2 normalize -> sentence embeddings."""

    arch: BertArch

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids):
        hidden = BertEncoder(self.arch, name="bert")(
            input_ids, attention_mask, token_type_ids
        )
        mask = attention_mask.astype(jnp.float32)[:, :, None]
        summed = jnp.sum(hidden * mask, axis=1)
        counts = jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
        mean = summed / counts
        norm = jnp.maximum(jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-12)
        return mean / norm


def init_params(arch: BertArch, seed: int = 0) -> Dict:
    """Deterministic random init (used when no converted weights exist)."""
    model = SentenceBert(arch)
    dummy = jnp.zeros((1, 8), dtype=jnp.int32)
    return model.init(
        jax.random.PRNGKey(seed), dummy, jnp.ones_like(dummy), dummy
    )["params"]
