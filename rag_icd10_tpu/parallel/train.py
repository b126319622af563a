"""Contrastive encoder training — sharded over a (dp, tp) mesh.

The reference consumes a pre-trained text2vec checkpoint and never trains
(services/embedding_service.py just loads sentence-transformers weights).
A production deployment needs to FINE-TUNE the embedder on in-domain pairs
(diagnosis text -> ICD title); this module provides that as a TPU-native
capability: in-batch-negatives bidirectional InfoNCE (the sentence-
transformers MultipleNegativesRankingLoss objective) under pjit, with
Megatron-TP parameter sharding (parallel/mesh.py) and dp-sharded batches.

XLA inserts all collectives from the sharding annotations — there is no
hand-written all-reduce here.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.bert import BertArch, SentenceBert, init_params
from .mesh import batch_sharding, param_shardings


def contrastive_loss(za: jnp.ndarray, zb: jnp.ndarray, temperature: float = 0.05):
    """Bidirectional in-batch-negatives InfoNCE over L2-normalized
    embeddings. za/zb: (B, H), row i of za pairs with row i of zb."""
    logits = (za @ zb.T) / temperature  # (B, B)
    labels = jnp.arange(za.shape[0])
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_b = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = 0.5 * (loss_a.mean() + loss_b.mean())
    accuracy = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return loss, accuracy


def make_train_step(arch: BertArch, optimizer, temperature: float = 0.05):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state,
    metrics). Pure function, ready to jit with shardings."""
    model = SentenceBert(arch)

    def loss_fn(params, batch):
        za = model.apply(
            {"params": params}, batch["a_ids"], batch["a_mask"], batch["a_types"]
        )
        zb = model.apply(
            {"params": params}, batch["b_ids"], batch["b_mask"], batch["b_types"]
        )
        loss, acc = contrastive_loss(za, zb, temperature)
        return loss, acc

    def train_step(params, opt_state, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return train_step


def init_train_state(
    arch: BertArch,
    mesh: Optional[Mesh] = None,
    learning_rate: float = 2e-5,
    seed: int = 0,
):
    """Initialize (params, opt_state, optimizer), device-sharded if a mesh
    is given."""
    params = init_params(arch, seed=seed)
    optimizer = optax.adamw(learning_rate, weight_decay=0.01)
    opt_state = optimizer.init(params)
    if mesh is not None:
        shardings = param_shardings(mesh, params)
        params = jax.device_put(params, shardings)
        # optimizer state mirrors param sharding where shaped like params
        opt_state = jax.device_put(
            opt_state,
            jax.tree_util.tree_map(
                lambda x: NamedSharding(mesh, P()), opt_state,
                is_leaf=lambda x: hasattr(x, "shape"),
            ),
        )
    return params, opt_state, optimizer


def make_sharded_train_step(
    arch: BertArch, mesh: Mesh, optimizer, temperature: float = 0.05
):
    """jit the train step with explicit in/out shardings over the mesh.

    Batches are dp-sharded on the leading axis; params follow the TP rules.
    XLA derives the gradient all-reduces and TP collectives.
    """
    train_step = make_train_step(arch, optimizer, temperature)
    dummy = init_params(arch, seed=0)
    p_shard = param_shardings(mesh, dummy)
    del dummy
    b_shard = batch_sharding(mesh)
    o_shard = NamedSharding(mesh, P())

    def batch_shardings(batch):
        return {k: b_shard for k in batch}

    def compiled(params, opt_state, batch):
        fn = jax.jit(
            train_step,
            in_shardings=(
                p_shard,
                jax.tree_util.tree_map(
                    lambda x: o_shard, opt_state,
                    is_leaf=lambda x: hasattr(x, "shape"),
                ),
                batch_shardings(batch),
            ),
            out_shardings=(p_shard, None, None),
            donate_argnums=(0, 1),
        )
        return fn(params, opt_state, batch)

    return compiled


def contrastive_train_step(params, opt_state, batch, arch, optimizer):
    """Convenience single-device step (tests)."""
    return make_train_step(arch, optimizer)(params, opt_state, batch)


def make_pair_batch(
    tokenizer, texts_a, texts_b, max_length: int = 64, pad_rows: Optional[int] = None
) -> Dict[str, jnp.ndarray]:
    """Tokenize a pair batch into static-shape arrays."""
    a_ids, a_mask, a_types = tokenizer.encode_batch(
        texts_a, max_length=max_length, buckets=(max_length,), pad_batch_to=pad_rows
    )
    b_ids, b_mask, b_types = tokenizer.encode_batch(
        texts_b, max_length=max_length, buckets=(max_length,), pad_batch_to=pad_rows
    )
    return {
        "a_ids": a_ids, "a_mask": a_mask, "a_types": a_types,
        "b_ids": b_ids, "b_mask": b_mask, "b_types": b_types,
    }
