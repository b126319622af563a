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
import numpy as np
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


def contrastive_loss_masked(
    za: jnp.ndarray,
    zb: jnp.ndarray,
    group_a: jnp.ndarray,
    group_b: jnp.ndarray,
    zh: Optional[jnp.ndarray] = None,
    h_group: Optional[jnp.ndarray] = None,
    temperature: float = 0.05,
    w_b: Optional[jnp.ndarray] = None,
    w_h: Optional[jnp.ndarray] = None,
):
    """InfoNCE with duplicate-collision masking and optional hard negatives.

    The ICD corpus has ~5.5k records sharing a title with another record;
    naive in-batch negatives then present a VALID positive as a negative
    (two codes, same title -> same anchor text), which poisons training.
    ``group_a``/``group_b`` carry per-row integer title ids for the anchor
    text and for the record behind the positive text; off-diagonal logits
    where either id collides are masked to -inf (the mask is symmetric, so
    it is valid for both directions of the bidirectional loss).

    ``zh`` (B, H) are explicit hard negatives (sibling titles under the
    same parent — the actually-confusable class). Every anchor sees ALL
    hard negatives in the batch; hard-negative columns whose title id
    equals the anchor's own or its positive's title id are masked
    (cross-example false negatives).

    ``w_b``/``w_h`` (B,) optionally fold the SERVED level weights
    (config.StoreConfig.level_weights ×1.2/1.0/0.8, fused into every
    search — SURVEY §2.5#4) into the loss: each comparison column j is
    scored w_j·cos instead of cos, so the softmax ranks candidates
    exactly as the weighted search will. A detail-level gold row
    (w=0.8) must then out-embed a chapter-level rival (w=1.2) by the
    full 1.5× ratio to win — plain cosine InfoNCE declares victory at
    any positive margin and leaves those serving-time inversions in
    place (measured on the incumbent encoder: 97% of exact-tier and
    87% of paraphrase-tier raw recall@1 misses are weight inversions,
    scripts/analyze_misses.py). The reverse direction uses
    the same weighted matrix transposed: a per-row constant scale
    inside softmax only changes that row's effective temperature
    (≤20%), never its ordering.
    """
    b = za.shape[0]
    logits_pos = za @ zb.T  # (B, B)
    if w_b is not None:
        logits_pos = logits_pos * w_b[None, :]
    logits_pos = logits_pos / temperature
    # collide on anchor-anchor, positive-positive AND the cross terms:
    # anchor i's title equal to the title of the record behind positive j
    # (e.g. a parent-pair row whose parent is titled like another row's
    # anchor) also makes zb[j] a valid positive for anchor i
    same = (
        (group_a[:, None] == group_a[None, :])
        | (group_b[:, None] == group_b[None, :])
        | (group_a[:, None] == group_b[None, :])
        | (group_b[:, None] == group_a[None, :])
    )
    off_diag = ~jnp.eye(b, dtype=bool)
    logits_pos = jnp.where(same & off_diag, -1e9, logits_pos)
    labels = jnp.arange(b)
    if zh is not None:
        logits_hn = za @ zh.T  # (B, B)
        if w_h is not None:
            logits_hn = logits_hn * w_h[None, :]
        logits_hn = logits_hn / temperature
        false_neg = (h_group[None, :] == group_a[:, None]) | (
            h_group[None, :] == group_b[:, None]
        )
        logits_hn = jnp.where(false_neg, -1e9, logits_hn)
        logits_fwd = jnp.concatenate([logits_pos, logits_hn], axis=1)  # (B, 2B)
    else:
        logits_fwd = logits_pos
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits_fwd, labels)
    loss_b = optax.softmax_cross_entropy_with_integer_labels(logits_pos.T, labels)
    loss = 0.5 * (loss_a.mean() + loss_b.mean())
    accuracy = jnp.mean(jnp.argmax(logits_fwd, axis=1) == labels)
    return loss, accuracy


def make_train_step(arch: BertArch, optimizer, temperature: float = 0.05):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state,
    metrics). Pure function, ready to jit with shardings.

    Batch keys decide the objective at trace time:
    - a_*/b_* only                    -> plain bidirectional InfoNCE
    - + "group_a"/"group_b"           -> duplicate-title masking
    - + h_*/"h_group"                 -> masked InfoNCE with hard negatives
      (anchors and hard negatives share one stacked forward — same seq len,
      twice the rows, better MXU utilization than two half-size calls)
    """
    model = SentenceBert(arch)

    def loss_fn(params, batch):
        if "h_ids" in batch and "group_a" not in batch:
            raise ValueError(
                "hard-negative batches require group_a/group_b/h_group "
                "(plain InfoNCE would silently ignore the hard negatives)"
            )
        if "h_ids" in batch and "h_group" not in batch:
            raise ValueError("h_ids given without h_group title ids")
        if "h_ids" in batch:
            ids = jnp.concatenate([batch["a_ids"], batch["h_ids"]], axis=0)
            msk = jnp.concatenate([batch["a_mask"], batch["h_mask"]], axis=0)
            typ = jnp.concatenate([batch["a_types"], batch["h_types"]], axis=0)
            zah = model.apply({"params": params}, ids, msk, typ)
            b = batch["a_ids"].shape[0]
            za, zh = zah[:b], zah[b:]
        else:
            za = model.apply(
                {"params": params}, batch["a_ids"], batch["a_mask"], batch["a_types"]
            )
            zh = None
        zb = model.apply(
            {"params": params}, batch["b_ids"], batch["b_mask"], batch["b_types"]
        )
        if "group_a" in batch:
            loss, acc = contrastive_loss_masked(
                za, zb, batch["group_a"], batch["group_b"],
                zh, batch.get("h_group"), temperature,
                w_b=batch.get("w_b"), w_h=batch.get("w_h"),
            )
        else:
            loss, acc = contrastive_loss(za, zb, temperature)
        return loss, acc

    def train_step(params, opt_state, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return train_step


def opt_state_shardings(mesh: Mesh, params, opt_state):
    """Shardings for an optax state tree: leaves that live inside a
    param-shaped subtree (Adam mu/nu mirror the param tree paths) get the
    matching param sharding; scalars/counters replicate. Replicating the
    whole state (2x param bytes for Adam) would defeat TP's memory
    savings."""
    from .mesh import _spec_for_path

    p_shards = {}
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(_key_str(k) for k in path)
        p_shards[keys] = NamedSharding(mesh, _spec_for_path("/".join(keys)))

    def lookup(path, leaf):
        keys = tuple(_key_str(k) for k in path)
        # match the longest param-path suffix (mu/nu nest the param tree
        # under a state-tuple prefix)
        for start in range(len(keys)):
            if keys[start:] in p_shards and getattr(leaf, "shape", None):
                return p_shards[keys[start:]]
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(lookup, opt_state)


def _key_str(k) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def init_train_state(
    arch: BertArch,
    mesh: Optional[Mesh] = None,
    learning_rate: float = 2e-5,
    seed: int = 0,
    optimizer=None,
    params=None,
    opt_state=None,
):
    """Initialize (params, opt_state, optimizer), device-sharded if a mesh
    is given. Pass ``optimizer`` to keep a caller-built schedule (e.g.
    warmup-cosine) instead of the plain adamw default. Pass ``params``
    (and optionally a restored ``opt_state``) to shard an existing
    host-side state instead of re-initializing — a warm start / resume
    must survive the dp path (train_encoder --dp --init-from used to
    silently discard the checkpoint here and gate freshly random
    weights)."""
    if params is None:
        params = init_params(arch, seed=seed)
    if optimizer is None:
        optimizer = optax.adamw(learning_rate, weight_decay=0.01)
    if opt_state is None:
        opt_state = optimizer.init(params)
    if mesh is not None:
        # multihost-aware placement: identical (deterministic-seed) host
        # values on every process; each materializes only its shards
        from .multihost import global_device_put

        shardings = param_shardings(mesh, params)
        params = jax.tree_util.tree_map(
            lambda x, s: global_device_put(np.asarray(x), s),
            params, shardings,
        )
        opt_state = jax.tree_util.tree_map(
            lambda x, s: global_device_put(np.asarray(x), s),
            opt_state, opt_state_shardings(mesh, params, opt_state),
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
    del dummy  # p_shard carries the identical tree structure/paths
    b_shard = batch_sharding(mesh)
    o_shard_cache = []

    def batch_shardings(batch):
        return {k: b_shard for k in batch}

    def compiled(params, opt_state, batch):
        if not o_shard_cache:
            # the sharding tree is identical every step; compute once.
            # p_shard's tree paths mirror the param tree, so it supplies
            # the path->spec mapping without retaining a host param copy.
            o_shard_cache.append(opt_state_shardings(mesh, p_shard, opt_state))
        o_shard = o_shard_cache[0]
        fn = jax.jit(
            train_step,
            in_shardings=(p_shard, o_shard, batch_shardings(batch)),
            # pin the opt-state output layout too, or XLA picks its own
            # and every step pays a reshard back to the input layout
            out_shardings=(p_shard, o_shard, None),
            donate_argnums=(0, 1),
        )
        return fn(params, opt_state, batch)

    return compiled


def contrastive_train_step(params, opt_state, batch, arch, optimizer):
    """Convenience single-device step (tests)."""
    return make_train_step(arch, optimizer)(params, opt_state, batch)


def make_triplet_batch(
    tokenizer,
    texts_a,
    texts_b,
    texts_h,
    group_a,
    group_b,
    h_group,
    seq_a: int = 48,
    seq_b: int = 96,
    pad_rows: Optional[int] = None,
    w_b=None,
    w_h=None,
) -> Dict[str, jnp.ndarray]:
    """Tokenize an (anchor, positive, hard-negative) batch with title-group
    ids into static-shape arrays for the masked-loss train step.

    Anchors and hard negatives are short titles (seq_a); positives are
    semantic_texts, whose p99 length is ~94 chars in the real corpus, so
    they get their own longer bucket (seq_b) instead of truncating at the
    anchor length.

    ``w_b``/``w_h`` optionally carry the served level weight of the
    record behind each positive / each hard-negative title; when given,
    the train step folds them into the logits (contrastive_loss_masked)
    so training ranks by the weighted serving score. Padding rows get
    weight 1.0 (their logits are already masked by group collisions).
    """
    a_ids, a_mask, a_types = tokenizer.encode_batch(
        texts_a, max_length=seq_a, buckets=(seq_a,), pad_batch_to=pad_rows
    )
    b_ids, b_mask, b_types = tokenizer.encode_batch(
        texts_b, max_length=seq_b, buckets=(seq_b,), pad_batch_to=pad_rows
    )
    h_ids, h_mask, h_types = tokenizer.encode_batch(
        texts_h, max_length=seq_a, buckets=(seq_a,), pad_batch_to=pad_rows
    )
    import numpy as np

    out = {
        "a_ids": a_ids, "a_mask": a_mask, "a_types": a_types,
        "b_ids": b_ids, "b_mask": b_mask, "b_types": b_types,
        "h_ids": h_ids, "h_mask": h_mask, "h_types": h_types,
        "group_a": np.asarray(group_a, np.int32),
        "group_b": np.asarray(group_b, np.int32),
        "h_group": np.asarray(h_group, np.int32),
    }
    if w_b is not None:
        rows = a_ids.shape[0]
        wb = np.ones(rows, np.float32)
        wb[: len(w_b)] = np.asarray(w_b, np.float32)
        wh = np.ones(rows, np.float32)
        if w_h is not None:
            wh[: len(w_h)] = np.asarray(w_h, np.float32)
        out["w_b"], out["w_h"] = wb, wh
    return out


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
