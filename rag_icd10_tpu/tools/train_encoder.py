"""Contrastive fine-tuning of the sentence encoder on corpus-derived pairs.

The reference consumes a fixed pre-trained checkpoint; this tool makes the
embedder trainable ON TPU as a first-class capability. Training pairs come
from the ICD corpus itself (no external data needed):

- (preferred_zh title, semantic_text) — a record's title should embed
  close to its enriched semantic text (the stored vector)
- (child title, parent title) — ICD hierarchy neighbors pull together
- objective: bidirectional in-batch-negatives InfoNCE
  (sentence-transformers MultipleNegativesRankingLoss)

Usage:
    python -m rag_icd10_tpu.tools.train_encoder \
        --steps 500 --batch 256 --out db/trained
    export EMBEDDING_WEIGHTS_PATH=db/trained/params.npz
    python -m rag_icd10_tpu.tools.build_database --rebuild

Single-device by default; pass --dp/--tp to shard over a mesh
(parallel/train.py rules).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path
from typing import List, Tuple

import numpy as np

logger = logging.getLogger("rag_icd10_tpu.train")


def make_pairs(corpus) -> List[Tuple[str, str]]:
    """Training pairs from the corpus (title<->semantic, child<->parent)."""
    pairs: List[Tuple[str, str]] = []
    title_of = {}
    for code, title in zip(corpus.codes, corpus.titles):
        title_of[code] = title
    for title, semantic in zip(corpus.titles, corpus.semantic_texts):
        pairs.append((title, semantic))
    for code, title, parent in zip(corpus.codes, corpus.titles, corpus.parent_codes):
        parent_title = title_of.get(parent)
        if parent_title and parent_title != title:
            pairs.append((title, parent_title))
    return pairs


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--seq", type=int, default=64)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--out", default="db/trained")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dp", type=int, default=0, help="mesh dp (0 = single device)")
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--log-every", type=int, default=50)
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s"
    )
    from ..utils import enable_compile_cache

    enable_compile_cache()

    import jax
    import optax

    from ..config import get_config
    from ..data.corpus import load_corpus
    from ..models.bert import BertArch, init_params
    from ..models.convert_hf import save_params
    from ..models.tokenizer import WordPieceTokenizer
    from ..parallel.train import make_pair_batch, make_train_step

    cfg = get_config()
    corpus = load_corpus(cfg.data_path)
    pairs = make_pairs(corpus)
    logger.info("built %d training pairs from %d records", len(pairs), len(corpus))

    vocab_path = str(Path(cfg.store.db_path).with_suffix("")) + ".vocab.txt"
    if Path(vocab_path).exists():
        tok = WordPieceTokenizer.from_vocab_file(vocab_path)
    else:
        tok = WordPieceTokenizer.from_corpus(corpus.titles + corpus.semantic_texts)
        tok.save_vocab(vocab_path)

    enc_cfg = cfg.encoder
    arch = BertArch(
        vocab_size=max(enc_cfg.vocab_size, tok.vocab_size),
        hidden_size=enc_cfg.hidden_size,
        num_layers=enc_cfg.num_layers,
        num_heads=enc_cfg.num_heads,
        intermediate_size=enc_cfg.intermediate_size,
        max_position_embeddings=enc_cfg.max_position_embeddings,
    )
    params = init_params(arch, seed=args.seed)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(100, args.steps // 10 + 1),
        decay_steps=args.steps,
    )
    optimizer = optax.adamw(schedule, weight_decay=0.01)
    opt_state = optimizer.init(params)

    if args.dp:
        from ..parallel.mesh import batch_sharding, make_mesh
        from ..parallel.train import init_train_state, make_sharded_train_step

        mesh = make_mesh(dp=args.dp, tp=args.tp)
        params, opt_state, optimizer = init_train_state(
            arch, mesh=mesh, learning_rate=args.lr
        )
        step_fn = make_sharded_train_step(arch, mesh, optimizer)
        b_shard = batch_sharding(mesh)

        def run_step(params, opt_state, batch):
            batch = {k: jax.device_put(v, b_shard) for k, v in batch.items()}
            return step_fn(params, opt_state, batch)
    else:
        step_fn = jax.jit(make_train_step(arch, optimizer), donate_argnums=(0, 1))

        def run_step(params, opt_state, batch):
            return step_fn(params, opt_state, batch)

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(pairs))
    t0 = time.time()
    losses = []
    for step in range(args.steps):
        lo = (step * args.batch) % len(pairs)
        idx = order[lo : lo + args.batch]
        if len(idx) < args.batch:  # wrap + reshuffle each epoch
            order = rng.permutation(len(pairs))
            idx = order[: args.batch]
        batch_pairs = [pairs[i] for i in idx]
        batch = make_pair_batch(
            tok,
            [a for a, _ in batch_pairs],
            [b for _, b in batch_pairs],
            max_length=args.seq,
            pad_rows=args.batch,
        )
        params, opt_state, m = run_step(params, opt_state, batch)
        losses.append(float(m["loss"]))
        if (step + 1) % args.log_every == 0 or step == 0:
            rate = (step + 1) / (time.time() - t0)
            logger.info(
                "step %d/%d loss=%.4f acc=%.3f (%.2f steps/s)",
                step + 1, args.steps, float(m["loss"]),
                float(m["accuracy"]), rate,
            )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    params_host = jax.device_get(params)
    save_params(params_host, str(out / "params.npz"))
    tok.save_vocab(str(out / "vocab.txt"))
    logger.info("saved trained params -> %s/params.npz (final loss %.4f)",
                out, float(np.mean(losses[-args.log_every:])))
    print(f"export EMBEDDING_WEIGHTS_PATH={out}/params.npz")
    print(f"export EMBEDDING_VOCAB_PATH={out}/vocab.txt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
