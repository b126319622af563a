"""Classify raw recall@1 misses: weight inversion vs encoder confusion.

The tiered eval (tools/eval_retrieval.py) reports raw recall@1 around
0.61-0.64 while the full pipeline scores ~1.0 — the gap is recoverable,
but WHERE it comes from decides the next training recipe. Two distinct
mechanisms can put a wrong title at raw rank 1:

  1. weight inversion — the fused level weights (x1.2/1.0/0.8,
     reference quirk kept per SURVEY §2.5#4) demote the gold row: the
     UNWEIGHTED cosine already ranks a gold title first, but a
     higher-level neighbor with cos > w_gold/w_neighbor x cos_gold
     overtakes it once weights fold in. No amount of plain contrastive
     training fixes this; the margin must exceed the weight ratio
     (up to 1.2/0.8 = 1.5x).
  2. encoder confusion — some other title outranks gold even
     unweighted. This IS an encoder-quality miss.

Usage (CPU ok, ~10 min: 800 query encodes):
    python scripts/analyze_misses.py [--out MISSES.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import Counter


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None, help="write JSON report here")
    ap.add_argument("--n", type=int, default=400, help="cases per tier")
    ap.add_argument("--n-uncertainty", type=int, default=0,
                    help="uncertainty-tier cases to classify (0 = skip)")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (outage-safe)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.clear_backends()
        except Exception:
            pass
        jax.devices()
    else:
        from rag_icd10_tpu.utils import guard_device_acquisition

        disarm = guard_device_acquisition(what="miss analysis")
        jax.devices()
        disarm()
    import numpy as np

    from rag_icd10_tpu.eval.retrieval import build_eval_set
    from rag_icd10_tpu.runtime import Engine

    engine = Engine()
    engine.init_encoder()
    store = engine.init_store()
    if not store.num_entities:
        print("no persisted store", file=sys.stderr)
        return 1

    corpus = store.corpus
    vectors = np.asarray(store._vectors, dtype=np.float32)
    weights = corpus.level_weights(store.config.level_weights).astype(
        np.float32
    )
    titles = list(corpus.titles)
    levels = list(corpus.levels)

    tiers = build_eval_set(
        corpus,
        n_exact=args.n,
        n_paraphrase=args.n,
        n_uncertainty=args.n_uncertainty,
        n_multi=0,
        seed=args.seed,
    )
    report = {}
    for tier in tiers:
        if not tier.cases:
            continue
        queries = [c.query for c in tier.cases]
        q = engine.encoder.encode_queries(queries).astype(np.float32)
        raw = q @ vectors.T  # (B, N) unweighted cosine (rows normed)
        wsc = raw * weights[None, :]

        kinds = Counter()
        details = []
        for i, case in enumerate(tier.cases):
            top_w = int(np.argmax(wsc[i]))
            if titles[top_w] in case.gold_titles:
                kinds["hit"] += 1
                continue
            top_r = int(np.argmax(raw[i]))
            gold_rows = [
                j for j, t in enumerate(titles) if t in case.gold_titles
            ]
            g = gold_rows[int(np.argmax(raw[i, gold_rows]))]
            kind = (
                "weight_inversion"
                if titles[top_r] in case.gold_titles
                else "encoder_confusion"
            )
            kinds[kind] += 1
            details.append(
                {
                    "query": case.query,
                    "gold_title": case.source_title,
                    "gold_level": int(levels[g]),
                    "gold_cos": round(float(raw[i, g]), 4),
                    "top1_title": titles[top_w],
                    "top1_level": int(levels[top_w]),
                    "top1_cos": round(float(raw[i, top_w]), 4),
                    "kind": kind,
                    # margin the encoder must open for the gold row to
                    # win WEIGHTED: cos_gold > cos_rival * w_r / w_g
                    "needed_ratio": round(
                        float(
                            raw[i, top_w]
                            * weights[top_w]
                            / max(weights[g], 1e-9)
                            / max(raw[i, g], 1e-9)
                        ),
                        4,
                    ),
                }
            )
        n = len(tier.cases)
        miss = n - kinds["hit"]
        tier_rep = {
            "n": n,
            "recall@1_weighted": round(kinds["hit"] / n, 4),
            "misses": miss,
            "weight_inversion": kinds["weight_inversion"],
            "encoder_confusion": kinds["encoder_confusion"],
            # how level pairs distribute over misses
            "miss_level_pairs": Counter(
                f"gold_l{d['gold_level']}->top_l{d['top1_level']}"
                for d in details
            ).most_common(),
            "examples": details[:40],
        }
        report[tier.name] = tier_rep
        print(
            f"{tier.name}: recall@1={tier_rep['recall@1_weighted']} "
            f"inversion={kinds['weight_inversion']} "
            f"confusion={kinds['encoder_confusion']}"
        )
        for pair, cnt in tier_rep["miss_level_pairs"]:
            print(f"  {pair}: {cnt}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, ensure_ascii=False, indent=1)
        print(f"-> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
