"""Corpus-sharding scale demo: flat search over a mesh at 25x corpus size.

Runs on the virtual 8-device CPU mesh (or a real slice): a 1M-row corpus
is row-sharded over 8 devices; each scans its shard and the per-shard
top-k merges with one all_gather. Verifies exactness against numpy and
reports per-scan time. This is the code path that takes the same engine
from the 40k ICD corpus to 100M+ rows on a pod slice (docs/SCALING.md).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python -m benchmarks.sharded [--rows 1000000] [--dim 128]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--queries", type=int, default=8)
    parser.add_argument("--k", type=int, default=10)
    args = parser.parse_args()

    import os

    # this demo targets the virtual CPU mesh; force the platform BEFORE any
    # jax.devices() call instantiates the axon backend
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.clear_backends()
    except Exception:
        pass

    from rag_icd10_tpu.parallel.mesh import make_mesh
    from rag_icd10_tpu.parallel.search import ShardedFlatSearcher

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((args.rows, args.dim)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    weights = np.array([1.2, 1.0, 0.8], dtype=np.float32)[
        rng.integers(0, 3, size=args.rows)
    ]
    q = rng.standard_normal((args.queries, args.dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    mesh = make_mesh(dp=n_dev, tp=1)
    searcher = ShardedFlatSearcher(corpus, weights, mesh, axis="dp")
    vals, idx = searcher.search(q, args.k)  # compile
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        vals, idx = searcher.search(q, args.k)
    per_scan = (time.time() - t0) / iters

    # exactness on a query subset
    sub = min(4, args.queries)
    expected = (q[:sub] @ corpus.T) * weights[None, :]
    eidx = np.argsort(-expected, axis=1)[:, : args.k]
    evals = np.take_along_axis(expected, eidx, axis=1)
    exact = bool(
        np.allclose(
            np.take_along_axis(expected, idx[:sub], axis=1), evals, rtol=1e-4
        )
    )

    print(
        json.dumps(
            {
                "sharded_search": {
                    "devices": n_dev,
                    "rows": args.rows,
                    "dim": args.dim,
                    "per_scan_ms": round(per_scan * 1000, 1),
                    "qps": round(args.queries / per_scan, 1),
                    "exact_vs_numpy": exact,
                }
            }
        )
    )


if __name__ == "__main__":
    main()
