"""Round-5 stretch proof: 10M-row int8 x chunkstream SHARDED search on
the virtual 8-device CPU mesh (VERDICT r4 next-round #9).

Ties the capacity story together end-to-end: the int8 quantized corpus
(ops/quantized.py law, 4x rows per HBM byte) shards over a
jax.sharding.Mesh and is scanned per shard with the streaming
chunk-select kernel spelling (parallel/search.py _build_int8), whose
int32-exact certificate + in-program fallback make the merged top-k
bit-identical to a single-device int8 scan. On real hardware the same
code runs over ICI; here 8 virtual CPU devices prove compile + exec +
correctness at capacity scale (the per-shard slice, 1.25M x 768 int8,
is exactly the config-8 single-chip regime x 8).

Writes MULTICHIP_r05_capacity.json. Run AFTER the chip/core is free
(one JAX process rule): ~10 min, peak ~75 GB host RAM at 10M rows.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402


def main() -> int:
    import jax

    # the axon sitecustomize imports jax at interpreter start with
    # JAX_PLATFORMS=axon — switch platform after the fact (conftest recipe)
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.clear_backends()
    except Exception:
        pass
    assert len(jax.devices()) == 8, jax.devices()

    from rag_icd10_tpu.parallel.mesh import make_mesh
    from rag_icd10_tpu.parallel.search import ShardedFlatSearcher

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    d, b, k, chunk = 768, 8, 10, 1_048_576
    rng = np.random.default_rng(11)

    # realistic embedding spectrum (config-9 parametric power-law fit)
    spec = np.arange(1, d + 1, dtype=np.float32) ** -0.395
    spec = spec / np.linalg.norm(spec) * np.sqrt(d)

    t0 = time.time()
    v = np.empty((n, d), np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        blk = rng.standard_normal((hi - lo, d), dtype=np.float32) * spec
        v[lo:hi] = blk / np.linalg.norm(blk, axis=1, keepdims=True)
    w = np.array([0.8, 1.0, 1.2], np.float32)[rng.integers(0, 3, n)]
    src = rng.integers(0, n, b)
    q = v[src] + 0.15 * rng.standard_normal((b, d), dtype=np.float32) * spec
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gen_s = time.time() - t0

    # exact fp32 ground truth (chunked host scan)
    t0 = time.time()
    bv = np.full((b, k), -np.inf, np.float32)
    bi = np.full((b, k), -1, np.int64)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        sc = (q @ v[lo:hi].T) * w[lo:hi][None, :]
        cat = np.concatenate([bv, sc], axis=1)
        ci = np.concatenate(
            [bi, lo + np.arange(hi - lo)[None, :].repeat(b, 0)], axis=1
        )
        sel = np.argsort(-cat, axis=1)[:, :k]
        bv = np.take_along_axis(cat, sel, axis=1)
        bi = np.take_along_axis(ci, sel, axis=1)
    truth_s = time.time() - t0

    t0 = time.time()
    mesh = make_mesh(n_devices=8, dp=8, tp=1)
    searcher = ShardedFlatSearcher(
        v, w, mesh, axis="dp", store_dtype="int8"
    )
    build_s = time.time() - t0

    out = {"rows": n, "dim": d, "batch": b, "k": k,
           "shards": 8, "gen_s": round(gen_s, 1),
           "truth_s": round(truth_s, 1), "build_s": round(build_s, 1),
           "int8_shard_mb": round(searcher.n_padded * d / 8 / 2**20, 1)}

    results = {}
    for method in ("chunkstream", "exact"):
        t0 = time.time()
        vals, idx = searcher.search(q, k, method=method)
        wall = time.time() - t0
        recalls = [
            len(set(r.tolist()) & set(e.tolist())) / k
            for r, e in zip(idx, bi)
        ]
        results[method] = {
            "wall_s_incl_compile": round(wall, 1),
            "recall_at_10_vs_fp32": round(float(np.mean(recalls)), 4),
            "vals": vals, "idx": idx,
        }
    # the law proof: chunkstream's certified/fallback contract makes it
    # bit-identical to the materialized int8 scan, sharded or not
    np.testing.assert_array_equal(
        results["chunkstream"]["vals"], results["exact"]["vals"]
    )
    sets_equal = all(
        set(a.tolist()) == set(b_.tolist())
        for a, b_ in zip(results["chunkstream"]["idx"],
                         results["exact"]["idx"])
    )
    out["chunkstream_equals_exact_int8"] = bool(sets_equal)
    for method in results:
        results[method].pop("vals"), results[method].pop("idx")
    out.update(results)

    # served contract: int8 SELECTS, the host re-ranks the merged
    # over-fetch against fp32 rows (exactly the single-device int8
    # store path) — this is the recall that reaches users
    m = 4 * k
    t0 = time.time()
    _, cand = searcher.search(q, m, method="chunkstream")
    exact = np.einsum("bd,bmd->bm", q, v[cand]) * w[cand]
    order = np.argsort(-exact, axis=1)[:, :k]
    ridx = np.take_along_axis(cand, order, axis=1)
    rr = [
        len(set(r.tolist()) & set(e.tolist())) / k
        for r, e in zip(ridx, bi)
    ]
    out["host_rerank"] = {
        "over_fetch_m": m,
        "wall_s_incl_compile": round(time.time() - t0, 1),
        "recall_at_10_vs_fp32": round(float(np.mean(rr)), 4),
    }

    with open("MULTICHIP_r05_capacity.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
