"""Hardware compile gate: jit-compile EVERY Pallas kernel entry point at
representative shapes on the real TPU and check results against numpy.

Round-3 lesson: interpret-mode tests keep the suite green while a kernel
is hardware-dead (ops/chunk_stream.py's round-3 pass-2 BlockSpec failed
Mosaic lowering on the chip with 324 tests passing). This script is the
gate that prevents that class of failure from landing again: it must run
(and pass) on the TPU before any round-end snapshot — it is wired into
scripts/reproduce.sh and bench prep.

Usage:  python scripts/tpu_smoke.py          # requires the TPU
        python scripts/tpu_smoke.py --json   # machine-readable summary
Exit code 0 = every kernel compiled, executed, and matched brute force.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def brute(q, vecs, w):
    return (q @ vecs.T) * w[None, :]


def topk_match(vals, idx, expected, k, rtol=1e-4):
    """Top-k result check tolerant of within-tolerance ties."""
    want = -np.sort(-expected, axis=1)[:, :k]
    got_v = np.asarray(vals)[:, :k]
    scores_at_idx = np.take_along_axis(
        expected, np.asarray(idx)[:, :k], axis=1
    )
    return (
        np.allclose(got_v, want, rtol=rtol, atol=1e-5)
        and np.allclose(scores_at_idx, want, rtol=rtol, atol=1e-5)
    )


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", action="store_true")
    parser.add_argument(
        "--allow-cpu", action="store_true",
        help="dev escape hatch: run on CPU (does NOT gate Mosaic lowering)",
    )
    args = parser.parse_args()

    import jax

    from rag_icd10_tpu.utils import (
        enable_compile_cache,
        guard_device_acquisition,
    )

    enable_compile_cache()
    disarm = guard_device_acquisition(what="tpu smoke gate")
    backend = jax.default_backend()  # first backend touch, under the guard
    disarm()
    if backend != "tpu" and not args.allow_cpu:
        print(f"FAIL: backend is {backend!r}, not tpu — this gate exists "
              "precisely because CPU/interpret runs do not exercise Mosaic "
              "lowering. Pass --allow-cpu only for dev plumbing checks.")
        return 1

    import jax.numpy as jnp

    from rag_icd10_tpu.ops.chunk_stream import (
        ChunkStore,
        chunk_maxima_transposed,
        chunk_stream_search,
        gather_rescore,
    )
    from rag_icd10_tpu.ops.flat_topk import pad_corpus
    from rag_icd10_tpu.ops.pallas_score import (
        fused_search,
        fused_weighted_scores,
        streaming_topk,
        streaming_tile_n,
    )
    from rag_icd10_tpu.ops.quantized import (
        int8_search,
        int8_search_device_rerank,
        quantize_rows,
    )
    from rag_icd10_tpu.ops.rerank import chunk_select_search

    rng = np.random.default_rng(0)
    results = {}
    failures = []

    def check(name, fn):
        t0 = time.time()
        try:
            fn()
            results[name] = {"ok": True, "s": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001 — gate reports, then fails
            results[name] = {
                "ok": False,
                "s": round(time.time() - t0, 1),
                "error": f"{type(e).__name__}: {e}"[:500],
            }
            failures.append(name)
        print(json.dumps({name: results[name]}), flush=True)

    def make(n, d, b, seed):
        r = np.random.default_rng(seed)
        vecs = r.standard_normal((n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        w = r.choice([0.8, 1.0, 1.2], n).astype(np.float32)
        q = r.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return vecs, w, q

    # --- serving shapes: N=40k-class, d=768 -------------------------------
    k = 16
    vecs, w, q = make(16384, 768, 64, 1)
    cp, wp, m = pad_corpus(vecs, w, 2048)
    cd, wd, md = jax.device_put(cp), jax.device_put(wp), jax.device_put(m)
    qd = jax.device_put(q)
    expect = brute(q, vecs, w)
    expect_pad = np.pad(expect, ((0, 0), (0, cp.shape[0] - vecs.shape[0])),
                        constant_values=-np.inf)

    def _fused_scores():
        s = np.asarray(fused_weighted_scores(qd, cd, wd, md, tile_n=2048))
        assert np.allclose(s[:, : vecs.shape[0]], expect, rtol=1e-4, atol=1e-5)

    check("fused_weighted_scores", _fused_scores)

    def _fused_search():
        v, i = fused_search(qd, cd, wd, md, k=k, tile_n=0)
        assert topk_match(v, i, expect_pad, k)

    check("fused_search", _fused_search)

    def _streaming():
        tile = streaming_tile_n(q.shape[0], cp.shape[0], 4, dim=768, k=k)
        v, i = streaming_topk(qd, cd, wd, md, k=k, tile_n=tile)
        assert topk_match(v, i, expect_pad, k)

    check("streaming_topk", _streaming)

    def _chunk_select_high():
        v, i, cert = chunk_select_search(
            qd, cd, wd, md, k=k, scan_precision="high", guarantee=False,
            bound_scale=float(np.max(w) * np.linalg.norm(vecs, axis=1).max()),
        )
        assert topk_match(v, i, expect_pad, k, rtol=2e-3)
        assert float(np.asarray(cert).mean()) > 0.9

    check("chunk_select_search[high]", _chunk_select_high)

    def _chunk_select_highest():
        v, i, cert = chunk_select_search(
            qd, cd, wd, md, k=k, scan_precision="highest", guarantee=True,
        )
        assert topk_match(v, i, expect_pad, k)

    check("chunk_select_search[highest]", _chunk_select_highest)

    def _int8():
        qq, sc = quantize_rows(cp)
        cq, scd = jax.device_put(qq), jax.device_put(sc)
        v, i = int8_search(qd, cq, scd, wd, md, k=k)
        # int8 is lossy: check overlap with the true top-k, not equality
        true_i = np.argsort(-expect_pad, axis=1)[:, :k]
        ov = np.mean([
            len(set(np.asarray(i)[r]) & set(true_i[r])) / k
            for r in range(q.shape[0])
        ])
        assert ov >= 0.8, ov
        v2, i2 = int8_search_device_rerank(qd, cq, scd, wd, md, k=k)
        ov2 = np.mean([
            len(set(np.asarray(i2)[r]) & set(true_i[r])) / k
            for r in range(q.shape[0])
        ])
        assert ov2 >= ov - 1e-9, (ov2, ov)

    check("int8_search(+device_rerank)", _int8)

    # --- chunk-stream v2: serving d=768 AND scaling d=256 shapes ----------
    for tag, (n, d, b) in {
        "d768_b64": (16384, 768, 64),
        "d256_b64": (32768, 256, 64),
        "d768_b5(pad)": (16384, 768, 5),
    }.items():
        vecs2, w2, q2 = make(n, d, b, seed=hash(tag) % 2**31)
        store = ChunkStore.build(vecs2, w2, batch_hint=max(8, b))
        exp2 = brute(q2, vecs2, w2)
        q2d = jax.device_put(q2)

        def _chunkstream(store=store, q2d=q2d, exp2=exp2, b=b):
            for scan in ("pallas", "xla", "xla_high"):
                v, i, cert = chunk_stream_search(
                    q2d, store.corpus_t, store.corpus, store.weights,
                    store.mask, k=k, tile_n=store.tile_n,
                    n_real=store.n_real, scan=scan,
                    bound_scale=store.bound_scale, guarantee=False,
                )
                rtol = 1e-4 if scan != "xla_high" else 1e-4  # pass-2 exact
                assert topk_match(v, i, exp2, k, rtol=rtol), scan
                assert float(np.asarray(cert).mean()) > 0.9, scan

        check(f"chunk_stream_search[{tag}]", _chunkstream)

    # gather_rescore + chunk_maxima_transposed standalone (the two Pallas
    # primitives inside chunk_stream_search, gated individually so a
    # failure names the kernel)
    vecs3, w3, q3 = make(32768, 256, 16, 9)
    store3 = ChunkStore.build(vecs3, w3, batch_hint=16)

    def _chunkmax():
        cm = np.asarray(chunk_maxima_transposed(
            jax.device_put(q3), store3.corpus_t, store3.tile_n
        ))
        folded = (vecs3 * w3[:, None])
        true_s = q3 @ folded.T
        n_pad = store3.corpus.shape[0]
        s_pad = np.pad(true_s, ((0, 0), (0, n_pad - vecs3.shape[0])))
        true_cm = s_pad.reshape(16, -1, 128).max(axis=2)
        assert np.allclose(cm, true_cm, rtol=1e-4, atol=1e-5)

    check("chunk_maxima_transposed", _chunkmax)

    def _chunkstream_reduced():
        # bf16/int8 stored pass-1 (both the Pallas kernel and the XLA
        # dot spelling): certified rows must match brute force exactly
        # (pass 2 is fp32 HIGHEST); selection overlap stays high even
        # where the conservative residual bound declines to certify
        exp3 = brute(q3, vecs3, w3)
        true_i = np.argsort(-exp3, axis=1)[:, :k]
        q3d = jax.device_put(q3)
        for sd in ("bf16", "int8"):
            storeR = ChunkStore.build(vecs3, w3, batch_hint=16,
                                      scan_dtype=sd)
            for scan in ("pallas", "xla"):
                v, i, cert = chunk_stream_search(
                    q3d, storeR.corpus_t, storeR.corpus, storeR.weights,
                    storeR.mask, k=k, tile_n=storeR.tile_n,
                    n_real=storeR.n_real, scan=scan,
                    bound_scale=storeR.bound_scale, scales=storeR.scales,
                    resid_max=storeR.resid_max, guarantee=False,
                )
                v, i, cert = map(np.asarray, (v, i, cert))
                want = -np.sort(-exp3, axis=1)[:, :k]
                for r in range(q3.shape[0]):
                    if cert[r]:
                        assert np.allclose(
                            v[r], want[r], rtol=1e-4, atol=1e-5
                        ), (sd, scan, r)
                ov = np.mean([
                    len(set(i[r]) & set(true_i[r])) / k
                    for r in range(q3.shape[0])
                ])
                assert ov >= 0.95, (sd, scan, ov)

    check("chunk_stream_search[bf16/int8 pass-1]", _chunkstream_reduced)

    def _gather():
        mc = 8
        ids = np.ascontiguousarray(
            rng.integers(0, vecs3.shape[0] // 128, (16, mc)), np.int32
        )
        raw = np.asarray(gather_rescore(
            jax.device_put(q3), store3.corpus,
            jax.device_put(ids), mc,
        ))
        for r in range(16):
            rows = np.concatenate([
                np.asarray(store3.corpus)[c * 128:(c + 1) * 128]
                for c in ids[r]
            ])
            assert np.allclose(raw[r], q3[r] @ rows.T, rtol=1e-4, atol=1e-5)

    check("gather_rescore", _gather)

    def _sketch():
        # capacity-tier screen (ops/sketch.py): device projection +
        # int8 sketch scan + host-row exact re-rank — the served
        # method="sketch" / STORE_DEVICE_DTYPE=host path end-to-end
        from rag_icd10_tpu.ops.sketch import (
            build_sketch,
            sketch_search_host_rerank,
        )

        # encoder-like geometry: isotropic 768-d rows are the documented
        # worst case for a low-rank screen (config 9's docstring) and
        # would fail ANY recall bar — use low-rank + noise rows, the
        # shape trained embeddings actually have
        rlr = np.random.default_rng(11)
        lat = rlr.standard_normal((16384, 48)).astype(np.float32)
        basis = rlr.standard_normal((48, 768)).astype(np.float32)
        vlr = lat @ basis + 0.05 * rlr.standard_normal(
            (16384, 768)
        ).astype(np.float32)
        vlr /= np.linalg.norm(vlr, axis=1, keepdims=True)
        qlr = vlr[rlr.integers(0, 16384, 64)] + 0.1 * rlr.standard_normal(
            (64, 768)
        ).astype(np.float32)
        qlr /= np.linalg.norm(qlr, axis=1, keepdims=True)
        store_s = build_sketch(vlr, w, d_sketch=64, pad_multiple=2048)
        vals, idx = sketch_search_host_rerank(
            store_s, vlr, w, qlr, k=k, m=256
        )
        # scores of selected rows must be EXACT fp32 weighted products
        for r in range(4):
            np.testing.assert_allclose(
                vals[r], (qlr[r] @ vlr[idx[r]].T) * w[idx[r]],
                rtol=1e-5, atol=1e-6,
            )
        top1 = np.argmax((qlr @ vlr.T) * w[None, :], axis=1)
        hit = np.mean([top1[r] in idx[r] for r in range(len(qlr))])
        assert hit >= 0.9, f"sketch screen top-1 hit rate {hit}"

        # chunked screen (auto at >= 2^20 rows — config 9's actual
        # served path): same selection as the materializing screen,
        # forced here at a chip-compilable size
        store_c = build_sketch(vlr, w, d_sketch=64, pad_multiple=2048,
                               screen_chunk=2048, proj=store_s.proj)
        vals_c, idx_c = sketch_search_host_rerank(
            store_c, vlr, w, qlr, k=k, m=256
        )
        np.testing.assert_array_equal(idx_c, idx)
        np.testing.assert_allclose(vals_c, vals, rtol=1e-5)

    check("sketch_screen(+host_rerank,+chunked)", _sketch)

    ok = not failures
    summary = {
        "backend": backend,
        "ok": ok,
        "kernels": len(results),
        "failed": failures,
    }
    if args.json:
        print(json.dumps({"summary": summary, "results": results}))
    else:
        print(json.dumps(summary))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
