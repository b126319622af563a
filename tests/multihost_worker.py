"""Two-process DCN dryrun worker (run by test_multihost.py).

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent);
jax.distributed joins them into one 8-device fleet. The worker then runs
the REAL distributed code paths — (dp=2, tp=4) mesh across the process
boundary, sharded contrastive train step, corpus-sharded search — with
multihost-aware data feeding (parallel/multihost.global_device_put).

Prints one line per check; the parent asserts both processes agree.
"""

import sys

import jax

# the parent launches us WITHOUT the axon sitecustomize and with
# JAX_PLATFORMS=cpu; the config update is a belt-and-braces default for
# manual runs. No backend-touching calls (jax.devices/clear_backends)
# may happen before jax.distributed.initialize().
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    # distributed init MUST precede anything that touches the backend —
    # including the package import chain
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=nproc,
        process_id=pid,
    )

    from rag_icd10_tpu.parallel.multihost import (
        global_device_put,
        global_sum,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_icd10_tpu.models.bert import BertArch
    from rag_icd10_tpu.parallel.mesh import batch_sharding, make_mesh
    from rag_icd10_tpu.parallel.train import (
        init_train_state,
        make_sharded_train_step,
    )

    # dp=2 spans the PROCESS boundary; tp=4 is intra-process
    mesh = make_mesh(n_devices=8, dp=2, tp=4)

    # cross-host all-reduce sanity
    arr = np.arange(64, dtype=np.float32)
    g = global_device_put(arr, NamedSharding(mesh, P("dp")))
    total = global_sum(g)
    print(f"CHECK sum {total}", flush=True)

    # sharded train step across processes
    arch = BertArch(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=32,
    )
    params, opt_state, optimizer = init_train_state(arch, mesh=mesh, seed=0)
    step = make_sharded_train_step(arch, mesh, optimizer)

    r = np.random.default_rng(0)  # same seed everywhere -> same batch
    b, seq = 8, 16

    def side():
        ids = r.integers(1, 128, size=(b, seq)).astype(np.int32)
        return ids, np.ones_like(ids), np.zeros_like(ids)

    a_ids, a_mask, a_types = side()
    b_ids, b_mask, b_types = side()
    batch_np = {
        "a_ids": a_ids, "a_mask": a_mask, "a_types": a_types,
        "b_ids": b_ids, "b_mask": b_mask, "b_types": b_types,
    }
    b_shard = batch_sharding(mesh)
    batch = {
        k: global_device_put(v, b_shard) for k, v in batch_np.items()
    }
    params, opt_state, metrics = step(params, opt_state, batch)
    loss = float(metrics["loss"])
    acc = float(metrics["accuracy"])
    assert np.isfinite(loss)
    print(f"CHECK loss {loss:.6f} acc {acc:.4f}", flush=True)

    # corpus-sharded search across processes (dp=8 over one axis needs a
    # fresh mesh; reuse dp=2 x tp=4 by sharding rows over dp)
    from rag_icd10_tpu.parallel.search import ShardedFlatSearcher

    rng = np.random.default_rng(7)
    n, d, k = 1024, 32, 5
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    weights = np.ones(n, np.float32)
    q = rng.standard_normal((2, d)).astype(np.float32)

    searcher = ShardedFlatSearcher(corpus, weights, mesh, axis="dp")
    vals, idx = searcher.search(q, k)
    expected = q @ corpus.T
    eidx = np.argsort(-expected, axis=1)[:, :k]
    ok = np.array_equal(np.asarray(idx), eidx)
    print(f"CHECK search {ok} top {np.asarray(idx)[0, 0]}", flush=True)

    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
