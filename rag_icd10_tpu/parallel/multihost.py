"""Multi-host (multi-process) helpers for the distributed paths.

Single-process code can ``jax.device_put(np_array, sharding)`` because
every device is addressable; under ``jax.distributed`` each process only
addresses its local devices, and building a global array requires
assembling per-shard data process-locally. ``global_device_put`` hides
the difference so parallel/train.py batches and parallel/search.py
corpora feed identically on one host or many (SURVEY §5 distributed row
— the reference has no distributed backend at all).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def global_device_put(x: np.ndarray, sharding) -> jax.Array:
    """Place a (replicated-per-process) numpy array as a global sharded
    array. Every process must pass the SAME full array (deterministic
    data generation or a shared filesystem guarantees this); each process
    materializes only the shards it addresses."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(
        x.shape, sharding, lambda idx: x[idx]
    )


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_count: int | None = None) -> None:
    """jax.distributed bootstrap (DCN). On TPU pods the runtime discovers
    topology itself; explicit arguments cover CPU/GPU fleets and the
    CI two-process dryrun."""
    kwargs = {}
    if local_device_count is not None:
        kwargs["local_device_ids"] = list(range(local_device_count))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def global_sum(x: jax.Array) -> float:
    """Cross-host reduction sanity check: jit inserts the DCN all-reduce
    for a globally sharded operand."""
    return float(jax.jit(jnp.sum)(x))
