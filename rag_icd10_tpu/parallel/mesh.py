"""Device mesh + sharding rules for multi-chip scaling.

The reference has NO distributed layer (SURVEY.md §5: no NCCL/MPI/
torch.distributed anywhere); scaling here is designed TPU-natively from
scratch via jax.sharding over an ICI mesh:

- ("dp", "tp") mesh for encoder training/serving: batch over dp,
  Megatron-style tensor parallelism over tp (attention heads + FFN
  intermediate sharded; XLA inserts the all-reduces).
- corpus-dimension sharding for search: each device scans its corpus shard
  and the per-shard top-k results merge with one all_gather (see
  parallel/search.py).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    axis_names: Sequence[str] = ("dp", "tp"),
) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    Defaults: tp = min(8, n) and dp = n // tp, so a v5e-8 slice becomes a
    1x8 TP group and larger slices add data parallelism.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if tp is None:
        tp = min(8, n)
        while n % tp:
            tp //= 2
    if dp is None:
        dp = n // tp
    assert dp * tp == n, (dp, tp, n)
    grid = np.array(devices[:n]).reshape(dp, tp)
    return Mesh(grid, axis_names=axis_names)


# Megatron-style TP rules for the flax BERT param tree (models/bert.py).
# Matched against 'path/like/this' strings; first hit wins.
_PARTITION_RULES = (
    # attention projections: shard the head (output) dim
    (r".*attention/(query|key|value)/kernel", P(None, "tp")),
    (r".*attention/(query|key|value)/bias", P("tp")),
    # attention output: shard the input dim (row-parallel)
    (r".*attention/out/kernel", P("tp", None)),
    (r".*attention/out/bias", P()),
    # FFN: column-parallel in, row-parallel out
    (r".*intermediate/kernel", P(None, "tp")),
    (r".*intermediate/bias", P("tp")),
    (r".*output/kernel", P("tp", None)),
    (r".*output/bias", P()),
    # embeddings: shard the vocab dim
    (r".*word_embeddings/embedding", P("tp", None)),
    (r".*position_embeddings/embedding", P()),
    (r".*token_type_embeddings/embedding", P()),
    # layer norms replicated
    (r".*ln/(scale|bias)", P()),
)


def _spec_for_path(path: str) -> P:
    for pattern, spec in _PARTITION_RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def param_shardings(mesh: Mesh, params) -> object:
    """PyTree of NamedShardings matching the param tree."""

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k) for k, v in tree.items()}
        return NamedSharding(mesh, _spec_for_path(prefix))

    return walk(params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Data batches shard over dp (leading axis), replicated over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
