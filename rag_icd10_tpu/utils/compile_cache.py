"""Persistent XLA compile cache.

First-jit in a process costs ~40 s in this environment (plugin init +
compile); the persistent cache removes the compile component across
processes — important for the builder CLI, API server, and bench which
all run as separate processes.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = os.path.expanduser("~/.cache/rag_icd10_tpu/jax")


def enable_compile_cache(path: str = None) -> None:
    import jax

    cache_dir = path or os.getenv("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
