"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes, so this executes at conftest
import time (pytest loads conftest before test modules).
"""

import os

# force CPU: the harness presets JAX_PLATFORMS=axon (the real TPU tunnel);
# tests must run on the virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# the axon sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon — switch the platform after the fact
jax.config.update("jax_platforms", "cpu")
try:
    jax.clear_backends()
except Exception:
    pass

# Persistent compile cache: repeated suite runs skip XLA compiles (the box
# typically has a single CPU core, so compiles dominate wall-clock).
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def real_csv_path():
    """Path to the real ICD-10 CSV if present, else skip."""
    from rag_icd10_tpu.config import default_icd_csv_path

    path = default_icd_csv_path()
    if path is None:
        pytest.skip("real ICD-10 CSV not available")
    return path
