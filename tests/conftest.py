"""Test harness config: run everything on a virtual 8-device CPU mesh.

Standard JAX trick for hardware-free sharding tests (SURVEY.md §4):
``xla_force_host_platform_device_count=8`` gives 8 fake CPU devices so all
mesh/collective code paths compile and execute exactly as on a v5e-8 slice.

Note: this environment preregisters a remote TPU backend at interpreter
startup (sitecustomize), which overrides ``JAX_PLATFORMS`` from the
environment — so we must force CPU via ``jax.config`` before any backend
initializes, not via env vars alone.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-bound on this 1-core host
jax.config.update("jax_compilation_cache_dir", "/tmp/stutter_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def cosine_distance(a, b):
    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    if denom == 0:
        return 0.0 if np.allclose(a, b) else 1.0
    return float(1.0 - np.dot(a, b) / denom)
