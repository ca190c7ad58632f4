"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must set env vars before jax is imported anywhere in the test process.
"""

import os

import pytest

# hard override: this environment's sitecustomize imports jax and
# registers the axon TPU plugin before conftest runs, so env-var changes
# are too late — use jax.config (backends are not yet initialized)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session", autouse=True)
def _jax_test_config():
    """This environment defaults matmuls to bf16-class precision even on
    CPU; correctness tests compare against f64/numpy oracles, so force
    full-f32 matmuls for the test session. Also enable the persistent
    compilation cache — per-shape XLA compiles dominate test runtime."""
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    yield
