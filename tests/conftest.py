"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` per the project build rules.

Gotchas handled here:
* the environment pins ``JAX_PLATFORMS=axon`` (a network-tunneled TPU), and
* jaxtyping's pytest plugin imports jax *before* this conftest runs, baking
  the env default into jax.config.

So we override both the env vars and the live jax config.  Backends are
initialized lazily at first use, which is still after this file runs.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: this VM has ONE CPU core, so XLA compiles of
# the unrolled flow graphs take minutes; the cache makes re-runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got " + repr(jax.devices())
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running scenario tests (CCTV-scale clips)"
    )
