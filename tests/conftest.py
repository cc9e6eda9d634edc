"""Test configuration: CPU backend with 8 virtual devices (the TPU analog
of a fake multi-chip backend), float64 enabled for golden-value physics
tests.  Must run before jax is imported anywhere."""

import os
import sys

# NOTE: the JAX_PLATFORMS env var is NOT honored in this environment (an
# axon TPU plugin overrides it) — only jax.config.update("jax_platforms")
# below actually forces the CPU backend.  The env vars are still set for
# subprocesses.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: repeated pytest runs skip recompiling the
# big dense-energy graphs.  MMC_TEST_CACHE overrides the location —
# CONCURRENT pytest processes must NOT share one cache dir (racing
# writers corrupt entries whose later reads/writes segfault inside
# jax's zstd (de)serialization; observed three times on this box).
_cache_dir = os.environ.get(
    "MMC_TEST_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference data not available")
    return REFERENCE_DIR
