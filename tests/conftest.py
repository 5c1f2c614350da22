"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual devices (the standard JAX
fake-backend idiom for testing pod code without a pod — SURVEY.md §4) and
with x64 enabled so float64 parity oracles are exact. The framework itself is
dtype-parameterized; production runs use f32/bf16 on TPU.

Note: this environment's TPU plugin (axon) force-selects itself via
`jax.config.update("jax_platforms", "axon,cpu")` at interpreter startup
(sitecustomize), so the JAX_PLATFORMS env var alone is not enough — we
override the config value after importing jax, before any backend
initializes. XLA_FLAGS must still be set before the CPU client exists.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent (on-disk) XLA compilation cache: the module-teardown
# jax.clear_caches() below (segfault workaround) drops every in-memory
# executable, so identical problems recompile in later modules — the
# disk cache turns those recompiles (and whole re-runs of the suite)
# into cache hits. Keyed by HLO hash, so it is safe across code edits.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SRBD_XLA_CACHE", "/tmp/srbd_horizon_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# The full 160-test suite segfaults XLA's CPU compiler at ~test 127
# (reproduced 4/4 at tests/test_robustness.py::test_steps_onto_raised_
# terrain, rc 134/139 inside backend_compile) while every bisected
# half/quarter passes — i.e. the crash tracks CUMULATIVE in-process
# state (~160 live compiled executables + tracing caches), not any
# specific test pairing. Dropping the caches between modules keeps the
# per-process live-executable count bounded; within-module caching (the
# common sharing pattern) is untouched.
import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
    gc.collect()
