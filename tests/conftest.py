"""Test harness config: run everything on CPU with 8 virtual devices.

SURVEY.md §4 items 4-5: Pallas kernels run with interpret=True on CPU, and
multi-device (DP/psum) tests use XLA's host-platform device-count override —
the JAX analogue of a fake distributed backend. Must be set before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the ambient axon/TPU setting
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS;
# the config update (post-import) is what actually pins tests to CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after every test module.

    The full suite compiles many hundreds of XLA:CPU executables across
    the 8-device virtual mesh; letting them all stay live crashed the
    single-process run reproducibly (SIGSEGV at ~test 146/165, VERDICT
    r4 weak 1 — per-process resource accumulation, NOT the concurrent-
    TPU-contention NOTES session-E first blamed). Per-module clearing
    bounds the live-executable set at the cost of recompiling the few
    helpers shared across modules; every module still passes in
    isolation, so per-module granularity is sufficient by construction.
    """
    yield
    jax.clear_caches()
