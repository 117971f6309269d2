"""Test harness: force the CPU backend with 8 virtual devices and float64.

Correctness gates follow the reference's float64 ``allclose``-against-
closed-form strategy (SURVEY.md §4), which requires x64 — so tests run on the
CPU backend regardless of any TPU attached to the session.  The 8 virtual
devices make multi-chip sharding testable without hardware (the JAX-native
substitute for distributed test machinery).

Note: jax may already be imported by a site hook before pytest starts, but the
CPU client is created lazily, so setting XLA_FLAGS here still takes effect.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(42)
