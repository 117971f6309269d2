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

if os.environ.get("FERMIFLOW_TPU_TESTS"):
    # Escape hatch for the TPU-gated tests (fused-kernel chains, sampler
    # moments): leave the default backend (the chip) in place, f32.  The
    # f64 CPU gates are skipped in this mode — run both invocations for
    # full coverage:  pytest tests/  AND  FERMIFLOW_TPU_TESTS=1 pytest
    # tests/test_pallas_metropolis.py ...
    pass
else:
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(42)
