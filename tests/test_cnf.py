"""CNF tests: reversibility, exact log-det via Jacobian cross-check, frames
(models reference src/flow.py:57-69 made into real tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.flow import CNF
from fermiflow_tpu.nn import backflow_apply, backflow_divergence, backflow_init_gaussian
from fermiflow_tpu.physics import HO2D, FreeFermion

orb = HO2D()
bd = FreeFermion(orb)


def make_cnf(steps=32):
    return CNF(
        velocity=backflow_apply, divergence=backflow_divergence, steps=steps
    )


def test_reversibility(rng):
    """z -> x -> z round trip and logp consistency (reference
    src/flow.py:57-69, whose __main__ harness is broken upstream)."""
    k1, k2 = jax.random.split(rng)
    params = backflow_init_gaussian(k1, 16, 16, std=0.1)
    cnf = make_cnf()
    n = 4
    occ = np.arange(n, dtype=np.int32)
    z = bd.sample(occ, (), k2, (32,), equilibrium_steps=50)
    diag = jax.jit(
        lambda p, zz: cnf.check_reversibility(
            p, lambda q: bd.log_prob(occ, (), q), zz
        )
    )(params, z)
    assert float(diag["max_abs_z_err"]) < 1e-8
    assert float(diag["max_abs_logp_err"]) < 1e-8


def test_delta_logp_matches_exact_jacobian(rng):
    """The ODE log-det equals log|det ∂x/∂z| of the generative map computed
    by full Jacobian autodiff — an exactness check the reference never had."""
    params = backflow_init_gaussian(rng, 8, None, std=0.2)
    cnf = make_cnf(steps=24)
    n = 3
    z = jax.random.normal(jax.random.PRNGKey(2), (3, n, 2), dtype=jnp.float64)

    x = jax.jit(cnf.generate)(params, z)
    _, delta_logp = jax.jit(cnf.delta_logp)(params, x)

    @jax.jit
    def logdet_jacobian(zb):
        def gen_flat(zf):
            return cnf.generate(params, zf.reshape(n, 2)).reshape(-1)

        J = jax.jacfwd(gen_flat)(zb.reshape(-1))
        return jnp.linalg.slogdet(J)[1]

    for b in range(z.shape[0]):
        # delta_logp is the log-det accumulated along the REVERSE path from x;
        # for a diffeomorphism it equals log|det ∂x/∂z|.
        np.testing.assert_allclose(
            float(delta_logp[b]), float(logdet_jacobian(z[b])), atol=1e-6
        )


def test_identity_flow_at_zero_init():
    from fermiflow_tpu.nn import backflow_init_zeros

    params = backflow_init_zeros(8, 8)
    cnf = make_cnf(steps=8)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3, 2)))
    x = cnf.generate(params, z)
    np.testing.assert_allclose(np.asarray(x), np.asarray(z), atol=1e-14)
    zz, dlp = cnf.delta_logp(params, x)
    np.testing.assert_allclose(np.asarray(zz), np.asarray(z), atol=1e-14)
    np.testing.assert_array_equal(np.asarray(dlp), 0.0)


def test_generate_trajectory_endpoints(rng):
    params = backflow_init_gaussian(rng, 8, 8, std=0.2)
    cnf = make_cnf(steps=16)
    z = jax.random.normal(jax.random.PRNGKey(4), (6, 3, 2), dtype=jnp.float64)
    frames = cnf.generate_trajectory(params, z, nframes=5)
    assert frames.shape == (5, 6, 3, 2)
    np.testing.assert_allclose(np.asarray(frames[0]), np.asarray(z), atol=1e-14)
    x = cnf.generate(params, z)
    np.testing.assert_allclose(np.asarray(frames[-1]), np.asarray(x), atol=1e-8)


def test_adaptive_generate_matches_fixed(rng):
    params = backflow_init_gaussian(rng, 8, 8, std=0.2)
    z = jax.random.normal(jax.random.PRNGKey(6), (4, 3, 2), dtype=jnp.float64)
    import dataclasses

    cnf_fixed = make_cnf(steps=32)
    cnf_adapt = dataclasses.replace(cnf_fixed, solver="adaptive")
    x_f = cnf_fixed.generate(params, z)
    x_a = cnf_adapt.generate(params, z)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_a), atol=1e-6)
