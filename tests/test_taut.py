"""Closed-form INTERACTING eigenstates (Taut-type) as local-energy oracles.

The Z=0 eigenstate gates (tests/test_basedist.py) validate the machinery on
non-interacting Slater states only.  Two electrons in a 2D harmonic trap
(hbar = m = omega = 1) with Coulomb coupling Z/r admit exact analytic ground
states at special couplings (the 2D analog of M. Taut, PRA 48, 3561 (1993)):
center-of-mass R = (r1+r2)/2 separates into a 2D oscillator of frequency 1
(E_cm = 1), and the relative coordinate r = r1 - r2 (mass 1/2) with potential
r^2/4 + Z/r has the nodeless solution

    psi_rel = (1 + r/Z) r^|m| e^{i m phi} e^{-r^2/4},   Z^2 = 2|m| + 1,
    E_rel = |m| + 2,

verified by direct substitution in the radial equation
-(R'' + R'/r - m^2 R/r^2) + (r^2/4 + Z/r) R = E R.  Hence:

  * singlet (nup=1, ndown=1), m=0, Z=1:      E0 = 1 + 2 = 3 exactly;
  * polarized triplet (nup=2), m=1, Z=sqrt3: E0 = 1 + 3 = 4 exactly.

These test the SAME local-energy pipeline the VMC estimators use
(y_grad_laplacian -> -1/4 lap - 1/8 |grad|^2 + V) on a CORRELATED
wavefunction with an explicit Jastrow-like factor — coverage the reference's
test suite never had (its oracles are all determinantal, Z=0).  The trained
counterparts (fermiflow_tpu converging to 3.0/4.0) live in
validation/runs/gs_n2_taut_*.jsonl / docs/VALIDATION.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermiflow_tpu.physics.potentials import CoulombPairPotential, HOPotential
from fermiflow_tpu.vmc.local_energy import y_grad_laplacian

SQRT3 = float(np.sqrt(3.0))


def _logp_taut(x, m, Z):
    """log |Psi|^2 for the Taut state: CM gaussian x relative solution.

    x: (..., 2, 2).  The m=1 channel uses the REAL eigenfunction
    r cos(phi) = u_x (the complex e^{i phi} phase would carry kinetic energy
    the |Psi|^2-based estimator cannot see), so

        |Psi|^2 = e^{-2R^2} (1 + r/Z)^2 u_x^{2m} e^{-r^2/2}

    up to normalization, which the local energy does not see.
    """
    R2 = jnp.sum(jnp.mean(x, axis=-2) ** 2, axis=-1)
    u = x[..., 0, :] - x[..., 1, :]
    r = jnp.sqrt(jnp.sum(u**2, axis=-1))
    out = -2.0 * R2 - 0.5 * r**2 + 2.0 * jnp.log1p(r / Z)
    if m:
        out = out + 2.0 * m * jnp.log(jnp.abs(u[..., 0]))
    return out


@pytest.mark.parametrize(
    "m,Z,E_exact",
    [(0, 1.0, 3.0), (1, SQRT3, 4.0)],
    ids=["singlet_Z1", "triplet_Zsqrt3"],
)
def test_taut_closed_form_is_eigenstate(m, Z, E_exact):
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (256, 2, 2), dtype=jnp.float64)
    # Keep walkers off the wavefunction's coordinate singularities (the
    # r = 0 coincidence and, for m=1, the u_x = 0 node); Metropolis never
    # lands exactly there either.
    ux = jnp.abs(x[:, 0, 0] - x[:, 1, 0])
    x = jnp.where((ux < 0.3)[:, None, None],
                  x + jnp.array([[1.0, 0.0], [-0.3, 0.0]]), x)

    logp, grad, lap = y_grad_laplacian(lambda xs: _logp_taut(xs, m, Z), x)
    kinetic = -0.25 * lap - 0.125 * jnp.sum(grad**2, axis=(-2, -1))
    eloc = kinetic + HOPotential()(x) + CoulombPairPotential(Z)(x)
    np.testing.assert_allclose(np.asarray(eloc), E_exact, rtol=0, atol=1e-9)
