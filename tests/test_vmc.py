"""VMC estimator tests: eigenstate energy gates, surrogate-loss structure,
finite-T estimators and the segment-mean baseline."""

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.flow import CNF
from fermiflow_tpu.nn import (
    backflow_apply,
    backflow_divergence,
    backflow_init_gaussian,
    backflow_init_zeros,
)
from fermiflow_tpu.physics import (
    HO2D,
    CoulombPairPotential,
    FreeFermion,
    HOPotential,
)
from fermiflow_tpu.vmc import BetaVMC, GSVMC

orb = HO2D()
bd = FreeFermion(orb)


def make_cnf(steps=8):
    return CNF(velocity=backflow_apply, divergence=backflow_divergence, steps=steps)


def make_gs(nup=3, Z=0.0, steps=8):
    return GSVMC(
        nup, 0, bd, make_cnf(steps), CoulombPairPotential(Z), HOPotential()
    )


def test_gs_zero_coupling_energy_exact(rng):
    """Z=0, identity flow: Eloc == E0 exactly for every walker (the
    reference's central correctness anchor, BASELINE.md)."""
    for nup, E0 in [(3, 5.0), (6, 14.0)]:
        model = make_gs(nup=nup)
        params = backflow_init_zeros(8, 8)
        _, x = model.sample(params, rng, 12, equilibrium_steps=20)
        eloc, _ = jax.jit(model.local_energy)(params, x)
        np.testing.assert_allclose(np.asarray(eloc), E0, atol=1e-8)


def test_gs_loss_gradient_vanishes_on_eigenstate(rng):
    """At Z=0 and identity flow, Eloc is constant => the REINFORCE surrogate
    gradient must vanish identically (variance-reduction sanity)."""
    model = make_gs(nup=3)
    params = backflow_init_zeros(8, 8)
    _, x = model.sample(params, rng, 16, equilibrium_steps=20)
    (_, metrics), grads = jax.jit(
        jax.value_and_grad(model.loss_and_metrics, has_aux=True)
    )(params, x)
    gnorm = jnp.sqrt(
        sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))
    )
    assert float(gnorm) < 1e-10
    np.testing.assert_allclose(float(metrics["E"]), 5.0, atol=1e-8)
    np.testing.assert_allclose(float(metrics["E_std"]), 0.0, atol=1e-8)


def test_gs_interacting_energy_above_noninteracting(rng):
    """Z>0 at identity flow: variational energy must exceed E0 and match
    E0 + <V_coulomb> under the base density."""
    model = make_gs(nup=3, Z=0.5)
    params = backflow_init_zeros(8, 8)
    _, x = model.sample(params, rng, 512, equilibrium_steps=100)
    eloc, _ = jax.jit(model.local_energy)(params, x)
    E = float(jnp.mean(eloc))
    assert E > 5.0
    pot = np.asarray(CoulombPairPotential(0.5)(x))
    np.testing.assert_allclose(E, 5.0 + pot.mean(), atol=1e-8)


def test_gs_nonzero_gradient_when_flow_active(rng):
    model = make_gs(nup=3, Z=0.5)
    params = backflow_init_gaussian(rng, 8, 8, std=0.1)
    _, x = model.sample(params, jax.random.PRNGKey(11), 32, equilibrium_steps=20)
    (_, _), grads = jax.jit(
        jax.value_and_grad(model.loss_and_metrics, has_aux=True)
    )(params, x)
    gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
    assert float(gnorm) > 1e-8


# ---- finite temperature ----

def make_beta(beta=2.0, nup=3, deltaE=2.0, Z=0.0, steps=8):
    return BetaVMC(
        beta, nup, 0, deltaE, orb, bd, make_cnf(steps),
        CoulombPairPotential(Z), HOPotential(),
    )


def test_beta_eigenstate_gate_and_boltzmann_optimum(rng):
    """Z=0, identity flow, Boltzmann init: (a) per-walker Eloc equals the
    sampled state's energy; (b) Floc is CONSTANT across walkers (the exact
    free energy), so F_std == 0 and the phi-gradient vanishes — Boltzmann
    weights are the optimum of the variational free energy at Z=0."""
    model = make_beta()
    params = {
        "flow": backflow_init_zeros(8, 8),
        "log_state_weights": model.init_log_state_weights(True),
    }
    idx, _, x = model.sample(params, rng, 64, equilibrium_steps=30)
    (loss, m), grads = jax.jit(
        jax.value_and_grad(model.loss_and_metrics, has_aux=True)
    )(params, idx, x)
    np.testing.assert_allclose(float(m["F_std"]), 0.0, atol=1e-10)
    # exact F = E0 - log(Z_part)/beta with Z_part = sum e^{-beta(E_s-E0)}
    Es = np.asarray(model.Es_original)
    F_exact = Es[0] - np.log(np.sum(np.exp(-2.0 * (Es - Es[0])))) / 2.0
    np.testing.assert_allclose(float(m["F"]), F_exact, atol=1e-8)
    assert float(jnp.linalg.norm(grads["log_state_weights"])) < 1e-10


def test_beta_largest_enumerated_problem_oracle(rng):
    """The reference's largest enumerated problem (N=10, deltaE=4 -> 1781
    states, /root/reference/src/orbitals.py:101-110): the Z=0 Boltzmann
    oracle must hold at full scale — F exact, F_std == 0, zero phi-grad.
    Gates that the dense occ-table design scales to Nstates ~ 2000."""
    model = make_beta(nup=10, deltaE=4.0)
    assert model.Nstates == 1781
    params = {
        "flow": backflow_init_zeros(8, 8),
        "log_state_weights": model.init_log_state_weights(True),
    }
    idx, _, x = model.sample(params, rng, 64, equilibrium_steps=20)
    (loss, m), grads = jax.jit(
        jax.value_and_grad(model.loss_and_metrics, has_aux=True)
    )(params, idx, x)
    np.testing.assert_allclose(float(m["F_std"]), 0.0, atol=1e-9)
    Es = np.asarray(model.Es_original)
    F_exact = Es[0] - np.log(np.sum(np.exp(-2.0 * (Es - Es[0])))) / 2.0
    np.testing.assert_allclose(float(m["F"]), F_exact, atol=1e-7)
    assert float(jnp.linalg.norm(grads["log_state_weights"])) < 1e-8


def test_beta_entropy_estimators_consistent(rng):
    model = make_beta()
    params = {
        "flow": backflow_init_zeros(8, 8),
        "log_state_weights": model.init_log_state_weights(True),
    }
    idx, _, x = model.sample(params, rng, 2000, equilibrium_steps=20)
    _, m = jax.jit(model.loss_and_metrics)(params, idx, x)
    # MC entropy within a few sigma of the analytic von-Neumann entropy.
    assert abs(float(m["S"]) - float(m["S_analytical"])) < 0.1
    # analytic entropy equals the closed form for Boltzmann weights
    Es = np.asarray(model.Es_original)
    w = np.exp(-2.0 * (Es - Es[0]))
    p = w / w.sum()
    np.testing.assert_allclose(
        float(m["S_analytical"]), float(-(p * np.log(p)).sum()), atol=1e-10
    )


def test_beta_segment_baseline_matches_manual_groupby(rng):
    """The segment-sum per-state baseline equals a manual python groupby
    (replacing the reference's Counter loop, src/VMC.py:164-169)."""
    model = make_beta()
    Ns = model.Nstates
    k1, k2 = jax.random.split(rng)
    idx = jax.random.randint(k1, (64,), 0, Ns)
    eloc = jax.random.normal(k2, (64,), dtype=jnp.float64)

    counts = jax.ops.segment_sum(jnp.ones_like(eloc), idx, num_segments=Ns)
    sums = jax.ops.segment_sum(eloc, idx, num_segments=Ns)
    baseline = (sums / jnp.maximum(counts, 1.0))[idx]

    idx_np, eloc_np = np.asarray(idx), np.asarray(eloc)
    for s in np.unique(idx_np):
        sel = idx_np == s
        np.testing.assert_allclose(
            np.asarray(baseline)[sel], eloc_np[sel].mean(), atol=1e-12
        )


def test_beta_random_init_requires_key():
    model = make_beta()
    import pytest

    with pytest.raises(ValueError):
        model.init_log_state_weights(False)
    w = model.init_log_state_weights(False, key=jax.random.PRNGKey(0))
    assert w.shape == (model.Nstates,)


def test_gs_unpolarized_two_spin_sectors(rng):
    """GSVMC with ndown > 0 (the reference supports this in GSVMC even though
    finite-T is polarized-only): Eloc == E0_up + E0_down exactly at Z=0."""
    model = GSVMC(2, 1, bd, make_cnf(4), CoulombPairPotential(0.0), HOPotential())
    params = backflow_init_zeros(8, 8)
    _, x = model.sample(params, rng, 8, equilibrium_steps=20)
    eloc, _ = jax.jit(model.local_energy)(params, x)
    # E0 = (1+2) up + (1) down = 4
    np.testing.assert_allclose(np.asarray(eloc), 4.0, atol=1e-8)


def test_loss_flops_not_worse_than_unshared(rng):
    """CSE regression guard for GSVMC.loss_and_metrics (nested-jvp engine).

    The differentiable log_prob re-solves the reverse ODE that local_energy
    already integrates; XLA must recover at least part of that duplication,
    so the compiled FLOPs of value_and_grad(loss) are pinned strictly below
    the fully-unshared sum of its two pieces (measured margin ~2%; a CSE
    miss would push it to the sum or above)."""
    model = make_gs(nup=3, Z=0.5, steps=4)
    params = backflow_init_zeros(8, 8)
    x = jax.random.normal(rng, (32, 3, 2))

    def flops(fn, *args):
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c["flops"])

    f_loss = flops(jax.value_and_grad(model.loss_and_metrics, has_aux=True),
                   params, x)
    f_le = flops(model.local_energy, params, x)
    f_lp = flops(jax.value_and_grad(
        lambda p, xx: jnp.mean(model.log_prob(p, xx))), params, x)
    assert f_loss < f_le + f_lp, (f_loss, f_le, f_lp)
    # And the surrogate machinery must stay a small overhead on the engine.
    assert f_loss < 1.25 * f_le, (f_loss, f_le)
