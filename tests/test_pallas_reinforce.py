"""Correctness of the fused REINFORCE-gradient kernel (ops/pallas_reinforce).

Oracles, strongest first:

  1. An XLA implementation of the IDENTICAL math — the continuous adjoint
     (x, a, theta_bar) integrated backward on the same grid, with
     (dv/dx)^T a, grad(div), and the parameter vjps obtained from
     ``jax.vjp`` of the backflow field instead of closed forms — run in
     float64.  The kernel (f32, interpret mode) must match to f32 roundoff.
     This validates every hand-derived table in the kernel: A^T a assembly,
     grad(div), and the d eta/d{w1,b1,w2}, d eta'/d{w1,b1,w2} rows.
  2. The production gradient: ``jax.value_and_grad`` of
     ``loss_and_metrics_from_base`` (reverse-ODE logp + autodiff VJP).  The
     kernel path is a different discretization of the same continuous
     gradient (optimize-then-discretize vs discretize-then-optimize), so
     agreement is up to the grid's reversal error — at 16 dopri5 steps and
     smooth fields this sits far below f32 noise (the cosine gate).
  3. The same end-to-end check for the finite-T estimator (theta loss via
     the kernel, phi loss by logits autodiff).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermiflow_tpu.flow.cnf import CNF
from fermiflow_tpu.nn.backflow import (
    backflow_apply,
    backflow_divergence,
    backflow_init_gaussian,
)
from fermiflow_tpu.nn.backflow_derivs import backflow_field_tensors
from fermiflow_tpu.ode import odeint
from fermiflow_tpu.ops.pallas_reinforce import reinforce_flow_grad_pallas
from fermiflow_tpu.physics import HO2D, FreeFermion
from fermiflow_tpu.physics.potentials import CoulombPairPotential, HOPotential
from fermiflow_tpu.vmc.gs import GSVMC


@pytest.fixture
def rng():
    return jax.random.PRNGKey(20)


def adjoint_oracle_xla(params, x1, ghat, w, t0, t1, steps, method):
    """The kernel's math via jax.vjp, any dtype: grads of
    sum_i w_i log p_theta(x1_i) by the continuous adjoint on the same grid."""
    B, n, dim = x1.shape

    def rhs(p, t, state):
        x, a, _ = state
        (v, _), vjp = jax.vjp(
            lambda pp, xx: (backflow_apply(pp, xx), backflow_divergence(pp, xx)),
            p, x,
        )
        # cotangents (a, -w): vjp gives ((dv/dp)^T a - w ddiv/dp,
        #                                (dv/dx)^T a - w grad(div))
        q_p, q_x = vjp((a, -w))
        return (
            v,
            jax.tree_util.tree_map(jnp.negative, q_x),
            jax.tree_util.tree_map(jnp.negative, q_p),
        )

    a1 = (-w[:, None] * ghat).reshape(x1.shape)
    th0 = jax.tree_util.tree_map(jnp.zeros_like, params)
    _, _, th = odeint(rhs, params, (x1, a1, th0), t1, t0,
                      steps=steps, method=method)
    return th


def _flat(tree):
    return jnp.concatenate([jnp.ravel(l) for l in
                            jax.tree_util.tree_leaves(tree)])


@pytest.mark.parametrize("d_mu", [8, None])
def test_kernel_matches_vjp_adjoint_oracle(rng, d_mu):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    params64 = backflow_init_gaussian(k1, 8, d_mu, std=0.3)
    x1 = jax.random.normal(k2, (16, 3, 2))
    ghat = jax.random.normal(k3, (16, 6))
    w = jax.random.normal(k4, (16,)) / 16.0

    oracle = adjoint_oracle_xla(params64, x1, ghat, w, 0.0, 1.0, 8, "dopri5")

    params32 = jax.tree.map(lambda a: a.astype(jnp.float32), params64)
    grads, z_back = reinforce_flow_grad_pallas(
        params32, x1.astype(jnp.float32), ghat.astype(jnp.float32),
        w.astype(jnp.float32), 0.0, 1.0, steps=8, method="dopri5",
        interpret=True,
    )
    go, gk = _flat(oracle), _flat(grads).astype(jnp.float64)
    scale = jnp.max(jnp.abs(go))
    np.testing.assert_allclose(np.asarray(gk), np.asarray(go),
                               atol=3e-6 * float(scale), rtol=2e-5)
    # The backward-reconstructed base point is finite and close to the
    # true preimage at this grid.
    assert np.all(np.isfinite(np.asarray(z_back)))


def test_kernel_matches_production_gradient(rng):
    k1, k2 = jax.random.split(rng)
    orb = HO2D()
    bd = FreeFermion(orb)
    cnf = CNF(
        velocity=backflow_apply,
        divergence=backflow_divergence,
        field_tensors=backflow_field_tensors,
        steps=16,
    )
    model = GSVMC(3, 0, bd, cnf, CoulombPairPotential(0.5), HOPotential())
    params64 = backflow_init_gaussian(k1, 8, 8, std=0.2)
    z = jax.random.normal(k2, (32, 3, 2))

    # Production: autodiff through the reverse-ODE logp (f64, exact
    # discrete gradient of its own formulation).
    (loss_ref, metrics_ref), grads_ref = jax.value_and_grad(
        model.loss_and_metrics_from_base, has_aux=True
    )(params64, z)

    # Kernel path (f32, interpret).
    params32 = jax.tree.map(lambda a: a.astype(jnp.float32), params64)
    loss_k, metrics_k, grads_k = model.loss_metrics_grads_pallas(
        params32, z.astype(jnp.float32), pallas_interpret=True
    )

    a = _flat(grads_ref)
    b = _flat(grads_k).astype(jnp.float64)
    cos = jnp.dot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b))
    assert float(cos) > 1 - 1e-6, float(cos)
    ratio = float(jnp.linalg.norm(b) / jnp.linalg.norm(a))
    assert abs(ratio - 1) < 1e-3, ratio
    np.testing.assert_allclose(float(metrics_k["E"]),
                               float(metrics_ref["E"]), rtol=1e-4)
    np.testing.assert_allclose(float(loss_k), float(loss_ref),
                               rtol=2e-3, atol=1e-5)


def test_kernel_matches_production_gradient_beta(rng):
    from fermiflow_tpu.vmc.beta import BetaVMC

    k1, k2, k3 = jax.random.split(rng, 3)
    orb = HO2D()
    bd = FreeFermion(orb)
    cnf = CNF(
        velocity=backflow_apply,
        divergence=backflow_divergence,
        field_tensors=backflow_field_tensors,
        steps=16,
    )
    model = BetaVMC(2.0, 3, 0, 2.0, orb, bd, cnf,
                    CoulombPairPotential(0.5), HOPotential())
    flow64 = backflow_init_gaussian(k1, 8, 8, std=0.2)
    logits = 0.3 * jax.random.normal(k2, (model.Nstates,))
    params64 = {"flow": flow64, "log_state_weights": logits}
    z = jax.random.normal(k3, (32, 3, 2))
    state_idx = jax.random.randint(k3, (32,), 0, model.Nstates)

    (loss_ref, metrics_ref), grads_ref = jax.value_and_grad(
        model.loss_and_metrics_from_base, has_aux=True
    )(params64, state_idx, z)

    params32 = jax.tree.map(lambda a: a.astype(jnp.float32), params64)
    loss_k, metrics_k, grads_k = model.loss_metrics_grads_pallas(
        params32, state_idx, z.astype(jnp.float32), pallas_interpret=True
    )

    a = _flat(grads_ref["flow"])
    b = _flat(grads_k["flow"]).astype(jnp.float64)
    cos = jnp.dot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b))
    assert float(cos) > 1 - 1e-6, float(cos)
    np.testing.assert_allclose(
        np.asarray(grads_k["log_state_weights"], dtype=np.float64),
        np.asarray(grads_ref["log_state_weights"]),
        atol=2e-5, rtol=1e-3,
    )
    for key in ("E", "F", "S", "S_analytical"):
        np.testing.assert_allclose(float(metrics_k[key]),
                                   float(metrics_ref[key]), rtol=1e-4,
                                   atol=1e-6)


def test_reinforce_sharded_matches_single(rng):
    from fermiflow_tpu.ops.pallas_reinforce import (
        reinforce_flow_grad_pallas_sharded,
    )
    from fermiflow_tpu.parallel import make_walker_mesh

    k1, k2, k3, k4 = jax.random.split(rng, 4)
    params = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        backflow_init_gaussian(k1, 8, 8, std=0.3),
    )
    x1 = jax.random.normal(k2, (64, 3, 2)).astype(jnp.float32)
    ghat = jax.random.normal(k3, (64, 6)).astype(jnp.float32)
    w = (jax.random.normal(k4, (64,)) / 64.0).astype(jnp.float32)

    single, _ = reinforce_flow_grad_pallas(
        params, x1, ghat, w, 0.0, 1.0, steps=2, method="rk4", interpret=True
    )
    mesh = make_walker_mesh(jax.devices("cpu"))
    sharded, _ = reinforce_flow_grad_pallas_sharded(
        mesh, params, x1, ghat, w, 0.0, 1.0, steps=2, method="rk4",
        interpret=True,
    )
    # The sharded gradient is the psum of per-shard closed-form adjoints —
    # identical math, different reduction order.
    a, b = _flat(single), _flat(sharded)
    scale = float(jnp.max(jnp.abs(a)))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                               atol=1e-6 * max(scale, 1.0))
