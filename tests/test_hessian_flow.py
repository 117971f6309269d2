"""Oracle tests for the Hessian-flow local-energy engine.

Layer 1: every closed-form field-derivative tensor in nn/backflow_derivs.py
must match generic autodiff of the backflow field to near machine precision
(float64).  Layer 2: the augmented-ODE local energy must reproduce the
nested-jvp Laplacian engine and the exact eigenstate oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermiflow_tpu.flow import CNF
from fermiflow_tpu.nn import backflow_init_gaussian, backflow_init_zeros
from fermiflow_tpu.nn.backflow import backflow_apply, backflow_divergence
from fermiflow_tpu.nn.backflow_derivs import backflow_field_tensors
from fermiflow_tpu.physics import HO2D, FreeFermion, HOPotential
from fermiflow_tpu.vmc.hessian_flow import (
    base_val_grad_hess,
    local_energy_flow,
)
from fermiflow_tpu.vmc.local_energy import y_grad_laplacian

N, DIM = 4, 2
ND = N * DIM


def _params(key, d_mu=8, std=0.5):
    # Large std so all derivative orders are exercised away from zero.
    return backflow_init_gaussian(key, 8, d_mu, std=std)


def _flat_field(params):
    def v_flat(xf):
        return backflow_apply(params, xf.reshape(N, DIM)).reshape(ND)

    def div_flat(xf):
        return backflow_divergence(params, xf.reshape(N, DIM))

    return v_flat, div_flat


@pytest.mark.parametrize("d_mu", [8, None])
def test_field_tensors_match_autodiff(rng, d_mu):
    k1, k2, k3 = jax.random.split(rng, 3)
    params = _params(k1, d_mu=d_mu)
    x = jax.random.normal(k2, (N, DIM))
    g = jax.random.normal(k3, (N, DIM))
    v_flat, div_flat = _flat_field(params)
    xf = x.reshape(ND)

    ft = backflow_field_tensors(params, x, g)

    np.testing.assert_allclose(
        np.asarray(ft["v"]).ravel(), np.asarray(v_flat(xf)), atol=1e-12
    )
    np.testing.assert_allclose(
        float(ft["div"]), float(div_flat(xf)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ft["A"]), np.asarray(jax.jacfwd(v_flat)(xf)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ft["gdiv"]), np.asarray(jax.grad(div_flat)(xf)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ft["S"]), np.asarray(jax.hessian(div_flat)(xf)), atol=1e-11
    )
    Hv = jax.hessian(v_flat)(xf)  # (c, a, b)
    T_want = jnp.einsum("cab,c->ab", Hv, g.reshape(ND))
    np.testing.assert_allclose(np.asarray(ft["T"]), np.asarray(T_want), atol=1e-11)

    # div must equal tr A (consistency of the two closed forms).
    np.testing.assert_allclose(
        float(ft["div"]), float(jnp.trace(ft["A"])), atol=1e-12
    )


def test_field_tensors_batched_shapes(rng):
    params = _params(rng)
    x = jax.random.normal(rng, (5, N, DIM))
    g = jax.random.normal(jax.random.fold_in(rng, 1), (5, N, DIM))
    ft = backflow_field_tensors(params, x, g)
    assert ft["v"].shape == (5, N, DIM)
    assert ft["div"].shape == (5,)
    assert ft["gdiv"].shape == (5, ND)
    assert ft["A"].shape == (5, ND, ND)
    # Batched result must equal the per-walker result.
    ft0 = backflow_field_tensors(params, x[2], g[2])
    np.testing.assert_allclose(np.asarray(ft["T"][2]), np.asarray(ft0["T"]), atol=1e-12)


def test_base_val_grad_hess_matches_laplacian_engine(rng):
    orb = HO2D()
    bd = FreeFermion(orb)
    occ = np.arange(3, dtype=np.int32)
    z = jax.random.normal(rng, (6, 3, 2))
    logp_single = lambda zs: bd.log_prob(occ, (), zs)
    y, g, H = base_val_grad_hess(logp_single, z)
    y2, g2, lap2 = y_grad_laplacian(logp_single, z)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g2).reshape(6, -1), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(jnp.trace(H, axis1=-2, axis2=-1)), np.asarray(lap2), atol=1e-9
    )


def test_identity_flow_exact_eigenstate(rng):
    """Zero-initialized flow: Eloc must be the exact eigenvalue (N=3 -> 5.0)
    for every walker — the reference's crown-jewel oracle
    (tests/test_basedist.py:43)."""
    orb = HO2D()
    bd = FreeFermion(orb)
    occ = np.arange(3, dtype=np.int32)
    params = backflow_init_zeros(8, 8)
    z = jax.random.normal(rng, (16, 3, 2))
    x, eloc, logp = local_energy_flow(
        backflow_field_tensors,
        lambda zs: bd.log_prob(occ, (), zs),
        lambda xs: HOPotential()(xs),
        params,
        z,
        0.0,
        1.0,
        steps=4,
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(z), atol=1e-12)
    np.testing.assert_allclose(np.asarray(eloc), 5.0, atol=1e-8)
    want_logp = bd.log_prob(occ, (), z)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(want_logp), atol=1e-10)


def test_train_step_engines_agree_at_identity_init():
    """Zero-init flow: the Hessian-flow and nested-jvp train steps see the
    identical base samples and must produce the same first-step metrics."""
    import optax

    from fermiflow_tpu.cli import common
    from fermiflow_tpu.config import Config
    from fermiflow_tpu.train import init_gs_state, make_gs_train_step

    metrics = {}
    for engine in ("nested_jvp", "hessian_flow"):
        cfg = Config(
            nup=3, Z=0.5, batch=32, d_eta=8, d_mu=8, ode_steps=4,
            equilibrium_steps=6, seed=11, local_energy=engine,
        )
        model, params = common.build_gs(cfg)
        opt = optax.adam(cfg.lr)
        state = init_gs_state(model, params, cfg, opt)
        step = make_gs_train_step(model, opt, cfg)
        _, m = step(state)
        metrics[engine] = m
    np.testing.assert_allclose(
        float(metrics["nested_jvp"]["E"]),
        float(metrics["hessian_flow"]["E"]),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        float(metrics["nested_jvp"]["E_std"]),
        float(metrics["hessian_flow"]["E_std"]),
        atol=1e-9,
    )


def test_beta_free_energy_oracle_hessian_flow(rng):
    """beta-VMC at Z=0, Boltzmann init, identity flow: Floc is constant
    (F exact, F_std = 0) through the Hessian-flow engine too."""
    import optax

    from fermiflow_tpu.cli import common
    from fermiflow_tpu.config import Config
    from fermiflow_tpu.train import init_beta_state, make_beta_train_step

    cfg = Config(
        nup=3, Z=0.0, beta=2.0, deltaE=2.0, boltzmann=True, batch=64,
        d_eta=8, d_mu=8, ode_steps=2, equilibrium_steps=6, seed=5,
        local_energy="hessian_flow",
    )
    model, params = common.build_beta(cfg)
    opt = optax.adam(cfg.lr)
    state = init_beta_state(model, params, cfg, opt)
    step = make_beta_train_step(model, opt, cfg)
    _, m = step(state)
    Es = np.asarray(model.Es_original)
    w = np.exp(-cfg.beta * (Es - Es[0]))
    p = w / w.sum()
    F_exact = float(np.sum(p * Es) + np.sum(p * np.log(p)) / cfg.beta)
    np.testing.assert_allclose(float(m["F"]), F_exact, atol=1e-8)
    assert float(m["F_std"]) < 1e-8


@pytest.mark.parametrize("d_mu", [8, None])
def test_hessian_flow_matches_reverse_laplacian(rng, d_mu):
    """Nontrivial flow: (logp, grad, lap) from the forward augmented system
    must match the reverse-ODE + nested-jvp engine at the generated points
    (both converge to the continuous flow; tight grid => tight agreement)."""
    orb = HO2D()
    bd = FreeFermion(orb)
    occ = np.arange(3, dtype=np.int32)
    k1, k2 = jax.random.split(rng)
    params = backflow_init_gaussian(k1, 8, d_mu, std=0.3)
    z = jax.random.normal(k2, (8, 3, 2))
    steps = 48

    x, eloc, logp = local_energy_flow(
        backflow_field_tensors,
        lambda zs: bd.log_prob(occ, (), zs),
        lambda xs: jnp.zeros(xs.shape[0], xs.dtype),
        params,
        z,
        0.0,
        1.0,
        steps=steps,
    )

    from fermiflow_tpu.nn.backflow import backflow_apply, backflow_divergence

    cnf = CNF(
        velocity=backflow_apply,
        divergence=backflow_divergence,
        steps=steps,
    )
    logp_fn = lambda xs: (
        bd.log_prob(occ, (), cnf.delta_logp(params, xs)[0])
        - cnf.delta_logp(params, xs)[1]
    )
    y2, g2, lap2 = y_grad_laplacian(logp_fn, x)
    kin2 = -0.25 * lap2 - 0.125 * jnp.sum(g2**2, axis=(-2, -1))
    np.testing.assert_allclose(np.asarray(logp), np.asarray(y2), rtol=0, atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(eloc), np.asarray(kin2), rtol=2e-5, atol=2e-5
    )


# ---- fused Pallas kernel (ops/pallas_hessian_flow.py) ----
#
# The kernel is deterministic (no RNG), so the TPU-flavored interpreter
# validates the full unrolled integration on CPU.  f32 accumulation order
# differs from the XLA engine, so both are judged against the f64 engine
# with an f32-roundoff tolerance (measured parity: the kernel's error vs
# the f64 oracle matches the XLA-f32 engine's to within ~2x).


@pytest.mark.parametrize("d_mu", [8, None])
def test_pallas_hessian_flow_matches_engine_interpret(rng, d_mu):
    from fermiflow_tpu.ops.pallas_hessian_flow import hessian_flow_pallas
    from fermiflow_tpu.vmc.hessian_flow import hessian_flow

    orb = HO2D()
    bd = FreeFermion(orb)
    occ = np.arange(3, dtype=np.int32)
    k1, k2 = jax.random.split(rng)
    params64 = backflow_init_gaussian(k1, 8, d_mu, std=0.3)
    params32 = jax.tree.map(
        lambda a: None if a is None else a.astype(jnp.float32), params64
    )
    z64 = jax.random.normal(k2, (64, 3, 2))
    y64, g64, H64 = base_val_grad_hess(
        lambda zs: bd.log_prob(occ, (), zs), z64
    )

    ref = hessian_flow(
        backflow_field_tensors, params64, z64, y64, g64, H64,
        0.0, 1.0, steps=4, method="rk4",
    )
    pal = hessian_flow_pallas(
        params32,
        z64.astype(jnp.float32),
        y64.astype(jnp.float32),
        g64.astype(jnp.float32),
        H64.astype(jnp.float32),
        0.0, 1.0, steps=4, method="rk4", interpret=True,
    )
    for name, r, p in zip(("x", "logp", "g", "H"), ref, pal):
        err = float(jnp.max(jnp.abs(np.asarray(r, np.float64) - np.asarray(p, np.float64))))
        scale = float(jnp.max(jnp.abs(r)))
        assert err < 1e-4 * scale + 1e-5, (name, err, scale)


@pytest.mark.parametrize("method", ["rk4", "dopri5"])
def test_pallas_hessian_flow_error_comparable_to_xla_f32(rng, method):
    """The kernel's f32 error vs the f64 oracle must stay within ~3x of the
    XLA-f32 engine's error — i.e. the Pallas accumulation order loses no
    meaningful precision (both integrators, both methods)."""
    from fermiflow_tpu.ops.pallas_hessian_flow import hessian_flow_pallas
    from fermiflow_tpu.vmc.hessian_flow import hessian_flow

    orb = HO2D()
    bd = FreeFermion(orb)
    occ = np.arange(3, dtype=np.int32)
    k1, k2 = jax.random.split(rng)
    params64 = backflow_init_gaussian(k1, 8, 8, std=0.3)
    params32 = jax.tree.map(lambda a: a.astype(jnp.float32), params64)
    z64 = jax.random.normal(k2, (64, 3, 2))
    z32 = z64.astype(jnp.float32)
    y64, g64, H64 = base_val_grad_hess(lambda zs: bd.log_prob(occ, (), zs), z64)
    y32, g32, H32 = (a.astype(jnp.float32) for a in (y64, g64, H64))

    ref = hessian_flow(
        backflow_field_tensors, params64, z64, y64, g64, H64,
        0.0, 1.0, steps=8, method=method,
    )
    xla32 = hessian_flow(
        backflow_field_tensors, params32, z32, y32, g32, H32,
        0.0, 1.0, steps=8, method=method,
    )
    pal32 = hessian_flow_pallas(
        params32, z32, y32, g32, H32,
        0.0, 1.0, steps=8, method=method, interpret=True,
    )
    for name, r, a, b in zip(("x", "logp", "g", "H"), ref, xla32, pal32):
        err_xla = float(jnp.max(jnp.abs(
            np.asarray(r, np.float64) - np.asarray(a, np.float64))))
        err_pal = float(jnp.max(jnp.abs(
            np.asarray(r, np.float64) - np.asarray(b, np.float64))))
        scale = float(jnp.max(jnp.abs(r)))
        assert err_pal < max(3.0 * err_xla, 1e-5 * scale + 1e-6), (
            method, name, err_xla, err_pal)


def test_pallas_hessian_flow_sharded_matches_single(rng):
    from fermiflow_tpu.ops.pallas_hessian_flow import (
        hessian_flow_pallas,
        hessian_flow_pallas_sharded,
    )
    from fermiflow_tpu.parallel import make_walker_mesh

    orb = HO2D()
    bd = FreeFermion(orb)
    occ = np.arange(3, dtype=np.int32)
    k1, k2 = jax.random.split(rng)
    params = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        backflow_init_gaussian(k1, 8, 8, std=0.3),
    )
    z = jax.random.normal(k2, (64, 3, 2)).astype(jnp.float32)
    y0, g0, H0 = base_val_grad_hess(
        lambda zs: bd.log_prob(occ, (), zs.astype(jnp.float64)), z
    )
    y0, g0, H0 = (a.astype(jnp.float32) for a in (y0, g0, H0))

    mesh = make_walker_mesh(jax.devices("cpu"))
    single = hessian_flow_pallas(
        params, z, y0, g0, H0, 0.0, 1.0, steps=2, method="rk4", interpret=True
    )
    sharded = hessian_flow_pallas_sharded(
        mesh, params, z, y0, g0, H0, 0.0, 1.0, steps=2, method="rk4",
        interpret=True,
    )
    # rtol: interpret-mode execution lowers the per-walker elementwise math
    # through XLA:CPU, whose mul+add -> FMA contraction depends on the lane
    # width (64 vs 8 per shard), so the H contraction rounds differently at
    # the f32 ulp scale (measured 1.3e-4 rel; x/logp/g stay bitwise equal).
    # The sharding itself changes no math — one kernel launch per shard.
    for name, a, b in zip(("x", "logp", "g", "H"), single, sharded):
        scale = float(np.max(np.abs(np.asarray(a))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3,
            atol=1e-6 * max(scale, 1.0), err_msg=name
        )
