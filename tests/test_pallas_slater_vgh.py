"""Fused Slater-VGH kernel vs the XLA closed form (interpret mode on CPU).

The kernel is fully deterministic (no on-core PRNG), so the complete
computation — Hermite ladder derivatives, pivoted Gauss-Jordan inverse,
B/C contractions, packed-triangle Hessian assembly — is exercised in the
Pallas TPU interpreter against ``FreeFermion.log_prob_vgh`` (itself pinned
to the nested-autodiff oracle in test_hessian_flow.py).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fermiflow_tpu.ops.pallas_slater_vgh import slater_vgh_pallas
from fermiflow_tpu.physics import HO2D, FreeFermion

ON_TPU = jax.devices()[0].platform == "tpu"
RUN_TPU = bool(int(os.environ.get("FERMIFLOW_TPU_TESTS", "0"))) and ON_TPU


def _setup(nup, ndown=0):
    orb = HO2D()
    bd = FreeFermion(orb)
    occ_up = np.arange(nup, dtype=np.int32)
    occ_dn = np.arange(ndown, dtype=np.int32)
    nx_up = tuple(int(v) for v in orb.nx[occ_up])
    ny_up = tuple(int(v) for v in orb.ny[occ_up])
    nx_dn = tuple(int(v) for v in orb.nx[occ_dn])
    ny_dn = tuple(int(v) for v in orb.ny[occ_dn])
    ks = int(max(nx_up + ny_up + nx_dn + ny_dn)) + 1
    return bd, occ_up, occ_dn, nx_up, ny_up, nx_dn, ny_dn, ks


def _assert_close(a, b, rtol, atol, max_viol_frac=0.0):
    """allclose with an allowance for a tiny fraction of near-nodal walkers.

    Random-Gaussian test positions land arbitrarily close to the Slater
    determinant's nodal surface, where the f32 Gauss-Jordan loses digits in
    a pivot-order-dependent way (production inputs are |det|^2-equilibrated
    and avoid nodes).  The interpret tests keep max_viol_frac=0 (bit-level
    agreement of the same f32 arithmetic); the on-chip test allows 0.1%."""
    a, b = np.asarray(a), np.asarray(b)
    viol = ~np.isclose(a, b, rtol=rtol, atol=atol)
    frac = float(viol.mean())
    assert frac <= max_viol_frac, (
        f"{viol.sum()}/{viol.size} elements ({frac:.2%}) outside "
        f"rtol={rtol}/atol={atol}; max |diff| "
        f"{np.abs(a - b)[viol].max() if viol.any() else 0}"
    )


def _check(nup, ndown, B, interpret, packed=False, equilibrate=False,
           max_viol_frac=0.0):
    bd, occ_up, occ_dn, nx_up, ny_up, nx_dn, ny_dn, ks = _setup(nup, ndown)
    n = nup + ndown
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (B, n, 2), jnp.float32)
    if equilibrate:
        from fermiflow_tpu.ops.pallas_metropolis import (
            metropolis_free_fermion,
        )

        x, _, _ = metropolis_free_fermion(
            x, jnp.int32(17), 0.1, 100, nx_up, ny_up, ks,
            nx_dn=nx_dn, ny_dn=ny_dn,
        )

    out = slater_vgh_pallas(
        x, nx_up, ny_up, ks, nx_dn, ny_dn,
        interpret=interpret, packed=packed,
    )
    y_ref, g_ref, H_ref = bd.log_prob_vgh(
        occ_up, occ_dn if ndown else (), x.astype(jnp.float64)
    )
    if packed:
        y, g, Hp = out
        iu = np.triu_indices(n * 2)
        H_ref_cmp = np.asarray(H_ref)[:, iu[0], iu[1]]
        H_cmp = np.asarray(Hp)
    else:
        y, g, H = out
        H_ref_cmp = np.asarray(H_ref)
        H_cmp = np.asarray(H)
    _assert_close(y, y_ref, rtol=2e-4, atol=2e-4,
                  max_viol_frac=max_viol_frac)
    _assert_close(g, g_ref, rtol=3e-3, atol=3e-3,
                  max_viol_frac=max_viol_frac)
    _assert_close(H_cmp, H_ref_cmp, rtol=5e-3, atol=5e-3,
                  max_viol_frac=max_viol_frac)


def test_vgh_polarized_n3_interpret():
    _check(nup=3, ndown=0, B=64, interpret=True)


def test_vgh_polarized_n6_interpret():
    _check(nup=6, ndown=0, B=64, interpret=True)


def test_vgh_two_sectors_interpret():
    _check(nup=2, ndown=1, B=64, interpret=True)


def test_vgh_packed_matches_full_interpret():
    _check(nup=3, ndown=0, B=64, interpret=True, packed=True)


def test_vgh_awkward_batch_padding_interpret():
    # B not a multiple of 8: wrapper pads with edge replication, slices off.
    _check(nup=3, ndown=0, B=37, interpret=True)


def test_vgh_multistate_interpret():
    """Per-walker-occupation kernel vs the XLA one-hot closed form."""
    from fermiflow_tpu.ops.pallas_slater_vgh import slater_vgh_ms_pallas

    orb = HO2D()
    bd = FreeFermion(orb)
    occ_table, _ = orb.fermion_states(3, 0, 2.0)  # 21 states
    occ_table = np.asarray(occ_table)
    ks = int(max(np.max(orb.nx[occ_table]), np.max(orb.ny[occ_table]))) + 1
    B = 64
    idx = jax.random.randint(jax.random.PRNGKey(5), (B,), 0,
                             occ_table.shape[0])
    occ = jnp.take(jnp.asarray(occ_table), idx, axis=0)
    nx = jnp.take(jnp.asarray(orb.nx), occ).astype(jnp.int32)
    ny = jnp.take(jnp.asarray(orb.ny), occ).astype(jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(6), (B, 3, 2), jnp.float32)

    y, g, H = slater_vgh_ms_pallas(x, nx, ny, ks, interpret=True)
    y_ref, g_ref, H_ref = bd.log_prob_vgh_multstates(
        jnp.asarray(occ_table), idx, x.astype(jnp.float64)
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref),
                               rtol=5e-3, atol=5e-3)


def test_tile_chained_path_matches_standard():
    """The zero-relayout tile chain (VGH -> Hessian-flow -> REINFORCE with
    raw tile handoffs + row-major observables) must agree with the
    standard-layout fused path to f32 roundoff — same kernels, different
    boundary plumbing."""
    from fermiflow_tpu.flow.cnf import CNF
    from fermiflow_tpu.nn import (
        backflow_apply,
        backflow_divergence,
        backflow_init_gaussian,
    )
    from fermiflow_tpu.nn.backflow_derivs import backflow_field_tensors
    from fermiflow_tpu.physics.potentials import (
        CoulombPairPotential,
        HOPotential,
    )
    from fermiflow_tpu.vmc.gs import GSVMC

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    orb = HO2D()
    bd = FreeFermion(orb)
    cnf = CNF(
        velocity=backflow_apply,
        divergence=backflow_divergence,
        field_tensors=backflow_field_tensors,
        steps=2,
    )
    model = GSVMC(3, 0, bd, cnf, CoulombPairPotential(0.5), HOPotential())
    params = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        backflow_init_gaussian(k1, 8, 8, std=0.2),
    )
    B = 1024  # smallest batch on which every kernel picks the (8, B/8) layout
    z = jax.random.normal(k2, (B, 3, 2), jnp.float32)
    assert model._tile_chain_ok(B, params)
    assert not model._tile_chain_ok(32, params)

    loss_t, m_t, g_t = model.loss_metrics_grads_pallas(
        params, z, pallas_interpret=True
    )
    model._tile_chain_ok = lambda b, p: False  # force the standard path
    loss_s, m_s, g_s = model.loss_metrics_grads_pallas(
        params, z, pallas_interpret=True
    )
    np.testing.assert_allclose(float(m_t["E"]), float(m_s["E"]), rtol=1e-5)
    np.testing.assert_allclose(float(loss_t), float(loss_s),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_t),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_beta_tile_chained_path_matches_standard():
    """Finite-T tile chain (mixed-state VGH -> hflow -> REINFORCE with raw
    tile handoffs) vs the standard-layout fused path — same kernels,
    different boundary plumbing."""
    from fermiflow_tpu.flow.cnf import CNF
    from fermiflow_tpu.nn import (
        backflow_apply,
        backflow_divergence,
        backflow_init_gaussian,
    )
    from fermiflow_tpu.nn.backflow_derivs import backflow_field_tensors
    from fermiflow_tpu.physics.potentials import (
        CoulombPairPotential,
        HOPotential,
    )
    from fermiflow_tpu.vmc.beta import BetaVMC
    from fermiflow_tpu.vmc.gs import tile_chain_available

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    orb = HO2D()
    bd = FreeFermion(orb)
    cnf = CNF(
        velocity=backflow_apply,
        divergence=backflow_divergence,
        field_tensors=backflow_field_tensors,
        steps=2,
    )
    model = BetaVMC(2.0, 3, 0, 2.0, orb, bd, cnf,
                    CoulombPairPotential(0.5), HOPotential())
    flow = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        backflow_init_gaussian(k1, 8, 8, std=0.2),
    )
    logits = (0.3 * jax.random.normal(k2, (model.Nstates,))).astype(
        jnp.float32)
    params = {"flow": flow, "log_state_weights": logits}
    B = 1024
    z = jax.random.normal(k3, (B, 3, 2), jnp.float32)
    state_idx = jax.random.randint(k3, (B,), 0, model.Nstates)
    assert tile_chain_available(model, B, flow)

    loss_t, m_t, g_t = model.loss_metrics_grads_pallas(
        params, state_idx, z, pallas_interpret=True
    )
    # Force the standard path (the gate is imported at call time).
    from unittest import mock

    with mock.patch("fermiflow_tpu.vmc.gs.tile_chain_available",
                    return_value=False):
        loss_s, m_s, g_s = model.loss_metrics_grads_pallas(
            params, state_idx, z, pallas_interpret=True
        )
    for key in ("E", "F", "S", "S_analytical"):
        np.testing.assert_allclose(float(m_t[key]), float(m_s[key]),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss_t), float(loss_s),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_t),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(not RUN_TPU, reason="real-TPU kernel test (set "
                    "FERMIFLOW_TPU_TESTS=1 on a TPU host)")
def test_vgh_tpu_n6():
    _check(nup=6, ndown=0, B=8192, interpret=False, equilibrate=True,
           max_viol_frac=1e-3)
