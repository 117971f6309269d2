"""Finite-temperature variational Monte Carlo (variational density matrix).

Capability parity with reference ``BetaVMC`` (``src/VMC.py:61-171``): a
learnable Categorical over the truncated many-body Slater basis (the discrete
occupation model), composed with the shared flow.  Estimators:

    Floc = Eloc + logp_states / beta
    S    = -mean(logp_states)            (MC entropy)
    S_an = -sum(p log p)                 (von Neumann, analytic)

Two score-function surrogate losses over DISJOINT parameter groups
(reference ``src/VMC.py:162-169``):

    loss_phi   = mean[logp_states · (Floc - F̄)]        (occupation logits)
    loss_theta = mean[logp_full · (Eloc - Ē_state)]     (flow params)

with Ē_state the PER-STATE mean baseline.  The reference computes that
baseline with a host-side Python loop over a Counter of contiguous state
groups (``src/VMC.py:164-169``) and samples grouped batches through a
ragged-segment determinant primitive; here every walker carries a dense state
index, the baseline is a ``segment_sum`` scatter-add, and the determinants are
one identically-shaped batched computation — no host loops, walker-shardable.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.flow.cnf import CNF
from fermiflow_tpu.physics.base_dist import FreeFermion
from fermiflow_tpu.physics.orbitals import HO2D
from fermiflow_tpu.vmc.local_energy import y_grad_laplacian

__all__ = ["BetaVMC"]


class BetaVMC:
    """Finite-T VMC model.

    Parameters pytree: ``{"flow": flow_params, "log_state_weights": (Nstates,)}``.
    """

    def __init__(
        self,
        beta: float,
        nup: int,
        ndown: int,
        deltaE: float,
        orbitals: HO2D,
        basedist: FreeFermion,
        cnf: CNF,
        pair_potential: Callable,
        sp_potential: Callable | None = None,
        laplacian_chunk: int | None = None,
    ):
        self.beta = beta
        self.laplacian_chunk = laplacian_chunk
        self.nup, self.ndown = nup, ndown
        self.n = nup + ndown
        occ, Es = orbitals.fermion_states(nup, ndown, deltaE)
        self.occ_table = occ  # (Nstates, nup) numpy int32
        self.Es_original = Es  # (Nstates,) numpy float64
        self.Nstates = occ.shape[0]
        self.basedist = basedist
        self.cnf = cnf
        self.pair_potential = pair_potential
        self.sp_potential = sp_potential

    def init_log_state_weights(
        self, boltzmann: bool, key: jax.Array | None = None, dtype=jnp.float64
    ) -> jax.Array:
        """Boltzmann init -beta (E_s - E_0) or standard Gaussian
        (reference ``src/VMC.py:78-81``)."""
        if boltzmann:
            return jnp.asarray(
                -self.beta * (self.Es_original - self.Es_original[0]), dtype=dtype
            )
        if key is None:
            raise ValueError("random init requires a PRNG key")
        return jax.random.normal(key, (self.Nstates,), dtype=dtype)

    # -- sampling --

    def sample(
        self,
        params,
        key: jax.Array,
        batch: int,
        equilibrium_steps: int = 100,
        tau: float = 0.1,
        dtype=jnp.float64,
    ):
        """Draw (state_idx, z, x): state from the Categorical, z from that
        state's Slater density, x through the flow."""
        k_state, k_base = jax.random.split(key)
        logits = params["log_state_weights"]
        state_idx = jax.random.categorical(k_state, logits, shape=(batch,))
        occ_table = jnp.asarray(self.occ_table)
        z = self.basedist.sample_multstates(
            occ_table,
            state_idx,
            k_base,
            equilibrium_steps=equilibrium_steps,
            tau=tau,
            dtype=dtype,
        )
        x = self.cnf.generate(params["flow"], z)
        return state_idx, z, x

    # -- likelihood --

    def log_prob(self, flow_params, x: jax.Array, state_idx: jax.Array) -> jax.Array:
        """Conditional log p_θ(x | state); unbatched or batched alike."""
        z, delta_logp = self.cnf.delta_logp(flow_params, x)
        occ_table = jnp.asarray(self.occ_table)
        return (
            self.basedist.log_prob_multstates(occ_table, state_idx, z) - delta_logp
        )

    def potential(self, x: jax.Array) -> jax.Array:
        pot = self.pair_potential(x)
        if self.sp_potential is not None:
            pot = pot + self.sp_potential(x)
        return pot

    # -- Hessian-flow path: local energy directly from base samples --

    def local_energy_from_base(self, flow_params, state_idx: jax.Array,
                               z: jax.Array, backend: str = "xla",
                               pallas_interpret: bool = False,
                               mesh=None, return_grad: bool = False):
        """(x, eloc, logp) via the forward augmented flow, each walker in its
        own Slater state (see GSVMC.local_energy_from_base)."""
        from fermiflow_tpu.vmc.hessian_flow import local_energy_flow

        occ_table = jnp.asarray(self.occ_table)
        if backend == "pallas":
            # Fused mixed-state Slater-VGH kernel (ops/pallas_slater_vgh):
            # the XLA one-hot-einsum closed form puts the n-wide Slater
            # axis on the 128-wide vector lanes — same layout problem (and
            # fix) as the ground-state base VGH.
            from fermiflow_tpu.ops.pallas_slater_vgh import (
                slater_vgh_ms_pallas,
                slater_vgh_ms_pallas_sharded,
            )

            nx_tab, ny_tab, ks = self._qnum_tables()

            def base_vgh(z_, idx):
                occ = jnp.take(occ_table, idx, axis=0)
                nx = jnp.take(nx_tab, occ)
                ny = jnp.take(ny_tab, occ)
                if mesh is not None:
                    return slater_vgh_ms_pallas_sharded(
                        mesh, z_, nx, ny, ks, interpret=pallas_interpret,
                    )
                return slater_vgh_ms_pallas(
                    z_, nx, ny, ks, interpret=pallas_interpret,
                )
        else:
            base_vgh = lambda z_, idx: self.basedist.log_prob_vgh_multstates(
                occ_table, idx, z_
            )

        return local_energy_flow(
            self.cnf.field_tensors,
            lambda zs, idx: self.basedist.log_prob_multstates(
                occ_table, idx[None], zs[None]
            )[0],
            self.potential,
            flow_params,
            z,
            self.cnf.t0,
            self.cnf.t1,
            steps=self.cnf.steps,
            method=self.cnf.method,
            base_args=(state_idx,),
            backend=backend,
            pallas_interpret=pallas_interpret,
            mesh=mesh,
            return_grad=return_grad,
            base_vgh=base_vgh,
        )

    def _qnum_tables(self):
        """(nx_tab, ny_tab, kshells): orbital quantum-number tables and the
        static Hermite depth covering the truncated state space."""
        import numpy as _np

        orb = self.basedist.orbitals
        occ_np = _np.asarray(self.occ_table)
        ks = int(max(_np.max(_np.asarray(orb.nx)[occ_np]),
                     _np.max(_np.asarray(orb.ny)[occ_np]))) + 1
        return jnp.asarray(orb.nx), jnp.asarray(orb.ny), ks

    def loss_and_metrics_from_base(self, params, state_idx: jax.Array,
                                   z: jax.Array, backend: str = "xla",
                                   pallas_interpret: bool = False,
                                   mesh=None):
        """As ``loss_and_metrics`` but from base samples z (Hessian flow)."""
        flow_sg = jax.lax.stop_gradient(params["flow"])
        x, eloc, _ = self.local_energy_from_base(
            flow_sg, state_idx, z,
            backend=backend, pallas_interpret=pallas_interpret, mesh=mesh,
        )
        x = jax.lax.stop_gradient(x)
        eloc = jax.lax.stop_gradient(eloc)
        return self._losses_from_eloc(params, state_idx, x, eloc)

    def loss_metrics_grads_pallas(self, params, state_idx: jax.Array,
                                  z: jax.Array,
                                  pallas_interpret: bool = False, mesh=None):
        """(loss, metrics, grads) with NO autodiff through the flow.

        Finite-T analog of ``GSVMC.loss_metrics_grads_pallas``: the
        theta-loss gradient mean[logp·(Eloc − per-state baseline)] comes from
        the fused adjoint kernel seeded with the state-CONDITIONAL score
        g = grad_x log p(x|s) (the forward mixed-state Hessian flow already
        computes it); the phi loss touches only the occupation logits and
        stays a trivial autodiff.
        """
        from fermiflow_tpu.ops.pallas_reinforce import (
            reinforce_flow_grad_pallas,
            reinforce_flow_grad_pallas_sharded,
        )
        from fermiflow_tpu.vmc.gs import tile_chain_available

        if mesh is None and tile_chain_available(
            self, z.shape[0], params["flow"]
        ):
            return self._loss_metrics_grads_tiles(
                params, state_idx, z, pallas_interpret
            )

        flow_sg = jax.lax.stop_gradient(params["flow"])
        x, eloc, logp, g = self.local_energy_from_base(
            flow_sg, state_idx, z, backend="pallas",
            pallas_interpret=pallas_interpret, mesh=mesh, return_grad=True,
        )
        x, eloc, logp, g = jax.lax.stop_gradient((x, eloc, logp, g))

        w, loss_phi, grad_logits, metrics = self._phi_loss_and_weights(
            params, state_idx, eloc
        )
        if mesh is not None:
            grads_flow, _ = reinforce_flow_grad_pallas_sharded(
                mesh, params["flow"], x, g, w, self.cnf.t0, self.cnf.t1,
                steps=self.cnf.steps, method=self.cnf.method,
                interpret=pallas_interpret,
            )
        else:
            grads_flow, _ = reinforce_flow_grad_pallas(
                params["flow"], x, g, w, self.cnf.t0, self.cnf.t1,
                steps=self.cnf.steps, method=self.cnf.method,
                interpret=pallas_interpret,
            )
        loss = loss_phi + jnp.sum(w * logp)
        return loss, metrics, {"flow": grads_flow,
                               "log_state_weights": grad_logits}

    def _phi_loss_and_weights(self, params, state_idx, eloc):
        """(w, loss_phi, grad_logits, metrics) — the layout-neutral half of
        the fused update: free-energy observables, the phi REINFORCE loss on
        the occupation logits (a few-flop value_and_grad), and the
        per-state-baselined theta weights (segment-sum replacing the
        reference's host Counter loop, ``src/VMC.py:164-169``)."""
        logits = params["log_state_weights"]
        logp_states_all = jax.nn.log_softmax(logits)
        logp_states_sg = jax.lax.stop_gradient(logp_states_all)[state_idx]
        floc = eloc + logp_states_sg / self.beta
        E, E_std = jnp.mean(eloc), jnp.std(eloc)
        F, F_std = jnp.mean(floc), jnp.std(floc)
        S = -jnp.mean(logp_states_sg)
        S_analytical = -jnp.sum(
            jax.lax.stop_gradient(logp_states_all * jnp.exp(logp_states_all))
        )

        def phi_loss(lg):
            lps = jax.nn.log_softmax(lg)[state_idx]
            return jnp.mean(lps * (floc - F))

        loss_phi, grad_logits = jax.value_and_grad(phi_loss)(logits)

        ones = jnp.ones_like(eloc)
        counts = jax.ops.segment_sum(ones, state_idx, num_segments=self.Nstates)
        sums = jax.ops.segment_sum(eloc, state_idx, num_segments=self.Nstates)
        eloc_baseline = (sums / jnp.maximum(counts, 1.0))[state_idx]
        w = (eloc - eloc_baseline) / eloc.shape[0]
        metrics = {
            "E": E, "E_std": E_std, "F": F, "F_std": F_std,
            "S": S, "S_analytical": S_analytical,
        }
        return w, loss_phi, grad_logits, metrics

    def _loss_metrics_grads_tiles(self, params, state_idx, z: jax.Array,
                                  pallas_interpret: bool = False):
        """Zero-relayout tile-chained finite-T update (see
        ``GSVMC._loss_metrics_grads_tiles``): mixed-state VGH -> Hessian
        flow -> REINFORCE adjoint exchange raw (rows*8, B/8) tiles; the
        only layout transitions are the z and per-walker quantum-number
        relayouts on entry."""
        from fermiflow_tpu.ops.pallas_hessian_flow import hessian_flow_pallas
        from fermiflow_tpu.ops.pallas_metropolis import _to_tiles
        from fermiflow_tpu.ops.pallas_reinforce import (
            reinforce_flow_grad_pallas,
        )
        from fermiflow_tpu.ops.pallas_slater_vgh import slater_vgh_ms_pallas

        B, n, dim = z.shape
        d = n * dim
        nut = d * (d + 1) // 2
        flow = jax.lax.stop_gradient(params["flow"])
        z = jax.lax.stop_gradient(z)
        nx_tab, ny_tab, ks = self._qnum_tables()
        occ = jnp.take(jnp.asarray(self.occ_table), state_idx, axis=0)
        nx = jnp.take(nx_tab, occ)
        ny = jnp.take(ny_tab, occ)

        z_cm = _to_tiles(z.reshape(B, d).T.astype(jnp.float32), d, B)
        nx_cm = _to_tiles(nx.T.astype(jnp.int32), n, B)
        ny_cm = _to_tiles(ny.T.astype(jnp.int32), n, B)
        y_t, g0_t, H0_t = slater_vgh_ms_pallas(
            z_cm, nx_cm, ny_cm, ks, interpret=pallas_interpret,
            tiles_in=True, tiles_out=True,
        )
        x_t, logp_t, g_t, Hp_t = hessian_flow_pallas(
            flow, z_cm, y_t, g0_t, H0_t, self.cnf.t0, self.cnf.t1,
            steps=self.cnf.steps, method=self.cnf.method,
            interpret=pallas_interpret, io_tiles=True,
        )

        gd = g_t.reshape(d, B)
        xd = x_t.reshape(d, B)
        Hd = Hp_t.reshape(nut, B)
        lap = sum(Hd[p * d - p * (p - 1) // 2] for p in range(d))
        g2 = jnp.sum(gd * gd, axis=0)
        V = self.pair_potential.V_rows(xd, n, dim)
        if self.sp_potential is not None:
            V = V + self.sp_potential.V_rows(xd, n, dim)
        eloc = -0.25 * lap - 0.125 * g2 + V
        logp = logp_t.reshape(B)

        w, loss_phi, grad_logits, metrics = self._phi_loss_and_weights(
            params, state_idx, eloc
        )
        grads_flow, _ = reinforce_flow_grad_pallas(
            flow, x_t, g_t, w, self.cnf.t0, self.cnf.t1,
            steps=self.cnf.steps, method=self.cnf.method,
            interpret=pallas_interpret, io_tiles=True,
        )
        loss = loss_phi + jnp.sum(w * logp)
        return loss, metrics, {"flow": grads_flow,
                               "log_state_weights": grad_logits}

    # -- loss & estimators --

    def _losses_from_eloc(self, params, state_idx, x, eloc):
        """Shared estimator/surrogate assembly given detached local energies."""
        logits = params["log_state_weights"]
        logp = self.log_prob(params["flow"], x, state_idx)

        logp_states_all = jax.nn.log_softmax(logits)
        logp_states = logp_states_all[state_idx]
        logp_states_sg = jax.lax.stop_gradient(logp_states)

        floc = eloc + logp_states_sg / self.beta
        E, E_std = jnp.mean(eloc), jnp.std(eloc)
        F, F_std = jnp.mean(floc), jnp.std(floc)
        S = -jnp.mean(logp_states_sg)
        S_analytical = -jnp.sum(
            jax.lax.stop_gradient(logp_states_all * jnp.exp(logp_states_all))
        )

        # phi loss: free-energy REINFORCE on the occupation logits.
        loss_phi = jnp.mean(logp_states * (floc - F))

        # theta loss: per-state-mean baseline via segment reduction
        # (replaces the Counter loop at src/VMC.py:164-169).
        ones = jnp.ones_like(eloc)
        counts = jax.ops.segment_sum(ones, state_idx, num_segments=self.Nstates)
        sums = jax.ops.segment_sum(eloc, state_idx, num_segments=self.Nstates)
        mean_per_state = sums / jnp.maximum(counts, 1.0)
        eloc_baseline = mean_per_state[state_idx]
        loss_theta = jnp.mean(logp * (eloc - eloc_baseline))

        loss = loss_phi + loss_theta
        metrics = {
            "E": E,
            "E_std": E_std,
            "F": F,
            "F_std": F_std,
            "S": S,
            "S_analytical": S_analytical,
        }
        return loss, metrics

    def loss_and_metrics(self, params, state_idx: jax.Array, x: jax.Array):
        """Combined surrogate loss (phi + theta terms act on disjoint params)
        and the full metric set (E, F, S, S_analytical + stds)."""
        # Local energy under fully stopped parameters (see GSVMC.loss_and_
        # metrics: keeps the outer grad from transposing the Hessian engine).
        flow_sg = jax.lax.stop_gradient(params["flow"])
        _, grad_logp, lap_logp = y_grad_laplacian(
            lambda xs, idx: self.log_prob(flow_sg, xs, idx), x, state_idx,
            chunk_size=self.laplacian_chunk,
        )
        kinetic = -0.25 * lap_logp - 0.125 * jnp.sum(grad_logp**2, axis=(-2, -1))
        eloc = jax.lax.stop_gradient(kinetic + self.potential(x))
        return self._losses_from_eloc(params, state_idx, x, eloc)
