"""Ground-state variational Monte Carlo estimator.

Capability parity with reference ``GSVMC`` (``src/VMC.py:4-59``): sample the
flow-transformed Slater ground state, estimate the local energy

    Eloc = -1/4 ∇²logp - 1/8 |∇logp|² + V(x)      (logp = 2 log|psi|)

and return the REINFORCE score-function surrogate whose gradient is the VMC
energy gradient:  loss = mean[(Eloc - Ē) · logp_θ(x)]  with Eloc detached
(reference ``src/VMC.py:40-58``).

TPU-native differences: pure functions over a params pytree; sampling through
the scan Metropolis kernel + forward flow (samples carry no gradients); one
shared computation produces (logp, ∇logp, ∇²logp) — the reference integrates
the reverse ODE twice (once for logp_full, once inside y_grad_laplacian);
metrics are returned, not stored as module attributes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.flow.cnf import CNF
from fermiflow_tpu.physics.base_dist import FreeFermion
from fermiflow_tpu.vmc.local_energy import y_grad_laplacian

__all__ = ["GSVMC", "tile_chain_available"]


def tile_chain_available(model, B: int, flow_params) -> bool:
    """Whether the zero-relayout tile-chained kernel path is available.

    Requires every kernel in the chain to pick the full-sublane (8, B/8)
    layout with no batch padding, and row-major potential support
    (``V_rows``).  ``model`` is a GSVMC or BetaVMC (both carry cnf,
    basedist and the two potentials); ``flow_params`` the backflow pytree.
    """
    from fermiflow_tpu.ode.integrators import TABLEAUS
    from fermiflow_tpu.ops.pallas_hessian_flow import SF_FULL, hflow_layout
    from fermiflow_tpu.ops.pallas_metropolis import _choose_block
    from fermiflow_tpu.ops.pallas_reinforce import reinforce_layout

    if B % SF_FULL:
        return False
    if not hasattr(model.pair_potential, "V_rows"):
        return False
    if model.sp_potential is not None and not hasattr(
        model.sp_potential, "V_rows"
    ):
        return False
    n, dim = model.n, model.basedist.dim
    if dim != 2:
        return False
    stages = TABLEAUS[model.cnf.method].stages
    d_eta = flow_params["eta"]["w1"].shape[1]
    mu = flow_params.get("mu")
    d_mu = mu["w1"].shape[1] if mu is not None else 0
    _, sf_h, bp_h = hflow_layout(B, n, dim, stages)
    _, sf_r, bp_r = reinforce_layout(B, n, dim, d_eta, d_mu, stages)
    _, bp_v = _choose_block(B, cap=1024)
    return (
        sf_h == SF_FULL and bp_h == B
        and sf_r == SF_FULL and bp_r == B
        and bp_v == B
    )


class GSVMC:
    """Ground-state VMC model (static config; all methods pure)."""

    def __init__(
        self,
        nup: int,
        ndown: int,
        basedist: FreeFermion,
        cnf: CNF,
        pair_potential: Callable,
        sp_potential: Callable | None = None,
        laplacian_chunk: int | None = None,
    ):
        self.nup, self.ndown = nup, ndown
        # Batch chunk for the Laplacian engine (memory bound, see
        # local_energy.y_grad_laplacian).
        self.laplacian_chunk = laplacian_chunk
        self.n = nup + ndown
        # Ground state occupies the lowest orbitals of each spin sector
        # (reference src/VMC.py:23-24).
        self.occ_up = np.arange(nup, dtype=np.int32)
        self.occ_down = np.arange(ndown, dtype=np.int32)
        self.basedist = basedist
        self.cnf = cnf
        self.pair_potential = pair_potential
        self.sp_potential = sp_potential

    # -- sampling: z ~ |base|², x = flow(z); x then follows |psi_θ|² exactly --

    def sample(
        self,
        params,
        key: jax.Array,
        batch: int,
        equilibrium_steps: int = 100,
        tau: float = 0.1,
        dtype=jnp.float64,
    ):
        z = self.basedist.sample(
            self.occ_up,
            self.occ_down,
            key,
            (batch,),
            equilibrium_steps=equilibrium_steps,
            tau=tau,
            dtype=dtype,
        )
        x = self.cnf.generate(params, z)
        return z, x

    # -- likelihood --

    def log_prob(self, params, x: jax.Array) -> jax.Array:
        """log p_θ(x) via reverse flow; works on any batch shape (incl. none)."""
        z, delta_logp = self.cnf.delta_logp(params, x)
        return self.basedist.log_prob(self.occ_up, self.occ_down, z) - delta_logp

    # -- local energy & loss --

    def potential(self, x: jax.Array) -> jax.Array:
        pot = self.pair_potential(x)
        if self.sp_potential is not None:
            pot = pot + self.sp_potential(x)
        return pot

    def local_energy(self, params, x: jax.Array):
        """Per-walker local energies and the differentiable logp (batch,)."""
        logp, grad_logp, lap_logp = y_grad_laplacian(
            lambda xs: self.log_prob(params, xs), x,
            chunk_size=self.laplacian_chunk,
        )
        kinetic = -0.25 * lap_logp - 0.125 * jnp.sum(grad_logp**2, axis=(-2, -1))
        eloc = kinetic + self.potential(x)
        return eloc, logp

    def loss_and_metrics(self, params, x: jax.Array):
        """REINFORCE surrogate loss and energy metrics for a walker batch.

        The local energy is evaluated with fully stopped parameters so the
        outer parameter gradient never transposes through the (chunked)
        Hessian machinery — only the cheap batched ``log_prob`` below carries
        parameter gradients.  Its primal re-solves the reverse ODE already
        integrated inside ``local_energy``; measured cost (XLA cost_analysis,
        pinned by tests/test_vmc.py::test_loss_flops_not_worse_than_unshared):
        compiled FLOPs of value_and_grad(loss) stay below the fully-unshared
        sum local_energy + value_and_grad(logp), i.e. XLA CSE recovers part
        of the duplication and the residual overhead is ~15% of the engine
        cost (the 2n·dim tangent channels dominate).
        """
        eloc, _ = self.local_energy(jax.lax.stop_gradient(params), x)
        eloc = jax.lax.stop_gradient(eloc)
        logp = self.log_prob(params, x)
        E = jnp.mean(eloc)
        E_std = jnp.std(eloc)
        loss = jnp.mean((eloc - E) * logp)
        return loss, {"E": E, "E_std": E_std}

    # -- Hessian-flow path: local energy directly from base samples --

    def local_energy_from_base(self, params, z: jax.Array,
                               backend: str = "xla",
                               pallas_interpret: bool = False,
                               mesh=None, return_grad: bool = False):
        """(x, eloc, logp) via the forward augmented flow (vmc/hessian_flow).

        One forward integration of (x, logp, grad logp, Hessian) from the
        known base samples replaces the reverse solve + 2n*dim nested-jvp
        tangent channels of ``local_energy``.  Requires
        ``cnf.field_tensors`` (closed-form field derivatives).
        backend="pallas" runs the whole integration in one fused TPU kernel
        (backflow field, float32).
        """
        from fermiflow_tpu.vmc.hessian_flow import local_energy_flow

        if backend == "pallas":
            # Fused Slater-VGH kernel: same closed form as log_prob_vgh but
            # in the sublane-major walker layout (ops/pallas_slater_vgh —
            # the XLA version's n-wide lanes leave the VPU ~99% idle).
            from fermiflow_tpu.ops.pallas_slater_vgh import (
                slater_vgh_pallas,
                slater_vgh_pallas_sharded,
            )

            orb = self.basedist.orbitals
            nx_up = tuple(int(v) for v in orb.nx[self.occ_up])
            ny_up = tuple(int(v) for v in orb.ny[self.occ_up])
            nx_dn = tuple(int(v) for v in orb.nx[self.occ_down])
            ny_dn = tuple(int(v) for v in orb.ny[self.occ_down])
            ks = int(max(nx_up + ny_up + nx_dn + ny_dn)) + 1

            def base_vgh(z_):
                if mesh is not None:
                    return slater_vgh_pallas_sharded(
                        mesh, z_, nx_up, ny_up, ks, nx_dn, ny_dn,
                        interpret=pallas_interpret,
                    )
                return slater_vgh_pallas(
                    z_, nx_up, ny_up, ks, nx_dn, ny_dn,
                    interpret=pallas_interpret,
                )
        else:
            base_vgh = lambda z_: self.basedist.log_prob_vgh(
                self.occ_up, self.occ_down, z_
            )

        return local_energy_flow(
            self.cnf.field_tensors,
            lambda zs: self.basedist.log_prob(self.occ_up, self.occ_down, zs),
            self.potential,
            params,
            z,
            self.cnf.t0,
            self.cnf.t1,
            steps=self.cnf.steps,
            method=self.cnf.method,
            backend=backend,
            pallas_interpret=pallas_interpret,
            mesh=mesh,
            return_grad=return_grad,
            base_vgh=base_vgh,
        )

    def loss_and_metrics_from_base(self, params, z: jax.Array,
                                   backend: str = "xla",
                                   pallas_interpret: bool = False,
                                   mesh=None):
        """As ``loss_and_metrics`` but from base samples z (Hessian flow).

        x = flow(z) follows |psi|^2 exactly, so the REINFORCE estimator is
        unchanged; only the Eloc evaluation strategy differs.
        """
        x, eloc, _ = self.local_energy_from_base(
            jax.lax.stop_gradient(params), z,
            backend=backend, pallas_interpret=pallas_interpret, mesh=mesh,
        )
        x = jax.lax.stop_gradient(x)
        eloc = jax.lax.stop_gradient(eloc)
        logp = self.log_prob(params, x)
        E = jnp.mean(eloc)
        E_std = jnp.std(eloc)
        loss = jnp.mean((eloc - E) * logp)
        return loss, {"E": E, "E_std": E_std}

    def loss_metrics_grads_pallas(self, params, z: jax.Array,
                                  pallas_interpret: bool = False, mesh=None):
        """(loss, metrics, grads) with NO autodiff through the flow.

        The gradient of the REINFORCE surrogate is computed by the fused
        adjoint kernel (``ops/pallas_reinforce.py``) from quantities the
        forward Hessian-flow kernel already produces: the generated x, the
        score g = grad_x log p(x) (terminal adjoint seed) and log p(x) (the
        loss value) — the reverse ODE solve + VJP of ``loss_and_metrics_
        from_base`` (87% of the measured step time) disappears entirely.
        Estimator-identical to ``loss_and_metrics_from_base`` up to the
        fixed grid's reversal error (~1e-10 relative at trained fields,
        validation/runs/ode_steps_n6.json).
        """
        from fermiflow_tpu.ops.pallas_reinforce import (
            reinforce_flow_grad_pallas,
            reinforce_flow_grad_pallas_sharded,
        )

        if mesh is None and self._tile_chain_ok(z.shape[0], params):
            return self._loss_metrics_grads_tiles(params, z, pallas_interpret)

        x, eloc, logp, g = self.local_energy_from_base(
            jax.lax.stop_gradient(params), z, backend="pallas",
            pallas_interpret=pallas_interpret, mesh=mesh, return_grad=True,
        )
        x, eloc, logp, g = jax.lax.stop_gradient((x, eloc, logp, g))
        E = jnp.mean(eloc)
        E_std = jnp.std(eloc)
        w = (eloc - E) / eloc.shape[0]
        if mesh is not None:
            grads, _ = reinforce_flow_grad_pallas_sharded(
                mesh, params, x, g, w, self.cnf.t0, self.cnf.t1,
                steps=self.cnf.steps, method=self.cnf.method,
                interpret=pallas_interpret,
            )
        else:
            grads, _ = reinforce_flow_grad_pallas(
                params, x, g, w, self.cnf.t0, self.cnf.t1,
                steps=self.cnf.steps, method=self.cnf.method,
                interpret=pallas_interpret,
            )
        loss = jnp.sum(w * logp)
        return loss, {"E": E, "E_std": E_std}, grads

    def _occ_qnums(self):
        """Static occupied-orbital quantum numbers for the fused kernels."""
        orb = self.basedist.orbitals
        nx_up = tuple(int(v) for v in orb.nx[self.occ_up])
        ny_up = tuple(int(v) for v in orb.ny[self.occ_up])
        nx_dn = tuple(int(v) for v in orb.nx[self.occ_down])
        ny_dn = tuple(int(v) for v in orb.ny[self.occ_down])
        ks = int(max(nx_up + ny_up + nx_dn + ny_dn)) + 1
        return nx_up, ny_up, nx_dn, ny_dn, ks

    def _tile_chain_ok(self, B: int, params) -> bool:
        return tile_chain_available(self, B, params)

    def _loss_metrics_grads_tiles(self, params, z: jax.Array,
                                  pallas_interpret: bool = False):
        """Zero-relayout chained kernel path (round-4 VERDICT item #3).

        The per-kernel fixed cost of the fused step was dominated by layout
        transitions at each pallas_call boundary (z/g transposed to the
        sublane-major tiles on kernel entry and back on exit, the Hessian
        packed and unpacked).  Here the base-VGH, Hessian-flow and
        REINFORCE-adjoint kernels exchange raw (rows*8, B/8) tile blocks;
        the only transpose left in the whole update is the one z relayout
        on entry, and every XLA-side observable (kinetic energy, potential,
        REINFORCE weights) is computed row-major, which is layout-neutral.
        """
        from fermiflow_tpu.ops.pallas_hessian_flow import hessian_flow_pallas
        from fermiflow_tpu.ops.pallas_metropolis import _SUB, _to_tiles
        from fermiflow_tpu.ops.pallas_reinforce import (
            reinforce_flow_grad_pallas,
        )
        from fermiflow_tpu.ops.pallas_slater_vgh import slater_vgh_pallas

        B, n, dim = z.shape
        d = n * dim
        nut = d * (d + 1) // 2
        nx_up, ny_up, nx_dn, ny_dn, ks = self._occ_qnums()
        z = jax.lax.stop_gradient(z)
        params = jax.lax.stop_gradient(params)

        # The single layout transition of the whole update.
        z_cm = _to_tiles(z.reshape(B, d).T.astype(jnp.float32), d, B)
        y_t, g0_t, H0_t = slater_vgh_pallas(
            z_cm, nx_up, ny_up, ks, nx_dn, ny_dn,
            interpret=pallas_interpret, tiles_in=True, tiles_out=True,
        )
        x_t, logp_t, g_t, Hp_t = hessian_flow_pallas(
            params, z_cm, y_t, g0_t, H0_t, self.cnf.t0, self.cnf.t1,
            steps=self.cnf.steps, method=self.cnf.method,
            interpret=pallas_interpret, io_tiles=True,
        )

        # Row-major observables (no transposes: (rows*8, B/8) -> (rows, B)
        # is a pure reshape in this layout).
        gd = g_t.reshape(d, B)
        xd = x_t.reshape(d, B)
        Hd = Hp_t.reshape(nut, B)
        # Packed-triangle diagonal rows: index of (p, p) in triu order.
        lap = sum(Hd[p * d - p * (p - 1) // 2] for p in range(d))
        g2 = jnp.sum(gd * gd, axis=0)
        V = self.pair_potential.V_rows(xd, n, dim)
        if self.sp_potential is not None:
            V = V + self.sp_potential.V_rows(xd, n, dim)
        eloc = -0.25 * lap - 0.125 * g2 + V
        logp = logp_t.reshape(B)

        E = jnp.mean(eloc)
        E_std = jnp.std(eloc)
        w = (eloc - E) / B
        grads, _ = reinforce_flow_grad_pallas(
            params, x_t, g_t, w, self.cnf.t0, self.cnf.t1,
            steps=self.cnf.steps, method=self.cnf.method,
            interpret=pallas_interpret, io_tiles=True,
        )
        loss = jnp.sum(w * logp)
        return loss, {"E": E, "E_std": E_std}, grads
