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

__all__ = ["GSVMC"]


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
            base_vgh=lambda z_: self.basedist.log_prob_vgh(
                self.occ_up, self.occ_down, z_
            ),
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
