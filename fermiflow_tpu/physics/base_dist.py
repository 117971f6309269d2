"""Free-fermion base distribution (Slater-determinant eigenstates).

Capability parity with reference ``src/base_dist.py`` (FreeFermion: log_prob,
sample, log_prob_multstates, sample_multstates), TPU-native:

  * log p = 2 (log|det↑| + log|det↓|) exactly as the reference
    (``src/base_dist.py:49-56``); determinants come from the batched slater
    module (no per-orbital host loops).
  * Sampling uses the ``lax.scan`` Metropolis kernel with explicit PRNG keys.
    Reference compatibility: fresh Gaussian init + 100 equilibration steps at
    tau = 0.1 per call (``src/base_dist.py:58-71``).
  * The mixed-state path takes a dense (batch,) state-index array instead of
    the reference's host-side Counter of contiguous segments
    (``src/base_dist.py:102-134``) — one identically-shaped batched
    computation, walker-shardable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fermiflow_tpu import mcmc
from fermiflow_tpu.physics.orbitals import HO2D
from fermiflow_tpu.physics.slater import (
    log_abs_slater_det,
    log_abs_slater_det_multstates,
    logdet_vgh,
    slater_derivs,
    slater_derivs_multstates,
)

__all__ = ["FreeFermion"]


class FreeFermion:
    """Non-interacting fermion eigenstates in a 2D trap.

    The wavefunction is the product of spin-up and spin-down Slater
    determinants; spin sectors factorize, so ``x[..., :nup, :]`` are the
    spin-up coordinates and ``x[..., nup:, :]`` the spin-down ones.
    """

    def __init__(self, orbitals: HO2D, dim: int = 2):
        self.orbitals = orbitals
        self.dim = dim

    def log_prob(self, occ_up, occ_down, x: jax.Array) -> jax.Array:
        """log p(x) = 2 log|Psi(x)| for a static (occ_up, occ_down) state."""
        nup = len(occ_up)
        ndown = len(occ_down)
        logabspsi = jnp.zeros(x.shape[:-2], dtype=x.dtype)
        if nup:
            logabspsi = logabspsi + log_abs_slater_det(
                self.orbitals, occ_up, x[..., :nup, :]
            )
        if ndown:
            logabspsi = logabspsi + log_abs_slater_det(
                self.orbitals, occ_down, x[..., nup:, :]
            )
        return 2.0 * logabspsi

    def log_prob_vgh(self, occ_up, occ_down, x: jax.Array):
        """(log p, grad, Hessian) of the base log-density, closed form.

        Replaces nested autodiff through the GE logdet with the determinant-
        calculus identities of ``slater.logdet_vgh`` — the one-time base
        evaluation feeding the Hessian-flow local-energy engine.  Spin
        sectors factorize, so the Hessian is block-diagonal across sectors.

        Args:
          x: (..., n, dim) with the first nup rows spin-up.

        Returns:
          (y, g, H): (...,), (..., n*dim), (..., n*dim, n*dim).
        """
        nup = len(occ_up)
        ndown = len(occ_down)
        dim = self.dim
        batch = x.shape[:-2]
        parts = []
        if nup:
            parts.append(logdet_vgh(
                *slater_derivs(self.orbitals, occ_up, x[..., :nup, :])
            ))
        if ndown:
            parts.append(logdet_vgh(
                *slater_derivs(self.orbitals, occ_down, x[..., nup:, :])
            ))
        y = sum(p[0] for p in parts) * 2.0
        g = 2.0 * jnp.concatenate([p[1] for p in parts], axis=-1)
        if len(parts) == 1:
            H = 2.0 * parts[0][2]
        else:
            du, dd = nup * dim, ndown * dim
            zt = jnp.zeros(batch + (du, dd), dtype=x.dtype)
            H = 2.0 * jnp.concatenate(
                [
                    jnp.concatenate([parts[0][2], zt], axis=-1),
                    jnp.concatenate(
                        [jnp.swapaxes(zt, -1, -2), parts[1][2]], axis=-1
                    ),
                ],
                axis=-2,
            )
        return y, g, H

    def log_prob_vgh_multstates(
        self, occ_table: jax.Array, state_idx: jax.Array, x: jax.Array
    ):
        """Mixed-state (y, g, H) per walker — closed form, per-walker states."""
        y, g, H = logdet_vgh(
            *slater_derivs_multstates(self.orbitals, occ_table, state_idx, x)
        )
        return 2.0 * y, 2.0 * g, 2.0 * H

    def sample(
        self,
        occ_up,
        occ_down,
        key: jax.Array,
        sample_shape: tuple,
        equilibrium_steps: int = 100,
        tau: float = 0.1,
        dtype=jnp.float64,
        use_pallas: bool = False,
    ) -> jax.Array:
        """Metropolis-sample the Slater density from a fresh Gaussian init.

        ``use_pallas=True`` routes the polarized f32 case through the fused
        TPU kernel (ops/pallas_metropolis)."""
        n = len(occ_up) + len(occ_down)
        k_init, k_mcmc = jax.random.split(key)
        x0 = jax.random.normal(k_init, (*sample_shape, n, self.dim), dtype=dtype)
        if use_pallas and len(occ_down) == 0 and dtype == jnp.float32:
            from fermiflow_tpu.ops.pallas_metropolis import metropolis_free_fermion

            seed = jax.random.randint(k_mcmc, (), 0, 2**31 - 1, dtype=jnp.int32)
            nx_occ = tuple(int(v) for v in self.orbitals.nx[list(occ_up)])
            ny_occ = tuple(int(v) for v in self.orbitals.ny[list(occ_up)])
            x, _, _ = metropolis_free_fermion(
                x0, seed, tau, equilibrium_steps, nx_occ, ny_occ,
                self.orbitals.num_shells,
            )
            return x
        state = mcmc.metropolis(
            lambda x: self.log_prob(occ_up, occ_down, x),
            k_mcmc,
            x0,
            equilibrium_steps,
            tau,
        )
        return state.x

    # ---- mixed-state (finite-temperature) path; spin-polarized like the
    # reference's fermion_states (src/orbitals.py:47-49) ----

    def log_prob_multstates(
        self, occ_table: jax.Array, state_idx: jax.Array, x: jax.Array
    ) -> jax.Array:
        """log p per walker, each walker in its own Slater state.

        occ_table: (Nstates, n) int orbital indices; state_idx: (batch,);
        x: (batch, n, dim) -> (batch,).
        """
        return 2.0 * log_abs_slater_det_multstates(
            self.orbitals, occ_table, state_idx, x
        )

    def sample_multstates(
        self,
        occ_table: jax.Array,
        state_idx: jax.Array,
        key: jax.Array,
        equilibrium_steps: int = 100,
        tau: float = 0.1,
        dtype=jnp.float64,
    ) -> jax.Array:
        """Metropolis-sample the per-walker mixed-state Slater densities."""
        n = occ_table.shape[1]
        batch = state_idx.shape[0]
        k_init, k_mcmc = jax.random.split(key)
        x0 = jax.random.normal(k_init, (batch, n, self.dim), dtype=dtype)
        state = mcmc.metropolis(
            lambda x: self.log_prob_multstates(occ_table, state_idx, x),
            k_mcmc,
            x0,
            equilibrium_steps,
            tau,
        )
        return state.x
