"""Single-particle orbitals of the 2D isotropic harmonic oscillator.

Capability parity with the reference's ``src/orbitals.py`` (HO2D: 36 hand-coded
orbital lambdas for shells n=0..7, state enumeration via the ``subsets`` DP,
``fermion_states`` / ``fermion_states_random`` / ``E_indices``), re-designed for
XLA:

  * Orbitals are NOT per-orbital Python closures evaluated in a host loop
    (reference ``src/orbitals.py:66-79``, consumed by the column loop at
    ``src/slater.py:28-31``).  Instead all orbitals are evaluated at once as a
    single batched tensor op: normalized 1D Hermite functions via a stable
    recurrence, combined into 2D products.  This supports an arbitrary number
    of shells (the reference is capped at 8) and is differentiable to any
    order by JAX autodiff — no hand-coded polynomial lists.
  * State enumeration (`subsets`) stays host-side python (it runs once at model
    construction), but returns dense ``(Nstates, k)`` int arrays of orbital
    indices instead of tuples-of-closures, so downstream code can gather/one-hot
    them inside jit.

Hamiltonian: h(r) = -1/2 ∇² + 1/2 r²,  r ∈ R².  Orbital energies E = n+1 with
degeneracy n+1 for shell n (reference ``src/orbitals.py:81-82``).
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hermite_functions", "HO2D"]


def hermite_functions(x: jax.Array, num: int) -> jax.Array:
    """Normalized 1D harmonic-oscillator polynomial factors h_0..h_{num-1}.

    h_n(x) = H_n(x) / sqrt(2^n n!)  (physicists' Hermite, normalized such that
    psi_n(x) = pi^{-1/4} h_n(x) exp(-x²/2) is the orthonormal 1D HO
    eigenfunction).  Three-term recurrence:

        h_0 = 1,  h_1 = sqrt(2) x,
        h_{n+1} = sqrt(2/(n+1)) x h_n - sqrt(n/(n+1)) h_{n-1}

    Matches the reference's hand-coded ``orbitals_1d`` list
    (``src/orbitals.py:66-75``) for n <= 7 but works for any ``num``.

    Args:
      x: any shape.
      num: number of functions (max polynomial degree + 1).

    Returns:
      stacked values, shape ``x.shape + (num,)``.
    """
    if num < 1:
        raise ValueError("num must be >= 1")
    # Coefficients as python floats (weak types): numpy f64 scalars would
    # upcast float32 inputs when jax_enable_x64 is on.
    hs = [jnp.ones_like(x)]
    if num > 1:
        hs.append(float(np.sqrt(2.0)) * x)
    for n in range(1, num - 1):
        h_next = (
            float(np.sqrt(2.0 / (n + 1))) * x * hs[n]
            - float(np.sqrt(n / (n + 1.0))) * hs[n - 1]
        )
        hs.append(h_next)
    return jnp.stack(hs, axis=-1)


def _subsets(k: int, pmax: float, prices: list) -> tuple[tuple, tuple]:
    """All index-subsets of length k with total price <= pmax, sorted by price.

    Same DP as the reference (``src/orbitals.py:14-31``): extend partial
    subsets one index at a time, pruning branches whose cheapest possible
    completion already exceeds the budget.  Host-side; runs once at model
    construction.
    """
    n_elements = len(prices)
    result = (((), 0),)
    for i in range(1, k + 1):
        result_new = []
        for subset, ptotal in result:
            next_idx = subset[-1] + 1 if subset else 0
            while next_idx + k - i < n_elements:
                if sum(prices[next_idx : next_idx + k - i + 1]) <= pmax - ptotal:
                    result_new.append(
                        (subset + (next_idx,), ptotal + prices[next_idx])
                    )
                next_idx += 1
        result = tuple(result_new)
    indices, ptotals = zip(*sorted(result, key=lambda ip: ip[1]))
    return indices, ptotals


class HO2D:
    """2D harmonic-oscillator orbital set (capability of reference ``HO2D``).

    Attributes:
      num_shells: number of energy shells (reference hardcodes 8).
      nx, ny: (num_orbitals,) numpy int arrays of 1D quantum numbers per
        orbital, ordered exactly like the reference's
        ``[orbital_2d(nx, n - nx) for n in range(8) for nx in range(n+1)]``.
      Es: (num_orbitals,) numpy int array of orbital energies (n+1).
    """

    def __init__(self, num_shells: int = 8):
        self.num_shells = num_shells
        pairs = [(nx, n - nx) for n in range(num_shells) for nx in range(n + 1)]
        self.nx = np.array([p[0] for p in pairs], dtype=np.int32)
        self.ny = np.array([p[1] for p in pairs], dtype=np.int32)
        self.Es = np.array(
            [n + 1 for n in range(num_shells) for _ in range(n + 1)], dtype=np.int32
        )
        self.num_orbitals = len(pairs)

    def E_indices(self, n: int) -> tuple:
        """Orbital indices of shell n (reference ``src/orbitals.py:83``)."""
        return tuple(range(n * (n + 1) // 2, (n + 1) * (n + 2) // 2))

    # ---- batched orbital evaluation (replaces per-orbital lambdas) ----

    @partial(jax.jit, static_argnums=0)
    def eval_all(self, x: jax.Array) -> jax.Array:
        """Evaluate ALL orbitals at positions x.

        Args:
          x: (..., 2) positions.

        Returns:
          (..., num_orbitals) orbital values
          phi_m(r) = pi^{-1/2} exp(-r²/2) h_{nx_m}(x) h_{ny_m}(y),
          matching reference ``orbital_2d`` (``src/orbitals.py:76-79``).
        """
        gauss = jnp.exp(-0.5 * jnp.sum(x**2, axis=-1)) * float(1 / np.sqrt(np.pi))
        hx = hermite_functions(x[..., 0], self.num_shells)
        hy = hermite_functions(x[..., 1], self.num_shells)
        return gauss[..., None] * hx[..., self.nx] * hy[..., self.ny]

    def eval_orbitals(self, orb_indices, x: jax.Array) -> jax.Array:
        """Evaluate a static subset of orbitals at x -> (..., len(orb_indices))."""
        orb_indices = np.asarray(orb_indices, dtype=np.int32)
        gauss = jnp.exp(-0.5 * jnp.sum(x**2, axis=-1)) * float(1 / np.sqrt(np.pi))
        hx = hermite_functions(x[..., 0], self.num_shells)
        hy = hermite_functions(x[..., 1], self.num_shells)
        return (
            gauss[..., None]
            * hx[..., self.nx[orb_indices]]
            * hy[..., self.ny[orb_indices]]
        )

    # ---- many-body state enumeration (host-side, construction time) ----

    def fermion_states(self, nup: int, ndown: int, deltaE: float):
        """Enumerate spin-polarized Slater states with excitation <= deltaE.

        Reference semantics (``src/orbitals.py:33-54``): only ndown == 0
        supported; returns states sorted by total energy.

        Returns:
          occ: (Nstates, nup) numpy int32 array of occupied orbital indices.
          Es: (Nstates,) numpy float64 array of total state energies.
        """
        if ndown != 0:
            raise ValueError(
                "Only the polarized case (ndown = 0) is supported, matching the "
                "reference (src/orbitals.py:47-49)."
            )
        E0 = float(np.sum(self.Es[:nup]))
        indices, Es = _subsets(nup, E0 + deltaE, self.Es.tolist())
        occ = np.array(indices, dtype=np.int32)
        return occ, np.array(Es, dtype=np.float64)

    def fermion_states_naive(self, nup: int, ndown: int, deltaE: float):
        """Exhaustive-search cross-check (reference ``src/orbitals.py:85-99``)."""
        if ndown != 0:
            raise ValueError("Only the polarized case (ndown = 0) is supported.")
        E0 = int(np.sum(self.Es[:nup]))
        states = [
            (idx, sum(E))
            for idx, E in zip(
                itertools.combinations(range(self.num_orbitals), nup),
                itertools.combinations(self.Es.tolist(), nup),
            )
            if sum(E) <= E0 + deltaE
        ]
        states.sort(key=lambda s: s[1])
        occ = np.array([s[0] for s in states], dtype=np.int32)
        Es = np.array([s[1] for s in states], dtype=np.float64)
        return occ, Es

    def fermion_states_random(self, n: int, seed: int | None = None):
        """n distinct random orbitals (reference ``src/orbitals.py:9-12``)."""
        rng = np.random.default_rng(seed)
        idx = np.sort(rng.choice(self.num_orbitals, size=n, replace=False))
        idx = idx.astype(np.int32)
        return idx, self.Es[idx].astype(np.float64)
