"""fermiflow_tpu — a TPU-native variational Monte Carlo framework.

A brand-new JAX/XLA/Pallas implementation (not a port) with the capabilities of
buwantaiji/FermiFlow: ground-state and finite-temperature VMC for interacting
fermions in the continuum, with the wavefunction represented as a
permutation-equivariant continuous normalizing flow (neural canonical
transformation) composed with Slater-determinant base states.

Design principles (TPU-first):
  * Pure functions over parameter pytrees; ``jit``/``vmap``/``scan`` everywhere.
  * No host loops in hot paths: the reference's per-orbital Python loops,
    Counter-grouped ragged batches, and per-coordinate Laplacian loops are all
    replaced by batched XLA ops (one-hot matmul Slater builds, segment
    reductions, forward-over-reverse Laplacians).
  * Walker axis shards over a ``jax.sharding.Mesh``; parameters replicate;
    XLA inserts the collectives.
  * dtype-polymorphic: float64 for correctness gates (CPU), float32/bfloat16
    for TPU throughput.

Reference parity map lives in SURVEY.md; each module cites the reference
file:line it provides the capability of.
"""

__version__ = "0.2.0"

from fermiflow_tpu import physics, nn, ode, flow, vmc, parallel, utils  # noqa: F401
