"""Walker-axis device mesh and sharding helpers.

The reference has NO multi-device support of any kind (SURVEY.md §2.4): one
process, one GPU via ``--cuda N``.  This module provides the TPU-native
scaling story mandated by BASELINE.json:

  * a 1-D ``walkers`` mesh over all devices (ICI within a host, DCN across
    hosts via ``jax.distributed.initialize``),
  * walker arrays sharded ``P("walkers")`` on their leading axis, parameters
    and occupation-model logits replicated ``P()``,
  * the whole train step under ``jax.jit`` with sharding constraints — XLA
    inserts the ``psum``/``pmean`` collectives for energy means, stds,
    gradient baselines, segment reductions, and the replicated parameter
    gradients automatically (GSPMD), so the estimator code stays identical
    from 1 chip to a pod slice.

Per-walker quantities (positions, log-probs, per-walker tau, state indices)
all carry a leading batch axis and therefore shard with the walkers; per-walker
step-size adaptation is embarrassingly parallel and needs no collective.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_walker_mesh",
    "walker_sharding",
    "replicated_sharding",
    "shard_walkers",
    "init_distributed",
]

WALKER_AXIS = "walkers"


def make_walker_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices with axis name ``walkers``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (WALKER_AXIS,))


def walker_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for (batch, ...) walker arrays."""
    return NamedSharding(mesh, P(WALKER_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_walkers(mesh: Mesh, tree):
    """Device-put every leaf of a walker pytree with leading-axis sharding."""
    sh = walker_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up wrapper around ``jax.distributed.initialize``.

    On single-host runs this is a no-op; on a pod slice each host calls it
    before any jax computation (the TPU-native replacement for the
    NCCL/MPI/torch.distributed machinery the reference lacks).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
