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
    """Place host-global walker arrays onto the mesh with leading-axis
    sharding.

    Multi-process safe: every process holds the identical global host value
    (deterministic seeded init) and materializes only its addressable shards,
    so the same call works from one chip to a multi-host pod slice (where a
    plain ``device_put`` onto a global ``NamedSharding`` would fail).
    """
    sh = walker_sharding(mesh)

    def place(x):
        x = np.asarray(x)
        dmap = sh.addressable_devices_indices_map(x.shape)
        arrs = [jax.device_put(x[idx], d) for d, idx in dmap.items()]
        return jax.make_array_from_single_device_arrays(x.shape, sh, arrs)

    return jax.tree_util.tree_map(place, tree)


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, initialization_timeout: int = 120
                     ) -> bool:
    """Multi-host bring-up wrapper around ``jax.distributed.initialize``.

    On single-process runs this is a no-op; on a pod slice (or a localhost
    multi-process test) each process calls it before any jax computation —
    the TPU-native replacement for the NCCL/MPI/torch.distributed machinery
    the reference lacks (SURVEY.md §2.4(f)).  Arguments left as ``None``
    fall back to jax's env/cluster autodetection.  Returns True when a
    multi-process runtime was initialized.
    """
    if (num_processes is None or num_processes <= 1) and \
            coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        # Bring-up barrier: rank start-up skew (imports + backend init on a
        # loaded host) must fit inside this window; the jax default is 300 s
        # but an explicit value keeps test hangs bounded.
        initialization_timeout=initialization_timeout,
    )
    return jax.process_count() > 1
