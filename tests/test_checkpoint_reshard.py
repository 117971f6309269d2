"""Elastic (resharding) checkpoint restore.

The reference has no checkpointing at all (SURVEY.md §5: demo only); round 3
added full-state save/restore but required the identical process count.
These tests cover the elastic cases:

  * per-process walker shards from a 2-process run merged into a 1-process
    restore (``_restore_resharded``, proc-dirs branch);
  * an 8-device-mesh-sharded state saved and restored onto 1 device, and a
    plain state restored into a mesh-sharded TrainState (re-placement via
    ``_place_like``);
  * a mixed directory where a later single-process save outranks older
    multi-process shards.

The true multi-host 2-proc -> 1-proc integration case lives in
``tests/test_multiprocess.py::test_two_proc_checkpoint_resumes_single``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fermiflow_tpu.cli import common
from fermiflow_tpu.config import Config
from fermiflow_tpu.parallel import make_walker_mesh, shard_walkers
from fermiflow_tpu.train import init_gs_state
from fermiflow_tpu.utils.checkpointing import (
    _fingerprint,
    _to_numpy_tree,
    restore_checkpoint,
    save_checkpoint,
)

BATCH = 16


def _mk_state(seed=0):
    cfg = Config(nup=2, batch=BATCH, dtype="float64", seed=seed)
    model, params = common.build_gs(cfg)
    state = init_gs_state(model, params, cfg, optax.adam(1e-3))
    # Recognizable walker payload so a shard permutation would be caught.
    walkers = jnp.arange(BATCH * model.n * 2, dtype=jnp.float64).reshape(
        BATCH, model.n, 2
    )
    return cfg, state._replace(
        walkers=walkers, tau=jnp.linspace(0.1, 0.9, BATCH)
    )


def _write_proc_shards(ckdir, state, nproc, step):
    """Fabricate the npz layout a ``nproc``-process run would have written:
    walker-axis leaves split into contiguous row blocks, everything else
    saved redundantly per rank (mirrors ``save_checkpoint`` +
    ``_local_numpy``)."""
    np_state = _to_numpy_tree(state)
    leaves, _ = jax.tree_util.tree_flatten(np_state)
    rows = BATCH // nproc
    for pi in range(nproc):
        shard_leaves = [
            l[pi * rows : (pi + 1) * rows]
            if np.ndim(l) >= 1 and np.shape(l)[0] == BATCH
            else l
            for l in leaves
        ]
        shard_tree = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(np_state), shard_leaves
        )
        d = os.path.join(ckdir, f"proc{pi:05d}")
        os.makedirs(d, exist_ok=True)
        named = {f"leaf_{i:05d}": l for i, l in enumerate(shard_leaves)}
        named["__fingerprint__"] = np.asarray(_fingerprint(shard_tree))
        np.savez(os.path.join(d, f"ckpt_{step:08d}.npz"), **named)


def _assert_states_equal(a, b):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_two_proc_shards_merge_into_single(tmp_path):
    _, state = _mk_state()
    ck = str(tmp_path / "ck")
    _write_proc_shards(ck, state, nproc=2, step=7)

    _, fresh = _mk_state(seed=99)  # different key/opt state than the save
    restored, step = restore_checkpoint(ck, fresh)
    assert step == 7
    _assert_states_equal(restored, state)


def test_newer_single_proc_save_outranks_old_shards(tmp_path):
    _, old = _mk_state(seed=1)
    ck = str(tmp_path / "ck")
    _write_proc_shards(ck, old, nproc=2, step=5)

    _, newer = _mk_state(seed=2)
    save_checkpoint(ck, 9, newer)

    _, fresh = _mk_state(seed=3)
    restored, step = restore_checkpoint(ck, fresh)
    assert step == 9
    _assert_states_equal(restored, newer)


def test_mesh_sharded_save_restores_to_single_device(tmp_path):
    assert len(jax.devices("cpu")) >= 8
    mesh = make_walker_mesh(jax.devices("cpu")[:8])
    _, state = _mk_state()
    sharded = state._replace(
        walkers=shard_walkers(mesh, state.walkers),
        tau=shard_walkers(mesh, state.tau),
    )
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, 3, sharded)

    _, fresh = _mk_state(seed=99)  # plain single-device structure
    restored, step = restore_checkpoint(ck, fresh)
    assert step == 3
    _assert_states_equal(restored, state)


def test_plain_save_restores_into_mesh_sharded_state(tmp_path):
    assert len(jax.devices("cpu")) >= 8
    _, state = _mk_state()
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, 4, state)

    mesh = make_walker_mesh(jax.devices("cpu")[:8])
    _, fresh = _mk_state(seed=99)
    fresh = fresh._replace(
        walkers=shard_walkers(mesh, fresh.walkers),
        tau=shard_walkers(mesh, fresh.tau),
    )
    restored, step = restore_checkpoint(ck, fresh)
    assert step == 4
    _assert_states_equal(restored, state)
    # The restored walkers landed back on the mesh sharding.
    assert restored.walkers.sharding == fresh.walkers.sharding
