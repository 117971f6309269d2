"""First-class checkpoint/resume for the full training state.

The reference only *demonstrates* checkpointing in a demo script
(``tests/demos/checkpoint.py:49-72``) and never wires it into training
(SURVEY.md §5).  Here the complete TrainState — parameters, optimizer state,
PRNG key, persistent walker positions, per-walker step sizes, and (finite-T)
occupation logits — round-trips through orbax, so a crashed run resumes
bit-exactly including its sampler state.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _local_numpy(x):
    """This process's host view of a leaf.

    Fully-addressable leaves (single-process, or host values) convert
    directly.  Global multi-process arrays reduce to the process-local view:
    replicated leaves take one shard (all addressable shards are identical),
    walker-sharded leaves concatenate this process's unique row blocks —
    exactly the layout ``jax.make_array_from_process_local_data`` expects at
    restore time.
    """
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    pieces = {}
    for s in x.addressable_shards:  # dedup replicas by global index
        pieces[tuple((sl.start, sl.stop) for sl in s.index)] = np.asarray(s.data)
    keys = sorted(pieces.keys(), key=lambda k: (k[0][0] or 0) if k else 0)
    return np.concatenate([pieces[k] for k in keys], axis=0) \
        if len(keys) > 1 else pieces[keys[0]]


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(_local_numpy, tree)


def _proc_dir(directory: str) -> str:
    """Per-process checkpoint subdirectory on multi-process runs (each
    process persists its own walker shards; replicated leaves are saved
    redundantly, which keeps restore host-local and shared-FS-free)."""
    if jax.process_count() > 1:
        return os.path.join(directory, f"proc{jax.process_index():05d}")
    return directory


def _match_structure(saved, like):
    """Re-walk an orbax raw-restored tree (NamedTuples/lists come back as
    dicts keyed by field name / stringified index) in the order of ``like``,
    tolerating fields that are None in ``like`` and absent in ``saved``."""
    if like is None:
        return None
    if saved is None:
        # empty containers (e.g. optax EmptyState) or fields added since the
        # save; only valid when `like` holds no array leaves there.
        if jax.tree_util.tree_leaves(like):
            raise ValueError("checkpoint is missing a leaf-bearing subtree")
        return None
    if isinstance(like, tuple) and hasattr(like, "_fields"):
        if isinstance(saved, dict):
            return [_match_structure(saved.get(f), getattr(like, f))
                    for f in like._fields]
        return [_match_structure(s, getattr(like, f))
                for s, f in zip(saved, like._fields)]
    if isinstance(like, (list, tuple)):
        if isinstance(saved, dict):
            saved = [saved[str(i)] for i in range(len(like))]
        return [_match_structure(s, l) for s, l in zip(saved, like)]
    if isinstance(like, dict):
        return {k: _match_structure(saved[k], like[k]) for k in like}
    return saved


def _place_like(np_leaf, like):
    """Re-place a restored host leaf with the sharding of the live leaf."""
    if isinstance(like, jax.Array) and not like.is_fully_addressable:
        return jax.make_array_from_process_local_data(
            like.sharding, np_leaf, like.shape
        )
    if isinstance(like, jax.Array) and getattr(like, "sharding", None) is not None \
            and like.committed:
        return jax.device_put(np_leaf, like.sharding)
    return np_leaf


def _fingerprint(tree) -> str:
    """Structure fingerprint for the npz fallback: treedef string plus leaf
    shapes/dtypes, so a restore into a different TrainState layout fails
    loudly instead of silently permuting leaves."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return json.dumps({
        "treedef": str(treedef),
        "leaves": [[list(np.shape(l)), str(np.asarray(l).dtype)]
                   for l in leaves],
    })


def save_checkpoint(directory: str, step: int, state) -> str:
    """Save a pytree train state; returns the checkpoint path.

    Multi-process runs save each process's local walker shards under
    ``directory/procNNNNN/`` (call from every process)."""
    directory = _proc_dir(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step:08d}")
    try:
        if jax.process_count() > 1:
            # orbax synchronizes across processes internally; per-process
            # shard files must stay host-local -> use the npz path.
            raise ImportError("npz path on multi-process runs")
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), _to_numpy_tree(state), force=True)
    except Exception:
        # Fallback: npz of explicitly numbered leaves + a structure
        # fingerprint checked at restore time.
        np_state = _to_numpy_tree(state)
        leaves, _ = jax.tree_util.tree_flatten(np_state)
        named = {f"leaf_{i:05d}": l for i, l in enumerate(leaves)}
        named["__fingerprint__"] = np.asarray(_fingerprint(np_state))
        np.savez(path + ".npz", **named)
    return path


def _latest_name(directory: str):
    if not os.path.isdir(directory):
        return None
    ckpts = sorted(f for f in os.listdir(directory) if f.startswith("ckpt_"))
    return ckpts[-1] if ckpts else None


def _load_ckpt_leaves(directory: str, name: str, state_like,
                      check_fingerprint: bool = True):
    """Raw numpy leaves of one checkpoint file/dir, in tree-flatten order.

    ``check_fingerprint=False`` is the elastic-restore mode: leaf SHAPES may
    legitimately differ from ``state_like`` (per-process walker shards of a
    different process count); structural order is still the npz leaf
    numbering / the orbax structure walk.
    """
    step = int(name.split("_")[1].split(".")[0])
    path = os.path.join(directory, name)
    if name.endswith(".npz"):
        data = np.load(path)
        if "__fingerprint__" in data.files:
            if check_fingerprint:
                want = _fingerprint(_to_numpy_tree(state_like))
                got = str(data["__fingerprint__"])
                if json.loads(got) != json.loads(want):
                    raise ValueError(
                        f"checkpoint structure mismatch at {path}: the saved "
                        f"TrainState layout does not match the one being "
                        f"restored into.\n saved: {got}\n  live: {want}"
                    )
            keys = sorted(k for k in data.files if k.startswith("leaf_"))
            leaves = [data[k] for k in keys]
        else:  # legacy positional npz (pre-fingerprint)
            leaves = [data[k] for k in data.files]
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        leaves = None
        if check_fingerprint:
            try:
                restored = ckptr.restore(
                    os.path.abspath(path), item=_to_numpy_tree(state_like)
                )
                leaves = jax.tree_util.tree_leaves(restored)
            except Exception:
                leaves = None
        if leaves is None:
            # Container-shape evolution (TrainState gained None fields) or
            # elastic restore: load the raw saved tree (orbax returns
            # name-keyed dicts) and re-walk it in the live structure's order.
            raw = ckptr.restore(os.path.abspath(path))
            leaves = jax.tree_util.tree_leaves(
                _match_structure(raw, state_like))
    n_like = len(jax.tree_util.tree_leaves(state_like))
    if len(leaves) != n_like:
        raise ValueError(
            f"checkpoint at {path} has {len(leaves)} leaves; live state "
            f"expects {n_like}"
        )
    return leaves, step


def _slice_local(global_np, like):
    """This process's row block of a globally-merged leaf (identity for
    fully-addressable or replicated leaves)."""
    if not isinstance(like, jax.Array) or like.is_fully_addressable:
        return global_np
    local_shape = tuple(_local_numpy(like).shape)
    if local_shape == tuple(global_np.shape):
        return global_np  # replicated
    rows = local_shape[0]
    off = jax.process_index() * rows
    return global_np[off : off + rows]


def _restore_resharded(directory: str, proc_dirs, state_like):
    """Elastic restore: a checkpoint saved at a DIFFERENT process count.

    Walker-sharded leaves (their saved per-process shards differ from the
    live global shape on axis 0) are concatenated across the saved
    ``procNNNNN`` shards into the global array; replicated leaves take the
    rank-0 copy.  Each live process then slices its own contiguous row block
    back out (the walker mesh assigns row blocks in process order).  The
    reverse direction — a single-process global checkpoint restored into a
    multi-process run — is the no-proc-dirs branch.  Requires the saved
    shards to be readable from every restoring host (shared or synced
    filesystem).
    """
    like_leaves = jax.tree_util.tree_leaves(state_like)
    if proc_dirs:
        name = _latest_name(os.path.join(directory, proc_dirs[0]))
        if name is None:
            return state_like, 0
        per_proc = []
        for d in proc_dirs:
            leaves, step = _load_ckpt_leaves(
                os.path.join(directory, d), name, state_like,
                check_fingerprint=False,
            )
            per_proc.append(leaves)
        # Live batch size (walkers leaf axis 0): used to disambiguate a
        # genuinely replicated leaf from a SHARDED leaf whose per-process
        # shard happens to match the live global shape (e.g. a 2-process
        # batch-2B checkpoint restored into a single-process batch-B run).
        live_batch = (
            int(np.shape(state_like.walkers)[0])
            if hasattr(state_like, "walkers") else None
        )
        merged = []
        for parts, like in zip(zip(*per_proc), like_leaves):
            gshape = tuple(np.shape(like))
            p0 = np.asarray(parts[0])
            if p0.ndim == 0 or tuple(p0.shape) == gshape:
                if (
                    live_batch is not None
                    and p0.ndim > 0
                    and p0.shape[0] == live_batch
                    and len(parts) > 1
                    and any(
                        not np.array_equal(p0, np.asarray(q))
                        for q in parts[1:]
                    )
                ):
                    # A replicated leaf is bit-identical on every rank; a
                    # batch-axis leaf that differs across saved shards was
                    # walker-sharded, so the total saved batch is
                    # len(parts) * rows != live batch.
                    raise ValueError(
                        f"batch-size mismatch: leaf of shape {p0.shape} "
                        f"differs across the {len(parts)} saved process "
                        f"shards (total saved batch "
                        f"{len(parts) * p0.shape[0]}) but the live run's "
                        f"batch is {live_batch}; restore with a matching "
                        f"--batch instead"
                    )
                merged.append(p0)  # replicated (saved redundantly per rank)
            else:
                cat = np.concatenate([np.asarray(p) for p in parts], axis=0)
                if tuple(cat.shape) != gshape:
                    raise ValueError(
                        f"cannot reshard leaf from {len(parts)} saved shards "
                        f"of shape {p0.shape} into live shape {gshape}"
                    )
                merged.append(cat)
    else:
        name = _latest_name(directory)
        if name is None:
            return state_like, 0
        merged, step = _load_ckpt_leaves(
            directory, name, state_like, check_fingerprint=False
        )
    leaves = [
        _place_like(_slice_local(g, like), like)
        for g, like in zip(merged, like_leaves)
    ]
    treedef = jax.tree_util.tree_structure(state_like)
    return jax.tree_util.tree_unflatten(treedef, leaves), step


def restore_checkpoint(directory: str, state_like):
    """Restore the latest checkpoint into the structure of ``state_like``.

    Leaves are re-placed with the shardings of ``state_like`` (host leaves
    stay host numpy), so restoring into a mesh-sharded TrainState — single-
    or multi-process — lands the walkers back on their devices.  Elastic
    recovery (absent in the reference, which has no checkpointing at all):
    a checkpoint saved under a different process count — per-process
    ``procNNNNN`` walker shards from a 2-host run restored into 1 process,
    or a single global checkpoint restored into a sharded multi-process run
    — is re-split/merged along the walker axis automatically.

    Returns (state, step) or (state_like, 0) when no checkpoint exists.
    """
    proc_dirs = []
    if os.path.isdir(directory):
        proc_dirs = sorted(
            d for d in os.listdir(directory)
            if d.startswith("proc")
            and os.path.isdir(os.path.join(directory, d))
        )
    nproc = jax.process_count()
    step_of = lambda name: int(name.split("_")[1].split(".")[0])
    if nproc == 1 and proc_dirs:
        # A dir can hold BOTH old multi-proc shards and newer single-proc
        # saves (an elastic resume that kept checkpointing); the newest
        # step wins.
        direct = _latest_name(directory)
        shard = _latest_name(os.path.join(directory, proc_dirs[0]))
        if direct is None or (shard is not None
                              and step_of(shard) > step_of(direct)):
            return _restore_resharded(directory, proc_dirs, state_like)
    elif nproc > 1 and len(proc_dirs) != nproc:
        return _restore_resharded(directory, proc_dirs, state_like)

    directory = _proc_dir(directory)
    name = _latest_name(directory)
    if name is None:
        return state_like, 0
    leaves, step = _load_ckpt_leaves(directory, name, state_like)
    like_leaves = jax.tree_util.tree_leaves(state_like)
    leaves = [_place_like(l, like) for l, like in zip(leaves, like_leaves)]
    treedef = jax.tree_util.tree_structure(state_like)
    return jax.tree_util.tree_unflatten(treedef, leaves), step
