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


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


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
    """Save a pytree train state; returns the checkpoint path."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step:08d}")
    try:
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


def restore_checkpoint(directory: str, state_like):
    """Restore the latest checkpoint into the structure of ``state_like``.

    Returns (state, step) or (state_like, 0) when no checkpoint exists.
    """
    if not os.path.isdir(directory):
        return state_like, 0
    ckpts = sorted(
        f for f in os.listdir(directory) if f.startswith("ckpt_")
    )
    if not ckpts:
        return state_like, 0
    latest = ckpts[-1]
    step = int(latest.split("_")[1].split(".")[0])
    path = os.path.join(directory, latest)
    treedef = jax.tree_util.tree_structure(state_like)
    if latest.endswith(".npz"):
        data = np.load(path)
        if "__fingerprint__" in data.files:
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
        return jax.tree_util.tree_unflatten(treedef, leaves), step
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path), item=_to_numpy_tree(state_like)
    )
    leaves = jax.tree_util.tree_leaves(restored)
    return jax.tree_util.tree_unflatten(treedef, leaves), step
