"""Checkpoint / resume via orbax.

Strictly dominates the reference's capability (SURVEY.md §5): the reference
pickles only the model weights via MLflow (utils/utils.py:36-37) and
restores by state_dict copy (:19-21) — optimizer state, stream cursor and
epoch are lost across restarts. Here a checkpoint carries
(params, opt_state, model_state, stream cursor, epoch, step), so training
resumes exactly.
"""

import os

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint"]


def _use_orbax():
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except ImportError:
        return False


def save_checkpoint(path, tree):
    """Save a pytree checkpoint to ``path`` (directory for orbax)."""
    path = os.path.abspath(path)
    if _use_orbax():
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, jax.device_get(tree), force=True)
    else:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".msgpack", "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(tree)))
    return path


def restore_checkpoint(path, target=None):
    """Restore a pytree checkpoint. ``target`` (optional) provides the
    structure/dtypes for restoration."""
    path = os.path.abspath(path)
    if os.path.isdir(path) and _use_orbax():
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        restored = ckpt.restore(path)
        if target is not None:
            flat_t, tdef = jax.tree_util.tree_flatten(target)
            flat_r = jax.tree_util.tree_leaves(restored)
            assert len(flat_t) == len(flat_r), "checkpoint structure mismatch"
            flat = [
                np.asarray(r).astype(t.dtype).reshape(t.shape)
                for t, r in zip(flat_t, flat_r)
            ]
            return jax.tree_util.tree_unflatten(tdef, flat)
        return restored
    with open(path + ".msgpack", "rb") as f:
        data = f.read()
    assert target is not None, "msgpack restore needs a target pytree"
    return serialization.from_bytes(target, data)


def latest_checkpoint(run_dir, prefer=("best", "latest")):
    """Checkpoint directory under ``run_dir/checkpoints``; prefers the
    ``best`` model (the reference restores the best saved model,
    utils/utils.py:8-25), then ``latest``, then anything."""
    root = os.path.join(run_dir, "checkpoints")
    if not os.path.isdir(root):
        return None
    entries = sorted(os.listdir(root))
    for tag in prefer:
        if tag in entries:
            return os.path.join(root, tag)
    return os.path.join(root, entries[-1]) if entries else None
