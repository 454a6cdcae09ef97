"""Checkpoint / resume via orbax.

Strictly dominates the reference's capability (SURVEY.md §5): the reference
pickles only the model weights via MLflow (utils/utils.py:36-37) and
restores by state_dict copy (:19-21) — optimizer state, stream cursor and
epoch are lost across restarts. Here a checkpoint carries
(params, opt_state, model_state, stream cursor, epoch, step), so training
resumes exactly.
"""

import os
import threading

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "save_checkpoint_async",
           "wait_for_async_saves", "restore_checkpoint",
           "latest_checkpoint"]


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


# -- async saves --------------------------------------------------------
# The disk write of an epoch checkpoint (orbax serialize + fsync) blocks
# the training loop for the whole file I/O; only the jax.device_get needs
# the caller's thread. One background writer at a time keeps ordering
# trivial (a second save waits for the first — same behavior as sync
# saves, minus the I/O stall on the hot path).

_ASYNC_LOCK = threading.Lock()
_ASYNC_PENDING = []


def save_checkpoint_async(path, tree):
    """``save_checkpoint`` with the serialization + disk write moved to a
    background thread. The device→host fetch still happens here (it must
    snapshot the CURRENT values); call ``wait_for_async_saves()`` before
    reading the checkpoint back or exiting."""
    # device_get copies device arrays to host but ALIASES host numpy
    # arrays — copy those too so the snapshot is immune to later
    # in-place mutation by the caller
    host_tree = jax.tree_util.tree_map(
        lambda x: np.array(jax.device_get(x), copy=True)
        if isinstance(x, (np.ndarray, jax.Array)) else x,
        tree,
    )
    wait_for_async_saves()
    t = threading.Thread(
        target=save_checkpoint, args=(path, host_tree), daemon=True
    )
    t.start()
    with _ASYNC_LOCK:
        _ASYNC_PENDING.append(t)
    return path


def wait_for_async_saves():
    """Join every in-flight async checkpoint write."""
    with _ASYNC_LOCK:
        pending, _ASYNC_PENDING[:] = _ASYNC_PENDING[:], []
    for t in pending:
        t.join()


def restore_checkpoint(path, target=None):
    """Restore a pytree checkpoint. ``target`` (optional) provides the
    structure/dtypes for restoration."""
    wait_for_async_saves()  # a same-process async write may be in flight
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
    wait_for_async_saves()  # don't return a half-written directory
    root = os.path.join(run_dir, "checkpoints")
    if not os.path.isdir(root):
        return None
    entries = sorted(os.listdir(root))
    for tag in prefer:
        if tag in entries:
            return os.path.join(root, tag)
    return os.path.join(root, entries[-1]) if entries else None
