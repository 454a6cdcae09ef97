"""Gradient statistics (reference: utils/gradients.py:4-11): per-tensor
mean/min/max of |grad|, for training-health CSVs and plots."""

import jax
import jax.numpy as jnp

__all__ = ["get_grads", "global_grad_norm"]


def get_grads(grads):
    """Flatten a gradient pytree into [(name, mean|g|, min|g|, max|g|)]."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = []
    for path, g in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        a = jnp.abs(g)
        out.append(
            (name, float(a.mean()), float(a.min()), float(a.max()))
        )
    return out


def global_grad_norm(grads):
    leaves = jax.tree_util.tree_leaves(grads)
    return float(
        jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    )
