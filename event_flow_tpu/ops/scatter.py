"""Batched scatter-add — the compute core of event encodings and the
image-of-warped-events (IWE).

TPU-native replacement for the reference's ``tensor.scatter_add_`` /
``index_put_(accumulate=True)`` (reference: utils/iwe.py:89-91,
dataloader/encodings.py:43). Differentiable w.r.t. the scattered values with
an analytic backward (gather of the cotangent at the scatter indices) via
``jax.custom_vjp`` — the gradient of scatter-add really is a gather, so we
never pay for XLA's generic scatter transpose.

Backends:
  - "xla"    : ``jax.ops.segment_sum`` (XLA scatter-add; deterministic on TPU)
  - "pallas" : Pallas TPU kernel (ops/scatter_pallas.py), same contract

Select with ``EVFLOW_SCATTER_IMPL`` env var or ``set_impl()``. Correctness
oracle tests compare the two.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["scatter_add", "set_impl", "get_impl"]

_IMPL = os.environ.get("EVFLOW_SCATTER_IMPL", "auto")


def set_impl(name):
    """Force the scatter backend: 'xla', 'pallas', or 'auto'."""
    global _IMPL
    assert name in ("xla", "pallas", "auto"), name
    _IMPL = name


def get_impl():
    if _IMPL != "auto":
        return _IMPL
    # 'auto' currently resolves to XLA scatter everywhere: benchmarked on
    # TPU v5e, XLA's native scatter-add beats the serial-accumulate Pallas
    # kernel for this op's index distributions. The Pallas kernel
    # (ops/scatter_pallas.py) remains selectable for A/B runs.
    return "xla"


def _scatter_add_xla(idx, vals, size):
    """idx [B, M] int32 in [0, size); vals [B, M, C] -> out [B, size, C]."""

    def one(i, v):
        return jax.ops.segment_sum(v, i, num_segments=size)

    return jax.vmap(one)(idx, vals)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_add_cf(idx, vals_cf, size):
    """Channels-FIRST batched scatter-add: vals [B, C, M] -> [B, C, size].

    TPU layout note: arrays tile their last two dims to (8, 128) lanes, so
    a [B, M, C] payload with small C pads the lane dim up to 128 (e.g.
    64x memory blowup for C=2). Keeping the event axis M / cell axis S
    minor avoids ALL padding on the scatter input and output — this is the
    production formulation; ``scatter_add`` remains for channels-last
    callers.
    """
    return _scatter_cf_impl(idx, vals_cf, size)


def _scatter_cf_impl(idx, vals_cf, size):
    def per_batch(i, v):  # v [C, M]
        return jax.vmap(
            lambda vv: jax.ops.segment_sum(vv, i, num_segments=size)
        )(v)

    return jax.vmap(per_batch)(idx, vals_cf)


def _scatter_cf_fwd(idx, vals_cf, size):
    return _scatter_cf_impl(idx, vals_cf, size), idx


def _scatter_cf_bwd(size, idx, g):
    # g [B, C, size] -> gather at idx per channel -> [B, C, M]
    gv = jax.vmap(
        lambda i, gb: jnp.take(gb, i, axis=-1)  # gb [C, size], i [M]
    )(idx, g)
    return (None, gv)


scatter_add_cf.defvjp(_scatter_cf_fwd, _scatter_cf_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_add(idx, vals, size):
    """Batched scatter-add with analytic VJP.

    Args:
      idx:  [B, M] int32 cell indices, already clamped to [0, size).
            Out-of-bounds events must carry zero ``vals`` (the IWE pipeline
            guarantees this via ``purge_unfeasible``, see ops/iwe.py).
      vals: [B, M, C] values to accumulate (C payload channels share indices;
            e.g. pos-count / neg-count / pos-ts / neg-ts in one scatter).
      size: static int — number of cells (H*W).

    Returns:
      [B, size, C] accumulated image.
    """
    return _scatter_impl(idx, vals, size)


def _scatter_impl(idx, vals, size):
    impl = get_impl()
    if impl == "pallas":
        from .scatter_pallas import scatter_add_pallas

        return scatter_add_pallas(idx, vals, size)
    return _scatter_add_xla(idx, vals, size)


def _scatter_fwd(idx, vals, size):
    return _scatter_impl(idx, vals, size), idx


def _scatter_bwd(size, idx, g):
    # d/dvals (sum over events scattered into cells) = g gathered at idx.
    # [B, size, C] -> [B, M, C]
    gv = jnp.take_along_axis(g, idx[:, :, None].astype(jnp.int32), axis=1)
    return (None, gv)


scatter_add.defvjp(_scatter_fwd, _scatter_bwd)
