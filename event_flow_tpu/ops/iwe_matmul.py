"""IWE accumulation as factorized matmuls — a TPU-native alternative to
scatter-add.

The bilinear splat of event m with warped float coords (wy, wx) deposits
``payload_m * max(0, 1-|wy-i|) * max(0, 1-|wx-j|)`` into grid cell (i, j)
(reference semantics: utils/iwe.py:48-68 — the 4-neighbor weights are
exactly this product's nonzeros, and out-of-grid neighbors drop out
automatically). Because the weight FACTORIZES into a row term and a column
term, the whole image is a contraction:

    img[c, i, j] = sum_m payload[c, m] * ry[m, i] * rx[m, j]
                 = ((payload_c ⊙ ry)^T @ rx)        per channel

i.e. two dense matmuls per event chunk — pure MXU work with regular
layouts, instead of a random-index scatter-add. XLA TPU scatters serialize
on duplicate indices and their transpose (the gradient) is another
scatter; here BOTH directions are matmuls, so the backward (d/d payload,
d/d warped coords -> flow gradients) is autodiff-through-matmul with no
scatter anywhere.

With integer coords (dy = dx = 0) ``ry``/``rx`` become one-hot and the same
routine computes exact count images — used as the matmul backend for event
encodings and gather transposes.

The event axis is processed in chunks under ``lax.scan`` with
rematerialization, so the [B, M, H] interpolation matrices never
materialize for the full event list at once.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["bilinear_splat_cf", "gather_planes_cf"]


@partial(jax.jit, static_argnums=(3, 4), inline=True)
def _splat_impl(wy, wx, payload, res, chunk):
    h, w = res
    b, c, m = payload.shape
    pad = (-m) % chunk
    if pad:
        # park padding far off-grid: its row/col weights are identically 0
        wy = jnp.pad(wy, ((0, 0), (0, pad)), constant_values=-4.0)
        wx = jnp.pad(wx, ((0, 0), (0, pad)), constant_values=-4.0)
        payload = jnp.pad(payload, ((0, 0), (0, 0), (0, pad)))
    k = (m + pad) // chunk
    wy_c = jnp.moveaxis(wy.reshape(b, k, chunk), 1, 0)  # [k, B, chunk]
    wx_c = jnp.moveaxis(wx.reshape(b, k, chunk), 1, 0)
    p_c = jnp.moveaxis(payload.reshape(b, c, k, chunk), 2, 0)  # [k,B,C,chunk]

    iy = jnp.arange(h, dtype=wy.dtype)
    ix = jnp.arange(w, dtype=wx.dtype)

    def body(acc, xs):
        wyc, wxc, pc = xs
        ry = jnp.maximum(0.0, 1.0 - jnp.abs(wyc[:, :, None] - iy))
        rx = jnp.maximum(0.0, 1.0 - jnp.abs(wxc[:, :, None] - ix))
        # per payload channel: [B, H, chunk] @ [B, chunk, W]
        img = jnp.stack(
            [
                jnp.einsum("bmh,bmw->bhw", pc[:, ci, :, None] * ry, rx,
                           preferred_element_type=jnp.float32)
                for ci in range(c)
            ],
            axis=1,
        )
        return acc + img, None

    init = jnp.zeros((b, c, h, w), jnp.float32)
    img, _ = jax.lax.scan(jax.checkpoint(body), init, (wy_c, wx_c, p_c))
    return img.astype(payload.dtype)


def bilinear_splat_cf(wy, wx, payload, res, chunk=1024):
    """Bilinear splat of per-event payloads into an image, as matmuls.

    Args:
      wy, wx:  [B, M] warped float coordinates (row, col).
      payload: [B, C, M] per-event values (C channels share coordinates).
      res:     (H, W) static.
      chunk:   event-axis tile per matmul step.

    Returns [B, C, H, W]; differentiable w.r.t. payload AND wy/wx (the
    coordinate gradient is the analytic derivative of the bilinear weights,
    matching autodiff through the scatter formulation).
    """
    return _splat_impl(wy, wx, payload, res, chunk)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_planes_cf(planes, lin, res):
    """Per-event gather from flat image planes, with a matmul transpose.

    planes: [G, C, H*W]; lin: [G, N] int32 linear pixel indices (y*W + x).
    Returns [G, C, N]. Forward is a plain gather (fast on TPU); the VJP
    splats the cotangent back with the one-hot matmul (integer coords make
    ``bilinear_splat_cf`` exact one-hot) instead of XLA's scatter-add
    transpose — the loss's per-event flow lookups
    (reference: loss/flow.py:64-84) stay scatter-free in both directions.
    """
    return jnp.take_along_axis(planes, lin[:, None, :], axis=-1)


def _gather_fwd(planes, lin, res):
    return gather_planes_cf(planes, lin, res), (lin, planes.shape)


def _gather_bwd(res, resid, g):
    lin, shape = resid
    h, w = res
    y = (lin // w).astype(g.dtype)
    x = (lin % w).astype(g.dtype)
    img = bilinear_splat_cf(y, x, g, (h, w))
    return (img.reshape(shape), None)


gather_planes_cf.defvjp(_gather_fwd, _gather_bwd)
