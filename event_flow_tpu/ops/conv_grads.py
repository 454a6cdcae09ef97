"""Direct-conv backward of a stride-1 same-padding NHWC conv.

The single home for the dx/dw formulations XLA emits for ``lax.conv``
autodiff — shared by the im2col custom VJP (models/conv.py) and the fused
conv+LIF kernel's native backward (ops/fused_lif_pallas.py) so the subtle
transposed-conv algebra lives in exactly one place:

  dx = conv(g, rot180(kernel) io-swapped), same padding
  dw = conv(x as [Ci,H,W,B], g as [H,W,B,Co]), same padding
       (the batch axis is the contraction dim)

both bf16-operand / f32-accumulate like the forwards they pair with.
"""

import jax
import jax.numpy as jnp

__all__ = ["conv_same_grads"]


def conv_same_grads(x, kernel, g, k):
    """(dx, dw) of ``y = conv_same(x, kernel)`` given output cotangent
    ``g``; ``kernel`` is [k, k, Cin, Cout], all tensors NHWC."""
    p = k // 2
    g = g.astype(x.dtype)
    # dx: correlate the cotangent with the spatially flipped, io-swapped
    # kernel (stride-1 same padding is self-transpose)
    k_flip = kernel[::-1, ::-1].transpose(0, 1, 3, 2)  # [k,k,Cout,Cin]
    dx = jax.lax.conv_general_dilated(
        g, k_flip.astype(x.dtype), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # dw[kh,kw,ci,co] = sum_{b,i,j} x[b,i+kh-p,j+kw-p,ci] * g[b,i,j,co]
    xt = jnp.moveaxis(x, (0, 3), (3, 0))  # [Ci, H, W, B]
    gt = jnp.moveaxis(g, 0, 2)  # [H, W, B, Co]
    dw = jax.lax.conv_general_dilated(
        xt, gt, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )  # [Ci, k, k, Co]
    return dx, jnp.moveaxis(dw, 0, 2).astype(kernel.dtype)
