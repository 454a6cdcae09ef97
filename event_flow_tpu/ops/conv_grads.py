"""Direct-conv backward of a stride-1 same-padding NHWC conv.

The single home for the dx/dw formulations XLA emits for ``lax.conv``
autodiff — shared by the im2col custom VJP (models/conv.py) and the fused
conv+LIF kernel's native backward (ops/fused_lif_pallas.py) so the subtle
transposed-conv algebra lives in exactly one place:

  dx = conv(g, rot180(kernel) io-swapped), same padding
  dw = conv(x, g) with the BATCH axis as the contraction dim

both bf16-operand / f32-accumulate like the forwards they pair with.

dw ships in two algebraically identical forms (``EVFLOW_CONV_BWD``):

  ``dn`` (default): x and g stay in their NHWC layouts and the role swap
      (batch<->feature) is expressed through conv dimension_numbers
      ("CHWN", "IHWO") — no materialized transpose at the HLO level.
  ``moveaxis``: the original explicit-transpose form ([Ci,H,W,B] /
      [H,W,B,Co] operands), kept for A/B.

Measured A/B on v5e (flagship b8 update, 2026-08-19): a TIE — 82.5 ms
device (dn) vs 82.4 (moveaxis). XLA folds explicit transposes into conv
dimension numbers during canonicalization, so both lower identically;
the layout copies the flagship profile attributes ~54% of device time to
(docs/evidence_r4/profile_summary.md) are the TPU conv emitter's own
operand-layout requirements for the backward shapes, not the moveaxis
ops — a measured dead end for this lever.
"""

import os

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
    if os.environ.get("EVFLOW_CONV_BWD", "dn") == "moveaxis":
        xt = jnp.moveaxis(x, (0, 3), (3, 0))  # [Ci, H, W, B]
        gt = jnp.moveaxis(g, 0, 2)  # [H, W, B, Co]
        dw = jax.lax.conv_general_dilated(
            xt, gt, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )  # [Ci, k, k, Co]
        dw = jnp.moveaxis(dw, 0, 2)
    else:
        # same contraction, operands untouched: x[B,H,W,Ci] with batch in
        # the FEATURE role and Ci in the BATCH role ("CHWN"), g[B,H,W,Co]
        # with batch as the contraction input ("IHWO"); out [Ci,k,k,Co]
        dw = jax.lax.conv_general_dilated(
            x, g, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("CHWN", "IHWO", "NHWC"),
            preferred_element_type=jnp.float32,
        )  # [Ci, k, k, Co]
        dw = jnp.moveaxis(dw, 0, 2)  # [k, k, Ci, Co] — kernel-sized, cheap
    return dx, dw.astype(kernel.dtype)
