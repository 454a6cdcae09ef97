"""Spatial resampling helpers with PyTorch-compatible semantics.

The reference uses two resize flavors:
  - ``F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)``
    in decoder upsampling (reference: models/submodules.py:176,
    spiking_submodules.py:1011)
  - ``F.interpolate(flow, scale_factor=s)`` with the default **nearest** mode
    to bring multi-resolution flow predictions to full resolution
    (reference: models/model.py:377-388)

``jax.image.resize`` with method='linear' uses half-pixel centers, which is
exactly torch's align_corners=False; 'nearest' likewise matches torch's
default nearest for integer scale factors. Inputs are NHWC.
"""

import jax

__all__ = ["upsample2x_bilinear", "resize_nearest", "avg_pool"]


def upsample2x_bilinear(x):
    """[B, H, W, C] -> [B, 2H, 2W, C], bilinear, align_corners=False."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")


def resize_nearest(x, out_hw):
    """[B, H, W, C] -> [B, out_h, out_w, C], nearest neighbor."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="nearest")


def avg_pool(x, kernel_size, stride, padding):
    """Average pooling matching ``nn.AvgPool2d(kernel, stride, padding)``
    with count_include_pad=True (torch default) — used by the PLIF/XLIF
    presynaptic-trace pooling (reference: spiking_submodules.py:164,372).

    x: [B, H, W, C].
    """
    window = (1, kernel_size, kernel_size, 1)
    strides = (1, stride, stride, 1)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    return summed / float(kernel_size * kernel_size)
