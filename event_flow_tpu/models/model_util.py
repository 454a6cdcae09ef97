"""Model utilities: skip connections with center pad/crop, optimal crop
sizes (reference: models/model_util.py)."""

import math

import jax.numpy as jnp

__all__ = ["center_fit", "skip_concat", "skip_sum", "optimal_crop_size",
           "CropParameters", "get_skip_fn", "count_params",
           "describe_model"]


def count_params(params):
    """Trainable parameter count of a flax params pytree."""
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def describe_model(model, params, name=None):
    """Model summary string with the trainable parameter count — the
    reference's ``BaseModel.__str__`` (models/base.py:11-31) for the
    functional world, where params live outside the module. Pass the
    registry ``name`` to report the variant (all FireNet-family variants
    share one parameterized flax class, so the type name alone would
    print ``FireNet`` for e.g. LIFFireNet)."""
    return (f"{name or type(model).__name__}\n"
            f"Trainable parameters: {count_params(params)}")


def center_fit(x, h, w):
    """Center-pad (or crop, for negative diff) NHWC ``x`` to (h, w) —
    the ZeroPad2d(diff//2, ...) behavior of the reference's skip functions
    (model_util.py:14-27), which crops when diff is negative."""
    dh = h - x.shape[1]
    dw = w - x.shape[2]

    def lohi(d):
        return d // 2, d - d // 2

    t, b = lohi(dh)
    l, r = lohi(dw)
    # positive part: pad; negative part: crop
    x = jnp.pad(
        x,
        ((0, 0), (max(t, 0), max(b, 0)), (max(l, 0), max(r, 0)), (0, 0)),
    )
    hs = -t if t < 0 else 0
    ws = -l if l < 0 else 0
    return x[:, hs:hs + h, ws:ws + w, :]


def skip_concat(x1, x2):
    """Channel concat with x1 center-fit to x2's spatial dims
    (reference: model_util.py:14-19)."""
    x1 = center_fit(x1, x2.shape[1], x2.shape[2])
    return jnp.concatenate([x1, x2], axis=-1)


def skip_sum(x1, x2):
    """Element-wise sum with x1 center-fit to x2 (model_util.py:22-27)."""
    return center_fit(x1, x2.shape[1], x2.shape[2]) + x2


def get_skip_fn(skip_type):
    """Explicit registry replacing ``eval('skip_' + type)`` (unet.py:76)."""
    return {"concat": skip_concat, "sum": skip_sum}[skip_type]


def optimal_crop_size(max_size, max_subsample_factor, safety_margin=0):
    """Smallest multiple of 2^factor >= max_size (model_util.py:30-38)."""
    f = 2 ** max_subsample_factor
    return f * math.ceil(max_size / f) + safety_margin * f


class CropParameters:
    """Pad-to-multiple-of-2^n helper for UNet inputs
    (reference: model_util.py:41-79). NHWC."""

    def __init__(self, width, height, num_encoders, safety_margin=0):
        self.height = height
        self.width = width
        self.height_crop = optimal_crop_size(height, num_encoders, safety_margin)
        self.width_crop = optimal_crop_size(width, num_encoders, safety_margin)
        self.pt = math.ceil(0.5 * (self.height_crop - height))
        self.pb = math.floor(0.5 * (self.height_crop - height))
        self.pl = math.ceil(0.5 * (self.width_crop - width))
        self.pr = math.floor(0.5 * (self.width_crop - width))
        cx = math.floor(self.width_crop / 2)
        cy = math.floor(self.height_crop / 2)
        self.ix0 = cx - math.floor(width / 2)
        self.ix1 = cx + math.ceil(width / 2)
        self.iy0 = cy - math.floor(height / 2)
        self.iy1 = cy + math.ceil(height / 2)

    def pad(self, x):
        return jnp.pad(
            x, ((0, 0), (self.pt, self.pb), (self.pl, self.pr), (0, 0))
        )

    def crop(self, x):
        return x[:, self.iy0:self.iy1, self.ix0:self.ix1, :]
