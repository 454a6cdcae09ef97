"""Surrogate-gradient spike functions (``jax.custom_vjp``).

TPU-native re-design of the reference's ``torch.autograd.Function`` spike
classes (reference: models/spiking_util.py:13-109). Forward is the Heaviside
step ``(v - thresh) > 0``; backward substitutes a smooth surrogate so BPTT
through ``lax.scan`` works.

Four flavors, matching the reference semantics exactly:
  - superspike      : sg = 1 / (1 + width*|x|)^2        (spiking_util.py:28-43)
  - mgspike         : multi-Gaussian                    (spiking_util.py:46-65)
  - trianglespike   : sg = relu(1 - width*|x|)          (spiking_util.py:68-79)
  - arctanspike     : sg = 1 / (1 + width*x^2)          (spiking_util.py:82-93; default)

All functions take ``(x, thresh, width)`` and spike on ``x - thresh``; the
surrogate gradient flows into both ``x`` and ``thresh`` (thresh is learnable
in LIF cells), while ``width`` is a static Python float (non-differentiable
buffer in the reference, spiking_util.py:43).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "superspike",
    "mgspike",
    "trianglespike",
    "arctanspike",
    "get_spike_fn",
    "SPIKE_FNS",
]


def _heaviside(x):
    return (x > 0).astype(x.dtype)


def _gaussian(x, mu, sigma):
    """Gaussian PDF (reference: spiking_util.py:6-10)."""
    return jnp.exp(-((x - mu) ** 2) / (2.0 * sigma * sigma)) / (
        sigma * math.sqrt(2.0 * math.pi)
    )


def _make_spike(surrogate_grad):
    """Build a custom-VJP spike primitive ``f(x, width) -> heaviside(x)``
    whose backward is ``g * surrogate_grad(x, width)``."""

    @partial(jax.custom_vjp, nondiff_argnums=(1,))
    def spike(x, width):
        return _heaviside(x)

    def fwd(x, width):
        return _heaviside(x), x

    def bwd(width, x, g):
        return (g * surrogate_grad(x, width),)

    spike.defvjp(fwd, bwd)
    return spike


_superspike_core = _make_spike(lambda x, w: 1.0 / (1.0 + w * jnp.abs(x)) ** 2)
_mgspike_core = _make_spike(
    lambda x, w: 1.15 * _gaussian(x, 0.0, w)
    - 0.15 * _gaussian(x, w, 6.0 * w)
    - 0.15 * _gaussian(x, -w, 6.0 * w)
)
_trianglespike_core = _make_spike(lambda x, w: jax.nn.relu(1.0 - w * jnp.abs(x)))
_arctanspike_core = _make_spike(lambda x, w: 1.0 / (1.0 + w * x * x))


def superspike(x, thresh=1.0, width=10.0):
    return _superspike_core(x - thresh, float(width))


def mgspike(x, thresh=1.0, width=0.5):
    return _mgspike_core(x - thresh, float(width))


def trianglespike(x, thresh=1.0, width=1.0):
    return _trianglespike_core(x - thresh, float(width))


def arctanspike(x, thresh=1.0, width=10.0):
    return _arctanspike_core(x - thresh, float(width))


SPIKE_FNS = {
    "superspike": superspike,
    "mgspike": mgspike,
    "trianglespike": trianglespike,
    "arctanspike": arctanspike,
}


def get_spike_fn(name):
    """String-name lookup, replacing the reference's ``getattr(spiking, name)``
    (spiking_submodules.py:81) with an explicit registry."""
    if name not in SPIKE_FNS:
        raise KeyError(
            f"Unknown spike function {name!r}; available: {sorted(SPIKE_FNS)}"
        )
    return SPIKE_FNS[name]
