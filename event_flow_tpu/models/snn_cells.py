"""Spiking convolutional cells (LIF / PLIF / ALIF / XLIF, feedforward and
recurrent) as pure stateful functions.

TPU-native rebuild of the reference SNN cells
(reference: models/spiking_submodules.py). Dynamics are kept exactly
equivalent — per-channel leaks/thresholds drawn N(mu, sigma), leak squashed
by sigmoid, threshold clamped >= 0.01, surrogate-gradient Heaviside spike,
reset detached from the graph — but expressed functionally so the recurrent
time loop is a ``lax.scan`` and surrogate BPTT flows through the scan carry.

Cell contract: ``cell(x, state, [residual]) -> (spikes, new_state)`` with
NHWC tensors and state tuples (v, z[, extra]).

Equation provenance (hard reset / soft reset), citing the reference:
  LIF:  v' = v*l*(1-z) + (1-l)*ff          | v' = v*l + (1-l)*ff - z*th
        (spiking_submodules.py:117-126)
  PLIF: pt' = pt*l_pt + (1-l_pt)*pool(mean|x|); current = ff - sig(add_pt)*pt'
        (spiking_submodules.py:210-227)
  ALIF: t' = t*l_t + (1-l_t)*z; th = t0 + t1*t'; soft reset uses old t
        (spiking_submodules.py:317-334)
  XLIF: th = t0 + t1*pt'; soft reset uses old pt
        (spiking_submodules.py:416-435)
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import avg_pool, upsample2x_bilinear
from ..ops.spike import get_spike_fn
from .conv import Conv2d, _uniform_fan_in_channels_init, out_hw
from .policy import cell_impl

__all__ = [
    "ConvLIF",
    "ConvPLIF",
    "ConvALIF",
    "ConvXLIF",
    "ConvLIFRecurrent",
    "ConvPLIFRecurrent",
    "ConvALIFRecurrent",
    "ConvXLIFRecurrent",
    "SpikingRecurrentConvLayer",
    "SpikingResidualBlock",
    "SpikingUpsampleConvLayer",
    "SpikingTransposedConvLayer",
]


def _normal_init(mu, sigma):
    def init(key, shape, dtype=jnp.float32):
        return mu + sigma * jax.random.normal(key, shape, dtype)

    return init


def _like(ref, *xs):
    """Cast per-channel neuron params to the cell's compute dtype (the
    input-current dtype) so bf16 inputs keep the elementwise dynamics in
    bf16 (models/policy.py); the squashings (sigmoid / clip) themselves
    run in f32 for accuracy and are rounded once here."""
    return tuple(x.astype(ref.dtype) for x in xs)


class _ConvKernel(nn.Module):
    """Bare conv-weight holder for the fused Pallas cell path: declares
    the SAME param ('<name>/kernel', snn init) as the bias-free Conv2d it
    replaces, so the parameter tree — and therefore checkpoints and the
    torch importer — are identical for both implementations."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, cin):
        return self.param(
            "kernel", _uniform_fan_in_channels_init,
            (self.kernel_size, self.kernel_size, cin, self.features),
        )


class _SpikingBase(nn.Module):
    """Shared helpers: per-channel neuron parameters with learn/freeze."""

    def _neuron_param(self, name, dist, features, learn):
        p = self.param(name, _normal_init(*dist), (features,))
        if not learn:
            p = jax.lax.stop_gradient(p)
        return p

    def _fused_current(self, x, z):
        """ff(x) + rec(z) as ONE conv over concat([x, z]) with the two
        bias-free snn-init kernels concatenated along the input-channel
        axis — mathematically identical (conv is linear in its input), one
        patch/matmul instead of two. Parameter tree unchanged
        ('ff'/'rec' kernels via _ConvKernel)."""
        from .conv import conv2d_fn

        kf = _ConvKernel(self.features, self.kernel_size,
                         name="ff")(x.shape[-1])
        kr = _ConvKernel(self.features, self.kernel_size,
                         name="rec")(self.features)
        return conv2d_fn(
            jnp.concatenate([x, z.astype(x.dtype)], axis=-1),
            jnp.concatenate([kf, kr], axis=2).astype(x.dtype),
        )

    def _use_fused(self, x, stride, rec=False):
        """Route through the fused conv+LIF Pallas kernel
        (ops/fused_lif_pallas.py) when selected and the shape qualifies
        (norm options — incl. weight norm — stay on the XLA path).
        'auto' additionally requires a TPU-like backend and a shape from
        the measured-win table (models/policy.py::fused_auto_wins)."""
        impl = cell_impl()
        if impl not in ("pallas", "auto"):
            return False
        if stride != 1 or self.norm not in (None, "none") or not self.detach:
            return False
        if impl == "auto":
            from .policy import fused_auto_wins

            # the kernel is Mosaic-TPU; anything else gets the XLA cells
            if jax.default_backend() != "tpu":
                return False
            if not fused_auto_wins(x.shape[1], x.shape[2], self.features,
                                   rec):
                return False
        from ..ops.fused_lif_pallas import fused_lif_available

        return fused_lif_available(x.shape, self.kernel_size, stride,
                                   cout=self.features, rec=rec)


class ConvLIF(_SpikingBase):
    """Feedforward conv LIF cell (reference: spiking_submodules.py:24-126).
    State: (v, z)."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: str = "arctanspike"
    act_width: float = 10.0
    leak: Tuple[float, float] = (-4.0, 0.1)
    thresh: Tuple[float, float] = (0.8, 0.0)
    learn_leak: bool = True
    learn_thresh: bool = True
    hard_reset: bool = True
    detach: bool = True
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, state, residual=0.0):
        # norm options (reference: spiking_submodules.py:86-94): "weight"
        # reparameterizes the ff conv, "group" normalizes the input current
        # with GroupNorm(1, Cin) (the reference's min(1, C//4) is always 1)
        wn = self.norm == "weight"
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm")(x)
        elif self.norm not in (None, "none", "weight"):
            raise NotImplementedError(f"norm={self.norm!r} is not supported")
        if self._use_fused(x, self.stride):
            from ..ops.fused_lif_pallas import fused_conv_lif

            kernel = _ConvKernel(self.features, self.kernel_size,
                                 name="ff")(x.shape[-1])
            thresh = jnp.maximum(
                self._neuron_param("thresh", self.thresh, self.features,
                                   self.learn_thresh), 0.01)
            leak = jax.nn.sigmoid(
                self._neuron_param("leak", self.leak, self.features,
                                   self.learn_leak))
            v, z = state
            v_out, z_out = fused_conv_lif(
                x, kernel.astype(x.dtype), v, z, leak, thresh,
                self.kernel_size, self.hard_reset, self.activation,
                self.act_width,
            )
            return z_out + residual, (v_out, z_out)
        ff = Conv2d(self.features, self.kernel_size, self.stride,
                    use_bias=False, init="snn", weight_norm=wn, name="ff")(x)
        v, z = state
        thresh = jnp.maximum(
            self._neuron_param("thresh", self.thresh, self.features,
                               self.learn_thresh),
            0.01,
        )
        leak = jax.nn.sigmoid(
            self._neuron_param("leak", self.leak, self.features,
                               self.learn_leak)
        )
        thresh, leak = _like(ff, thresh, leak)
        if self.detach:
            z = jax.lax.stop_gradient(z)
        if self.hard_reset:
            v_out = v * leak * (1.0 - z) + (1.0 - leak) * ff
        else:
            v_out = v * leak + (1.0 - leak) * ff - z * thresh
        spike = get_spike_fn(self.activation)
        z_out = spike(v_out, thresh, self.act_width)
        return z_out + residual, (v_out, z_out)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        oh, ow = out_hw(h, w, self.stride)
        s = jnp.zeros((batch, oh, ow, self.features), dtype)
        return (s, s)


class ConvPLIF(_SpikingBase):
    """LIF + presynaptic-trace adaptation
    (reference: spiking_submodules.py:129-227). State: (v, z, pt)."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: str = "arctanspike"
    act_width: float = 10.0
    leak_v: Tuple[float, float] = (-4.0, 0.1)
    leak_pt: Tuple[float, float] = (-4.0, 0.1)
    add_pt: Tuple[float, float] = (-2.0, 0.1)
    thresh: Tuple[float, float] = (0.8, 0.0)
    learn_leak: bool = True
    learn_thresh: bool = True
    hard_reset: bool = True
    detach: bool = True
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, state, residual=0.0):
        ff = Conv2d(self.features, self.kernel_size, self.stride,
                    use_bias=False, init="snn", name="ff")(x)
        v, z, pt = state
        thresh = jnp.maximum(
            self._neuron_param("thresh", self.thresh, self.features,
                               self.learn_thresh),
            0.01,
        )
        leak_v = jax.nn.sigmoid(
            self._neuron_param("leak_v", self.leak_v, self.features,
                               self.learn_leak))
        leak_pt = jax.nn.sigmoid(
            self._neuron_param("leak_pt", self.leak_pt, self.features,
                               self.learn_leak))
        add_pt = jax.nn.sigmoid(
            self._neuron_param("add_pt", self.add_pt, self.features,
                               self.learn_leak))
        thresh, leak_v, leak_pt, add_pt = _like(
            ff, thresh, leak_v, leak_pt, add_pt)
        # presynaptic trace: avg-pooled mean |input| (spiking_submodules.py:212)
        trace_in = avg_pool(
            jnp.mean(jnp.abs(x), axis=-1, keepdims=True),
            self.kernel_size, self.stride, self.kernel_size // 2,
        )
        pt_out = pt * leak_pt + (1.0 - leak_pt) * trace_in
        if self.detach:
            z = jax.lax.stop_gradient(z)
        cur = ff - add_pt * pt_out
        if self.hard_reset:
            v_out = v * leak_v * (1.0 - z) + (1.0 - leak_v) * cur
        else:
            v_out = v * leak_v + (1.0 - leak_v) * cur - z * thresh
        z_out = get_spike_fn(self.activation)(v_out, thresh, self.act_width)
        return z_out + residual, (v_out, z_out, pt_out)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        oh, ow = out_hw(h, w, self.stride)
        s = jnp.zeros((batch, oh, ow, self.features), dtype)
        return (s, s, s)


class ConvALIF(_SpikingBase):
    """Adaptive-threshold LIF (reference: spiking_submodules.py:230-334).
    State: (v, z, t). Defaults: soft reset, learn_thresh=False."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: str = "arctanspike"
    act_width: float = 10.0
    leak_v: Tuple[float, float] = (-4.0, 0.1)
    leak_t: Tuple[float, float] = (-4.0, 0.1)
    t0: Tuple[float, float] = (0.01, 0.0)
    t1: Tuple[float, float] = (1.8, 0.0)
    learn_leak: bool = True
    learn_thresh: bool = False
    hard_reset: bool = False
    detach: bool = True
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, state, residual=0.0):
        ff = Conv2d(self.features, self.kernel_size, self.stride,
                    use_bias=False, init="snn", name="ff")(x)
        v, z, t = state
        t0 = jnp.maximum(
            self._neuron_param("t0", self.t0, self.features,
                               self.learn_thresh), 0.01)
        t1 = jnp.maximum(
            self._neuron_param("t1", self.t1, self.features,
                               self.learn_thresh), 0.0)
        leak_v = jax.nn.sigmoid(
            self._neuron_param("leak_v", self.leak_v, self.features,
                               self.learn_leak))
        leak_t = jax.nn.sigmoid(
            self._neuron_param("leak_t", self.leak_t, self.features,
                               self.learn_leak))
        t0, t1, leak_v, leak_t = _like(ff, t0, t1, leak_v, leak_t)
        # threshold trace uses pre-detach z (spiking_submodules.py:317)
        t_out = t * leak_t + (1.0 - leak_t) * z
        thresh = t0 + t1 * t_out
        if self.detach:
            z = jax.lax.stop_gradient(z)
        if self.hard_reset:
            v_out = v * leak_v * (1.0 - z) + (1.0 - leak_v) * ff
        else:
            v_out = v * leak_v + (1.0 - leak_v) * ff - z * (t0 + t1 * t)
        z_out = get_spike_fn(self.activation)(v_out, thresh, self.act_width)
        return z_out + residual, (v_out, z_out, t_out)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        oh, ow = out_hw(h, w, self.stride)
        s = jnp.zeros((batch, oh, ow, self.features), dtype)
        return (s, s, s)


class ConvXLIF(_SpikingBase):
    """LIF with threshold adaptation driven by the presynaptic trace
    (PLIF x ALIF cross, reference: spiking_submodules.py:337-435).
    State: (v, z, pt)."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: str = "arctanspike"
    act_width: float = 10.0
    leak_v: Tuple[float, float] = (-4.0, 0.1)
    leak_pt: Tuple[float, float] = (-4.0, 0.1)
    t0: Tuple[float, float] = (0.01, 0.0)
    t1: Tuple[float, float] = (1.8, 0.0)
    learn_leak: bool = True
    learn_thresh: bool = False
    hard_reset: bool = False
    detach: bool = True
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, state, residual=0.0):
        ff = Conv2d(self.features, self.kernel_size, self.stride,
                    use_bias=False, init="snn", name="ff")(x)
        v, z, pt = state
        t0 = jnp.maximum(
            self._neuron_param("t0", self.t0, self.features,
                               self.learn_thresh), 0.01)
        t1 = jnp.maximum(
            self._neuron_param("t1", self.t1, self.features,
                               self.learn_thresh), 0.0)
        leak_v = jax.nn.sigmoid(
            self._neuron_param("leak_v", self.leak_v, self.features,
                               self.learn_leak))
        leak_pt = jax.nn.sigmoid(
            self._neuron_param("leak_pt", self.leak_pt, self.features,
                               self.learn_leak))
        t0, t1, leak_v, leak_pt = _like(ff, t0, t1, leak_v, leak_pt)
        trace_in = avg_pool(
            jnp.mean(jnp.abs(x), axis=-1, keepdims=True),
            self.kernel_size, self.stride, self.kernel_size // 2,
        )
        pt_out = pt * leak_pt + (1.0 - leak_pt) * trace_in
        thresh = t0 + t1 * pt_out
        if self.detach:
            z = jax.lax.stop_gradient(z)
        if self.hard_reset:
            v_out = v * leak_v * (1.0 - z) + (1.0 - leak_v) * ff
        else:
            v_out = v * leak_v + (1.0 - leak_v) * ff - z * (t0 + t1 * pt)
        z_out = get_spike_fn(self.activation)(v_out, thresh, self.act_width)
        return z_out + residual, (v_out, z_out, pt_out)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        oh, ow = out_hw(h, w, self.stride)
        s = jnp.zeros((batch, oh, ow, self.features), dtype)
        return (s, s, s)


class ConvLIFRecurrent(_SpikingBase):
    """Recurrent conv LIF: current = ff(x) + rec(z_prev)
    (reference: spiking_submodules.py:438-551). State: (v, z)."""

    features: int
    kernel_size: int
    activation: str = "arctanspike"
    act_width: float = 10.0
    leak: Tuple[float, float] = (-4.0, 0.1)
    thresh: Tuple[float, float] = (0.8, 0.0)
    learn_leak: bool = True
    learn_thresh: bool = True
    hard_reset: bool = True
    detach: bool = True
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, state):
        # norms (reference: spiking_submodules.py:501-514, applied :518-529):
        # "weight" reparameterizes both convs; "group" normalizes the ff
        # input and the previous spikes (the normalized z also feeds the
        # reset term, matching the reference's in-place overwrite at :529)
        wn = self.norm == "weight"
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm_ff")(x)
        elif self.norm not in (None, "none", "weight"):
            raise NotImplementedError(f"norm={self.norm!r} is not supported")
        if self._use_fused(x, 1, rec=True):
            from ..ops.fused_lif_pallas import fused_conv_lif_rec

            kernel = _ConvKernel(self.features, self.kernel_size,
                                 name="ff")(x.shape[-1])
            kernel_rec = _ConvKernel(self.features, self.kernel_size,
                                     name="rec")(self.features)
            thresh = jnp.maximum(
                self._neuron_param("thresh", self.thresh, self.features,
                                   self.learn_thresh), 0.01)
            leak = jax.nn.sigmoid(
                self._neuron_param("leak", self.leak, self.features,
                                   self.learn_leak))
            v, z = state
            v_out, z_out = fused_conv_lif_rec(
                x, kernel.astype(x.dtype), kernel_rec.astype(x.dtype),
                v, z, z, leak, thresh, self.kernel_size, self.hard_reset,
                self.activation, self.act_width,
            )
            return z_out, (v_out, z_out)
        v, z = state
        if self.norm == "group":
            z = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm_rec")(z)
        # recurrent current from pre-detach spikes (spiking_submodules.py:530)
        if wn:
            # weight norm reparameterizes each conv separately — keep the
            # two-conv form
            ff = Conv2d(self.features, self.kernel_size, 1, use_bias=False,
                        init="snn", weight_norm=True, name="ff")(x)
            rec = Conv2d(self.features, self.kernel_size, 1, use_bias=False,
                         init="snn", weight_norm=True, name="rec")(z)
            cur = ff + rec
        else:
            cur = self._fused_current(x, z)
        thresh = jnp.maximum(
            self._neuron_param("thresh", self.thresh, self.features,
                               self.learn_thresh), 0.01)
        leak = jax.nn.sigmoid(
            self._neuron_param("leak", self.leak, self.features,
                               self.learn_leak))
        thresh, leak = _like(cur, thresh, leak)
        if self.detach:
            z = jax.lax.stop_gradient(z)
        if self.hard_reset:
            v_out = v * leak * (1.0 - z) + (1.0 - leak) * cur
        else:
            v_out = v * leak + (1.0 - leak) * cur - z * thresh
        z_out = get_spike_fn(self.activation)(v_out, thresh, self.act_width)
        return z_out, (v_out, z_out)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        s = jnp.zeros((batch, h, w, self.features), dtype)
        return (s, s)


class ConvPLIFRecurrent(_SpikingBase):
    """Recurrent PLIF (reference: spiking_submodules.py:554-657).
    State: (v, z, pt)."""

    features: int
    kernel_size: int
    activation: str = "arctanspike"
    act_width: float = 10.0
    leak_v: Tuple[float, float] = (-4.0, 0.1)
    leak_pt: Tuple[float, float] = (-4.0, 0.1)
    add_pt: Tuple[float, float] = (-2.0, 0.1)
    thresh: Tuple[float, float] = (0.8, 0.0)
    learn_leak: bool = True
    learn_thresh: bool = True
    hard_reset: bool = True
    detach: bool = True
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, state, residual=0.0):
        v, z, pt = state
        ff = self._fused_current(x, z)  # ff(x) + rec(z), fused
        thresh = jnp.maximum(
            self._neuron_param("thresh", self.thresh, self.features,
                               self.learn_thresh), 0.01)
        leak_v = jax.nn.sigmoid(
            self._neuron_param("leak_v", self.leak_v, self.features,
                               self.learn_leak))
        leak_pt = jax.nn.sigmoid(
            self._neuron_param("leak_pt", self.leak_pt, self.features,
                               self.learn_leak))
        add_pt = jax.nn.sigmoid(
            self._neuron_param("add_pt", self.add_pt, self.features,
                               self.learn_leak))
        thresh, leak_v, leak_pt, add_pt = _like(
            ff, thresh, leak_v, leak_pt, add_pt)
        trace_in = avg_pool(
            jnp.mean(jnp.abs(x), axis=-1, keepdims=True),
            self.kernel_size, 1, self.kernel_size // 2,
        )
        pt_out = pt * leak_pt + (1.0 - leak_pt) * trace_in
        if self.detach:
            z = jax.lax.stop_gradient(z)
        cur = ff - add_pt * pt_out
        if self.hard_reset:
            v_out = v * leak_v * (1.0 - z) + (1.0 - leak_v) * cur
        else:
            v_out = v * leak_v + (1.0 - leak_v) * cur - z * thresh
        z_out = get_spike_fn(self.activation)(v_out, thresh, self.act_width)
        return z_out + residual, (v_out, z_out, pt_out)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        s = jnp.zeros((batch, h, w, self.features), dtype)
        return (s, s, s)


class ConvALIFRecurrent(_SpikingBase):
    """Recurrent ALIF (reference: spiking_submodules.py:660-768).
    State: (v, z, t)."""

    features: int
    kernel_size: int
    activation: str = "arctanspike"
    act_width: float = 10.0
    leak_v: Tuple[float, float] = (-4.0, 0.1)
    leak_t: Tuple[float, float] = (-4.0, 0.1)
    t0: Tuple[float, float] = (0.01, 0.0)
    t1: Tuple[float, float] = (1.8, 0.0)
    learn_leak: bool = True
    learn_thresh: bool = False
    hard_reset: bool = False
    detach: bool = True
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, state):
        v, z, t = state
        cur = self._fused_current(x, z)  # ff(x) + rec(z), fused
        t0 = jnp.maximum(
            self._neuron_param("t0", self.t0, self.features,
                               self.learn_thresh), 0.01)
        t1 = jnp.maximum(
            self._neuron_param("t1", self.t1, self.features,
                               self.learn_thresh), 0.0)
        leak_v = jax.nn.sigmoid(
            self._neuron_param("leak_v", self.leak_v, self.features,
                               self.learn_leak))
        leak_t = jax.nn.sigmoid(
            self._neuron_param("leak_t", self.leak_t, self.features,
                               self.learn_leak))
        t0, t1, leak_v, leak_t = _like(cur, t0, t1, leak_v, leak_t)
        t_out = t * leak_t + (1.0 - leak_t) * z
        thresh = t0 + t1 * t_out
        if self.detach:
            z = jax.lax.stop_gradient(z)
        if self.hard_reset:
            v_out = v * leak_v * (1.0 - z) + (1.0 - leak_v) * cur
        else:
            v_out = v * leak_v + (1.0 - leak_v) * cur - z * (t0 + t1 * t)
        z_out = get_spike_fn(self.activation)(v_out, thresh, self.act_width)
        return z_out, (v_out, z_out, t_out)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        s = jnp.zeros((batch, h, w, self.features), dtype)
        return (s, s, s)


class ConvXLIFRecurrent(_SpikingBase):
    """Recurrent XLIF (reference: spiking_submodules.py:771-875).
    State: (v, z, pt)."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: str = "arctanspike"
    act_width: float = 10.0
    leak_v: Tuple[float, float] = (-4.0, 0.1)
    leak_pt: Tuple[float, float] = (-4.0, 0.1)
    t0: Tuple[float, float] = (0.01, 0.0)
    t1: Tuple[float, float] = (1.8, 0.0)
    learn_leak: bool = True
    learn_thresh: bool = False
    hard_reset: bool = False
    detach: bool = True
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, state):
        v, z, pt = state
        if self.stride == 1:
            cur = self._fused_current(x, z)  # ff(x) + rec(z), fused
        else:
            cur = Conv2d(self.features, self.kernel_size, self.stride,
                         use_bias=False, init="snn", name="ff")(x) \
                + Conv2d(self.features, self.kernel_size, 1,
                         use_bias=False, init="snn", name="rec")(z)
        t0 = jnp.maximum(
            self._neuron_param("t0", self.t0, self.features,
                               self.learn_thresh), 0.01)
        t1 = jnp.maximum(
            self._neuron_param("t1", self.t1, self.features,
                               self.learn_thresh), 0.0)
        leak_v = jax.nn.sigmoid(
            self._neuron_param("leak_v", self.leak_v, self.features,
                               self.learn_leak))
        leak_pt = jax.nn.sigmoid(
            self._neuron_param("leak_pt", self.leak_pt, self.features,
                               self.learn_leak))
        t0, t1, leak_v, leak_pt = _like(cur, t0, t1, leak_v, leak_pt)
        trace_in = avg_pool(
            jnp.mean(jnp.abs(x), axis=-1, keepdims=True),
            self.kernel_size, self.stride, self.kernel_size // 2,
        )
        pt_out = pt * leak_pt + (1.0 - leak_pt) * trace_in
        thresh = t0 + t1 * pt_out
        if self.detach:
            z = jax.lax.stop_gradient(z)
        if self.hard_reset:
            v_out = v * leak_v * (1.0 - z) + (1.0 - leak_v) * cur
        else:
            v_out = v * leak_v + (1.0 - leak_v) * cur - z * (t0 + t1 * pt)
        z_out = get_spike_fn(self.activation)(v_out, thresh, self.act_width)
        return z_out, (v_out, z_out, pt_out)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        oh, ow = out_hw(h, w, self.stride)
        s = jnp.zeros((batch, oh, ow, self.features), dtype)
        return (s, s, s)


_FF_BLOCKS = {"lif": ConvLIF, "alif": ConvALIF, "plif": ConvPLIF, "xlif": ConvXLIF}
_REC_BLOCKS = {
    "lif": ConvLIFRecurrent,
    "alif": ConvALIFRecurrent,
    "plif": ConvPLIFRecurrent,
    "xlif": ConvXLIFRecurrent,
}


class SpikingRecurrentConvLayer(nn.Module):
    """Strided spiking ff cell -> spiking recurrent cell
    (reference: spiking_submodules.py:878-930)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    recurrent_block_type: str = "lif"
    activation_ff: str = "arctanspike"
    activation_rec: str = "arctanspike"
    neuron_kwargs: dict = None

    def setup(self):
        assert self.recurrent_block_type in _FF_BLOCKS
        kw = dict(self.neuron_kwargs or {})
        kw.pop("spiking_feedforward_block_type", None)
        self.conv = _FF_BLOCKS[self.recurrent_block_type](
            self.features, self.kernel_size, self.stride,
            activation=self.activation_ff, **kw,
        )
        self.recurrent_block = _REC_BLOCKS[self.recurrent_block_type](
            self.features, self.kernel_size,
            activation=self.activation_rec, **kw,
        )

    def __call__(self, x, state):
        s_ff, s_rec = state
        x1, s_ff = self.conv(x, s_ff)
        x2, s_rec = self.recurrent_block(x1, s_rec)
        return x2, (s_ff, s_rec)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        oh, ow = out_hw(h, w, self.stride)
        kw = dict(self.neuron_kwargs or {})
        kw.pop("spiking_feedforward_block_type", None)
        ff = _FF_BLOCKS[self.recurrent_block_type](
            self.features, self.kernel_size, self.stride,
            activation=self.activation_ff, **kw)
        rec = _REC_BLOCKS[self.recurrent_block_type](
            self.features, self.kernel_size,
            activation=self.activation_rec, **kw)
        return (ff.zero_state(batch, h, w, dtype),
                rec.zero_state(batch, oh, ow, dtype))


class SpikingResidualBlock(nn.Module):
    """Two spiking ff cells, residual into the 2nd cell's spikes
    (reference: spiking_submodules.py:933-975)."""

    features: int
    stride: int = 1
    spiking_feedforward_block_type: str = "lif"
    activation: str = "arctanspike"
    neuron_kwargs: dict = None

    def setup(self):
        block = _FF_BLOCKS[self.spiking_feedforward_block_type]
        kw = dict(self.neuron_kwargs or {})
        self.conv1 = block(self.features, 3, self.stride,
                           activation=self.activation, **kw)
        self.conv2 = block(self.features, 3, 1,
                           activation=self.activation, **kw)

    def __call__(self, x, state):
        s1, s2 = state
        x1, s1 = self.conv1(x, s1)
        x2, s2 = self.conv2(x1, s2, residual=x)
        return x2, (s1, s2)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        block = _FF_BLOCKS[self.spiking_feedforward_block_type]
        kw = dict(self.neuron_kwargs or {})
        c1 = block(self.features, 3, self.stride,
                   activation=self.activation, **kw)
        oh, ow = out_hw(h, w, self.stride)
        c2 = block(self.features, 3, 1, activation=self.activation, **kw)
        return (c1.zero_state(batch, h, w, dtype),
                c2.zero_state(batch, oh, ow, dtype))


class SpikingUpsampleConvLayer(nn.Module):
    """Bilinear x2 + spiking ff cell (reference: spiking_submodules.py:978-1013)."""

    features: int
    kernel_size: int
    stride: int = 1
    spiking_feedforward_block_type: str = "lif"
    activation: str = "arctanspike"
    neuron_kwargs: dict = None

    def setup(self):
        block = _FF_BLOCKS[self.spiking_feedforward_block_type]
        self.conv2d = block(
            self.features, self.kernel_size, self.stride,
            activation=self.activation, **dict(self.neuron_kwargs or {}),
        )

    def __call__(self, x, state):
        return self.conv2d(upsample2x_bilinear(x), state)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        block = _FF_BLOCKS[self.spiking_feedforward_block_type]
        cell = block(self.features, self.kernel_size, self.stride,
                     activation=self.activation,
                     **dict(self.neuron_kwargs or {}))
        return cell.zero_state(batch, 2 * h, 2 * w, dtype)


class SpikingTransposedConvLayer(nn.Module):
    """Declared but unimplemented in the reference
    (spiking_submodules.py:1016-1032)."""

    features: int
    kernel_size: int

    def __call__(self, *a, **k):
        raise NotImplementedError(
            "SpikingTransposedConvLayer is unsupported (matches reference)"
        )
