"""ANN convolutional cells as pure stateful-function modules.

TPU-native rebuild of the reference's ANN submodules
(reference: models/submodules.py). Every recurrent cell follows the
functional contract ``cell(x, state, [residual]) -> (y, new_state)`` with
state passed explicitly (no module-held state), so the whole model scans
cleanly under ``lax.scan`` and state resets are masked carry updates.

Layout is NHWC. ``zero_state(batch, h, w)`` gives the lazily-zero initial
state of the reference (e.g. submodules.py:407-409) as an eager, static-shape
pytree; ``h, w`` are the cell's *input* spatial dims.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import upsample2x_bilinear
from ..ops.spike import SPIKE_FNS
from .conv import Conv2d, ConvTranspose2dX2, out_hw

__all__ = [
    "resolve_activation",
    "ConvLayer",
    "ConvLayerS",
    "TransposedConvLayer",
    "UpsampleConvLayer",
    "ResidualBlock",
    "ConvLSTM",
    "ConvGRU",
    "ConvRecurrent",
    "ConvLeakyRecurrent",
    "ConvLeaky",
    "RecurrentConvLayer",
    "LeakyResidualBlock",
    "LeakyUpsampleConvLayer",
    "LeakyTransposedConvLayer",
    "LeakyRecurrentConvLayer",
]

_TORCH_ACTS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def resolve_activation(name: Optional[str]):
    """Explicit-registry version of the reference's
    ``getattr(torch, act) or getattr(spiking, act)`` (submodules.py:38-44)."""
    if name is None:
        return lambda x: x
    if name in _TORCH_ACTS:
        return _TORCH_ACTS[name]
    if name in SPIKE_FNS:
        fn = SPIKE_FNS[name]
        return lambda x: fn(x)
    raise KeyError(f"Unknown activation {name!r}")


class Norm2d(nn.Module):
    """BN / IN over NHWC activations (reference: submodules.py:46-56).

    Matches torch training-mode semantics: ``BN`` normalizes per channel
    over (N, H, W) with learnable scale+bias (BatchNorm2d affine=True);
    ``IN`` normalizes per (sample, channel) over (H, W) with no affine
    (InstanceNorm2d default). Running statistics are not tracked — no
    shipped reference config enables norms, and training always uses batch
    statistics in torch too."""

    kind: str

    @nn.compact
    def __call__(self, x):
        eps = 1e-5
        if self.kind == "BN":
            mean = x.mean(axis=(0, 1, 2))
            var = x.var(axis=(0, 1, 2))
            y = (x - mean) * jax.lax.rsqrt(var + eps)
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            return y * scale + bias
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps)


def _apply_norm(norm, y):
    """Post-conv norm dispatch; call inside @nn.compact."""
    if norm in (None, "none"):
        return y
    if norm in ("BN", "IN"):
        return Norm2d(norm, name="norm")(y)
    raise NotImplementedError(f"norm={norm!r} is not supported")


def _normal_init(mu, sigma):
    def init(key, shape, dtype=jnp.float32):
        return mu + sigma * jax.random.normal(key, shape, dtype)

    return init


class ConvLayer(nn.Module):
    """Conv + activation (reference: submodules.py:12-61). Stateless."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    w_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        init = self.w_scale if self.w_scale is not None else "torch_default"
        y = Conv2d(
            self.features, self.kernel_size, self.stride, init=init,
            use_bias=self.norm != "BN", name="conv"
        )(x)
        y = _apply_norm(self.norm, y)
        return resolve_activation(self.activation)(y)


class ConvLayerS(nn.Module):
    """ConvLayer with the stateful cell signature and residual injection
    pre-activation (reference: submodules.py:64-83, ``ConvLayer_``)."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    w_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x, state, residual=0.0):
        init = self.w_scale if self.w_scale is not None else "torch_default"
        y = Conv2d(
            self.features, self.kernel_size, self.stride, init=init,
            use_bias=self.norm != "BN", name="conv"
        )(x)
        # norm before the residual injection (reference: submodules.py:74-79)
        y = _apply_norm(self.norm, y) + residual
        return resolve_activation(self.activation)(y), state

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        # stateless stand-in: zero-dim scalar placeholder (reference uses
        # torch.tensor(0), submodules.py:72)
        return jnp.zeros((), dtype)


class TransposedConvLayer(nn.Module):
    """Stride-2 transposed conv x2 upsample (reference: submodules.py:86-137)."""

    features: int
    kernel_size: int
    activation: Optional[str] = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose2dX2(
            self.features, self.kernel_size,
            use_bias=self.norm != "BN", name="deconv"
        )(x)
        y = _apply_norm(self.norm, y)
        return resolve_activation(self.activation)(y)


class UpsampleConvLayer(nn.Module):
    """Bilinear x2 + conv, avoids checkerboard (reference: submodules.py:140-185)."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: Optional[str] = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        y = Conv2d(
            self.features, self.kernel_size, self.stride,
            use_bias=self.norm != "BN", name="conv"
        )(upsample2x_bilinear(x))
        y = _apply_norm(self.norm, y)
        return resolve_activation(self.activation)(y)


class ResidualBlock(nn.Module):
    """conv-act-conv + skip (reference: submodules.py:238-311). Stateless;
    returns the post-skip activation (the reference's second return value is
    unused by the UNets)."""

    features: int
    activation: Optional[str] = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        act = resolve_activation(self.activation)
        bias = self.norm != "BN"
        out1 = Conv2d(self.features, 3, use_bias=bias, name="conv1")(x)
        if self.norm in ("BN", "IN"):
            out1 = Norm2d(self.norm, name="norm1")(out1)
        out1 = act(out1)
        out2 = Conv2d(self.features, 3, use_bias=bias, name="conv2")(out1)
        if self.norm in ("BN", "IN"):
            out2 = Norm2d(self.norm, name="norm2")(out2)
        elif self.norm not in (None, "none"):
            raise NotImplementedError(f"norm={self.norm!r} is not supported")
        return act(out2 + x)


class ConvLSTM(nn.Module):
    """4-gate convolutional LSTM (reference: submodules.py:314-374).
    state = (hidden, cell)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, state):
        hidden, cell = state
        stacked = jnp.concatenate([x, hidden], axis=-1)
        gates = Conv2d(4 * self.features, self.kernel_size, name="gates")(stacked)
        i, r, o, g = jnp.split(gates, 4, axis=-1)
        i, r, o = jax.nn.sigmoid(i), jax.nn.sigmoid(r), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        cell = r * cell + i * g
        hidden = o * jnp.tanh(cell)
        return hidden, (hidden, cell)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        s = (batch, h, w, self.features)
        return (jnp.zeros(s, dtype), jnp.zeros(s, dtype))


class _ConvGateParams(nn.Module):
    """Parameter-only stand-in for a Conv2d gate: creates the identical
    {kernel, bias} tree (same names, shapes, initializers — so checkpoints
    and torch imports interchange) but returns the parameters instead of
    computing, letting the owner fuse several same-input gates into one
    conv call."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, cin):
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.orthogonal(column_axis=-1),
            (k, k, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class ConvGRU(nn.Module):
    """3-gate convolutional GRU, orthogonal init + zero bias
    (reference: submodules.py:377-418).

    The update and reset gates read the same concat([x, h]) input, so
    their convs are fused into ONE conv with the kernels concatenated
    along the output-channel axis — mathematically identical, half the
    gate-conv dispatches, and a fuller MXU N dim at small feature counts
    (the UNet's first encoder runs F=64 < the 128 TPU lane width). The
    parameter tree is unchanged (update_gate/reset_gate/out_gate)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, state):
        from .conv import conv2d_fn

        stacked = jnp.concatenate([x, state], axis=-1)
        cin = stacked.shape[-1]
        ku, bu = _ConvGateParams(self.features, self.kernel_size,
                                 name="update_gate")(cin)
        kr, br = _ConvGateParams(self.features, self.kernel_size,
                                 name="reset_gate")(cin)
        ko, bo = _ConvGateParams(self.features, self.kernel_size,
                                 name="out_gate")(cin)
        ur = conv2d_fn(
            stacked,
            jnp.concatenate([ku, kr], axis=-1),
            bias=jnp.concatenate([bu, br]),
        )
        update = jax.nn.sigmoid(ur[..., : self.features])
        reset = jax.nn.sigmoid(ur[..., self.features:])
        out = jnp.tanh(conv2d_fn(
            jnp.concatenate([x, state * reset], axis=-1), ko, bias=bo
        ))
        new_state = state * (1.0 - update) + out * update
        return new_state, new_state

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        return jnp.zeros((batch, h, w, self.features), dtype)


class ConvRecurrent(nn.Module):
    """Vanilla conv-RNN: state = tanh(ff(x) + rec(h)); out = relu(out(state))
    (reference: submodules.py:421-451)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, state):
        ff = Conv2d(self.features, self.kernel_size, name="ff")(x)
        rec = Conv2d(self.features, self.kernel_size, name="rec")(state)
        new_state = jnp.tanh(ff + rec)
        out = jax.nn.relu(Conv2d(self.features, self.kernel_size, name="out")(new_state))
        return out, new_state

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        return jnp.zeros((batch, h, w, self.features), dtype)


class ConvLeakyRecurrent(nn.Module):
    """Conv-RNN with learnable per-channel leak
    (reference: submodules.py:454-499):
    s' = tanh(s*sigmoid(l) + (1-sigmoid(l))*(ff+rec)); out = relu(out(s'))."""

    features: int
    kernel_size: int
    activation: Optional[str] = None  # compat slot; must stay None
    leak: Tuple[float, float] = (-4.0, 0.1)
    learn_leak: bool = True

    @nn.compact
    def __call__(self, x, state):
        assert self.activation is None, (
            "ConvLeakyRecurrent activation cannot be set (submodules.py:483)"
        )
        ff = Conv2d(self.features, self.kernel_size, name="ff")(x)
        rec = Conv2d(self.features, self.kernel_size, name="rec")(state)
        leak_p = self.param("leak", _normal_init(*self.leak), (self.features,))
        if not self.learn_leak:
            # non-learned leaks are buffers in the reference; freezing via
            # stop_gradient keeps the param tree uniform
            leak_p = jax.lax.stop_gradient(leak_p)
        leak = jax.nn.sigmoid(leak_p).astype(ff.dtype)
        new_state = jnp.tanh(state * leak + (1.0 - leak) * (ff + rec))
        out = jax.nn.relu(Conv2d(self.features, self.kernel_size, name="out")(new_state))
        return out, new_state

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        return jnp.zeros((batch, h, w, self.features), dtype)


class ConvLeaky(nn.Module):
    """Feedforward leaky integrator with pre-activation residual injection
    (reference: submodules.py:502-554):
    s' = s*sigmoid(l) + (1-sigmoid(l))*(ff + residual); out = act(s')."""

    features: int
    kernel_size: int
    stride: int = 1
    activation: Optional[str] = "relu"
    leak: Tuple[float, float] = (-4.0, 0.1)
    learn_leak: bool = True
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x, state, residual=0.0):
        # the reference's ConvLeaky accepts a norm kwarg but never applies it
        # (submodules.py:516 — no norm_layer is built); same here
        ff = Conv2d(self.features, self.kernel_size, self.stride, name="ff")(x)
        leak_p = self.param("leak", _normal_init(*self.leak), (self.features,))
        if not self.learn_leak:
            leak_p = jax.lax.stop_gradient(leak_p)
        leak = jax.nn.sigmoid(leak_p).astype(ff.dtype)
        new_state = state * leak + (1.0 - leak) * (ff + residual)
        return resolve_activation(self.activation)(new_state), new_state

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        oh, ow = out_hw(h, w, self.stride)
        return jnp.zeros((batch, oh, ow, self.features), dtype)


class RecurrentConvLayer(nn.Module):
    """Strided ConvLayer -> {ConvLSTM|ConvGRU|ConvRecurrent}
    (reference: submodules.py:188-235)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    recurrent_block_type: str = "convlstm"
    activation_ff: Optional[str] = "relu"
    activation_rec: Optional[str] = None
    norm: Optional[str] = None

    def setup(self):
        assert self.recurrent_block_type in ("convlstm", "convgru", "convrnn")
        self.conv = ConvLayer(
            self.features,
            self.kernel_size,
            self.stride,
            activation=self.activation_ff,
            norm=self.norm,
        )
        # recurrent block kernel size is fixed to 3 in the reference
        # (submodules.py:226-228)
        if self.recurrent_block_type == "convlstm":
            self.recurrent_block = ConvLSTM(self.features, 3)
        elif self.recurrent_block_type == "convgru":
            self.recurrent_block = ConvGRU(self.features, 3)
        else:
            self.recurrent_block = ConvRecurrent(self.features, 3)

    def __call__(self, x, state):
        x = self.conv(x)
        return self.recurrent_block(x, state)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        oh, ow = out_hw(h, w, self.stride)
        if self.recurrent_block_type == "convlstm":
            return ConvLSTM(self.features, 3).zero_state(batch, oh, ow, dtype)
        return jnp.zeros((batch, oh, ow, self.features), dtype)


class LeakyResidualBlock(nn.Module):
    """Two ConvLeaky cells, residual into the 2nd cell's input current
    (reference: submodules.py:557-592)."""

    features: int
    activation: Optional[str] = "relu"
    leak: Tuple[float, float] = (-4.0, 0.1)
    learn_leak: bool = True

    def setup(self):
        kw = dict(leak=self.leak, learn_leak=self.learn_leak)
        self.conv1 = ConvLeaky(self.features, 3, 1, self.activation, **kw)
        self.conv2 = ConvLeaky(self.features, 3, 1, self.activation, **kw)

    def __call__(self, x, state):
        s1, s2 = state
        x1, s1 = self.conv1(x, s1)
        x2, s2 = self.conv2(x1, s2, residual=x)
        return x2, (s1, s2)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        s = jnp.zeros((batch, h, w, self.features), dtype)
        return (s, s)


class LeakyUpsampleConvLayer(nn.Module):
    """Bilinear x2 + ConvLeaky (reference: submodules.py:595-623)."""

    features: int
    kernel_size: int
    activation: Optional[str] = "relu"
    leak: Tuple[float, float] = (-4.0, 0.1)
    learn_leak: bool = True

    def setup(self):
        self.conv = ConvLeaky(
            self.features, self.kernel_size, 1, self.activation,
            leak=self.leak, learn_leak=self.learn_leak,
        )

    def __call__(self, x, state):
        return self.conv(upsample2x_bilinear(x), state)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        return jnp.zeros((batch, 2 * h, 2 * w, self.features), dtype)


class LeakyTransposedConvLayer(nn.Module):
    """Declared but unimplemented in the reference (submodules.py:626-641);
    kept as an explicit unsupported-config error (SURVEY.md §7 hard part 6)."""

    features: int
    kernel_size: int

    def __call__(self, *a, **k):
        raise NotImplementedError(
            "LeakyTransposedConvLayer is unsupported (matches reference)"
        )


class LeakyRecurrentConvLayer(nn.Module):
    """Strided ConvLeaky -> ConvLeakyRecurrent (reference: submodules.py:644-686)."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    activation_ff: Optional[str] = "relu"
    activation_rec: Optional[str] = None
    leak: Tuple[float, float] = (-4.0, 0.1)
    learn_leak: bool = True

    def setup(self):
        self.conv = ConvLeaky(
            self.features, self.kernel_size, self.stride, self.activation_ff,
            leak=self.leak, learn_leak=self.learn_leak,
        )
        self.recurrent_block = ConvLeakyRecurrent(
            self.features, self.kernel_size,
            leak=self.leak, learn_leak=self.learn_leak,
        )

    def __call__(self, x, state):
        s_ff, s_rec = state
        x1, s_ff = self.conv(x, s_ff)
        x2, s_rec = self.recurrent_block(x1, s_rec)
        return x2, (s_ff, s_rec)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        oh, ow = out_hw(h, w, self.stride)
        s = jnp.zeros((batch, oh, ow, self.features), dtype)
        return (s, s)
