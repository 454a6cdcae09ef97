"""UNet machinery: MultiResUNet (EV-FlowNet), recurrent / spiking / leaky
variants, and UNetRecurrent (E2VID).

TPU-native rebuild of the reference UNets (reference: models/unet.py).
Channel schedule ``base * multiplier^i`` (unet.py:83-89); stride-2
encoders; residual bottleneck; x2-upsampling decoders; multi-resolution
flow predictions concatenated into the next decoder's input
(unet.py:302-311). All layouts NHWC; input channel counts are inferred by
flax, so only output features are specified.

State is explicit: recurrent variants are ``(x, state) -> (preds, state)``
with ``zero_state(batch, h, w)`` building the exact static-shape pytree the
reference lazily zero-initializes (unet.py:333, :435).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .cells import (
    ConvLayer,
    LeakyResidualBlock,
    LeakyRecurrentConvLayer,
    LeakyTransposedConvLayer,
    LeakyUpsampleConvLayer,
    RecurrentConvLayer,
    ResidualBlock,
    TransposedConvLayer,
    UpsampleConvLayer,
)
from .conv import out_hw
from .model_util import get_skip_fn
from .snn_cells import (
    SpikingRecurrentConvLayer,
    SpikingResidualBlock,
    SpikingTransposedConvLayer,
    SpikingUpsampleConvLayer,
)

__all__ = [
    "MultiResUNet",
    "MultiResUNetRecurrent",
    "SpikingMultiResUNetRecurrent",
    "LeakyMultiResUNetRecurrent",
    "UNetRecurrent",
]


def _enc_dims(h, w, num_encoders):
    """Spatial dims after each stride-2 encoder (torch k//2-padding)."""
    dims = []
    for _ in range(num_encoders):
        h, w = out_hw(h, w, 2)
        dims.append((h, w))
    return dims


class _UNetBase(nn.Module):
    """Shared config (reference: unet.py:28-89)."""

    base_num_channels: int
    num_encoders: int
    num_residual_blocks: int
    num_output_channels: int
    skip_type: str
    norm: Optional[str]
    use_upsample_conv: bool
    num_bins: int
    kernel_size: int = 5
    channel_multiplier: int = 2
    ff_act: Optional[str] = "relu"
    rec_act: Optional[str] = None
    final_activation: Optional[str] = None
    recurrent_block_type: Optional[str] = None
    spiking_feedforward_block_type: Optional[str] = None
    neuron_kwargs: Optional[dict] = None
    w_scale_pred: Optional[float] = None

    @property
    def encoder_output_sizes(self):
        return [
            int(self.base_num_channels * self.channel_multiplier ** (i + 1))
            for i in range(self.num_encoders)
        ]

    @property
    def decoder_output_sizes(self):
        return [
            int(self.base_num_channels * self.channel_multiplier ** i)
            for i in reversed(range(self.num_encoders))
        ]

    @property
    def max_num_channels(self):
        return self.encoder_output_sizes[-1]

    @property
    def skip_fn(self):
        return get_skip_fn(self.skip_type)


class MultiResUNet(_UNetBase):
    """Stateless EV-FlowNet topology (reference: unet.py:224-311):
    4 stride-2 encoders, 2 resblocks, per-scale predictions concatenated
    into the next decoder input. Returns predictions low-res -> high-res."""

    def setup(self):
        if not self.use_upsample_conv:
            up = TransposedConvLayer
        else:
            up = UpsampleConvLayer
        self.encoders = [
            ConvLayer(
                feats, self.kernel_size, stride=2, activation=self.ff_act,
                norm=self.norm,
            )
            for feats in self.encoder_output_sizes
        ]
        self.resblocks = [
            ResidualBlock(self.max_num_channels, activation=self.ff_act,
                          norm=self.norm)
            for _ in range(self.num_residual_blocks)
        ]
        self.decoders = [
            up(feats, self.kernel_size, activation=self.ff_act, norm=self.norm)
            for feats in self.decoder_output_sizes
        ]
        self.preds = [
            ConvLayer(self.num_output_channels, 1,
                      activation=self.final_activation, norm=self.norm)
            for _ in range(self.num_encoders)
        ]

    def __call__(self, x):
        blocks = []
        for enc in self.encoders:
            x = enc(x)
            blocks.append(x)
        for res in self.resblocks:
            x = res(x)
        predictions = []
        for i, (dec, pred) in enumerate(zip(self.decoders, self.preds)):
            x = self.skip_fn(x, blocks[self.num_encoders - i - 1])
            if i > 0:
                x = self.skip_fn(predictions[-1], x)
            x = dec(x)
            predictions.append(pred(x))
        return predictions


class MultiResUNetRecurrent(_UNetBase):
    """EV-FlowNet with recurrent encoders (reference: unet.py:314-415);
    state = tuple over encoders of the recurrent-block state."""

    def setup(self):
        up = UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer
        self.encoders = [
            RecurrentConvLayer(
                feats, self.kernel_size, stride=2,
                recurrent_block_type=self.recurrent_block_type,
                activation_ff=self.ff_act, activation_rec=self.rec_act,
                norm=self.norm,
            )
            for feats in self.encoder_output_sizes
        ]
        self.resblocks = [
            ResidualBlock(self.max_num_channels, activation=self.ff_act,
                          norm=self.norm)
            for _ in range(self.num_residual_blocks)
        ]
        self.decoders = [
            up(feats, self.kernel_size, activation=self.ff_act, norm=self.norm)
            for feats in self.decoder_output_sizes
        ]
        self.preds = [
            ConvLayer(self.num_output_channels, 1,
                      activation=self.final_activation, norm=self.norm,
                      w_scale=self.w_scale_pred)
            for _ in range(self.num_encoders)
        ]

    def __call__(self, x, state):
        state = list(state)
        blocks = []
        for i, enc in enumerate(self.encoders):
            x, state[i] = enc(x, state[i])
            blocks.append(x)
        for res in self.resblocks:
            x = res(x)
        predictions = []
        for i, (dec, pred) in enumerate(zip(self.decoders, self.preds)):
            x = self.skip_fn(x, blocks[self.num_encoders - i - 1])
            if i > 0:
                x = self.skip_fn(predictions[-1], x)
            x = dec(x)
            predictions.append(pred(x))
        return predictions, tuple(state)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        dims = _enc_dims(h, w, self.num_encoders)
        states = []
        for feats, (eh, ew) in zip(self.encoder_output_sizes, dims):
            s = jnp.zeros((batch, eh, ew, feats), dtype)
            if self.recurrent_block_type == "convlstm":
                states.append((s, s))
            else:
                states.append(s)
        return tuple(states)


class SpikingMultiResUNetRecurrent(_UNetBase):
    """All-spiking EV-FlowNet (reference: unet.py:418-465): spiking
    recurrent encoders, spiking resblocks, spiking upsample decoders;
    state = encoders + resblocks + decoders
    (num_states = 2*num_encoders + num_residual_blocks, unet.py:434,
    counting each encoder's (ff, rec) pair as two)."""

    def setup(self):
        kw = dict(self.neuron_kwargs or {})
        ff_type = self.spiking_feedforward_block_type or "lif"
        self.encoders = [
            SpikingRecurrentConvLayer(
                feats, self.kernel_size, stride=2,
                recurrent_block_type=self.recurrent_block_type or "lif",
                activation_ff=self.ff_act, activation_rec=self.rec_act,
                neuron_kwargs=kw,
            )
            for feats in self.encoder_output_sizes
        ]
        self.resblocks = [
            SpikingResidualBlock(
                self.max_num_channels,
                spiking_feedforward_block_type=ff_type,
                activation=self.ff_act, neuron_kwargs=kw,
            )
            for _ in range(self.num_residual_blocks)
        ]
        if not self.use_upsample_conv:
            self.decoders = [
                SpikingTransposedConvLayer(feats, self.kernel_size)
                for feats in self.decoder_output_sizes
            ]
        else:
            self.decoders = [
                SpikingUpsampleConvLayer(
                    feats, self.kernel_size,
                    spiking_feedforward_block_type=ff_type,
                    activation=self.ff_act, neuron_kwargs=kw,
                )
                for feats in self.decoder_output_sizes
            ]
        self.preds = [
            ConvLayer(self.num_output_channels, 1,
                      activation=self.final_activation, norm=self.norm,
                      w_scale=0.01)
            for _ in range(self.num_encoders)
        ]

    def __call__(self, x, state):
        state = list(state)
        ne, nr = self.num_encoders, self.num_residual_blocks
        blocks = []
        for i, enc in enumerate(self.encoders):
            x, state[i] = enc(x, state[i])
            blocks.append(x)
        for i, res in enumerate(self.resblocks):
            x, state[ne + i] = res(x, state[ne + i])
        predictions = []
        off = ne + nr
        for i, (dec, pred) in enumerate(zip(self.decoders, self.preds)):
            x = self.skip_fn(x, blocks[ne - i - 1])
            if i > 0:
                x = self.skip_fn(predictions[-1], x)
            x, state[off + i] = dec(x, state[off + i])
            predictions.append(pred(x))
        return predictions, tuple(state)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        kw = dict(self.neuron_kwargs or {})
        ff_type = self.spiking_feedforward_block_type or "lif"
        dims = _enc_dims(h, w, self.num_encoders)
        states = []
        for i, feats in enumerate(self.encoder_output_sizes):
            enc = SpikingRecurrentConvLayer(
                feats, self.kernel_size, stride=2,
                recurrent_block_type=self.recurrent_block_type or "lif",
                activation_ff=self.ff_act, activation_rec=self.rec_act,
                neuron_kwargs=kw,
            )
            # zero_state takes the encoder's INPUT dims; stride-2 halves them
            states.append(enc.zero_state(batch, *self._in_dims(h, w, i), dtype))
        bh, bw = dims[-1]
        for _ in range(self.num_residual_blocks):
            res = SpikingResidualBlock(
                self.max_num_channels,
                spiking_feedforward_block_type=ff_type,
                activation=self.ff_act, neuron_kwargs=kw,
            )
            states.append(res.zero_state(batch, bh, bw, dtype))
        for i, feats in enumerate(self.decoder_output_sizes):
            dh, dw = dims[self.num_encoders - 1 - i]
            dec = SpikingUpsampleConvLayer(
                feats, self.kernel_size,
                spiking_feedforward_block_type=ff_type,
                activation=self.ff_act, neuron_kwargs=kw,
            )
            states.append(dec.zero_state(batch, dh, dw, dtype))
        return tuple(states)

    @nn.nowrap
    def _in_dims(self, h, w, enc_index):
        """Input spatial dims of encoder ``enc_index``."""
        for _ in range(enc_index):
            h, w = out_hw(h, w, 2)
        return h, w


class LeakyMultiResUNetRecurrent(_UNetBase):
    """Leaky-cell variant of the spiking UNet (reference: unet.py:468-479)."""

    def setup(self):
        kw = dict(self.neuron_kwargs or {})
        self.encoders = [
            LeakyRecurrentConvLayer(
                feats, self.kernel_size, stride=2,
                activation_ff=self.ff_act, activation_rec=self.rec_act, **kw,
            )
            for feats in self.encoder_output_sizes
        ]
        self.resblocks = [
            LeakyResidualBlock(self.max_num_channels, activation=self.ff_act,
                               **kw)
            for _ in range(self.num_residual_blocks)
        ]
        if not self.use_upsample_conv:
            self.decoders = [
                LeakyTransposedConvLayer(feats, self.kernel_size)
                for feats in self.decoder_output_sizes
            ]
        else:
            self.decoders = [
                LeakyUpsampleConvLayer(feats, self.kernel_size,
                                       activation=self.ff_act, **kw)
                for feats in self.decoder_output_sizes
            ]
        self.preds = [
            ConvLayer(self.num_output_channels, 1,
                      activation=self.final_activation, norm=self.norm,
                      w_scale=0.01)
            for _ in range(self.num_encoders)
        ]

    def __call__(self, x, state):
        state = list(state)
        ne, nr = self.num_encoders, self.num_residual_blocks
        blocks = []
        for i, enc in enumerate(self.encoders):
            x, state[i] = enc(x, state[i])
            blocks.append(x)
        for i, res in enumerate(self.resblocks):
            x, state[ne + i] = res(x, state[ne + i])
        predictions = []
        off = ne + nr
        for i, (dec, pred) in enumerate(zip(self.decoders, self.preds)):
            x = self.skip_fn(x, blocks[ne - i - 1])
            if i > 0:
                x = self.skip_fn(predictions[-1], x)
            x, state[off + i] = dec(x, state[off + i])
            predictions.append(pred(x))
        return predictions, tuple(state)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        dims = _enc_dims(h, w, self.num_encoders)
        states = []
        for feats, (eh, ew) in zip(self.encoder_output_sizes, dims):
            s = jnp.zeros((batch, eh, ew, feats), dtype)
            states.append((s, s))
        bh, bw = dims[-1]
        for _ in range(self.num_residual_blocks):
            s = jnp.zeros((batch, bh, bw, self.max_num_channels), dtype)
            states.append((s, s))
        for i, feats in enumerate(self.decoder_output_sizes):
            dh, dw = dims[self.num_encoders - 1 - i]
            states.append(jnp.zeros((batch, 2 * dh, 2 * dw, feats), dtype))
        return tuple(states)


class UNetRecurrent(_UNetBase):
    """E2VID topology (reference: unet.py:148-221): head conv, ConvLSTM
    encoders, resblocks, skip_sum decoders, final tanh; state = encoders."""

    def setup(self):
        up = UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer
        self.head = ConvLayer(
            self.base_num_channels, self.kernel_size, stride=1,
        )
        self.encoders = [
            RecurrentConvLayer(
                feats, self.kernel_size, stride=2,
                recurrent_block_type=self.recurrent_block_type,
                activation_ff=self.ff_act, activation_rec=self.rec_act,
                norm=self.norm,
            )
            for feats in self.encoder_output_sizes
        ]
        self.resblocks = [
            ResidualBlock(self.max_num_channels, activation=self.ff_act,
                          norm=self.norm)
            for _ in range(self.num_residual_blocks)
        ]
        self.decoders = [
            up(feats, self.kernel_size, activation=self.ff_act, norm=self.norm)
            for feats in self.decoder_output_sizes
        ]
        self.pred = ConvLayer(self.num_output_channels, 1, activation=None,
                              norm=self.norm)

    def __call__(self, x, state):
        from .cells import resolve_activation

        state = list(state)
        x = self.head(x)
        head = x
        blocks = []
        for i, enc in enumerate(self.encoders):
            x, state[i] = enc(x, state[i])
            blocks.append(x)
        for res in self.resblocks:
            x = res(x)
        for i, dec in enumerate(self.decoders):
            x = dec(self.skip_fn(x, blocks[self.num_encoders - i - 1]))
        img = self.pred(self.skip_fn(x, head))
        if self.final_activation is not None:
            img = resolve_activation(self.final_activation)(img)
        return [img], tuple(state)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        dims = _enc_dims(h, w, self.num_encoders)
        states = []
        for feats, (eh, ew) in zip(self.encoder_output_sizes, dims):
            s = jnp.zeros((batch, eh, ew, feats), dtype)
            if self.recurrent_block_type == "convlstm":
                states.append((s, s))
            else:
                states.append(s)
        return tuple(states)
