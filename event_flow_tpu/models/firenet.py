"""FireNet model family (ANN, leaky, and spiking variants).

TPU-native rebuild of the reference FireNet architectures
(reference: models/model.py:148-286 and subclasses :398-409, :614-705).
7-unit recurrent pipeline: head -> G1(rec) -> R1a -> R1b -> G2(rec) -> R2a
-> R2b -> 1x1 tanh prediction; single full-resolution flow output.

Functional contract (replaces the reference's module-held ``self._states``):
    out, new_state = model.apply(params, voxel, cnt, state, log=False)
    out = {"flow": [B x H x W x 2 (x, y)], "activity": dict | None}
``state`` is a 7-tuple of per-cell state pytrees; ``model.zero_state(B,H,W)``
replaces ``reset_states`` (model.py:223-224) and ``detach_states``
(model.py:211-221) becomes ``jax.lax.stop_gradient`` on the carry between
truncated-BPTT segments.
"""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .cells import (
    ConvGRU,
    ConvLayer,
    ConvLayerS,
    ConvLeaky,
    ConvLeakyRecurrent,
    ConvRecurrent,
)
from .snn_cells import (
    ConvALIF,
    ConvALIFRecurrent,
    ConvLIF,
    ConvLIFRecurrent,
    ConvPLIF,
    ConvPLIFRecurrent,
    ConvXLIF,
    ConvXLIFRecurrent,
)

__all__ = ["FireNet", "FIRENET_VARIANTS", "make_firenet"]


def _norm_nonzero(x):
    """Normalize nonzero entries to zero mean / unit std across the whole
    tensor (reference: model.py:247-252). Statistics accumulate in f32
    (whole-tensor sums overflow bf16's 8-bit mantissa)."""
    xf = x.astype(jnp.float32)
    mask = (xf != 0).astype(jnp.float32)
    n = jnp.maximum(mask.sum(), 1.0)
    mean = (xf * mask).sum() / n
    var = (((xf - mean) * mask) ** 2).sum() / jnp.maximum(n - 1.0, 1.0)
    std = jnp.sqrt(var)
    return jnp.where(
        mask > 0, (xf - mean) / jnp.maximum(std, 1e-9), xf
    ).astype(x.dtype)


def _select_encoding(encoding, num_bins, event_voxel, event_cnt):
    if encoding == "voxel":
        return event_voxel
    if encoding == "cnt" and num_bins == 2:
        return event_cnt
    raise ValueError(f"Incorrect input encoding {encoding!r}/{num_bins}")


class FireNet(nn.Module):
    """Configurable FireNet; the variant table below instantiates the
    reference's subclasses (head/ff/rec neuron classes, model.py:148-159)."""

    num_bins: int
    base_num_channels: int = 32
    kernel_size: int = 3
    encoding: str = "cnt"
    norm_input: bool = False
    mask_output: bool = True
    activations: Sequence[Optional[str]] = ("relu", None)
    head_neuron: type = ConvLayerS
    ff_neuron: type = ConvLayerS
    rec_neuron: type = ConvGRU
    residual: bool = False
    w_scale_pred: Optional[float] = None
    neuron_kwargs: Optional[dict] = None

    num_recurrent_units = 7

    def _make_ff(self, cls, features):
        kw = dict(self.neuron_kwargs or {})
        return cls(features, self.kernel_size, activation=self.activations[0], **kw)

    def _make_rec(self, features):
        kw = dict(self.neuron_kwargs or {})
        if self.rec_neuron in (ConvGRU, ConvRecurrent):
            # plain recurrent blocks take no activation/neuron kwargs
            # (reference asserts activation is None, submodules.py:391)
            return self.rec_neuron(features, self.kernel_size)
        return self.rec_neuron(
            features, self.kernel_size, activation=self.activations[1], **kw
        )

    def setup(self):
        c = self.base_num_channels
        self.head = self._make_ff(self.head_neuron, c)
        self.G1 = self._make_rec(c)
        self.R1a = self._make_ff(self.ff_neuron, c)
        self.R1b = self._make_ff(self.ff_neuron, c)
        self.G2 = self._make_rec(c)
        self.R2a = self._make_ff(self.ff_neuron, c)
        self.R2b = self._make_ff(self.ff_neuron, c)
        self.pred = ConvLayer(
            2, 1, activation="tanh", w_scale=self.w_scale_pred
        )

    def __call__(self, event_voxel, event_cnt, state, log=False):
        x = _select_encoding(self.encoding, self.num_bins, event_voxel, event_cnt)
        if self.norm_input:
            x = _norm_nonzero(x)

        s = list(state)
        x1, s[0] = self.head(x, s[0])
        x2, s[1] = self.G1(x1, s[1])
        x3, s[2] = self.R1a(x2, s[2])
        x4, s[3] = self.R1b(x3, s[3], residual=x2 if self.residual else 0.0)
        x5, s[4] = self.G2(x4, s[4])
        x6, s[5] = self.R2a(x5, s[5])
        x7, s[6] = self.R2b(x6, s[6], residual=x5 if self.residual else 0.0)
        flow = self.pred(x7)

        activity = None
        if log:
            names = ["0:input", "1:head", "2:G1", "3:R1a", "4:R1b", "5:G2",
                     "6:R2a", "7:R2b", "8:pred"]
            tensors = [x, x1, x2, x3, x4, x5, x6, x7, flow]
            activity = {
                n: (t != 0).astype(jnp.float32).mean()
                for n, t in zip(names, tensors)
            }
        return {"flow": [flow], "activity": activity}, tuple(s)

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        c = self.base_num_channels
        kw = dict(self.neuron_kwargs or {})
        ff_act, rec_act = self.activations

        def ff_cell():
            return self.ff_neuron(c, self.kernel_size, activation=ff_act, **kw)

        def rec_cell():
            if self.rec_neuron in (ConvGRU, ConvRecurrent):
                return self.rec_neuron(c, self.kernel_size)
            return self.rec_neuron(c, self.kernel_size, activation=rec_act, **kw)

        cells = [
            self.head_neuron(c, self.kernel_size, activation=ff_act, **kw),
            rec_cell(), ff_cell(), ff_cell(), rec_cell(), ff_cell(), ff_cell(),
        ]
        return tuple(cell.zero_state(batch, h, w, dtype) for cell in cells)


# variant table: name -> (head, ff, rec, residual, w_scale_pred)
# (reference: models/model.py:148-159, 398-409, 614-705)
FIRENET_VARIANTS = {
    "FireNet": (ConvLayerS, ConvLayerS, ConvGRU, False, None),
    "RNNFireNet": (ConvLayerS, ConvLayerS, ConvRecurrent, False, None),
    "LeakyFireNet": (ConvLeaky, ConvLeaky, ConvLeakyRecurrent, False, None),
    "FireFlowNet": (ConvLayerS, ConvLayerS, ConvLayerS, False, 0.01),
    "LeakyFireFlowNet": (ConvLeaky, ConvLeaky, ConvLeaky, False, None),
    "LIFFireNet": (ConvLIF, ConvLIF, ConvLIFRecurrent, False, 0.01),
    "PLIFFireNet": (ConvPLIF, ConvPLIF, ConvPLIFRecurrent, False, 0.01),
    "ALIFFireNet": (ConvALIF, ConvALIF, ConvALIFRecurrent, False, 0.01),
    "XLIFFireNet": (ConvXLIF, ConvXLIF, ConvXLIFRecurrent, False, 0.01),
    "LIFFireFlowNet": (ConvLIF, ConvLIF, ConvLIF, False, 0.01),
}


def make_firenet(name, model_cfg):
    """Build a FireNet variant from a reference-schema model config dict
    (configs/train_SNN.yml model+spiking_neuron blocks)."""
    head, ff, rec, residual, w_scale_pred = FIRENET_VARIANTS[name]
    neuron_kwargs = dict(model_cfg.get("spiking_neuron") or {})
    # YAML lists -> tuples for hashable module fields
    neuron_kwargs = {
        k: tuple(v) if isinstance(v, list) else v
        for k, v in neuron_kwargs.items()
    }
    return FireNet(
        num_bins=model_cfg["num_bins"],
        base_num_channels=model_cfg.get("base_num_channels", 32),
        kernel_size=model_cfg.get("kernel_size", 3),
        encoding=model_cfg.get("encoding", "cnt"),
        norm_input=model_cfg.get("norm_input", False),
        mask_output=model_cfg.get("mask_output", True),
        activations=tuple(model_cfg.get("activations", ("relu", None))),
        head_neuron=head,
        ff_neuron=ff,
        rec_neuron=rec,
        residual=residual,
        w_scale_pred=w_scale_pred,
        neuron_kwargs=neuron_kwargs,
    )
