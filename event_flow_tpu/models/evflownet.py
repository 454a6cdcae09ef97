"""Model-level wrappers for the UNet families: EVFlowNet, RecEVFlowNet
(+ spiking / leaky / RNN variants), E2VID.

TPU-native rebuild of the reference model classes
(reference: models/model.py:29-145 E2VID, :289-395 EVFlowNet,
:412-547 RecEVFlowNet, :550-611 variants). Shared forward contract with
FireNet: ``(voxel, cnt, state, log) -> ({"flow": [...], "activity"}, state)``
with every flow upsampled to the highest-resolution prediction's size with
nearest-neighbor interpolation (model.py:377-388; torch F.interpolate's
default mode).
"""

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_nearest
from .firenet import _norm_nonzero, _select_encoding
from .unet import (
    LeakyMultiResUNetRecurrent,
    MultiResUNet,
    MultiResUNetRecurrent,
    SpikingMultiResUNetRecurrent,
    UNetRecurrent,
)

__all__ = ["UNetFlowModel", "UNET_VARIANTS", "make_unet_model"]

# name -> (unet class, num_encoders, num_residual_blocks, skip_type,
#          recurrent_block_type, spiking_ff_type)
# (reference: models/model.py EVFlowNet_kwargs / RecEVFlowNet_kwargs /
#  E2VID_kwargs blocks)
UNET_VARIANTS = {
    "EVFlowNet": (MultiResUNet, 4, 2, "concat", None, None),
    "RecEVFlowNet": (MultiResUNetRecurrent, 4, 2, "concat", "convgru", None),
    "RNNRecEVFlowNet": (MultiResUNetRecurrent, 4, 2, "concat", "convrnn", None),
    "LeakyRecEVFlowNet": (LeakyMultiResUNetRecurrent, 4, 2, "concat",
                          "convleaky", None),
    "SpikingRecEVFlowNet": (SpikingMultiResUNetRecurrent, 4, 2, "concat",
                            "lif", "lif"),
    "PLIFRecEVFlowNet": (SpikingMultiResUNetRecurrent, 4, 2, "concat",
                         "plif", "plif"),
    "ALIFRecEVFlowNet": (SpikingMultiResUNetRecurrent, 4, 2, "concat",
                         "alif", "alif"),
    "XLIFRecEVFlowNet": (SpikingMultiResUNetRecurrent, 4, 2, "concat",
                         "xlif", "xlif"),
    "E2VID": (UNetRecurrent, 3, 2, "sum", "convlstm", None),
}


class UNetFlowModel(nn.Module):
    """Encoding selection + input norm + UNet + multi-res flow upsampling."""

    unet_cls: type
    unet_fields: dict
    encoding: str = "cnt"
    num_bins: int = 2
    norm_input: bool = False
    mask_output: bool = True
    stateless: bool = False

    def setup(self):
        self.unet = self.unet_cls(**self.unet_fields)

    def __call__(self, event_voxel, event_cnt, state, log=False):
        if log:
            # parity with the reference (model.py:135-136, :371-372, :522-524)
            raise NotImplementedError("Activity logging not implemented")
        x = _select_encoding(self.encoding, self.num_bins, event_voxel,
                             event_cnt)
        if self.norm_input:
            x = _norm_nonzero(x)
        if self.stateless:
            preds = self.unet(x)
        else:
            preds, state = self.unet(x, state)
        full = preds[-1].shape[1:3]
        flow_list = [
            p if p.shape[1:3] == full else resize_nearest(p, full)
            for p in preds
        ]
        return {"flow": flow_list, "activity": None}, state

    @nn.nowrap
    def zero_state(self, batch, h, w, dtype=jnp.float32):
        if self.stateless:
            return ()
        return self.unet_cls(**self.unet_fields).zero_state(batch, h, w, dtype)


def make_unet_model(name, model_cfg):
    """Build a UNet-family model from a reference-schema model config."""
    unet_cls, n_enc, n_res, skip, rec_type, ff_type = UNET_VARIANTS[name]
    neuron_kwargs = {
        k: tuple(v) if isinstance(v, list) else v
        for k, v in dict(model_cfg.get("spiking_neuron") or {}).items()
    }
    activations = tuple(model_cfg.get("activations", ("relu", None)))
    unet_fields = dict(
        base_num_channels=model_cfg.get("base_num_channels", 32),
        num_encoders=n_enc,
        num_residual_blocks=n_res,
        num_output_channels=2,
        skip_type=skip,
        norm=model_cfg.get("norm"),
        use_upsample_conv=model_cfg.get("use_upsample_conv", True),
        num_bins=model_cfg["num_bins"],
        kernel_size=model_cfg.get("kernel_size", 3),
        channel_multiplier=2,
        ff_act=activations[0],
        rec_act=activations[1] if len(activations) > 1 else None,
        final_activation="tanh",
        recurrent_block_type=rec_type,
        spiking_feedforward_block_type=ff_type,
        neuron_kwargs=neuron_kwargs,
    )
    return UNetFlowModel(
        unet_cls=unet_cls,
        unet_fields=unet_fields,
        encoding=model_cfg.get("encoding", "cnt"),
        num_bins=model_cfg["num_bins"],
        norm_input=model_cfg.get("norm_input", False),
        mask_output=model_cfg.get("mask_output", True),
        stateless=(unet_cls is MultiResUNet),
    )
