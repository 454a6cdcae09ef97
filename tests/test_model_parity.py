"""Full-model forward parity against the reference PyTorch FireNet with
identical weights: recurrent multi-step agreement of the flow output."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)
torch = pytest.importorskip("torch")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, H, W, C = 2, 16, 16, 8


def _hwio(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def _vec(p):
    return jnp.asarray(p.detach().numpy().reshape(-1))


def _nhwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


def _gru_params(gru):
    return {
        "reset_gate": {"kernel": _hwio(gru.reset_gate.weight),
                       "bias": _vec(gru.reset_gate.bias)},
        "update_gate": {"kernel": _hwio(gru.update_gate.weight),
                        "bias": _vec(gru.update_gate.bias)},
        "out_gate": {"kernel": _hwio(gru.out_gate.weight),
                     "bias": _vec(gru.out_gate.bias)},
    }


def test_firenet_ann_multistep_parity():
    from models.model import FireNet as RefFireNet

    from event_flow_tpu.models.registry import get_model

    cfg = {
        "name": "FireNet", "encoding": "cnt", "round_encoding": False,
        "norm_input": False, "num_bins": 2, "base_num_channels": C,
        "kernel_size": 3, "activations": ["relu", None],
        "mask_output": True, "spiking_neuron": None,
    }
    torch.manual_seed(0)
    ref = RefFireNet(dict(cfg))
    ref.eval()

    model = get_model("FireNet", cfg)

    def conv_p(layer):
        return {"conv": {"kernel": _hwio(layer.conv2d.weight),
                         "bias": _vec(layer.conv2d.bias)}}

    params = {"params": {
        "head": conv_p(ref.head),
        "G1": _gru_params(ref.G1),
        "R1a": conv_p(ref.R1a),
        "R1b": conv_p(ref.R1b),
        "G2": _gru_params(ref.G2),
        "R2a": conv_p(ref.R2a),
        "R2b": conv_p(ref.R2b),
        "pred": conv_p(ref.pred),
    }}

    rng = np.random.default_rng(0)
    state = model.zero_state(B, H, W)
    ref.reset_states()
    for step in range(4):
        cnt = rng.normal(0, 1, (B, 2, H, W)).astype(np.float32)
        with torch.no_grad():
            out_t = ref(None, torch.from_numpy(cnt))
        out_j, state = model.apply(params, _nhwc(cnt) * 0, _nhwc(cnt), state)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(out_j["flow"][0]), -1, 1),
            out_t["flow"][0].numpy(),
            atol=1e-5,
            err_msg=f"flow diverges at step {step}",
        )


def test_lif_firenet_multistep_parity():
    from models.model import LIFFireNet as RefLIF

    from event_flow_tpu.models.registry import get_model

    snn = {
        "leak": [-4.0, 0.1], "thresh": [0.8, 0.1],
        "learn_leak": True, "learn_thresh": True, "hard_reset": True,
    }
    cfg = {
        "name": "LIFFireNet", "encoding": "cnt", "round_encoding": False,
        "norm_input": False, "num_bins": 2, "base_num_channels": C,
        "kernel_size": 3, "activations": ["arctanspike", "arctanspike"],
        "mask_output": True, "spiking_neuron": dict(snn),
    }
    torch.manual_seed(1)
    # reference FireNet variants share the class-level kwargs dict; build
    # with spiking params (model.py:159, :171-173)
    ref_cfg = dict(cfg)
    ref_cfg["spiking_neuron"] = dict(snn)
    ref = RefLIF(ref_cfg)
    ref.eval()

    model = get_model("LIFFireNet", cfg)

    def lif_p(cell):
        return {"ff": {"kernel": _hwio(cell.ff.weight)},
                "leak": _vec(cell.leak), "thresh": _vec(cell.thresh)}

    def lif_rec_p(cell):
        return {"ff": {"kernel": _hwio(cell.ff.weight)},
                "rec": {"kernel": _hwio(cell.rec.weight)},
                "leak": _vec(cell.leak), "thresh": _vec(cell.thresh)}

    params = {"params": {
        "head": lif_p(ref.head),
        "G1": lif_rec_p(ref.G1),
        "R1a": lif_p(ref.R1a),
        "R1b": lif_p(ref.R1b),
        "G2": lif_rec_p(ref.G2),
        "R2a": lif_p(ref.R2a),
        "R2b": lif_p(ref.R2b),
        "pred": {"conv": {"kernel": _hwio(ref.pred.conv2d.weight),
                          "bias": _vec(ref.pred.conv2d.bias)}},
    }}

    rng = np.random.default_rng(2)
    state = model.zero_state(B, H, W)
    ref.reset_states()
    for step in range(5):
        cnt = np.abs(rng.normal(0, 2, (B, 2, H, W))).astype(np.float32)
        with torch.no_grad():
            out_t = ref(None, torch.from_numpy(cnt))
        out_j, state = model.apply(params, _nhwc(cnt) * 0, _nhwc(cnt), state)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(out_j["flow"][0]), -1, 1),
            out_t["flow"][0].numpy(),
            atol=1e-5,
            err_msg=f"flow diverges at step {step}",
        )


def test_rec_evflownet_multistep_parity():
    from models.model import RecEVFlowNet as RefRec

    from event_flow_tpu.models.registry import get_model

    cfg = {
        "name": "RecEVFlowNet", "encoding": "cnt", "round_encoding": False,
        "norm_input": False, "num_bins": 2, "base_num_channels": 4,
        "kernel_size": 3, "activations": ["relu", None],
        "mask_output": True, "spiking_neuron": None,
    }
    torch.manual_seed(3)
    ref = RefRec(dict(cfg))
    ref.eval()
    unet = ref.multires_unetrec

    model = get_model("RecEVFlowNet", cfg)

    def conv2d_p(c):
        return {"kernel": _hwio(c.weight), "bias": _vec(c.bias)}

    p = {}
    for i, enc in enumerate(unet.encoders):
        p[f"encoders_{i}"] = {
            "conv": {"conv": conv2d_p(enc.conv.conv2d)},
            "recurrent_block": _gru_params(enc.recurrent_block),
        }
    for i, res in enumerate(unet.resblocks):
        p[f"resblocks_{i}"] = {"conv1": conv2d_p(res.conv1),
                               "conv2": conv2d_p(res.conv2)}
    for i, dec in enumerate(unet.decoders):
        p[f"decoders_{i}"] = {"conv": conv2d_p(dec.conv2d)}
    for i, pr in enumerate(unet.preds):
        p[f"preds_{i}"] = {"conv": conv2d_p(pr.conv2d)}
    params = {"params": {"unet": p}}

    rng = np.random.default_rng(4)
    state = model.zero_state(B, H, W)
    ref.reset_states()
    for step in range(3):
        cnt = rng.normal(0, 1, (B, 2, H, W)).astype(np.float32)
        with torch.no_grad():
            out_t = ref(None, torch.from_numpy(cnt))
        out_j, state = model.apply(params, _nhwc(cnt) * 0, _nhwc(cnt), state)
        # all 4 scales, upsampled to full res, must agree
        for s in range(4):
            np.testing.assert_allclose(
                np.moveaxis(np.asarray(out_j["flow"][s]), -1, 1),
                out_t["flow"][s].numpy(),
                atol=1e-5,
                err_msg=f"scale {s} diverges at step {step}",
            )


def test_e2vid_multistep_parity():
    from models.model import E2VID as RefE2VID

    from event_flow_tpu.models.registry import get_model

    cfg = {
        "name": "E2VID", "encoding": "cnt", "round_encoding": False,
        "norm_input": False, "num_bins": 2, "base_num_channels": 4,
        "kernel_size": 3, "activations": ["relu", None],
        "mask_output": True, "spiking_neuron": None,
    }
    torch.manual_seed(5)
    ref = RefE2VID(dict(cfg))
    ref.eval()
    unet = ref.unetrecurrent

    model = get_model("E2VID", cfg)

    def conv2d_p(c):
        return {"kernel": _hwio(c.weight), "bias": _vec(c.bias)}

    p = {"head": {"conv": conv2d_p(unet.head.conv2d)}}
    for i, enc in enumerate(unet.encoders):
        # reference ConvLSTM packs all gates into one conv in i,r,o,g order
        # (submodules.py:331, :360) — same packing here
        p[f"encoders_{i}"] = {
            "conv": {"conv": conv2d_p(enc.conv.conv2d)},
            "recurrent_block": {"gates": conv2d_p(enc.recurrent_block.Gates)},
        }
    for i, res in enumerate(unet.resblocks):
        p[f"resblocks_{i}"] = {"conv1": conv2d_p(res.conv1),
                               "conv2": conv2d_p(res.conv2)}
    for i, dec in enumerate(unet.decoders):
        p[f"decoders_{i}"] = {"conv": conv2d_p(dec.conv2d)}
    p["pred"] = {"conv": conv2d_p(unet.pred.conv2d)}
    params = {"params": {"unet": p}}

    rng = np.random.default_rng(6)
    state = model.zero_state(B, H, W)
    ref.reset_states()
    for step in range(3):
        cnt = rng.normal(0, 1, (B, 2, H, W)).astype(np.float32)
        with torch.no_grad():
            out_t = ref(None, torch.from_numpy(cnt))
        out_j, state = model.apply(params, _nhwc(cnt) * 0, _nhwc(cnt), state)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(out_j["flow"][0]), -1, 1),
            out_t["flow"][0].numpy(),
            atol=1e-5,
            err_msg=f"E2VID flow diverges at step {step}",
        )
