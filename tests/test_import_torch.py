"""tools/import_torch.py: reference torch checkpoint -> flax params.

Covers all 19 model classes (strict, shape-complete import from the real
reference models' state_dicts), forward parity through the importer for
representative recurrent models, and the MLflow artifact-directory layout
(reference: utils/utils.py:8-25)."""

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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.import_torch import (  # noqa: E402
    import_torch_checkpoint,
    load_torch_state_dict,
    state_dict_to_params,
)

ALL_MODELS = [
    "FireNet", "RNNFireNet", "LeakyFireNet", "FireFlowNet",
    "LeakyFireFlowNet", "LIFFireNet", "PLIFFireNet", "ALIFFireNet",
    "XLIFFireNet", "LIFFireFlowNet", "E2VID", "EVFlowNet", "RecEVFlowNet",
    "SpikingRecEVFlowNet", "PLIFRecEVFlowNet", "ALIFRecEVFlowNet",
    "XLIFRecEVFlowNet", "RNNRecEVFlowNet", "LeakyRecEVFlowNet",
]

BASE = {
    "encoding": "cnt", "round_encoding": False, "norm_input": False,
    "num_bins": 2, "base_num_channels": 4, "kernel_size": 3,
    "mask_output": True,
}


def _cfg_for(name):
    cfg = dict(BASE, name=name)
    if "PLIF" in name:
        cfg["activations"] = ["arctanspike", "arctanspike"]
        cfg["spiking_neuron"] = {
            "leak_v": [-4.0, 0.1], "leak_pt": [-4.0, 0.1],
            "add_pt": [-2.0, 0.1], "thresh": [0.8, 0.1],
            "learn_leak": True, "learn_thresh": True, "hard_reset": True,
        }
    elif "ALIF" in name:
        cfg["activations"] = ["arctanspike", "arctanspike"]
        cfg["spiking_neuron"] = {
            "leak_v": [-4.0, 0.1], "leak_t": [-4.0, 0.1],
            "learn_leak": True, "learn_thresh": False, "hard_reset": False,
        }
    elif "XLIF" in name:
        cfg["activations"] = ["arctanspike", "arctanspike"]
        cfg["spiking_neuron"] = {
            "leak_v": [-4.0, 0.1], "leak_pt": [-4.0, 0.1],
            "learn_leak": True, "learn_thresh": False, "hard_reset": False,
        }
    elif "LIF" in name or "Spiking" in name:
        cfg["activations"] = ["arctanspike", "arctanspike"]
        cfg["spiking_neuron"] = {
            "leak": [-4.0, 0.1], "thresh": [0.8, 0.1],
            "learn_leak": True, "learn_thresh": True, "hard_reset": True,
        }
    elif "Leaky" in name:
        cfg["activations"] = ["relu", None]
        cfg["spiking_neuron"] = {"leak": [-4.0, 0.1], "learn_leak": True}
    else:
        cfg["activations"] = ["relu", None]
        cfg["spiking_neuron"] = None
    return cfg


def _ref_model(name, cfg, seed=0):
    import models.model as ref_models

    cls = getattr(ref_models, name)
    # the reference FireNet family mutates a CLASS-level shared kwargs list
    # (model.py:159, :171-173) — reset it so models built earlier in this
    # process don't leak neuron kwargs into ANN variants
    for klass in cls.__mro__:
        if "kwargs" in vars(klass):
            klass.kwargs = [{} for _ in klass.kwargs]
    torch.manual_seed(seed)
    m = cls(dict(cfg))
    m.eval()
    return m


@pytest.mark.parametrize("name", ALL_MODELS)
def test_strict_import_all_models(name, tmp_path):
    cfg = _cfg_for(name)
    ref = _ref_model(name, cfg)
    path = tmp_path / "sd.pth"
    torch.save(ref.state_dict(), str(path))
    params = import_torch_checkpoint(str(path), name, cfg, res=(16, 16))
    # strict import covered every leaf; spot-check a kernel actually moved
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in leaves)
    n_torch = sum(
        v.numel() for k, v in ref.state_dict().items()
        if not k.endswith(("act_width", "num_batches_tracked",
                           "running_mean", "running_var"))
    )
    n_flax = sum(np.asarray(v).size for v in leaves)
    assert n_torch == n_flax, f"{name}: {n_torch} torch vs {n_flax} flax"


@pytest.mark.parametrize("name", ["LIFFireNet", "RecEVFlowNet", "E2VID"])
def test_forward_parity_through_importer(name, tmp_path):
    import jax.numpy as jnp

    from event_flow_tpu.models.registry import get_model

    B, H, W = 2, 16, 16
    cfg = _cfg_for(name)
    ref = _ref_model(name, cfg, seed=7)
    path = tmp_path / "sd.pth"
    torch.save(ref.state_dict(), str(path))
    params = import_torch_checkpoint(str(path), name, cfg, res=(H, W))

    model = get_model(name, cfg)
    state = model.zero_state(B, H, W)
    ref.reset_states()
    rng = np.random.default_rng(3)
    for step in range(3):
        cnt = np.abs(rng.normal(0, 2, (B, 2, H, W))).astype(np.float32)
        with torch.no_grad():
            out_t = ref(None, torch.from_numpy(cnt))
        nhwc = jnp.asarray(np.moveaxis(cnt, 1, -1))
        out_j, state = model.apply(params, nhwc * 0, nhwc, state)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(out_j["flow"][0]), -1, 1),
            out_t["flow"][0].numpy(), atol=1e-5,
            err_msg=f"{name} diverges at step {step}",
        )


def test_mlflow_dir_layout_and_whole_model(tmp_path):
    """Whole pickled model under <run>/artifacts/model/data/model.pth."""
    name = "FireNet"
    cfg = _cfg_for(name)
    ref = _ref_model(name, cfg, seed=1)
    d = tmp_path / "runid" / "artifacts" / "model" / "data"
    d.mkdir(parents=True)
    torch.save(ref, str(d / "model.pth"))
    sd = load_torch_state_dict(str(tmp_path / "runid"))
    assert any(k.endswith("conv2d.weight") for k in sd)
    params = import_torch_checkpoint(str(tmp_path / "runid"), name, cfg,
                                     res=(16, 16))
    import jax

    assert len(jax.tree_util.tree_leaves(params)) > 0


def test_strict_rejects_mismatched_model(tmp_path):
    cfg = _cfg_for("FireNet")
    ref = _ref_model("FireNet", cfg)
    path = tmp_path / "sd.pth"
    torch.save(ref.state_dict(), str(path))
    with pytest.raises(ValueError):
        import_torch_checkpoint(
            str(path), "LIFFireNet", _cfg_for("LIFFireNet"), res=(16, 16)
        )


def test_weight_norm_mapping():
    """weight_g/weight_v keys (norm: weight SNN convs,
    spiking_submodules.py:87-88) map onto kernel+g."""
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.models.registry import get_model

    name = "LIFFireNet"
    cfg = dict(_cfg_for(name))
    cfg["spiking_neuron"] = dict(cfg["spiking_neuron"], norm="weight")
    ref = _ref_model(name, cfg, seed=2)
    sd = ref.state_dict()
    assert any(k.endswith("weight_g") for k in sd)

    model = get_model(name, cfg)
    state = model.zero_state(1, 16, 16)
    z = jnp.zeros((1, 16, 16, 2))
    target = model.init(jax.random.PRNGKey(0), z, z, state)
    params = state_dict_to_params(sd, target)

    B, H, W = 1, 16, 16
    rng = np.random.default_rng(5)
    state = model.zero_state(B, H, W)
    ref.reset_states()
    cnt = np.abs(rng.normal(0, 2, (B, 2, H, W))).astype(np.float32)
    with torch.no_grad():
        out_t = ref(None, torch.from_numpy(cnt))
    nhwc = jnp.asarray(np.moveaxis(cnt, 1, -1))
    out_j, state = model.apply(params, nhwc * 0, nhwc, state)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out_j["flow"][0]), -1, 1),
        out_t["flow"][0].numpy(), atol=1e-5,
    )
