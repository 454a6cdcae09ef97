import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_flow_tpu.models.evflownet import UNET_VARIANTS
from event_flow_tpu.models.registry import get_model

B, H, W = 1, 32, 32

BASE_CFG = {
    "encoding": "cnt",
    "num_bins": 2,
    "base_num_channels": 4,
    "kernel_size": 3,
    "mask_output": True,
    "activations": ["relu", None],
    "spiking_neuron": None,
}
SNN_NEURON = {
    "lif": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1], "learn_leak": True,
            "learn_thresh": True, "hard_reset": True},
    "plif": {"leak_v": [-4.0, 0.1], "leak_pt": [-4.0, 0.1],
             "add_pt": [-2.0, 0.1], "thresh": [0.8, 0.1]},
    "alif": {"leak_v": [-4.0, 0.1], "leak_t": [-4.0, 0.1]},
    "xlif": {"leak_v": [-4.0, 0.1], "leak_pt": [-4.0, 0.1]},
}


def _cfg(name):
    cfg = dict(BASE_CFG)
    if "LIF" in name or "Spiking" in name:
        cfg["activations"] = ["arctanspike", "arctanspike"]
        for key in ("plif", "alif", "xlif"):
            if key.upper() in name.upper().replace("SPIKING", ""):
                cfg["spiking_neuron"] = SNN_NEURON[key]
                break
        else:
            cfg["spiking_neuron"] = SNN_NEURON["lif"]
        if name.startswith("Spiking"):
            cfg["spiking_neuron"] = SNN_NEURON["lif"]
    if "Leaky" in name:
        cfg["spiking_neuron"] = {"leak": [-4.0, 0.1], "learn_leak": True}
    return cfg


def _expected_scales(name):
    return 1 if name == "E2VID" else 4


@pytest.mark.parametrize("name", sorted(UNET_VARIANTS))
def test_unet_variant_forward(name):
    model = get_model(name, _cfg(name))
    state = model.zero_state(B, H, W)
    cnt = jnp.zeros((B, H, W, 2)).at[:, 8:16, 8:16, :].set(1.0)
    voxel = jnp.zeros((B, H, W, 2))
    params = model.init(jax.random.PRNGKey(0), voxel, cnt, state)
    out, new_state = model.apply(params, voxel, cnt, state)
    flows = out["flow"]
    assert len(flows) == _expected_scales(name)
    for f in flows:
        # all scales upsampled to full resolution
        assert f.shape == (B, H, W, 2)
        assert np.all(np.isfinite(np.asarray(f)))
        assert np.abs(np.asarray(f)).max() <= 1.0  # tanh head
    assert jax.tree_util.tree_structure(state) == jax.tree_util.tree_structure(
        new_state
    )


@pytest.mark.parametrize("name", ["RecEVFlowNet", "SpikingRecEVFlowNet"])
def test_recurrent_state_evolves(name):
    model = get_model(name, _cfg(name))
    state = model.zero_state(B, H, W)
    cnt = jnp.ones((B, H, W, 2))
    voxel = jnp.zeros((B, H, W, 2))
    params = model.init(jax.random.PRNGKey(1), voxel, cnt, state)
    _, s1 = model.apply(params, voxel, cnt, state)
    _, s2 = model.apply(params, voxel, cnt, s1)
    l1 = jax.tree_util.tree_leaves(s1)
    l2 = jax.tree_util.tree_leaves(s2)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(l1, l2))


def test_spiking_state_count():
    # num_states = 2*num_encoders + num_residual_blocks (unet.py:434):
    # 4 encoders (each an (ff, rec) pair) + 2 resblocks + 4 decoders
    model = get_model("SpikingRecEVFlowNet", _cfg("SpikingRecEVFlowNet"))
    state = model.zero_state(B, H, W)
    assert len(state) == 4 + 2 + 4
    # encoder entries are (ff, rec) pairs
    assert isinstance(state[0], tuple) and len(state[0]) == 2


def test_odd_resolution_forward():
    # 45x60 exercises the center pad/crop skip path (odd dims after stride-2)
    model = get_model("RecEVFlowNet", _cfg("RecEVFlowNet"))
    h, w = 45, 60
    state = model.zero_state(B, h, w)
    cnt = jnp.ones((B, h, w, 2))
    voxel = jnp.zeros((B, h, w, 2))
    params = model.init(jax.random.PRNGKey(0), voxel, cnt, state)
    out, _ = model.apply(params, voxel, cnt, state)
    for f in out["flow"]:
        assert f.shape == out["flow"][-1].shape


def test_evflownet_is_stateless():
    model = get_model("EVFlowNet", _cfg("EVFlowNet"))
    assert model.zero_state(B, H, W) == ()


def test_log_raises_like_reference():
    model = get_model("EVFlowNet", _cfg("EVFlowNet"))
    state = model.zero_state(B, H, W)
    cnt = jnp.ones((B, H, W, 2))
    params = model.init(jax.random.PRNGKey(0), cnt * 0, cnt, state)
    with pytest.raises(NotImplementedError):
        model.apply(params, cnt * 0, cnt, state, log=True)
