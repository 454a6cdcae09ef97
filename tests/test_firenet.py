import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_flow_tpu.models.firenet import FIRENET_VARIANTS, make_firenet

B, H, W = 2, 16, 16

SNN_CFG = {
    "num_bins": 2,
    "base_num_channels": 8,
    "kernel_size": 3,
    "encoding": "cnt",
    "norm_input": False,
    "mask_output": True,
    "activations": ["arctanspike", "arctanspike"],
    "spiking_neuron": {
        "leak": [-4.0, 0.1],
        "thresh": [0.8, 0.1],
        "learn_leak": True,
        "learn_thresh": True,
        "hard_reset": True,
    },
}
ANN_CFG = {
    "num_bins": 2,
    "base_num_channels": 8,
    "kernel_size": 3,
    "encoding": "cnt",
    "activations": ["relu", None],
    "spiking_neuron": None,
}
LEAKY_CFG = {
    "num_bins": 2,
    "base_num_channels": 8,
    "kernel_size": 3,
    "encoding": "cnt",
    "activations": ["relu", None],
    "spiking_neuron": {"leak": [-4.0, 0.1], "learn_leak": True},
}


def _cfg_for(name):
    # neuron kwargs must match the cell family (the reference cells reject
    # unknown keys the same way, e.g. ConvALIF has no `leak`/`thresh`)
    if "PLIF" in name:
        return dict(SNN_CFG, spiking_neuron={
            "leak_v": [-4.0, 0.1], "leak_pt": [-4.0, 0.1],
            "add_pt": [-2.0, 0.1], "thresh": [0.8, 0.1],
            "learn_leak": True, "learn_thresh": True, "hard_reset": True,
        })
    if "ALIF" in name:
        return dict(SNN_CFG, spiking_neuron={
            "leak_v": [-4.0, 0.1], "leak_t": [-4.0, 0.1],
            "learn_leak": True, "learn_thresh": False, "hard_reset": False,
        })
    if "XLIF" in name:
        return dict(SNN_CFG, spiking_neuron={
            "leak_v": [-4.0, 0.1], "leak_pt": [-4.0, 0.1],
            "learn_leak": True, "learn_thresh": False, "hard_reset": False,
        })
    if "LIF" in name:
        return SNN_CFG
    if "Leaky" in name:
        return LEAKY_CFG
    return ANN_CFG


@pytest.mark.parametrize("name", sorted(FIRENET_VARIANTS))
def test_variant_forward_and_state(name):
    model = make_firenet(name, _cfg_for(name))
    state = model.zero_state(B, H, W)
    cnt = jnp.zeros((B, H, W, 2)).at[:, 4:8, 4:8, :].set(1.0)
    voxel = jnp.zeros((B, H, W, 2))
    params = model.init(jax.random.PRNGKey(0), voxel, cnt, state)
    out, new_state = model.apply(params, voxel, cnt, state)
    assert len(out["flow"]) == 1
    flow = out["flow"][0]
    assert flow.shape == (B, H, W, 2)
    assert np.all(np.abs(np.asarray(flow)) <= 1.0)  # tanh head
    # state pytree structure preserved
    assert jax.tree_util.tree_structure(state) == jax.tree_util.tree_structure(
        new_state
    )
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(new_state)):
        assert a.shape == b.shape


def test_lif_states_evolve_and_spike_binary():
    model = make_firenet("LIFFireNet", SNN_CFG)
    state = model.zero_state(B, H, W)
    cnt = jnp.ones((B, H, W, 2)) * 5.0
    voxel = jnp.zeros((B, H, W, 2))
    params = model.init(jax.random.PRNGKey(1), voxel, cnt, state)
    out, s1 = model.apply(params, voxel, cnt, state)
    _, s2 = model.apply(params, voxel, cnt, s1)
    # voltage changed across steps
    assert not np.allclose(np.asarray(s1[0][0]), np.asarray(s2[0][0]))
    # spikes binary
    z = np.asarray(s1[0][1])
    assert set(np.unique(z)).issubset({0.0, 1.0})


def test_activity_logging():
    model = make_firenet("FireNet", ANN_CFG)
    state = model.zero_state(B, H, W)
    cnt = jnp.ones((B, H, W, 2))
    params = model.init(jax.random.PRNGKey(0), cnt * 0, cnt, state)
    out, _ = model.apply(params, cnt * 0, cnt, state, log=True)
    assert out["activity"] is not None
    assert out["activity"]["0:input"] == 1.0


def test_param_init_distributions():
    model = make_firenet("LIFFireNet", SNN_CFG)
    state = model.zero_state(B, H, W)
    x = jnp.zeros((B, H, W, 2))
    params = model.init(jax.random.PRNGKey(2), x, x, state)["params"]
    # SNN conv init: U(+-sqrt(1/Cin)) on head (Cin=2) -> bound 0.707
    wk = params["head"]["ff"]["kernel"]
    assert np.abs(wk).max() <= np.sqrt(1 / 2) + 1e-6
    # leak ~ N(-4, 0.1)
    leak = params["head"]["leak"]
    assert -4.5 < leak.mean() < -3.5
    # thresh ~ N(0.8, 0.1)
    thresh = params["head"]["thresh"]
    assert 0.4 < thresh.mean() < 1.2


def test_gradients_flow_through_bptt():
    model = make_firenet("LIFFireNet", SNN_CFG)
    state = model.zero_state(B, H, W)
    cnt = jnp.ones((B, H, W, 2))
    voxel = jnp.zeros((B, H, W, 2))
    params = model.init(jax.random.PRNGKey(3), voxel, cnt, state)

    def loss_fn(p):
        s = state
        tot = 0.0
        for _ in range(3):
            out, s = model.apply(p, voxel, cnt, s)
            tot = tot + (out["flow"][0] ** 2).sum()
        return tot

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    # surrogate gradients reach the head conv through the spike chain
    gnorm = sum(float(np.abs(l).sum()) for l in leaves)
    assert gnorm > 0.0
