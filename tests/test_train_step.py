import jax
import jax.numpy as jnp
import numpy as np

from event_flow_tpu.data.synthetic import constant_flow_window
from event_flow_tpu.loss.warping import LossConfig
from event_flow_tpu.models.registry import get_model
from event_flow_tpu.train.optim import make_optimizer
from event_flow_tpu.train.step import (
    TrainState,
    init_train_state,
    make_train_step,
)

RES = (32, 32)
B, T, N = 2, 3, 300

MODEL_CFG = {
    "name": "LIFFireNet",
    "encoding": "cnt",
    "num_bins": 2,
    "base_num_channels": 8,
    "kernel_size": 3,
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


def _batch(seed=0, vel_scale=6.0):
    rng = np.random.default_rng(seed)
    vel = rng.uniform(-vel_scale, vel_scale, (B, 2))
    ev = np.stack(
        [
            np.stack(
                [
                    constant_flow_window(rng, N, RES, vel[b], sharp_points=12)
                    for _ in range(T)
                ]
            )
            for b in range(B)
        ]
    )
    return jnp.asarray(ev), jnp.ones((B, T, N)), jnp.zeros((B, 3))


def _setup():
    model = get_model("LIFFireNet", MODEL_CFG)
    tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
    loss_cfg = LossConfig(RES, float(max(RES)), 0.001, smoothing_mask=True)
    step = make_train_step(model, tx, RES, 2, loss_cfg)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)
    return model, jax.jit(step), state


def test_train_step_runs_and_loss_finite():
    _, step, state = _setup()
    ev, valid, aug = _batch()
    new_state, loss = step(state, ev, valid, aug, jnp.asarray(False))
    assert np.isfinite(float(loss))
    # params actually updated
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_training_reduces_loss():
    # overfit one fixed batch with an ANN FireNet (cleaner gradients than
    # the surrogate-grad SNN for a quick smoke test)
    cfg = dict(MODEL_CFG, name="FireNet", activations=["relu", None],
               spiking_neuron=None)
    model = get_model("FireNet", cfg)
    tx = make_optimizer("Adam", 2e-3, clip_grad=100.0)
    loss_cfg = LossConfig(RES, float(max(RES)), 0.001, smoothing_mask=True)
    step = jax.jit(make_train_step(model, tx, RES, 2, loss_cfg))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)
    ev, valid, aug = _batch(seed=0)
    losses = []
    for _ in range(25):
        state, loss = step(state, ev, valid, aug, jnp.asarray(False))
        losses.append(float(loss))
    assert np.isfinite(losses[-1])
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_reset_zeroes_model_state():
    _, step, state = _setup()
    ev, valid, aug = _batch()
    state1, _ = step(state, ev, valid, aug, jnp.asarray(False))
    # carried state nonzero after a step
    assert any(
        float(jnp.abs(l).sum()) > 0
        for l in jax.tree_util.tree_leaves(state1.model_state)
    )
    # a reset step behaves like starting from zero state
    state_manual = TrainState(state1.params, state1.opt_state,
                              state.model_state)
    out_reset, loss_reset = step(state1, ev, valid, aug, jnp.asarray(True))
    out_manual, loss_manual = step(state_manual, ev, valid, aug,
                                   jnp.asarray(False))
    np.testing.assert_allclose(float(loss_reset), float(loss_manual), rtol=1e-5)


def test_augmentation_flags_change_loss():
    _, step, state = _setup()
    ev, valid, _ = _batch()
    _, l_plain = step(state, ev, valid, jnp.zeros((B, 3)), jnp.asarray(False))
    _, l_flip = step(state, ev, valid, jnp.ones((B, 3)), jnp.asarray(False))
    assert not np.isclose(float(l_plain), float(l_flip))


def test_data_parallel_sharded_step():
    from event_flow_tpu.parallel.mesh import (
        make_mesh,
        shard_state,
        shard_train_step,
    )

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs >=2 devices")
    model = get_model("LIFFireNet", MODEL_CFG)
    tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
    loss_cfg = LossConfig(RES, float(max(RES)), 0.001, smoothing_mask=True)
    step = make_train_step(model, tx, RES, 2, loss_cfg)

    mesh = make_mesh(2)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)
    sharded = shard_train_step(step, mesh, state)
    state = shard_state(state, mesh)
    ev, valid, aug = _batch()
    new_state, loss = sharded(state, ev, valid, aug, jnp.asarray(False))
    assert np.isfinite(float(loss))

    # parity with the single-device step on identical inputs
    ref_state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)
    _, ref_loss = jax.jit(step)(ref_state, ev, valid, aug, jnp.asarray(False))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)
