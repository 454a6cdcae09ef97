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


def test_padded_window_step_matches_short_step():
    """A step padded to T_max with t_live real windows computes the same
    loss as the natural short-T step (variable loss windows for time/gtflow
    training modes; reference gate train_flow.py:141)."""
    model = get_model("LIFFireNet", MODEL_CFG)
    tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
    loss_cfg = LossConfig(RES, float(max(RES)), 0.001, smoothing_mask=True)
    step = jax.jit(make_train_step(model, tx, RES, 2, loss_cfg))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)

    ev, valid, aug = _batch(seed=3)
    t_live = 2
    # natural short step on the first t_live windows
    _, loss_short = step(state, ev[:, :t_live], valid[:, :t_live], aug,
                         jnp.asarray(False))
    # padded step: T windows, trailing T - t_live marked padding
    ev_pad = jnp.concatenate(
        [ev[:, :t_live], jnp.zeros_like(ev[:, t_live:])], axis=1)
    va_pad = jnp.concatenate(
        [valid[:, :t_live], jnp.zeros_like(valid[:, t_live:])], axis=1)
    state_pad, loss_pad = step(state, ev_pad, va_pad, aug,
                               jnp.asarray(False), jnp.asarray(t_live))
    np.testing.assert_allclose(float(loss_pad), float(loss_short), rtol=1e-5)

    # the carried recurrent state froze through the padding windows
    state_short, _ = step(state, ev[:, :t_live], valid[:, :t_live], aug,
                          jnp.asarray(False))
    for a, b in zip(jax.tree_util.tree_leaves(state_pad.model_state),
                    jax.tree_util.tree_leaves(state_short.model_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_time_mode_event_count_gated_cadence(tmp_path):
    """Trainer update cadence in time mode matches a host simulation of the
    reference's accumulated-event gate (reference: train_flow.py:141 with
    num_events = accumulated event-list length, loss/flow.py:161-166)."""
    from event_flow_tpu.config.parser import default_config, merge_dicts
    from event_flow_tpu.data.h5 import EventStream
    from event_flow_tpu.data.schema import write_synthetic_sequence
    from event_flow_tpu.train.loop import Trainer

    for i in range(2):
        write_synthetic_sequence(
            str(tmp_path / f"seq{i}.h5"), res=RES, n_events=4000,
            duration=1.0, velocity=(2.0, 4.0), seed=i, t0=1.0 + 5 * i,
        )
    cfg = default_config()
    merge_dicts(
        {
            "data": {"path": str(tmp_path), "mode": "time", "window": 0.07,
                     "window_loss": 900, "t_max_windows": 6,
                     "max_events": 1024},
            "model": {"name": "FireNet", "encoding": "cnt", "num_bins": 2,
                      "base_num_channels": 4, "kernel_size": 3,
                      "activations": ["relu", None], "mask_output": True,
                      "spiking_neuron": None},
            "loss": {"flow_regul_weight": 0.001, "clip_grad": 100.0},
            "optimizer": {"name": "Adam", "lr": 1e-3},
            "loader": {"resolution": list(RES), "batch_size": 1,
                       "augment": [], "seed": 0},
        },
        cfg,
    )
    trainer = Trainer(cfg)
    stream = EventStream(cfg)

    fired = []
    sim_count = 0
    sim_windows = 0
    sim_fired = []
    for i in range(30):
        batch = stream.next_batch()
        # reference-semantics host simulation: reset drops the partial
        # window; update when accumulated true event count >= window_loss
        if batch["new_seq"]:
            sim_count = 0
            sim_windows = 0
        sim_count += int(np.asarray(batch["valid"]).sum())
        sim_windows += 1
        if sim_count >= 900 or sim_windows >= 6:
            sim_fired.append(i)
            sim_count = 0
            sim_windows = 0

        loss = trainer.feed(batch)
        if loss is not None:
            fired.append(i)
            assert np.isfinite(loss)
    stream.close()
    assert fired, "no updates fired in 30 batches"
    assert fired == sim_fired, (fired, sim_fired)


def test_micro_batch_grad_accumulation_identical():
    """micro_batch=B/2 must produce the same loss and updated params as the
    full-batch step (the loss sums over batch, so gradients add)."""
    ev, valid, aug = _batch(seed=5)
    model = get_model("LIFFireNet", MODEL_CFG)
    tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
    loss_cfg = LossConfig(RES, float(max(RES)), 0.001, smoothing_mask=True)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)

    step_full = jax.jit(make_train_step(model, tx, RES, 2, loss_cfg))
    step_mb = jax.jit(make_train_step(model, tx, RES, 2, loss_cfg,
                                      micro_batch=1))
    s1, l1 = step_full(state, ev, valid, aug, jnp.asarray(False))
    s2, l2 = step_mb(state, ev, valid, aug, jnp.asarray(False))
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.model_state),
                    jax.tree_util.tree_leaves(s2.model_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_remat_policies_numerically_identical():
    """EVFLOW_REMAT only changes WHAT is saved across the scan remat, not
    the math: 'convs' (save named conv outputs) and 'none' must produce
    the same loss and updated params as the default full remat."""
    import os

    ev, valid, aug = _batch(seed=11)
    model = get_model("LIFFireNet", MODEL_CFG)
    tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)

    def run(mode):
        old = os.environ.get("EVFLOW_REMAT")
        os.environ["EVFLOW_REMAT"] = mode
        try:
            step = jax.jit(make_train_step(
                model, tx, RES, 2,
                LossConfig(RES, float(max(RES)), 0.001,
                           smoothing_mask=True)))
            state = init_train_state(model, tx, jax.random.PRNGKey(0), B,
                                     RES, 2)
            state, loss = step(state, ev, valid, aug, jnp.asarray(False))
            return float(loss), state.params
        finally:
            if old is None:
                os.environ.pop("EVFLOW_REMAT", None)
            else:
                os.environ["EVFLOW_REMAT"] = old

    loss_full, p_full = run("full")
    for mode in ("convs", "none"):
        loss_m, p_m = run(mode)
        np.testing.assert_allclose(loss_m, loss_full, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p_full),
                        jax.tree_util.tree_leaves(p_m)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


def test_training_vis_artifacts(tmp_path):
    """--vis training: the step returns the last window's flow/cnt/mask and
    the Trainer renders + stores PNG artifacts (reference:
    train_flow.py:64,164-177)."""
    from event_flow_tpu.train.loop import Trainer
    from event_flow_tpu.utils.visualization import Visualization
    from event_flow_tpu.data.synthetic import synthetic_window_stream

    res = (32, 32)
    config = {
        "data": {"mode": "events", "window": 200, "window_loss": 400},
        "model": {"name": "FireFlowNet", "encoding": "cnt",
                  "round_encoding": False, "norm_input": False,
                  "num_bins": 2, "base_num_channels": 8, "kernel_size": 3,
                  "activations": ["relu", None], "mask_output": True,
                  "spiking_neuron": None},
        "loss": {"flow_regul_weight": 0.001, "clip_grad": 100.0,
                 "overwrite_intermediate": False},
        "optimizer": {"name": "Adam", "lr": 2e-4},
        "loader": {"batch_size": 1, "resolution": list(res), "augment": [],
                   "seed": 0},
        "vis": {"enabled": True, "store": True, "train_every": 1,
                "bars": False},
        "hot_filter": {"enabled": False},
    }
    vis = Visualization(config, eval_id=-1, path_results=str(tmp_path),
                        show=False)
    trainer = Trainer(config, vis=vis)
    gen = synthetic_window_stream(0, 1, 200, res, 1)
    fired = 0
    for _ in range(6):
        ev = next(gen)[:, 0]
        batch = {"events": ev, "valid": np.ones(ev.shape[:2], np.float32),
                 "aug_flags": np.zeros((1, 3), np.float32),
                 "new_seq": False}
        if trainer.feed(batch) is not None:
            fired += 1
    assert fired >= 2
    import glob
    events_pngs = glob.glob(str(tmp_path / "vis" / "train" / "events" / "*"))
    flow_pngs = glob.glob(str(tmp_path / "vis" / "train" / "flow" / "*"))
    assert len(events_pngs) == fired
    assert len(flow_pngs) == fired
