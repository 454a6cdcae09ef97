"""Determinism of the scatter-add (the one race-like concern in the
framework, SURVEY.md §5 'race detection') and exact training resume."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml


def test_scatter_add_is_deterministic():
    # duplicate-index accumulation order must not change results between
    # executions (XLA scatter-add on TPU/CPU is deterministic; assert it)
    from event_flow_tpu.ops.scatter import scatter_add

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 97, (4, 50000)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(4, 50000, 3)).astype(np.float32))
    f = jax.jit(lambda i, v: scatter_add(i, v, 97))
    a = np.asarray(f(idx, vals))
    b = np.asarray(f(idx, vals))
    np.testing.assert_array_equal(a, b)


def test_loss_grad_is_deterministic():
    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.loss.warping import LossConfig, event_warping_loss
    from event_flow_tpu.ops.encodings import encode_windows

    res = (32, 32)
    rng = np.random.default_rng(0)
    ev = jnp.asarray(
        np.stack([constant_flow_window(rng, 400, res, (2.0, 1.0), 12)
                  for _ in range(2)])
    )[None]
    enc = encode_windows(ev, res, 2)
    cfg = LossConfig(res, 32.0, 0.001, smoothing_mask=True)
    fmap = jnp.zeros((1, 2, *res, 2)) + 0.01

    g = jax.jit(jax.grad(lambda f: event_warping_loss(
        [f], enc["event_list"], enc["pol_mask"], enc["event_mask"], cfg)))
    a = np.asarray(g(fmap))
    b = np.asarray(g(fmap))
    np.testing.assert_array_equal(a, b)


def test_exact_resume(tmp_path):
    """Full-checkpoint resume reproduces the exact same training trajectory
    (new capability vs the reference's weights-only warm start)."""
    import train_flow

    cfg = {
        "experiment": "resume-test",
        "data": {"mode": "events", "window": 200, "window_loss": 400},
        "model": {
            "name": "FireNet", "encoding": "cnt", "num_bins": 2,
            "base_num_channels": 4, "kernel_size": 3,
            "activations": ["relu", None], "mask_output": True,
            "spiking_neuron": None, "round_encoding": False,
        },
        "loss": {"flow_regul_weight": 0.001, "clip_grad": 100.0,
                 "overwrite_intermediate": False},
        "optimizer": {"name": "Adam", "lr": 0.001},
        "loader": {"n_epochs": 1, "batch_size": 1,
                   "resolution": [16, 16], "augment": [], "seed": 0},
        "vis": {"verbose": False, "store_grads": False},
        "hot_filter": {"enabled": False},
    }
    # one long synthetic H5 sequence so the stream cursor matters and no
    # rollover happens within the test horizon
    from event_flow_tpu.data.schema import write_synthetic_sequence

    ds = tmp_path / "ds"
    ds.mkdir()
    write_synthetic_sequence(str(ds / "seq0.h5"), res=(16, 16),
                             n_events=4000, velocity=(2.0, 2.0), seed=0)
    cfg["data"]["path"] = str(ds)
    cfg_path = str(tmp_path / "cfg.yml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    runs_root = str(tmp_path / "runs")

    def run(max_updates, resume=""):
        args = argparse.Namespace(
            config=cfg_path, prev_runid="", runs_root=runs_root,
            synthetic=False, native=False, resume=resume, profile=False,
            max_updates=max_updates, dp=False,
        )
        return train_flow.train(args)

    # 4 updates straight through
    rid_full = run(4)
    # 2 updates, then resume for 2 more
    rid_a = run(2)
    rid_b = run(2, resume=rid_a)

    from event_flow_tpu.utils import checkpoint as ckpt

    p_full = ckpt.restore_checkpoint(
        ckpt.latest_checkpoint(os.path.join(runs_root, rid_full),
                               prefer=("latest",)))["params"]
    p_res = ckpt.restore_checkpoint(
        ckpt.latest_checkpoint(os.path.join(runs_root, rid_b),
                               prefer=("latest",)))["params"]
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multiscale_unet_training_step():
    """RecEVFlowNet's 4-scale flow list trains through the scan step."""
    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import init_train_state, make_train_step

    res = (32, 32)
    cfg = {
        "name": "RecEVFlowNet", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 4, "kernel_size": 3,
        "activations": ["relu", None], "mask_output": True,
        "spiking_neuron": None,
    }
    model = get_model("RecEVFlowNet", cfg)
    tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
    step = jax.jit(make_train_step(
        model, tx, res, 2, LossConfig(res, 32.0, 0.001, smoothing_mask=True)
    ))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), 1, res, 2)
    rng = np.random.default_rng(0)
    ev = jnp.asarray(
        np.stack([constant_flow_window(rng, 300, res, (2.0, 1.0), 12)
                  for _ in range(2)])
    )[None]
    state, loss = step(state, ev, jnp.ones((1, 2, 300)), jnp.zeros((1, 3)),
                       jnp.asarray(False))
    assert np.isfinite(float(loss))
