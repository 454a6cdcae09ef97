"""tools/export_serving.py: run dir -> serving artifact CLI.

Builds a tiny trained run (params checkpoint + stored train config the
way the Trainer writes them), exports the artifact through the CLI
main(), and serves it back with SerializedEngine."""

import os
import sys

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp


@pytest.fixture()
def tiny_run(tmp_path):
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.utils.checkpoint import save_checkpoint
    from event_flow_tpu.utils.tracking import Tracker

    res = (16, 16)
    model_cfg = {
        "name": "LIFFireNet", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 4, "kernel_size": 3, "mask_output": True,
        "activations": ["arctanspike", "arctanspike"],
        "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1]},
    }
    model = get_model("LIFFireNet", model_cfg)
    state = model.zero_state(1, *res)
    x = jnp.zeros((1, *res, 2))
    params = model.init(jax.random.PRNGKey(0), x, x, state)

    t = Tracker(runs_root=str(tmp_path / "runs"))
    t.log_params({"model": model_cfg,
                  "loader": {"resolution": list(res), "batch_size": 1}})
    save_checkpoint(os.path.join(t.dir, "checkpoints", "best"),
                    {"params": params})
    eval_yml = tmp_path / "eval.yml"
    yaml.safe_dump(
        {"data": {"mode": "events", "window": 200},
         "loader": {"resolution": list(res), "batch_size": 1},
         "metrics": {"name": ["FWL"], "flow_scaling": 16}},
        open(eval_yml, "w"),
    )
    return t.dir, str(eval_yml), res, params


def test_export_serving_cli_round_trip(tiny_run, tmp_path, monkeypatch):
    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.eval.serialized import SerializedEngine
    from tools import export_serving

    run_dir, eval_yml, res, params = tiny_run
    out = str(tmp_path / "artifact")
    monkeypatch.setattr(sys, "argv", [
        "export_serving.py", run_dir, "--config", eval_yml,
        "--out", out, "--events", "200", "--s", "2",
        "--platforms", "cpu",
    ])
    export_serving.main()
    for f in ("step.bin", "step_many.bin", "leaves.npz", "meta.json"):
        assert os.path.isfile(os.path.join(out, f)), f

    eng = SerializedEngine(out)
    rng = np.random.default_rng(0)
    w = constant_flow_window(rng, 150, res, (1.0, -1.0), 8)
    flow = np.asarray(eng.step(w))  # short window: pads to capacity
    assert flow.shape == (1, *res, 2)
    assert np.isfinite(flow).all()

    # the exported params leaves are the CHECKPOINT's values, not inits
    data = np.load(os.path.join(out, "leaves.npz"))
    ckpt_leaves = [np.asarray(v) for v in
                   jax.tree_util.tree_leaves(params)]
    exported = [data[f"p{i}"] for i in range(len(ckpt_leaves))]
    by_shape = lambda arrs: sorted(arrs, key=lambda a: (a.shape, a.sum()))
    for a, b in zip(by_shape(exported), by_shape(ckpt_leaves)):
        np.testing.assert_array_equal(a, b)


def test_export_serving_cli_requires_model(tiny_run, tmp_path, monkeypatch):
    from tools import export_serving

    _, eval_yml, _, _ = tiny_run
    empty_run = str(tmp_path / "norun")
    os.makedirs(empty_run)
    monkeypatch.setattr(sys, "argv", [
        "export_serving.py", empty_run, "--config", eval_yml,
        "--out", str(tmp_path / "a2"), "--platforms", "cpu",
    ])
    with pytest.raises(AssertionError, match="model"):
        export_serving.main()
