import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml


def test_config_defaults_and_merge(tmp_path):
    from event_flow_tpu.config.parser import YAMLConfig, load_config

    p = tmp_path / "c.yml"
    yaml.safe_dump(
        {"data": {"window": 1234},
         "spiking_neuron": {"leak": [-4.0, 0.1]},
         "model": {"name": "LIFFireNet"}},
        open(p, "w"),
    )
    cfg = load_config(str(p))
    # defaults survive partial overrides (reference parser.py:32-66)
    assert cfg["data"]["mode"] == "events"
    assert cfg["data"]["window"] == 1234
    assert cfg["loader"]["resolution"] == [180, 240]
    assert cfg["hot_filter"]["max_px"] == 100
    # spiking_neuron re-nested under model (parser.py:117-127)
    assert cfg["model"]["spiking_neuron"]["leak"] == [-4.0, 0.1]
    assert "spiking_neuron" not in cfg

    # stored-params merge without eval()
    yc = YAMLConfig(str(p))
    merged = yc.merge_configs(
        {"model": "{name: FireNet, num_bins: 2}", "experiment": "X"}
    )
    assert merged["model"]["name"] == "LIFFireNet"  # config overrides stored


def test_eval_run_param_merge_full_config(tmp_path):
    """The FULL stored train config merges under the eval config
    (reference: configs/parser.py:98-115): nested non-model keys like
    loss.overwrite_intermediate survive into eval, while keys the eval
    YAML sets (data.window) win over the stored values."""
    from event_flow_tpu.config.parser import YAMLConfig

    eval_yml = tmp_path / "eval.yml"
    yaml.safe_dump(
        {"data": {"mode": "events", "window": 15000},
         "metrics": {"name": ["FWL"], "flow_scaling": 128}},
        open(eval_yml, "w"),
    )
    # a stored training config as Tracker.log_params writes it (nested,
    # post-combine): carries a loss block no eval YAML ever sets
    stored = {
        "model": {"name": "LIFFireNet", "num_bins": 2,
                  "spiking_neuron": {"leak": [-4.0, 0.1]}},
        "loss": {"flow_regul_weight": 0.001, "overwrite_intermediate": True},
        "data": {"mode": "events", "window": 1000},
        "loader": {"batch_size": 8, "resolution": [128, 128]},
    }
    yc = YAMLConfig(str(eval_yml))
    merged = yc.merge_configs(stored)
    # nested non-model train keys survive
    assert merged["loss"]["overwrite_intermediate"] is True
    assert merged["loss"]["flow_regul_weight"] == 0.001
    # model block (incl. re-nested spiking_neuron) comes from the run
    assert merged["model"]["name"] == "LIFFireNet"
    assert merged["model"]["spiking_neuron"]["leak"] == [-4.0, 0.1]
    # eval YAML wins on conflicts
    assert merged["data"]["window"] == 15000
    assert merged["metrics"]["name"] == ["FWL"]
    # eval defaults win over stored loader values (reference behavior:
    # the eval-side config, defaults included, overlays the run params)
    assert merged["loader"]["batch_size"] == 1


def test_checkpoint_roundtrip(tmp_path):
    from event_flow_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    tree = {
        "params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
        "epoch": 7,
    }
    path = save_checkpoint(str(tmp_path / "ck"), tree)
    back = restore_checkpoint(path)
    np.testing.assert_array_equal(back["params"]["w"], tree["params"]["w"])
    assert int(back["epoch"]) == 7


def test_tracker_artifacts(tmp_path):
    from event_flow_tpu.utils.tracking import (
        Tracker,
        log_eval_config,
        log_eval_results,
    )

    t = Tracker("exp", runs_root=str(tmp_path))
    t.log_params({"a": 1, "nested": {"b": 2}})
    t.log_metric("loss", 0.5, step=0)
    t.log_metric("loss", 0.4, step=1)
    assert t.load_params()["nested"]["b"] == 2
    assert os.path.exists(os.path.join(t.dir, "metrics.csv"))

    eid = log_eval_config(str(tmp_path), "rid", {"k": "v"})
    log_eval_results(str(tmp_path), eid, {"FWL": {"seq.h5": 1.23}})
    stored = yaml.safe_load(open(tmp_path / f"metrics_{eid}.yml"))
    assert stored["FWL"]["seq.h5"] == "1.23"


def test_visualization_renders():
    from event_flow_tpu.utils.visualization import (
        events_to_image,
        flow_to_image,
    )

    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 0] = 1.0
    img = flow_to_image(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8

    cnt = np.zeros((8, 8, 2), np.float32)
    cnt[2, 2, 0] = 3
    cnt[4, 4, 1] = 2
    img = events_to_image(cnt)
    assert img[2, 2, 1] > 0  # green positive
    assert img[4, 4, 2] > 0  # red negative


def test_inference_engine_streaming():
    from event_flow_tpu.config.parser import default_config
    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.eval.predict import InferenceEngine
    from event_flow_tpu.models.registry import get_model

    res = (16, 16)
    cfg = default_config()
    cfg["loader"]["resolution"] = list(res)
    cfg["model"] = {
        "name": "LIFFireNet", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 4, "kernel_size": 3, "mask_output": True,
        "activations": ["arctanspike", "arctanspike"],
        "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1]},
    }
    cfg["hot_filter"]["enabled"] = True
    model = get_model("LIFFireNet", cfg["model"])
    state = model.zero_state(1, *res)
    x = jnp.zeros((1, *res, 2))
    params = model.init(jax.random.PRNGKey(0), x, x, state)
    eng = InferenceEngine(cfg, model, params, with_iwe=True)

    rng = np.random.default_rng(0)
    flows = []
    for _ in range(3):
        w = constant_flow_window(rng, 200, res, (1.0, 1.0), 8)
        flow = eng.step(w)
        flows.append(np.asarray(flow))
    assert flows[0].shape == (1, *res, 2)
    assert eng.last_iwe.shape == (1, *res, 2)
    # recurrent state accumulates across windows and reset() clears it
    carried = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(eng._state)
    )
    assert carried > 0.0
    eng.reset()
    cleared = sum(
        float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(eng._state)
    )
    assert cleared == 0.0


def test_progress_printer(capsys):
    from event_flow_tpu.data.progress import ProgressPrinter

    p = ProgressPrinter(enabled=True, every=2)
    for _ in range(4):
        p.tick("seq.h5")
    p.finish()
    out = capsys.readouterr().out
    assert "seq.h5" in out and "Hz" in out


def test_describe_model_param_count():
    """describe_model reports the trainable parameter count (the
    reference's BaseModel.__str__, models/base.py:11-31)."""
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.models.model_util import (count_params,
                                                  describe_model)
    from event_flow_tpu.models.registry import get_model

    cfg = {"name": "FireFlowNet", "encoding": "cnt", "num_bins": 2,
           "base_num_channels": 4, "kernel_size": 3, "mask_output": True,
           "activations": ["relu", None], "spiking_neuron": None}
    model = get_model("FireFlowNet", cfg)
    state = model.zero_state(1, 16, 16)
    cnt = jnp.zeros((1, 16, 16, 2))
    params = model.init(jax.random.PRNGKey(0), cnt, cnt, state)
    n = count_params(params)
    # 7 stateless convs: head 2->4 + 5x 4->4 + pred 4->2 (+ biases)
    assert n > 0
    s = describe_model(model, params)
    assert "FireNet" in s and str(n) in s


def test_inference_engine_step_many_matches_step():
    """step_many (S windows, one device-scanned dispatch) must reproduce
    S sequential step() calls exactly, including the recurrent carry."""
    from event_flow_tpu.config.parser import default_config
    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.eval.predict import InferenceEngine
    from event_flow_tpu.models.registry import get_model

    res = (16, 16)
    cfg = default_config()
    cfg["loader"]["resolution"] = list(res)
    cfg["model"] = {
        "name": "LIFFireNet", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 4, "kernel_size": 3, "mask_output": True,
        "activations": ["arctanspike", "arctanspike"],
        "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1]},
    }
    model = get_model("LIFFireNet", cfg["model"])
    state = model.zero_state(1, *res)
    x = jnp.zeros((1, *res, 2))
    params = model.init(jax.random.PRNGKey(0), x, x, state)

    rng = np.random.default_rng(1)
    windows = np.stack(
        [constant_flow_window(rng, 200, res, (1.0, -1.0), 8)
         for _ in range(4)]
    )  # [S, N, 4]

    eng_a = InferenceEngine(cfg, model, params)
    seq = np.stack([np.asarray(eng_a.step(w)) for w in windows])

    eng_b = InferenceEngine(cfg, model, params)
    many = np.asarray(eng_b.step_many(windows))  # [S, 1, H, W, 2]

    np.testing.assert_allclose(many, seq, rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(eng_a._state),
                    jax.tree_util.tree_leaves(eng_b._state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_ensure_synthetic_dataset(tmp_path):
    """eval_flow --synthetic's dataset builder: correct schema per mode,
    cached on second call, streamable."""
    from event_flow_tpu.config.parser import default_config
    from event_flow_tpu.data.h5 import EventStream
    from event_flow_tpu.data.synthetic import ensure_synthetic_dataset

    cfg = default_config()
    cfg["loader"]["resolution"] = [16, 16]
    cfg["loader"]["batch_size"] = 1
    cfg["data"]["mode"] = "events"
    cfg["data"]["window"] = 500
    cfg["data"]["window_eval"] = 500
    root = str(tmp_path / "synth")
    path = ensure_synthetic_dataset(cfg, root=root)
    assert sorted(os.listdir(path.rstrip(os.sep))) == [
        ".complete", "seq_a.h5", "seq_b.h5"]
    # cached: second call returns without rewriting
    mtime = os.path.getmtime(os.path.join(path, "seq_a.h5"))
    assert ensure_synthetic_dataset(cfg, root=root) == path
    assert os.path.getmtime(os.path.join(path, "seq_a.h5")) == mtime
    cfg["data"]["path"] = path
    stream = EventStream(cfg)
    batch = stream.next_batch()
    assert batch["events"].shape[-1] == 4
    stream.close()

    # gtflow_dt4 mode writes flow_dt4 maps at the right shape
    import h5py

    cfg4 = default_config()
    cfg4["loader"]["resolution"] = [16, 16]
    cfg4["data"]["mode"] = "gtflow_dt4"
    cfg4["data"]["window"] = 1
    path4 = ensure_synthetic_dataset(cfg4, root=root)
    with h5py.File(os.path.join(path4, "seq_a.h5")) as f:
        names = sorted(f["flow_dt4"])
        assert len(names) >= 3
        d = f["flow_dt4"][names[0]]
        assert d.shape == (2, 16, 16) and "timestamp" in d.attrs


def test_ensure_synthetic_dataset_time_and_frames(tmp_path):
    """time mode sizes duration in SECONDS-per-window (not the events
    heuristic); frames mode writes an images/ group so the stream opens."""
    import h5py

    from event_flow_tpu.config.parser import default_config
    from event_flow_tpu.data.h5 import EventStream
    from event_flow_tpu.data.synthetic import ensure_synthetic_dataset

    root = str(tmp_path / "synth")

    cfg = default_config()
    cfg["loader"]["resolution"] = [16, 16]
    cfg["data"]["mode"] = "time"
    cfg["data"]["window"] = 0.5  # seconds
    path = ensure_synthetic_dataset(cfg, root=root, n_windows=8)
    with h5py.File(path + "seq_a.h5") as f:
        assert f.attrs["duration"] >= 0.9 * 8 * 0.5  # ~n_windows windows

    cfg_f = default_config()
    cfg_f["loader"]["resolution"] = [16, 16]
    cfg_f["data"]["mode"] = "frames"
    cfg_f["data"]["window"] = 1
    path_f = ensure_synthetic_dataset(cfg_f, root=root)
    cfg_f["data"]["path"] = path_f
    cfg_f["loader"]["batch_size"] = 1
    stream = EventStream(cfg_f)
    b = stream.next_batch()
    assert b["frames"].shape == (1, 2, 16, 16)
    stream.close()

    # cache key covers the window: a different window regenerates
    cfg2 = default_config()
    cfg2["loader"]["resolution"] = [16, 16]
    cfg2["data"]["mode"] = "time"
    cfg2["data"]["window"] = 2.0
    assert ensure_synthetic_dataset(cfg2, root=root, n_windows=8) != path


def test_checkpoint_async_roundtrip(tmp_path):
    """Async saves snapshot values at CALL time (later mutations don't
    leak in) and restore_checkpoint joins the in-flight write."""
    from event_flow_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint_async,
        wait_for_async_saves,
    )

    w = np.arange(6, dtype=np.float32)
    tree = {"params": {"w": w}, "epoch": 1}
    path = save_checkpoint_async(str(tmp_path / "ck"), tree)
    w += 100.0  # mutate AFTER the call: must not appear in the snapshot
    back = restore_checkpoint(path)  # joins the writer internally
    np.testing.assert_array_equal(back["params"]["w"],
                                  np.arange(6, dtype=np.float32))
    # consecutive async saves to the same path serialize correctly
    save_checkpoint_async(str(tmp_path / "ck"), {"params": {"w": w},
                                                 "epoch": 2})
    wait_for_async_saves()
    back2 = restore_checkpoint(path)
    assert int(back2["epoch"]) == 2
    np.testing.assert_array_equal(back2["params"]["w"], w)
