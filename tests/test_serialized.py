"""eval/serialized.py: jax.export serving artifacts.

A SerializedEngine restored from disk must reproduce the live
InferenceEngine exactly — per-window flows, the recurrent carry across
windows, reset semantics, the padded short-window path, and the S-window
step_many form — while depending only on jax + the artifact files."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _make_engine(res=(16, 16), hot=False, batch=1):
    from event_flow_tpu.config.parser import default_config
    from event_flow_tpu.eval.predict import InferenceEngine
    from event_flow_tpu.models.registry import get_model

    cfg = default_config()
    cfg["loader"]["resolution"] = list(res)
    cfg["model"] = {
        "name": "LIFFireNet", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 4, "kernel_size": 3, "mask_output": True,
        "activations": ["arctanspike", "arctanspike"],
        "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1]},
    }
    cfg["hot_filter"]["enabled"] = hot
    model = get_model("LIFFireNet", cfg["model"])
    state = model.zero_state(batch, *res)
    x = jnp.zeros((batch, *res, 2))
    params = model.init(jax.random.PRNGKey(0), x, x, state)
    return cfg, InferenceEngine(cfg, model, params, batch=batch)


def _windows(rng, s, n, res):
    from event_flow_tpu.data.synthetic import constant_flow_window

    return np.stack(
        [constant_flow_window(rng, n, res, (1.0, -1.0), 8) for _ in range(s)]
    )


def test_serialized_matches_live(tmp_path):
    from event_flow_tpu.eval.serialized import (SerializedEngine,
                                                export_engine)

    res = (16, 16)
    _, live = _make_engine(res, hot=True)
    path = export_engine(live, str(tmp_path / "art"), n_events=200, s=3,
                         platforms=("cpu",))
    ser = SerializedEngine(path)
    assert ser.meta["n_events"] == 200 and ser.batch == 1

    rng = np.random.default_rng(0)
    ws = _windows(rng, 4, 200, res)
    for i, w in enumerate(ws):
        a = np.asarray(live.step(w))
        b = np.asarray(ser.step(w))
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6,
                                   err_msg=f"window {i}")

    # reset restores the exported initial state on both sides
    live.reset()
    ser.reset()
    a = np.asarray(live.step(ws[0]))
    b = np.asarray(ser.step(ws[0]))
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)


def test_serialized_short_window_padding(tmp_path):
    """A window below the artifact capacity pads + masks identically to
    the live engine fed an explicit validity mask."""
    from event_flow_tpu.eval.serialized import (SerializedEngine,
                                                export_engine)

    res = (16, 16)
    _, live = _make_engine(res)
    path = export_engine(live, str(tmp_path / "art"), n_events=256,
                         platforms=("cpu",))
    ser = SerializedEngine(path)

    rng = np.random.default_rng(1)
    w = _windows(rng, 1, 100, res)[0]  # 100 < 256
    padded = np.zeros((1, 256, 4), np.float32)
    padded[0, :100] = w
    valid = np.zeros((1, 256), np.float32)
    valid[0, :100] = 1.0

    a = np.asarray(live.step(padded, valid))
    b = np.asarray(ser.step(w))  # auto-pads
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="artifact capacity"):
        ser.step(np.zeros((1, 300, 4), np.float32))


def test_serialized_step_many(tmp_path):
    from event_flow_tpu.eval.serialized import (SerializedEngine,
                                                export_engine)

    res = (16, 16)
    _, live = _make_engine(res)
    path = export_engine(live, str(tmp_path / "art"), n_events=200, s=3,
                         platforms=("cpu",))
    ser = SerializedEngine(path)

    rng = np.random.default_rng(2)
    ws = _windows(rng, 3, 200, res)
    seq = np.stack([np.asarray(live.step(w)) for w in ws])
    many = np.asarray(ser.step_many(ws))
    np.testing.assert_allclose(many, seq, rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="expects S="):
        ser.step_many(ws[:2])


def test_export_multiplatform_lowering(tmp_path):
    """The default artifact lowers for cpu AND tpu so one build serves on
    either backend; verify the recorded platforms (execution on tpu is
    covered by the opt-in hardware suite)."""
    from jax import export as jexport

    from event_flow_tpu.eval.serialized import export_engine

    _, live = _make_engine((16, 16))
    try:
        path = export_engine(live, str(tmp_path / "art"), n_events=64)
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"multi-platform lowering unavailable here: {e}")
    with open(f"{path}/step.bin", "rb") as f:
        exported = jexport.deserialize(f.read())
    assert set(p.lower() for p in exported.platforms) == {"cpu", "tpu"}
