"""int8 serving quantization (models/conv.py::_conv2d_int8,
InferenceEngine(quantize='int8')).

Symmetric per-output-channel weight scales + dynamic per-tensor
activation scale; integer accumulation is exact, so the only deviation
vs f32 is input/weight rounding — and hidden spiking-layer inputs
(binary spikes) quantize exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from event_flow_tpu.models import conv as C


@pytest.fixture(autouse=True)
def _no_global_quant():
    yield
    assert C._CONV_QUANT == "none"  # nothing may leak the policy


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
        * scale
    )


@pytest.mark.parametrize("stride", [1, 2])
def test_int8_conv_error_bound(stride):
    x = _rand((2, 16, 16, 8), 0)
    w = _rand((3, 3, 8, 16), 1, 0.2)
    ref = C.conv2d_fn(x, w, stride=stride)
    C.set_conv_quant("int8")
    try:
        q = C.conv2d_fn(x, w, stride=stride)
    finally:
        C.set_conv_quant("none")
    rel = float(jnp.max(jnp.abs(q - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.03, rel


def test_int8_binary_input_weight_only_error():
    """Binary spike inputs: activation quantization is exact, so the
    int8 conv equals the conv with (dequantized) int8 WEIGHTS alone."""
    z = jnp.asarray(
        (np.random.default_rng(2).random((2, 12, 12, 8)) < 0.2)
        .astype(np.float32)
    )
    w = _rand((3, 3, 8, 8), 3, 0.3)
    w_i8, w_scale = C._quantize_sym(w, (0, 1, 2))
    w_deq = w_i8.astype(jnp.float32) * w_scale
    ref_wq = C.conv2d_fn(z, w_deq)
    C.set_conv_quant("int8")
    try:
        q = C.conv2d_fn(z, w)
    finally:
        C.set_conv_quant("none")
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref_wq),
                               rtol=1e-5, atol=1e-5)


def _make_engine(quantize=None, seed=0, name="FireNet"):
    from event_flow_tpu.config.parser import default_config
    from event_flow_tpu.eval.predict import InferenceEngine
    from event_flow_tpu.models.registry import get_model

    res = (16, 16)
    cfg = default_config()
    cfg["loader"]["resolution"] = list(res)
    cfg["model"] = {
        "name": name, "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
    }
    if name == "LIFFireNet":
        cfg["model"]["activations"] = ["arctanspike", "arctanspike"]
        cfg["model"]["spiking_neuron"] = {
            "leak": [-4.0, 0.1], "thresh": [0.8, 0.1]
        }
    else:
        cfg["model"]["activations"] = ["relu", None]
    model = get_model(name, cfg["model"])
    state = model.zero_state(1, *res)
    x = jnp.zeros((1, *res, 2))
    params = model.init(jax.random.PRNGKey(seed), x, x, state)
    return InferenceEngine(cfg, model, params, quantize=quantize), res


def _windows(res, s=4, n=300):
    from event_flow_tpu.data.synthetic import constant_flow_window

    rng = np.random.default_rng(5)
    return [constant_flow_window(rng, n, res, (1.0, -1.5), 8)
            for _ in range(s)]


def test_int8_engine_tracks_f32_and_scopes_policy():
    """Continuous (ANN) model: int8 output tracks f32 within ~2%.

    (An UNTRAINED spiking model is the wrong oracle here: ~1% current
    perturbations flip threshold crossings at a chaotic random init, so
    end-to-end deltas are unbounded even for a correct implementation —
    int8 SNN serving accuracy is a trained-model, metric-level question.
    The conv-level guarantees are tested above; spike inputs are exact.)"""
    eng_q, res = _make_engine(quantize="int8")
    eng_f, _ = _make_engine(quantize=None)
    ws = _windows(res)
    # interleave so the quant engine's traced policy cannot leak into
    # the f32 engine's trace (both trace on their first step call)
    flows_q = [np.asarray(eng_q.step(w)) for w in ws]
    flows_f = [np.asarray(eng_f.step(w)) for w in ws]
    fq, ff = np.stack(flows_q), np.stack(flows_f)
    assert not np.allclose(fq, ff)  # quantization actually happened
    # bounded deviation on the stateful 7-cell recurrent ANN
    err = np.max(np.abs(fq - ff)) / (np.max(np.abs(ff)) + 1e-12)
    assert err < 0.02, err
    # the global policy was never left flipped
    assert C._CONV_QUANT == "none"

    # an f32 engine traced AFTER the quant engine reproduces eng_f exactly
    eng_f2, _ = _make_engine(quantize=None)
    flows_f2 = [np.asarray(eng_f2.step(w)) for w in ws]
    np.testing.assert_array_equal(np.stack(flows_f2), ff)


def test_int8_engine_serializes(tmp_path):
    """A quantized engine exports/restores through the StableHLO
    serving artifact and reproduces the live quantized flows."""
    from event_flow_tpu.eval.serialized import SerializedEngine, export_engine

    eng_q, res = _make_engine(quantize="int8", name="LIFFireNet")
    ws = _windows(res, s=3)
    n = ws[0].shape[0]
    path = str(tmp_path / "artifact")
    export_engine(eng_q, path, n_events=n, platforms=("cpu",))
    live = np.stack([np.asarray(eng_q.step(w)) for w in ws])
    ser = SerializedEngine(path)
    restored = np.stack([np.asarray(ser.step(w)) for w in ws])
    np.testing.assert_allclose(restored, live, rtol=1e-5, atol=1e-6)


def test_int8_eval_metric_deltas_bounded(tmp_path):
    """Metric-level int8 accuracy: the full eval protocol (FWL/RSAT on a
    synthetic stream) run with int8 convs tracks the f32 metrics within
    a few percent on a continuous (ANN) model — the deployment-accuracy
    question for quantized serving, answered at the metric level."""
    from event_flow_tpu.config.parser import default_config
    from event_flow_tpu.data.h5 import EventStream
    from event_flow_tpu.data.schema import write_synthetic_sequence
    from event_flow_tpu.eval.harness import Evaluator
    from event_flow_tpu.models.registry import get_model

    res = (32, 32)
    write_synthetic_sequence(str(tmp_path / "seq.h5"), res=res,
                             n_events=12000, duration=1.0,
                             velocity=(4.0, 8.0), seed=0)
    cfg = default_config()
    cfg["data"].update({"path": str(tmp_path), "mode": "events",
                        "window": 1000, "window_eval": 2000})
    cfg["loader"].update({"resolution": list(res), "batch_size": 1,
                          "augment": [], "seed": 0})
    cfg["metrics"] = {"name": ["FWL", "RSAT"], "flow_scaling": 32}
    cfg["hot_filter"] = {"enabled": False}
    cfg["model"] = {
        "name": "FireNet", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
        "activations": ["relu", None],
    }
    model = get_model("FireNet", cfg["model"])
    state = model.zero_state(1, *res)
    x = jnp.zeros((1, *res, 2))
    params = model.init(jax.random.PRNGKey(1), x, x, state)

    results = {}
    for mode in ("none", "int8"):
        C.set_conv_quant(mode)
        try:
            stream = EventStream(cfg)
            results[mode] = Evaluator(cfg, model, params).run(stream)
            stream.close()
        finally:
            C.set_conv_quant("none")
    for metric in ("FWL", "RSAT"):
        for fname, f32_val in results["none"][metric].items():
            q_val = results["int8"][metric][fname]
            assert q_val == pytest.approx(f32_val, rel=0.05), (
                metric, fname, f32_val, q_val
            )
