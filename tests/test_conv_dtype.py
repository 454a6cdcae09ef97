"""bf16-compute convolution option (EVFLOW_CONV_DTYPE / set_conv_compute_dtype).

The TPU MXU is bf16-native; the option casts conv operands to bf16 and
accumulates in f32 (models/conv.py::_conv_operands). These tests bound the
numeric deviation: per-conv output tolerance, full-model forward tolerance,
and that a short training run still optimizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_flow_tpu.models import conv as conv_mod
from event_flow_tpu.models.registry import get_model


@pytest.fixture
def bf16_convs():
    conv_mod.set_conv_compute_dtype("bfloat16")
    yield
    conv_mod.set_conv_compute_dtype("float32")


def test_single_conv_bf16_close_to_f32(bf16_convs):
    m = conv_mod.Conv2d(features=32, kernel_size=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 16))
    # the `init` config field shadows flax's Module.init; build params
    # directly (models always init through their parent module)
    params = {"params": {
        "kernel": conv_mod.torch_conv_kernel_init(
            jax.random.PRNGKey(1), (3, 3, 16, 32)),
        "bias": jnp.zeros((32,)),
    }}
    y_bf16 = m.apply(params, x)
    conv_mod.set_conv_compute_dtype("float32")
    y_f32 = m.apply(params, x)
    # bf16 has ~8 mantissa bits; with f32 accumulation the relative error
    # of a 144-term dot stays ~1e-2
    err = np.abs(np.asarray(y_bf16 - y_f32))
    scale = np.abs(np.asarray(y_f32)).max()
    assert err.max() / scale < 2e-2, err.max() / scale
    assert y_bf16.dtype == jnp.float32  # accumulation/output stays f32


def test_full_model_forward_bf16_close(bf16_convs):
    cfg = {"name": "FireNet", "encoding": "cnt", "num_bins": 2,
           "base_num_channels": 8, "kernel_size": 3,
           "activations": ["relu", None], "mask_output": True,
           "spiking_neuron": None}
    model = get_model("FireNet", cfg)
    state = model.zero_state(2, 32, 32)
    cnt = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 2)))
    params = model.init(jax.random.PRNGKey(3), cnt * 0, cnt, state)
    out_bf16, _ = model.apply(params, cnt * 0, cnt, state)
    conv_mod.set_conv_compute_dtype("float32")
    out_f32, _ = model.apply(params, cnt * 0, cnt, state)
    a = np.asarray(out_bf16["flow"][0])
    b = np.asarray(out_f32["flow"][0])
    assert np.abs(a - b).max() < 5e-2 * max(np.abs(b).max(), 1e-3)


def test_training_still_optimizes_bf16(bf16_convs):
    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import init_train_state, make_train_step

    RES, B, T, N = (32, 32), 2, 3, 300
    cfg = {"name": "FireNet", "encoding": "cnt", "num_bins": 2,
           "base_num_channels": 8, "kernel_size": 3,
           "activations": ["relu", None], "mask_output": True,
           "spiking_neuron": None}
    model = get_model("FireNet", cfg)
    tx = make_optimizer("Adam", 2e-3, clip_grad=100.0)
    step = jax.jit(make_train_step(
        model, tx, RES, 2, LossConfig(RES, 32.0, 0.001, smoothing_mask=True)
    ))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)
    rng = np.random.default_rng(0)
    ev = jnp.asarray(np.stack([np.stack(
        [constant_flow_window(rng, N, RES, (3.0, -2.0), 12)
         for _ in range(T)]) for _ in range(B)]))
    valid = jnp.ones((B, T, N))
    aug = jnp.zeros((B, 3))
    losses = []
    for _ in range(25):
        state, loss = step(state, ev, valid, aug, jnp.asarray(False))
        losses.append(float(loss))
    assert np.isfinite(losses[-1])
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
