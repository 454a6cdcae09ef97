"""bf16 compute-precision options.

Two independent levers, both f32 by default (bit-level reference parity):
  - EVFLOW_CONV_DTYPE (models/conv.py::_conv_operands): conv operands in
    bf16, f32 accumulation — the MXU fast path.
  - EVFLOW_CELL_DTYPE (models/policy.py): the whole per-window cell
    compute (encodings in, neuron dynamics, scan carries) in bf16 with
    params, optimizer, and the contrast-max loss kept f32 — the HBM
    bandwidth lever (the scan carry + remat saves dominate traffic).

These tests bound the numeric deviation of each lever and check that
short training runs still optimize under them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_flow_tpu.models import conv as conv_mod
from event_flow_tpu.models import policy as policy_mod
from event_flow_tpu.models.registry import get_model


@pytest.fixture
def bf16_convs():
    conv_mod.set_conv_compute_dtype("bfloat16")
    yield
    conv_mod.set_conv_compute_dtype("float32")


@pytest.fixture
def bf16_cells():
    policy_mod.set_cell_compute_dtype("bfloat16")
    yield
    policy_mod.set_cell_compute_dtype("float32")


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


def _step_setup(name, spiking, res=(32, 32), b=2, t=3, n=300, seed=0):
    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import init_train_state, make_train_step

    cfg = {"name": name, "encoding": "cnt", "num_bins": 2,
           "base_num_channels": 8, "kernel_size": 3,
           "activations": ["arctanspike", "arctanspike"] if spiking
           else ["relu", None],
           "mask_output": True,
           "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1],
                              "learn_leak": True, "learn_thresh": True,
                              "hard_reset": True} if spiking else None}
    model = get_model(name, cfg)
    tx = make_optimizer("Adam", 2e-3, clip_grad=100.0)
    step = jax.jit(make_train_step(
        model, tx, res, 2, LossConfig(res, float(max(res)), 0.001,
                                      smoothing_mask=True)))
    state = init_train_state(model, tx, jax.random.PRNGKey(seed), b, res, 2)
    rng = np.random.default_rng(seed)
    ev = jnp.asarray(np.stack([np.stack(
        [constant_flow_window(rng, n, res, (3.0, -2.0), 12)
         for _ in range(t)]) for _ in range(b)]))
    return step, state, ev, jnp.ones((b, t, n)), jnp.zeros((b, 3))


def test_cell_bf16_loss_close_and_state_f32(bf16_cells):
    """One ANN train step under bf16 cells: loss within a few percent of
    f32, external TrainState (params / recurrent state) stays f32."""
    step, state, ev, valid, aug = _step_setup("FireNet", spiking=False)
    st_bf, loss_bf = step(state, ev, valid, aug, jnp.asarray(False))
    policy_mod.set_cell_compute_dtype("float32")
    step_f, state_f, *_ = _step_setup("FireNet", spiking=False)
    _, loss_f = step_f(state_f, ev, valid, aug, jnp.asarray(False))
    assert abs(float(loss_bf) - float(loss_f)) < 0.05 * abs(float(loss_f))
    for leaf in jax.tree_util.tree_leaves(
        (st_bf.params, st_bf.model_state)
    ):
        assert leaf.dtype == jnp.float32, leaf.dtype


def test_cell_bf16_lif_tracks_f32_training(bf16_cells):
    """The flagship SNN under full-bf16 cell compute: surrogate gradients
    flow through bf16 spikes and the per-step training losses track the
    f32 run within a few percent over several updates (spike flips from
    rounding stay rare at these dynamics)."""
    step, state, ev, valid, aug = _step_setup("LIFFireNet", spiking=True)
    bf = []
    for _ in range(8):
        state, loss = step(state, ev, valid, aug, jnp.asarray(False))
        bf.append(float(loss))
    policy_mod.set_cell_compute_dtype("float32")
    step, state, ev, valid, aug = _step_setup("LIFFireNet", spiking=True)
    f32 = []
    for _ in range(8):
        state, loss = step(state, ev, valid, aug, jnp.asarray(False))
        f32.append(float(loss))
    assert np.all(np.isfinite(bf))
    np.testing.assert_allclose(bf, f32, rtol=0.05)


def test_cell_bf16_carried_state_matches_reset_semantics(bf16_cells):
    """Masked sequence reset still zeroes bf16-computed carried state."""
    step, state, ev, valid, aug = _step_setup("LIFFireNet", spiking=True)
    state, _ = step(state, ev, valid, aug, jnp.asarray(False))
    st_reset, _ = step(state, ev, valid, aug, jnp.asarray(True))
    st_zero, _ = step(state._replace(
        model_state=jax.tree_util.tree_map(
            jnp.zeros_like, state.model_state)),
        ev, valid, aug, jnp.asarray(False))
    for a, b in zip(jax.tree_util.tree_leaves(st_reset.model_state),
                    jax.tree_util.tree_leaves(st_zero.model_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_forced_im2col_respects_stride():
    """EVFLOW_CONV_IMPL=im2col must not hijack strided convs: the im2col
    formulation is stride-1 only, so UNet encoder convs (stride 2) fall
    back to lax.conv and keep their downsampling (regression: forcing
    im2col once routed stride-2 convs through the stride-1 path and broke
    every UNet-family model under the bench's fast-conv config)."""
    from event_flow_tpu.models import conv as cm

    old = cm._CONV_IMPL
    cm.set_conv_impl("im2col")
    try:
        m = cm.Conv2d(features=8, kernel_size=3, stride=2)
        x = jnp.zeros((2, 16, 16, 4))
        params = {"params": {"kernel": cm.torch_conv_kernel_init(
            jax.random.PRNGKey(0), (3, 3, 4, 8)), "bias": jnp.zeros((8,))}}
        y = m.apply(params, x)
        assert y.shape == (2, 8, 8, 8), y.shape
    finally:
        cm.set_conv_impl(old)


def test_unet_trace_under_fast_conv_config():
    """RecEVFlowNet's full train step must trace under the bench's
    im2col+bf16 configuration (stride-2 encoders + bf16 cells)."""
    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.models import conv as cm
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import init_train_state, make_train_step

    cfg = {"name": "RecEVFlowNet", "encoding": "voxel", "num_bins": 5,
           "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
           "norm_input": False, "activations": ["relu", None],
           "spiking_neuron": None}
    model = get_model("RecEVFlowNet", cfg)
    tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
    res = (32, 32)
    cm.set_conv_impl("im2col")
    cm.set_conv_compute_dtype("bfloat16")
    policy_mod.set_cell_compute_dtype("bfloat16")
    try:
        step = jax.jit(make_train_step(
            model, tx, res, 5,
            LossConfig(res, 32.0, 0.001, smoothing_mask=True),
            micro_batch=1))
        state = init_train_state(model, tx, jax.random.PRNGKey(0), 2,
                                 res, 5)
        step.lower(state,
                   jax.ShapeDtypeStruct((2, 3, 100, 4), jnp.float32),
                   jax.ShapeDtypeStruct((2, 3, 100), jnp.float32),
                   jax.ShapeDtypeStruct((2, 3), jnp.float32),
                   jax.ShapeDtypeStruct((), jnp.bool_))
    finally:
        cm.set_conv_impl("auto")
        cm.set_conv_compute_dtype("float32")
        policy_mod.set_cell_compute_dtype("float32")


def test_im2col_native_backward_matches_patch_autodiff():
    """The im2col custom VJP (native-conv dx/dw, models/conv.py) must equal
    autodiff through the patch matmul for values and both gradients."""
    from event_flow_tpu.models.conv import _conv_im2col, _conv_im2col_raw

    rng = np.random.default_rng(7)
    for (b, h, w, ci, co, k) in [(2, 8, 9, 3, 5, 3), (1, 12, 12, 8, 4, 5)]:
        x = jnp.asarray(rng.normal(size=(b, h, w, ci)).astype(np.float32))
        kr = jnp.asarray(rng.normal(size=(k, k, ci, co)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(_conv_im2col(x, kr, k)),
            np.asarray(_conv_im2col_raw(x, kr, k)), rtol=1e-5, atol=1e-5)
        g1 = jax.grad(lambda a, b_: (_conv_im2col(a, b_, k) ** 2).sum(),
                      argnums=(0, 1))(x, kr)
        g2 = jax.grad(lambda a, b_: (_conv_im2col_raw(a, b_, k) ** 2).sum(),
                      argnums=(0, 1))(x, kr)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4)
