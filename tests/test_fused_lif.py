"""Fused conv+LIF Pallas kernel vs the unfused formulation.

The fused kernel (ops/fused_lif_pallas.py) must reproduce the ConvLIF /
ConvLIFRecurrent dynamics (reference: spiking_submodules.py:96-126) and
their surrogate-gradient BPTT exactly: forward states bitwise-close, and
every gradient (x, w, w_rec, v, post-squash leak/thresh, recurrent z)
matching jax autodiff through the unfused ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_flow_tpu.ops import conv_pallas
from event_flow_tpu.ops.fused_lif_pallas import (fused_conv_lif,
                                                 fused_conv_lif_rec)
from event_flow_tpu.ops.spike import get_spike_fn


@pytest.fixture(autouse=True)
def interpret_mode():
    conv_pallas.set_interpret(True)
    yield
    conv_pallas.set_interpret(False)


def _conv(x, w):
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _ref_cell(x, w, v, z, leak, thresh, hard_reset, activation, width,
              w_rec=None, z_rec=None):
    """Unfused reference: conv + LIF update + surrogate spike, detach=True
    (mirrors models/snn_cells.py::ConvLIF[Recurrent])."""
    cur = _conv(x, w)
    if w_rec is not None:
        cur = cur + _conv(z_rec, w_rec)
    zd = jax.lax.stop_gradient(z)
    if hard_reset:
        v_out = v * leak * (1.0 - zd) + (1.0 - leak) * cur
    else:
        v_out = v * leak + (1.0 - leak) * cur - zd * thresh
    z_out = get_spike_fn(activation)(v_out, thresh, width)
    return v_out, z_out


def _setup(rec=False, seed=0, b=2, h=16, w=16, c=8):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    wk = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32) * 0.5)
    z = jnp.asarray((rng.random((b, h, w, c)) < 0.3).astype(np.float32))
    leak = jnp.asarray(jax.nn.sigmoid(rng.normal(size=c) - 2).astype(
        np.float32))
    thresh = jnp.asarray((0.5 + 0.3 * rng.random(c)).astype(np.float32))
    out = [x, wk, v, z, leak, thresh]
    if rec:
        wr = jnp.asarray(
            rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2)
        out.append(wr)
    return out


@pytest.mark.parametrize("hard_reset", [True, False])
def test_forward_matches_unfused(hard_reset):
    x, wk, v, z, leak, thresh = _setup()
    vo, zo = fused_conv_lif(x, wk, v, z, leak, thresh, 3, hard_reset,
                            "arctanspike", 10.0)
    vr, zr = _ref_cell(x, wk, v, z, leak, thresh, hard_reset,
                       "arctanspike", 10.0)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(zo), np.asarray(zr), atol=1e-6)


@pytest.mark.parametrize("hard_reset", [True, False])
@pytest.mark.parametrize("activation", ["arctanspike", "superspike"])
def test_gradients_match_unfused(hard_reset, activation):
    x, wk, v, z, leak, thresh = _setup(seed=1)

    def loss_fused(x, wk, v, leak, thresh):
        vo, zo = fused_conv_lif(x, wk, v, z, leak, thresh, 3, hard_reset,
                                activation, 10.0)
        return (vo * 0.3 + zo).sum()

    def loss_ref(x, wk, v, leak, thresh):
        vo, zo = _ref_cell(x, wk, v, z, leak, thresh, hard_reset,
                           activation, 10.0)
        return (vo * 0.3 + zo).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, wk, v, leak, thresh)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, wk, v, leak, thresh)
    for a, b, name in zip(gf, gr, ["x", "w", "v", "leak", "thresh"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4,
            err_msg=f"grad mismatch: {name}")


def test_recurrent_forward_and_gradients():
    x, wk, v, z, leak, thresh, wr = _setup(rec=True, seed=2)

    def out_fused(x, wk, wr, v, z, leak, thresh):
        # z doubles as the recurrent input, like ConvLIFRecurrent
        vo, zo = fused_conv_lif_rec(x, wk, wr, v, z, z, leak, thresh, 3,
                                    True, "arctanspike", 10.0)
        return vo, zo

    def out_ref(x, wk, wr, v, z, leak, thresh):
        return _ref_cell(x, wk, v, z, leak, thresh, True, "arctanspike",
                         10.0, w_rec=wr, z_rec=z)

    vo, zo = out_fused(x, wk, wr, v, z, leak, thresh)
    vr, zr = out_ref(x, wk, wr, v, z, leak, thresh)
    np.testing.assert_allclose(np.asarray(vo), np.asarray(vr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(zo), np.asarray(zr), atol=1e-6)

    def lf(*a):
        vo, zo = out_fused(*a)
        return (vo * 0.2 + zo).sum()

    def lr(*a):
        vo, zo = out_ref(*a)
        return (vo * 0.2 + zo).sum()

    gf = jax.grad(lf, argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, wk, wr, v, z, leak, thresh)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, wk, wr, v, z, leak, thresh)
    names = ["x", "w", "w_rec", "v", "z", "leak", "thresh"]
    for a, b, name in zip(gf, gr, names):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4,
            err_msg=f"grad mismatch: {name}")


def test_liffirenet_fused_matches_xla_impl():
    """Full-model check: LIFFireNet forward + gradient are identical under
    EVFLOW_CELL_IMPL=pallas (fused kernels, interpret mode) and the XLA
    path, with the SAME params pytree (checkpoint compatibility)."""
    from event_flow_tpu.models import policy as policy_mod
    from event_flow_tpu.models.registry import get_model

    cfg = {"name": "LIFFireNet", "encoding": "cnt", "num_bins": 2,
           "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
           "activations": ["arctanspike", "arctanspike"],
           "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1],
                              "learn_leak": True, "learn_thresh": True,
                              "hard_reset": True}}
    model = get_model("LIFFireNet", cfg)
    state = model.zero_state(2, 16, 16)
    cnt = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 2)))

    policy_mod.set_cell_impl("xla")
    try:
        params = model.init(jax.random.PRNGKey(1), cnt * 0, cnt, state)

        def loss(params, impl):
            policy_mod.set_cell_impl(impl)
            out, st = model.apply(params, cnt * 0, cnt, state)
            return out["flow"][0].sum() + sum(
                s.sum() for s in jax.tree_util.tree_leaves(st))

        # same params pytree initializes under the fused impl too
        policy_mod.set_cell_impl("pallas")
        params_fused = model.init(jax.random.PRNGKey(1), cnt * 0, cnt, state)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params_fused)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params_fused)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

        lx, gx = jax.value_and_grad(loss)(params, "xla")
        lp, gp = jax.value_and_grad(loss)(params, "pallas")
        np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gx),
                        jax.tree_util.tree_leaves(gp)):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(
                a, b, atol=1e-6 + 1e-5 * max(np.abs(a).max(), 1.0))
    finally:
        policy_mod.set_cell_impl("xla")


def test_bf16_inputs_supported():
    x, wk, v, z, leak, thresh = _setup(seed=3)
    to = lambda t: t.astype(jnp.bfloat16)
    vo, zo = fused_conv_lif(to(x), to(wk), to(v), to(z), leak, thresh, 3,
                            True, "arctanspike", 10.0)
    assert vo.dtype == jnp.bfloat16 and zo.dtype == jnp.bfloat16
    vr, zr = _ref_cell(x, wk, v, z, leak, thresh, True, "arctanspike", 10.0)
    assert np.abs(np.asarray(vo, np.float32) - np.asarray(vr)).max() < 0.05


def test_train_step_under_fused_bf16_cells():
    """The full jitted train step runs with EVFLOW_CELL_IMPL=pallas and
    bf16 cell compute together (interpret mode): finite loss, close to
    the XLA-impl loss."""
    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.models import policy as policy_mod
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import init_train_state, make_train_step

    res, b, t, n = (16, 16), 1, 2, 100
    cfg = {"name": "LIFFireNet", "encoding": "cnt", "num_bins": 2,
           "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
           "activations": ["arctanspike", "arctanspike"],
           "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1],
                              "learn_leak": True, "learn_thresh": True,
                              "hard_reset": True}}
    model = get_model("LIFFireNet", cfg)
    tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
    rng = np.random.default_rng(0)
    ev = jnp.asarray(np.stack([np.stack(
        [constant_flow_window(rng, n, res, (2.0, -1.0), 8)
         for _ in range(t)]) for _ in range(b)]))
    valid, aug = jnp.ones((b, t, n)), jnp.zeros((b, 3))

    def one(impl, dtype):
        policy_mod.set_cell_impl(impl)
        policy_mod.set_cell_compute_dtype(dtype)
        try:
            step = jax.jit(make_train_step(
                model, tx, res, 2,
                LossConfig(res, 16.0, 0.001, smoothing_mask=True)))
            st = init_train_state(model, tx, jax.random.PRNGKey(0), b,
                                  res, 2)
            _, loss = step(st, ev, valid, aug, jnp.asarray(False))
            return float(loss)
        finally:
            policy_mod.set_cell_impl("xla")
            policy_mod.set_cell_compute_dtype("float32")

    l_ref = one("xla", "float32")
    l_fused_bf16 = one("pallas", "bfloat16")
    assert np.isfinite(l_fused_bf16)
    assert abs(l_fused_bf16 - l_ref) < 0.1 * abs(l_ref) + 1e-3


def test_auto_gate_routing():
    """EVFLOW_CELL_IMPL=auto must (a) reproduce the measured-win table
    (models/policy.py::fused_auto_wins — recurrent c64 everywhere, c>=128
    only at <=32x32, never feedforward) and (b) never route through the
    Pallas kernel on the CPU backend, where the kernel would run in the
    slow interpreter."""
    from event_flow_tpu.models import policy
    from event_flow_tpu.models.snn_cells import ConvLIFRecurrent

    # (h, w, c, rec) -> expected
    table = {
        (128, 128, 32, True): False,   # XLA wins at c32
        (64, 64, 64, True): True,      # measured -13%
        (128, 128, 64, True): True,    # measured -13%
        (32, 32, 128, True): True,     # measured -4% (2026-08-18 A/B)
        (128, 128, 128, True): False,  # VMEM-gated shape; stay on XLA
        (16, 16, 256, True): True,     # measured -18%
        (8, 8, 512, True): True,       # measured -3.8% (2026-08-18 A/B)
        (64, 64, 64, False): False,    # feedforward never wins
        (16, 16, 256, False): False,
        (90, 120, 64, True): False,    # h % 8 != 0: row tile degrades
    }
    for (h, w, c, rec), want in table.items():
        assert policy.fused_auto_wins(h, w, c, rec) == want, (h, w, c, rec)

    # on CPU, auto must fall back to the XLA cells even at a win shape
    cell = ConvLIFRecurrent(features=64, kernel_size=3)
    x = jnp.zeros((1, 32, 32, 64))
    v = jnp.zeros((1, 32, 32, 64))
    params = cell.init(jax.random.PRNGKey(0), x, (v, v))
    bound = cell.bind(params)
    policy.set_cell_impl("auto")
    try:
        assert jax.default_backend() == "cpu"
        assert not bound._use_fused(x, 1, rec=True)
    finally:
        policy.set_cell_impl("xla")
