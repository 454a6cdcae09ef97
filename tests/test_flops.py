"""utils/flops.py: the jaxpr FLOP walker must count matmuls/convs exactly
and multiply scan bodies by trip count (the reason it exists — XLA's
compiled cost analysis counts a while body once)."""

import jax
import jax.numpy as jnp

from event_flow_tpu.utils.flops import flops_of_fn


def test_matmul_exact():
    f = flops_of_fn(lambda a, b: a @ b,
                    jnp.zeros((128, 256)), jnp.zeros((256, 64)))
    assert f == 2 * 128 * 256 * 64


def test_conv_exact():
    f = flops_of_fn(
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        jnp.zeros((2, 16, 16, 8)), jnp.zeros((3, 3, 8, 4)))
    assert f == 2 * 2 * 16 * 16 * 4 * 8 * 9


def test_scan_multiplies_by_length():
    def scanned(x):
        def body(c, _):
            return c @ x, None

        out, _ = jax.lax.scan(body, jnp.eye(64), None, length=5)
        return out

    f = flops_of_fn(scanned, jnp.zeros((64, 64)))
    assert f == 5 * 2 * 64 * 64 * 64


def test_grad_and_remat_counted():
    """Backward matmuls (incl. under jax.checkpoint recompute) count."""
    w = jnp.zeros((32, 32))

    def loss(w, x):
        f = jax.checkpoint(lambda x: (x @ w) @ w)
        return f(x).sum()

    fwd = flops_of_fn(lambda w, x: loss(w, x), w, jnp.zeros((8, 32)))
    both = flops_of_fn(lambda w, x: jax.grad(loss)(w, x), w,
                       jnp.zeros((8, 32)))
    # backward of 2 chained matmuls ~2x forward, plus remat recompute
    assert both >= 2.5 * fwd


def test_train_step_order_of_magnitude():
    """The full train step's count must reflect T scan windows (the
    pre-walker XLA count was ~100x low)."""
    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import init_train_state, make_train_step

    cfg = {"name": "FireFlowNet", "encoding": "cnt", "num_bins": 2,
           "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
           "activations": ["relu", None]}
    model = get_model("FireFlowNet", cfg)
    tx = make_optimizer("Adam", 2e-4)
    res = (32, 32)
    st = init_train_state(model, tx, jax.random.PRNGKey(0), 2, res, 2)
    step = make_train_step(model, tx, res, 2,
                           LossConfig(res, 32.0, 0.001))
    t = 4
    fl = flops_of_fn(step, st, jnp.zeros((2, t, 100, 4)),
                     jnp.ones((2, t, 100)), jnp.zeros((2, 3)),
                     jnp.asarray(False))
    # one-window forward conv FLOPs (5 convs, dominated by 3 8->8 k3)
    per_window_fwd = flops_of_fn(
        lambda p, v, c, s: model.apply(p, v, c, s),
        st.params, jnp.zeros((2, 32, 32, 2)), jnp.zeros((2, 32, 32, 2)),
        st.model_state)
    # full update >= T windows of fwd + some backward
    assert fl >= t * per_window_fwd * 1.5


def test_pallas_call_counted_grid_times_kernel():
    """pallas_call kernels count their block dot_generals x grid size, so
    MFU is exact under EVFLOW_CELL_IMPL=pallas/auto (round-3 gap: the
    fused conv+LIF kernel's MXU work was invisible to the walker)."""
    from jax.experimental import pallas as pl

    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                           preferred_element_type=jnp.float32)

    def f(x, w):
        return pl.pallas_call(
            kern, grid=(4,),
            in_specs=[pl.BlockSpec((32, 16), lambda i: (i, 0)),
                      pl.BlockSpec((16, 8), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((32, 8), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((128, 8), jnp.float32))(x, w)

    f_count = flops_of_fn(f, jnp.zeros((128, 16)), jnp.zeros((16, 8)))
    assert f_count == 4 * 2 * 32 * 16 * 8


def test_fused_lif_pallas_flops_match_xla_cell():
    """The fused conv+LIF forward must count the same MXU FLOPs as the
    unfused conv it replaces (2*B*H*W*cout*cin*k^2 for ff, + the
    recurrent conv when rec), so bench FLOPs agree between cell impls."""
    from event_flow_tpu.ops.fused_lif_pallas import (
        _fused_fwd, fused_lif_available)

    b, h, w, cin, cout, k = 2, 32, 32, 16, 16, 3
    if not fused_lif_available((b, h, w, cin), k, 1, cout=cout, rec=True):
        import pytest
        pytest.skip("fused kernel gated off at this shape")
    x = jnp.zeros((b, h, w, cin), jnp.float32)
    w2 = jnp.zeros((k * k * cin, cout), jnp.float32)
    wr2 = jnp.zeros((k * k * cout, cout), jnp.float32)
    v = jnp.zeros((b, h, w, cout), jnp.float32)
    z = jnp.zeros((b, h, w, cout), jnp.float32)
    leak = jnp.zeros((cout,), jnp.float32)
    thresh = jnp.ones((cout,), jnp.float32)

    got = flops_of_fn(
        lambda *a: _fused_fwd(*a, k=k, hard_reset=True,
                              activation="arctanspike", width=10.0,
                              z_rec=z, wr2=wr2),
        x, w2, v, z, leak, thresh)
    conv = 2.0 * b * h * w * cout * cin * k * k
    rec_conv = 2.0 * b * h * w * cout * cout * k * k
    assert got == conv + rec_conv
