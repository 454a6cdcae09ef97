"""Numerical parity of individual cells against the reference PyTorch
implementation with identical weights (metric-level parity starts at the
cell level; SURVEY.md §7 hard part 4)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)
torch = pytest.importorskip("torch")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, H, W, CIN, COUT, K = 2, 12, 12, 4, 6, 3


def _rand(shape, seed=0, scale=0.3):
    return np.random.default_rng(seed).normal(0, scale, shape).astype(
        np.float32
    )


def _to_torch_conv(conv, w_oihw, bias=None):
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w_oihw))
        if bias is not None:
            conv.bias.copy_(torch.from_numpy(bias))


def _hwio(w_oihw):
    return jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))  # OIHW -> HWIO


def _nhwc(x_nchw):
    return jnp.asarray(np.moveaxis(x_nchw, 1, -1))


def _from_nhwc(y):
    return np.moveaxis(np.asarray(y), -1, 1)


def test_conv_lif_matches_reference():
    from models.spiking_submodules import ConvLIF as RefLIF

    from event_flow_tpu.models.snn_cells import ConvLIF

    w = _rand((COUT, CIN, K, K), 1)
    leak = _rand((COUT,), 2, 1.0) - 3.0
    thresh = np.abs(_rand((COUT,), 3, 0.3)) + 0.5

    ref = RefLIF(CIN, COUT, K)
    with torch.no_grad():
        ref.ff.weight.copy_(torch.from_numpy(w))
        ref.leak.copy_(torch.from_numpy(leak.reshape(COUT, 1, 1)))
        ref.thresh.copy_(torch.from_numpy(thresh.reshape(COUT, 1, 1)))

    cell = ConvLIF(COUT, K)
    params = {"params": {"ff": {"kernel": _hwio(w)},
                         "leak": jnp.asarray(leak),
                         "thresh": jnp.asarray(thresh)}}

    x = _rand((B, CIN, H, W), 4, 1.0)
    state_t = None
    state_j = cell.zero_state(B, H, W)
    for step in range(4):
        xt = torch.from_numpy(x * (step + 1))
        with torch.no_grad():
            z_t, state_t = ref(xt, state_t)
        z_j, state_j = cell.apply(params, _nhwc(x * (step + 1)), state_j)
        np.testing.assert_allclose(
            _from_nhwc(z_j), z_t.numpy(), atol=1e-5,
            err_msg=f"spikes diverge at step {step}",
        )
        np.testing.assert_allclose(
            _from_nhwc(state_j[0]), state_t[0].numpy(), atol=1e-5,
            err_msg=f"voltage diverges at step {step}",
        )


def test_conv_alif_matches_reference():
    from models.spiking_submodules import ConvALIF as RefALIF

    from event_flow_tpu.models.snn_cells import ConvALIF

    w = _rand((COUT, CIN, K, K), 5)
    leak_v = _rand((COUT,), 6, 1.0) - 3.0
    leak_t = _rand((COUT,), 7, 1.0) - 3.0

    ref = RefALIF(CIN, COUT, K)
    with torch.no_grad():
        ref.ff.weight.copy_(torch.from_numpy(w))
        ref.leak_v.copy_(torch.from_numpy(leak_v.reshape(COUT, 1, 1)))
        ref.leak_t.copy_(torch.from_numpy(leak_t.reshape(COUT, 1, 1)))
    t0 = ref.t0.numpy().reshape(-1)
    t1 = ref.t1.numpy().reshape(-1)

    cell = ConvALIF(COUT, K)
    params = {"params": {"ff": {"kernel": _hwio(w)},
                         "leak_v": jnp.asarray(leak_v),
                         "leak_t": jnp.asarray(leak_t),
                         "t0": jnp.asarray(t0), "t1": jnp.asarray(t1)}}

    x = _rand((B, CIN, H, W), 8, 1.5)
    state_t = None
    state_j = cell.zero_state(B, H, W)
    for step in range(4):
        with torch.no_grad():
            z_t, state_t = ref(torch.from_numpy(x), state_t)
        z_j, state_j = cell.apply(params, _nhwc(x), state_j)
        np.testing.assert_allclose(_from_nhwc(z_j), z_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(
            _from_nhwc(state_j[2]), state_t[2].numpy(), atol=1e-5,
            err_msg="threshold trace diverges",
        )


def test_conv_gru_matches_reference():
    from models.submodules import ConvGRU as RefGRU

    from event_flow_tpu.models.cells import ConvGRU

    c = COUT
    wr = _rand((c, CIN + c, K, K), 9)
    wu = _rand((c, CIN + c, K, K), 10)
    wo = _rand((c, CIN + c, K, K), 11)
    br, bu, bo = _rand((c,), 12), _rand((c,), 13), _rand((c,), 14)

    ref = RefGRU(CIN, c, K)
    _to_torch_conv(ref.reset_gate, wr, br)
    _to_torch_conv(ref.update_gate, wu, bu)
    _to_torch_conv(ref.out_gate, wo, bo)

    cell = ConvGRU(c, K)
    params = {"params": {
        "reset_gate": {"kernel": _hwio(wr), "bias": jnp.asarray(br)},
        "update_gate": {"kernel": _hwio(wu), "bias": jnp.asarray(bu)},
        "out_gate": {"kernel": _hwio(wo), "bias": jnp.asarray(bo)},
    }}

    x = _rand((B, CIN, H, W), 15, 1.0)
    state_t = None
    state_j = cell.zero_state(B, H, W)
    for step in range(3):
        with torch.no_grad():
            z_t, state_t = ref(torch.from_numpy(x), state_t)
        z_j, state_j = cell.apply(params, _nhwc(x), state_j)
        np.testing.assert_allclose(_from_nhwc(z_j), z_t.numpy(), atol=1e-5)


def test_conv_leaky_matches_reference():
    from models.submodules import ConvLeaky as RefLeaky

    from event_flow_tpu.models.cells import ConvLeaky

    w = _rand((COUT, CIN, K, K), 16)
    bias = _rand((COUT,), 17)
    leak = _rand((COUT,), 18, 1.0) - 3.0

    ref = RefLeaky(CIN, COUT, K)
    _to_torch_conv(ref.ff, w, bias)
    with torch.no_grad():
        ref.leak.copy_(torch.from_numpy(leak.reshape(COUT, 1, 1)))

    cell = ConvLeaky(COUT, K)
    params = {"params": {"ff": {"kernel": _hwio(w), "bias": jnp.asarray(bias)},
                         "leak": jnp.asarray(leak)}}

    x = _rand((B, CIN, H, W), 19, 1.0)
    state_t = None
    state_j = cell.zero_state(B, H, W)
    for step in range(3):
        with torch.no_grad():
            z_t, state_t = ref(torch.from_numpy(x), state_t)
        z_j, state_j = cell.apply(params, _nhwc(x), state_j)
        np.testing.assert_allclose(_from_nhwc(z_j), z_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(_from_nhwc(state_j), state_t.numpy(),
                                   atol=1e-5)


def test_upsample_bilinear_matches_torch():
    import torch.nn.functional as F

    from event_flow_tpu.ops.resize import upsample2x_bilinear

    x = _rand((B, CIN, H, W), 20, 1.0)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2,
                        mode="bilinear", align_corners=False).numpy()
    ours = _from_nhwc(upsample2x_bilinear(_nhwc(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_avg_pool_matches_torch():
    from event_flow_tpu.ops.resize import avg_pool

    x = _rand((B, CIN, H, W), 21, 1.0)
    ref = torch.nn.AvgPool2d(3, 2, padding=1)(torch.from_numpy(x)).numpy()
    ours = _from_nhwc(avg_pool(_nhwc(x), 3, 2, 1))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_nearest_resize_matches_torch():
    import torch.nn.functional as F

    from event_flow_tpu.ops.resize import resize_nearest

    x = _rand((B, CIN, 4, 6), 22, 1.0)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=(4.0, 4.0)).numpy()
    ours = _from_nhwc(resize_nearest(_nhwc(x), (16, 24)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_conv_layer_bn_matches_reference():
    from models.submodules import ConvLayer as RefConvLayer

    from event_flow_tpu.models.cells import ConvLayer

    w = _rand((COUT, CIN, K, K), 30)
    scale = np.abs(_rand((COUT,), 31)) + 0.5
    shift = _rand((COUT,), 32)

    ref = RefConvLayer(CIN, COUT, K, norm="BN")
    ref.train()
    with torch.no_grad():
        ref.conv2d.weight.copy_(torch.from_numpy(w))
        ref.norm_layer.weight.copy_(torch.from_numpy(scale))
        ref.norm_layer.bias.copy_(torch.from_numpy(shift))

    layer = ConvLayer(COUT, K, norm="BN")
    params = {"params": {"conv": {"kernel": _hwio(w)},
                         "norm": {"scale": jnp.asarray(scale),
                                  "bias": jnp.asarray(shift)}}}
    x = _rand((B, CIN, H, W), 33, 1.0)
    y_t = ref(torch.from_numpy(x))
    y_j = layer.apply(params, _nhwc(x))
    np.testing.assert_allclose(_from_nhwc(y_j), y_t.detach().numpy(),
                               atol=1e-5)


def test_conv_layer_in_matches_reference():
    from models.submodules import ConvLayer as RefConvLayer

    from event_flow_tpu.models.cells import ConvLayer

    w = _rand((COUT, CIN, K, K), 34)
    bias = _rand((COUT,), 35)

    ref = RefConvLayer(CIN, COUT, K, norm="IN")
    ref.train()
    with torch.no_grad():
        ref.conv2d.weight.copy_(torch.from_numpy(w))
        ref.conv2d.bias.copy_(torch.from_numpy(bias))

    layer = ConvLayer(COUT, K, norm="IN")
    params = {"params": {"conv": {"kernel": _hwio(w),
                                  "bias": jnp.asarray(bias)}}}
    x = _rand((B, CIN, H, W), 36, 1.0)
    y_t = ref(torch.from_numpy(x))
    y_j = layer.apply(params, _nhwc(x))
    np.testing.assert_allclose(_from_nhwc(y_j), y_t.detach().numpy(),
                               atol=1e-5)


def test_conv_lif_weight_norm_matches_reference():
    from models.spiking_submodules import ConvLIF as RefLIF

    from event_flow_tpu.models.snn_cells import ConvLIF

    w = _rand((COUT, CIN, K, K), 37)
    g = np.abs(_rand((COUT,), 38)) + 0.5
    leak = _rand((COUT,), 39, 1.0) - 3.0

    ref = RefLIF(CIN, COUT, K, norm="weight")
    with torch.no_grad():
        ref.ff.weight_v.copy_(torch.from_numpy(w))
        ref.ff.weight_g.copy_(torch.from_numpy(g.reshape(COUT, 1, 1, 1)))
        ref.leak.copy_(torch.from_numpy(leak.reshape(COUT, 1, 1)))

    cell = ConvLIF(COUT, K, norm="weight")
    params = {"params": {"ff": {"kernel": _hwio(w), "g": jnp.asarray(g)},
                         "leak": jnp.asarray(leak),
                         "thresh": ref.thresh.detach().numpy().reshape(-1)}}

    x = _rand((B, CIN, H, W), 40, 1.0)
    state_t = None
    state_j = cell.zero_state(B, H, W)
    for _ in range(3):
        with torch.no_grad():
            z_t, state_t = ref(torch.from_numpy(x), state_t)
        z_j, state_j = cell.apply(params, _nhwc(x), state_j)
        np.testing.assert_allclose(_from_nhwc(z_j), z_t.numpy(), atol=1e-5)


def test_conv_lif_weight_norm_init_matches_torch():
    """Fresh-init parity of the weight-norm reparameterization: at init
    g = ||v|| so the effective kernel equals the raw init kernel
    (torch nn.utils.weight_norm semantics)."""
    from event_flow_tpu.models.snn_cells import ConvLIF

    cell = ConvLIF(COUT, K, norm="weight")
    x = jnp.zeros((B, H, W, CIN))
    params = cell.init(jax.random.PRNGKey(0), x, cell.zero_state(B, H, W))
    v = params["params"]["ff"]["kernel"]
    g = params["params"]["ff"]["g"]
    np.testing.assert_allclose(
        np.asarray(g), np.sqrt((np.asarray(v) ** 2).sum(axis=(0, 1, 2))),
        rtol=1e-6,
    )


def test_conv_lif_recurrent_group_norm_matches_reference():
    from models.spiking_submodules import ConvLIFRecurrent as RefLIFRec

    from event_flow_tpu.models.snn_cells import ConvLIFRecurrent

    w_ff = _rand((COUT, CIN, K, K), 41)
    w_rec = _rand((COUT, COUT, K, K), 42)
    leak = _rand((COUT,), 43, 1.0) - 3.0
    gn_ff_w = np.abs(_rand((CIN,), 44)) + 0.5
    gn_ff_b = _rand((CIN,), 45)
    gn_rec_w = np.abs(_rand((COUT,), 46)) + 0.5
    gn_rec_b = _rand((COUT,), 47)

    ref = RefLIFRec(CIN, COUT, K, norm="group")
    with torch.no_grad():
        ref.ff.weight.copy_(torch.from_numpy(w_ff))
        ref.rec.weight.copy_(torch.from_numpy(w_rec))
        ref.leak.copy_(torch.from_numpy(leak.reshape(COUT, 1, 1)))
        ref.norm_ff.weight.copy_(torch.from_numpy(gn_ff_w))
        ref.norm_ff.bias.copy_(torch.from_numpy(gn_ff_b))
        ref.norm_rec.weight.copy_(torch.from_numpy(gn_rec_w))
        ref.norm_rec.bias.copy_(torch.from_numpy(gn_rec_b))

    cell = ConvLIFRecurrent(COUT, K, norm="group")
    params = {"params": {
        "ff": {"kernel": _hwio(w_ff)},
        "rec": {"kernel": _hwio(w_rec)},
        "leak": jnp.asarray(leak),
        "thresh": ref.thresh.detach().numpy().reshape(-1),
        "norm_ff": {"scale": jnp.asarray(gn_ff_w),
                    "bias": jnp.asarray(gn_ff_b)},
        "norm_rec": {"scale": jnp.asarray(gn_rec_w),
                     "bias": jnp.asarray(gn_rec_b)},
    }}

    x = _rand((B, CIN, H, W), 48, 1.0)
    state_t = None
    state_j = cell.zero_state(B, H, W)
    for step in range(3):
        with torch.no_grad():
            z_t, state_t = ref(torch.from_numpy(x), state_t)
        z_j, state_j = cell.apply(params, _nhwc(x), state_j)
        np.testing.assert_allclose(
            _from_nhwc(z_j), z_t.numpy(), atol=1e-5,
            err_msg=f"spikes diverge at step {step}",
        )
