"""Equivalence of the factorized-matmul IWE backend (ops/iwe_matmul.py)
against the scatter-add formulation — values AND gradients, both warp
directions, overwrite/padded variants. The matmul path is the TPU default
(loss/warping._iwe_impl); CPU tests pin each impl explicitly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import event_flow_tpu.loss.warping as warping
from event_flow_tpu.loss.warping import LossConfig, event_warping_loss
from event_flow_tpu.ops.iwe_matmul import bilinear_splat_cf, gather_planes_cf
from event_flow_tpu.ops.iwe import (
    get_interpolation_compact_cf,
    interpolate_compact_cf,
)


@pytest.fixture(autouse=True)
def _restore_impl():
    yield
    warping.set_iwe_impl("auto")


def _rand_events(rng, b, t, n, h, w):
    ev = np.zeros((b, t, n, 4), np.float32)
    ev[..., 0] = np.sort(rng.uniform(0, 1, (b, t, n)), axis=-1)
    ev[..., 1] = rng.integers(0, h, (b, t, n))
    ev[..., 2] = rng.integers(0, w, (b, t, n))
    ev[..., 3] = rng.choice([-1.0, 1.0], (b, t, n))
    pol = np.stack([ev[..., 3] > 0, ev[..., 3] < 0], -1).astype(np.float32)
    return jnp.asarray(ev), jnp.asarray(pol)


def test_splat_matches_scatter_values_and_flow_grads():
    rng = np.random.default_rng(3)
    b, m, h, w = 2, 300, 24, 20
    ts = jnp.asarray(np.sort(rng.uniform(0, 1, (b, m))).astype(np.float32))
    ys = jnp.asarray(rng.integers(0, h, (b, m)).astype(np.float32))
    xs = jnp.asarray(rng.integers(0, w, (b, m)).astype(np.float32))
    fy = jnp.asarray(rng.normal(0, 0.05, (b, m)).astype(np.float32))
    fx = jnp.asarray(rng.normal(0, 0.05, (b, m)).astype(np.float32))
    pay = jnp.asarray(rng.random((b, 4, m)).astype(np.float32))
    scaling = 16.0

    def img_matmul(fy, fx):
        wy = ys + (1.0 - ts) * fy * scaling
        wx = xs + (1.0 - ts) * fx * scaling
        return bilinear_splat_cf(wy, wx, pay, (h, w))

    def img_scatter(fy, fx):
        idx, w4 = get_interpolation_compact_cf(
            ts, ys, xs, fy, fx, 1.0, (h, w), scaling)
        stack = (w4[:, :, None, :] * pay[:, None, :, :]).reshape(b, 16, m)
        return interpolate_compact_cf(idx, stack, (h, w), 4)

    a = img_matmul(fy, fx)
    s = img_scatter(fy, fx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(s),
                               rtol=1e-5, atol=1e-5)
    # total in-bounds mass agrees between the two formulations
    np.testing.assert_allclose(
        np.asarray(a.sum(axis=(2, 3))), np.asarray(s.sum(axis=(2, 3))),
        rtol=1e-4)

    ga = jax.grad(lambda f: (img_matmul(*f) ** 2).sum())((fy, fx))
    gs = jax.grad(lambda f: (img_scatter(*f) ** 2).sum())((fy, fx))
    for x, y in zip(ga, gs):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4)


def test_gather_planes_value_and_grad():
    rng = np.random.default_rng(4)
    g_, c, h, w, n = 3, 2, 16, 18, 120
    planes = jnp.asarray(rng.normal(size=(g_, c, h * w)).astype(np.float32))
    lin = jnp.asarray(rng.integers(0, h * w, (g_, n)).astype(np.int32))

    out = gather_planes_cf(planes, lin, (h, w))
    ref = jnp.take_along_axis(planes, lin[:, None, :], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

    def f_custom(p):
        return (gather_planes_cf(p, lin, (h, w)) ** 2).sum()

    def f_ref(p):
        return (jnp.take_along_axis(p, lin[:, None, :], axis=-1) ** 2).sum()

    gc = jax.grad(f_custom)(planes)
    gr = jax.grad(f_ref)(planes)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("overwrite", [False, True])
@pytest.mark.parametrize("t_live_val", [None, 2])
def test_loss_impls_agree(overwrite, t_live_val):
    rng = np.random.default_rng(0)
    b, t, n, h, w = 2, 3, 200, 24, 24
    ev, pol = _rand_events(rng, b, t, n, h, w)
    mask = jnp.asarray((rng.random((b, t, h, w)) > 0.3).astype(np.float32))
    flows = [
        (jnp.asarray(rng.normal(0, 0.02, (b, t, h, w)).astype(np.float32)),
         jnp.asarray(rng.normal(0, 0.02, (b, t, h, w)).astype(np.float32)))
        for _ in range(2)
    ]
    if t_live_val is not None:
        live = (np.arange(t) < t_live_val)[None, :, None]
        pol = pol * jnp.asarray(live.astype(np.float32))[..., None]
    t_live = None if t_live_val is None else jnp.asarray(t_live_val)
    cfg = LossConfig((h, w), 24.0, 0.001, smoothing_mask=True,
                     overwrite_intermediate=overwrite)

    def loss_fn(fl):
        return event_warping_loss(list(fl), ev, pol, mask, cfg,
                                  t_live=t_live)

    warping.set_iwe_impl("scatter")
    l1, g1 = jax.value_and_grad(loss_fn)(flows)
    warping.set_iwe_impl("matmul")
    l2, g2 = jax.value_and_grad(loss_fn)(flows)
    assert abs(float(l1 - l2)) <= 1e-5 * max(1.0, abs(float(l1)))
    d = jax.tree_util.tree_map(
        lambda a, bb: float(jnp.max(jnp.abs(a - bb))), g1, g2)
    scale = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a: float(jnp.max(jnp.abs(a))), g1)))
    assert max(jax.tree_util.tree_leaves(d)) <= 1e-4 * max(1.0, scale)


def test_round_idx_splat_equals_scatter_metrics_path():
    """The eval metrics' one-hot (round-idx) IWE must be identical between
    the matmul splat and the scatter path (loss/metrics.py::_round_iwe)."""
    from event_flow_tpu.ops.iwe import get_interpolation, interpolate_multi

    rng = np.random.default_rng(11)
    b, m, h, w = 2, 500, 30, 40
    ev = np.zeros((b, m, 4), np.float32)
    ev[..., 0] = np.sort(rng.uniform(0, 1, (b, m)))
    ev[..., 1] = rng.integers(0, h, (b, m))
    ev[..., 2] = rng.integers(0, w, (b, m))
    ev[..., 3] = rng.choice([-1, 1], (b, m))
    flow = rng.normal(0, 0.08, (b, m, 2)).astype(np.float32)
    vals = rng.random((b, m, 3)).astype(np.float32)
    ev, flow, vals = jnp.asarray(ev), jnp.asarray(flow), jnp.asarray(vals)
    tref, scaling = 1.0, 24.0

    idx, wgt = get_interpolation(ev, flow, tref, (h, w), scaling,
                                 round_idx=True)
    ref = interpolate_multi(idx, wgt * vals, (h, w))

    ts = ev[..., 0:1]
    warped = jnp.round(ev[..., 1:3] + (tref - ts) * flow * scaling)
    img = bilinear_splat_cf(warped[..., 0], warped[..., 1],
                            jnp.moveaxis(vals, -1, 1), (h, w))
    out = jnp.moveaxis(img, 1, -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
