import jax
import jax.numpy as jnp
import numpy as np

from event_flow_tpu.data.synthetic import constant_flow_window
from event_flow_tpu.loss.metrics import aee, fwl, rsat
from event_flow_tpu.loss.warping import LossConfig, event_warping_loss
from event_flow_tpu.ops.encodings import events_to_mask, polarity_mask

RES = (32, 32)
SCALING = 32.0
CFG = LossConfig(
    resolution=RES,
    flow_scaling=SCALING,
    flow_regul_weight=0.0,
    smoothing_mask=False,
    overwrite_intermediate=False,
)

# jit once; op-by-op tracing of the loss is prohibitively slow on CPU
from functools import partial


@partial(jax.jit, static_argnums=(5,))
def _jloss(fmaps, ev, pol, mask, _dummy, cfg):
    return event_warping_loss(fmaps, ev, pol, mask, cfg)


def jloss(fmaps, ev, pol, mask, cfg=CFG):
    return _jloss(fmaps, ev, pol, mask, None, cfg)


def _window_batch(velocity, t=2, n=400, seed=0, points=64):
    """[1, T, N, 4] windows + pol mask + event mask for one sequence."""
    rng = np.random.default_rng(seed)
    ev = np.stack(
        [
            constant_flow_window(rng, n, RES, velocity, sharp_points=points)
            for _ in range(t)
        ]
    )
    ev = jnp.asarray(ev)[None]  # [1, T, N, 4]
    pol = jax.vmap(lambda e: polarity_mask(e[..., 3]))(ev)
    mask = jax.vmap(
        lambda e: events_to_mask(e[..., 1], e[..., 2], e[..., 3], RES)
    )(ev)
    return ev, pol, mask


def _const_flow_maps(vx_vy, t=2):
    fx, fy = vx_vy
    fmap = jnp.zeros((1, t, *RES, 2)).at[..., 0].set(fx).at[..., 1].set(fy)
    return [fmap]


def test_loss_lower_at_true_flow():
    # needs demo-like structure: sparse sources, large displacement
    # (reference tools/demo_iwe.py uses flow_scaling=1 and +-64 px range)
    vel = (0.0, 8.0)  # vy, vx in px/window
    ev, pol, mask = _window_batch(vel, t=1, n=800, points=10)
    true_flow = (vel[1] / SCALING, vel[0] / SCALING)  # (x, y)
    l_true = jloss(_const_flow_maps(true_flow, t=1), ev, pol, mask, CFG)
    l_zero = jloss(_const_flow_maps((0.0, 0.0), t=1), ev, pol, mask, CFG)
    l_wrong = jloss(
        _const_flow_maps((-vel[1] / SCALING, 0.0), t=1), ev, pol, mask, CFG
    )
    assert l_true < l_zero < l_wrong


def test_loss_minimum_at_true_flow_grid():
    # the demo_iwe property (reference tools/demo_iwe.py:69-91): grid-search
    # constant flow; the minimum must sit at the true velocity
    vel = (4.0, -4.0)
    ev, pol, mask = _window_batch(vel, t=1, n=800, points=10)
    candidates = [-8.0, -4.0, 0.0, 4.0, 8.0]
    losses = np.array(
        [
            [
                float(
                    jloss(
                        _const_flow_maps((vx / SCALING, vy / SCALING), t=1),
                        ev, pol, mask, CFG,
                    )
                )
                for vx in candidates
            ]
            for vy in candidates
        ]
    )
    iy, ix = np.unravel_index(np.argmin(losses), losses.shape)
    assert candidates[iy] == vel[0]  # vy
    assert candidates[ix] == vel[1]  # vx


def test_loss_differentiable_and_nonzero_grad():
    vel = (1.0, 2.0)
    ev, pol, mask = _window_batch(vel)

    def f(fx):
        return event_warping_loss(_const_flow_maps((fx, 0.0)), ev, pol, mask, CFG)

    g = jax.grad(f)(0.01)
    assert np.isfinite(g) and g != 0.0


def test_smoothness_penalizes_rough_flow():
    cfg = LossConfig(RES, SCALING, flow_regul_weight=1.0)
    ev, pol, mask = _window_batch((0.0, 0.0))
    smooth = _const_flow_maps((0.5, 0.5))
    rough_map = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.5, (1, 2, *RES, 2)).astype(np.float32)
    )
    l_smooth = jloss(smooth, ev, pol, mask, cfg)
    l_rough = jloss([rough_map], ev, pol, mask, cfg)
    assert l_rough > l_smooth


def test_overwrite_intermediate_runs():
    cfg = LossConfig(RES, SCALING, 0.001, overwrite_intermediate=True)
    ev, pol, mask = _window_batch((1.0, 1.0))
    l = jloss(_const_flow_maps((0.01, 0.01)), ev, pol, mask, cfg)
    assert np.isfinite(float(l))


def test_multi_scale_average():
    ev, pol, mask = _window_batch((1.0, 1.0))
    m = _const_flow_maps((0.01, 0.01))
    l1 = jloss(m, ev, pol, mask)
    l2 = jloss(m + m, ev, pol, mask)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


# ---- metrics ---- (jitted wrappers: op-by-op is slow on CPU)

_jfwl = jax.jit(lambda e, f: fwl(e, f, 1, RES, SCALING))
_jrsat = jax.jit(lambda e, f, p: rsat(e, f, p, 1, RES, SCALING))
_jaee = jax.jit(lambda fm, gt, m, di, dg: aee(fm, gt, m, di, dg, SCALING))

def _accumulated(vel, passes=1, n=400):
    ev, pol, _ = _window_batch(vel, t=passes, n=n)
    b, t, nn, _ = ev.shape
    ts_off = ev[..., 0] + jnp.arange(t, dtype=ev.dtype)[None, :, None]
    flat = jnp.concatenate([ts_off[..., None], ev[..., 1:]], axis=-1).reshape(
        b, t * nn, 4
    )
    return flat, pol.reshape(b, t * nn, 2)


def test_fwl_zero_flow_is_one():
    ev, _ = _accumulated((0.0, 2.0))
    flow = jnp.zeros((1, ev.shape[1], 2))
    np.testing.assert_allclose(np.asarray(_jfwl(ev, flow)), 1.0)


def test_fwl_true_flow_above_one():
    vel = (0.0, 4.0)
    ev, _ = _accumulated(vel)
    # per-event flow (y, x) such that events warp back onto sources
    flow = jnp.zeros((1, ev.shape[1], 2)).at[..., 1].set(vel[1] / SCALING)
    val = _jfwl(ev, flow)
    assert float(val[0]) > 1.1


def test_rsat_true_flow_below_one():
    vel = (3.0, 0.0)
    ev, pol = _accumulated(vel)
    flow = jnp.zeros((1, ev.shape[1], 2)).at[..., 0].set(vel[0] / SCALING)
    r = _jrsat(ev, flow, pol)
    zero = _jrsat(ev, flow * 0, pol)
    np.testing.assert_allclose(np.asarray(zero), 1.0, rtol=1e-5)
    assert float(r[0]) < 1.0


def test_aee_perfect_prediction():
    gt = jnp.ones((1, *RES, 2)) * 2.0
    pred = gt / SCALING  # metric rescales by flow_scaling * dt_gt/dt_input
    mask = jnp.ones((1, *RES, 1))
    val, pct = _jaee(pred, gt, mask, jnp.ones(1), jnp.ones(1))
    np.testing.assert_allclose(np.asarray(val), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pct), 0.0)


def test_aee_known_error_and_outliers():
    gt = jnp.zeros((1, *RES, 2)).at[..., 0].set(10.0)
    pred = jnp.zeros((1, *RES, 2))  # error = 10 px everywhere
    mask = jnp.ones((1, *RES, 1))
    val, pct = _jaee(pred, gt, mask, jnp.ones(1), jnp.ones(1))
    np.testing.assert_allclose(np.asarray(val), 10.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pct), 1.0, rtol=1e-5)


def test_aee_respects_event_mask():
    gt = jnp.zeros((1, *RES, 2)).at[..., 0].set(5.0)
    pred = jnp.zeros((1, *RES, 2))
    mask = jnp.zeros((1, *RES, 1)).at[0, 0, 0, 0].set(1.0)
    gt = gt.at[0, 0, 0, 0].set(0.0)  # the only evented pixel has no GT
    val, _ = _jaee(pred, gt, mask, jnp.ones(1), jnp.ones(1))
    np.testing.assert_allclose(np.asarray(val), 0.0, atol=1e-6)


def test_aee_dt_rescaling():
    gt = jnp.zeros((1, *RES, 2)).at[..., 1].set(4.0)
    pred = gt / SCALING / 2.0  # dt_gt/dt_input = 2 doubles the prediction
    mask = jnp.ones((1, *RES, 1))
    val, _ = _jaee(pred, gt, mask, jnp.ones(1) * 0.5, jnp.ones(1))
    np.testing.assert_allclose(np.asarray(val), 0.0, atol=1e-5)
