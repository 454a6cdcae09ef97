import jax
import jax.numpy as jnp
import numpy as np

from event_flow_tpu.ops.iwe import (
    compute_pol_iwe,
    deblur_events,
    gather_event_flow,
    get_interpolation,
    interpolate,
    purge_unfeasible,
)

RES = (8, 10)


def _evlist(rows):
    # rows: (ts, y, x, p)
    return jnp.asarray(np.array(rows, np.float32))[None]


def test_purge_unfeasible():
    coords = jnp.array([[[1.0, 2.0], [-0.5, 3.0], [7.9, 9.9], [8.0, 0.0], [0.0, 10.0]]])
    out, mask = purge_unfeasible(coords, RES)
    np.testing.assert_allclose(mask[0, :, 0], [1, 0, 1, 0, 0])
    np.testing.assert_allclose(out[0, 1], [0.0, 0.0])


def test_zero_flow_round_idx_is_event_image():
    ev = _evlist([(0.0, 1, 2, 1), (0.5, 3, 4, -1), (1.0, 1, 2, 1)])
    flow = jnp.zeros((1, 3, 2))
    idx, w = get_interpolation(ev, flow, 1.0, RES, 128, round_idx=True)
    img = interpolate(idx, w, RES)
    assert img[0, 1, 2, 0] == 2.0
    assert img[0, 3, 4, 0] == 1.0
    assert img.sum() == 3.0


def test_bilinear_weights_integer_coords():
    # integer warped location -> all mass on top-left neighbor
    ev = _evlist([(0.0, 2, 3, 1)])
    flow = jnp.zeros((1, 1, 2))
    idx, w = get_interpolation(ev, flow, 1.0, RES, 128, round_idx=False)
    assert idx.shape == (1, 4)
    assert w.shape == (1, 4, 1)
    np.testing.assert_allclose(w[0, :, 0], [1.0, 0.0, 0.0, 0.0])
    assert idx[0, 0] == 2 * RES[1] + 3


def test_bilinear_weights_fractional():
    # warp event at (2,3) by flow (0.25, 0.5)/scaling with tref-ts=1
    ev = _evlist([(0.0, 2, 3, 1)])
    flow = jnp.array([[[0.25, 0.5]]]) / 128.0
    idx, w = get_interpolation(ev, flow, 1.0, RES, 128, round_idx=False)
    # warped to (2.25, 3.5): weights TL=.75*.5 TR=.75*.5 BL=.25*.5 BR=.25*.5
    np.testing.assert_allclose(w[0, :, 0], [0.375, 0.375, 0.125, 0.125], rtol=1e-6)
    img = interpolate(idx, w, RES)
    assert np.isclose(img.sum(), 1.0)  # mass conservation
    assert np.isclose(img[0, 2, 3, 0], 0.375)
    assert np.isclose(img[0, 3, 4, 0], 0.125)


def test_mass_conservation_random_inbounds():
    rng = np.random.default_rng(0)
    n = 200
    ev = np.zeros((1, n, 4), np.float32)
    ev[0, :, 0] = np.sort(rng.uniform(0, 1, n))
    ev[0, :, 1] = rng.integers(2, 6, n)
    ev[0, :, 2] = rng.integers(2, 8, n)
    ev[0, :, 3] = rng.choice([-1, 1], n)
    flow = rng.uniform(-1, 1, (1, n, 2)).astype(np.float32) / 128.0
    idx, w = get_interpolation(jnp.asarray(ev), jnp.asarray(flow), 1.0, RES, 128)
    img = interpolate(idx, w, RES)
    # small flow keeps everything in bounds -> total mass = n
    np.testing.assert_allclose(img.sum(), n, rtol=1e-4)


def test_gather_event_flow_swaps_components():
    flow_map = jnp.zeros((1, *RES, 2)).at[0, 2, 3].set(jnp.array([7.0, 9.0]))
    ev = _evlist([(0.0, 2, 3, 1)])
    g = gather_event_flow(flow_map, ev, RES)
    # map stores (x, y); per-event flow is (y, x)
    np.testing.assert_allclose(g[0, 0], [9.0, 7.0])


def test_deblur_constant_flow_sharpens():
    # two events from the same edge moving right by 2px/unit-time:
    # with correct flow they warp to the same pixel at tref=1
    ev = _evlist([(0.0, 4, 4, 1), (0.5, 4, 5, 1)])
    flow_map = jnp.zeros((1, *RES, 2)).at[..., 0].set(2.0 / 128.0)  # x-flow
    iwe = deblur_events(flow_map, ev, RES, flow_scaling=128, round_idx=True)
    assert iwe[0, 4, 6, 0] == 2.0  # both landed on x=6
    zero = deblur_events(jnp.zeros_like(flow_map), ev, RES, round_idx=True)
    assert zero.max() == 1.0


def test_compute_pol_iwe_shapes():
    ev = _evlist([(0.0, 1, 1, 1), (1.0, 2, 2, -1)])
    pos = jnp.array([[[1.0], [0.0]]])
    neg = jnp.array([[[0.0], [1.0]]])
    flow_map = jnp.zeros((1, *RES, 2))
    iwe = compute_pol_iwe(flow_map, ev, RES, pos, neg, round_idx=True)
    assert iwe.shape == (1, *RES, 2)
    assert iwe[0, 1, 1, 0] == 1.0
    assert iwe[0, 2, 2, 1] == 1.0


def test_interpolation_differentiable_wrt_flow():
    ev = _evlist([(0.0, 3, 3, 1)])

    def loss(f):
        flow = jnp.full((1, 1, 2), f)
        idx, w = get_interpolation(ev, flow, 1.0, RES, 128, round_idx=False)
        img = interpolate(idx, w, RES)
        return (img**2).sum()

    g = jax.grad(loss)(0.001)
    assert np.isfinite(g) and g != 0.0
