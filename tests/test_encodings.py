import jax.numpy as jnp
import numpy as np

from event_flow_tpu.ops.encodings import (
    encode_window,
    event_image,
    events_to_channels,
    events_to_mask,
    events_to_voxel,
    normalize_timestamps,
    polarity_mask,
)

RES = (4, 5)


def _events(ts, ys, xs, ps):
    return (
        jnp.asarray(ts, jnp.float32)[None],
        jnp.asarray(ys, jnp.float32)[None],
        jnp.asarray(xs, jnp.float32)[None],
        jnp.asarray(ps, jnp.float32)[None],
    )


def test_event_image_accumulates():
    _, ys, xs, ps = _events([0, 0, 0], [1, 1, 3], [2, 2, 4], [1, 1, -1])
    img = event_image(ys, xs, ps, RES)
    assert img.shape == (1, 4, 5)
    assert img[0, 1, 2] == 2.0
    assert img[0, 3, 4] == -1.0
    assert jnp.abs(img).sum() == 3.0


def test_event_image_out_of_bounds_dropped():
    _, ys, xs, ps = _events([0, 0], [-1, 7], [0, 0], [1, 1])
    img = event_image(ys, xs, ps, RES)
    assert jnp.abs(img).sum() == 0.0


def test_events_to_channels_per_polarity():
    # both channels count positively (reference encodings.py:70-85)
    _, ys, xs, ps = _events([0, 0, 0], [0, 0, 0], [0, 0, 1], [1, -1, -1])
    cnt = events_to_channels(ys, xs, ps, RES)
    assert cnt.shape == (1, 4, 5, 2)
    assert cnt[0, 0, 0, 0] == 1.0  # one positive at (0,0)
    assert cnt[0, 0, 0, 1] == 1.0  # one negative at (0,0), counted +1
    assert cnt[0, 0, 1, 1] == 1.0


def test_voxel_temporal_bilinear():
    # ts=0 -> all weight in bin 0; ts=1 -> bin 1; ts=0.5 -> half/half (2 bins)
    ts, ys, xs, ps = _events([0.0, 1.0, 0.5], [0, 0, 1], [0, 1, 1], [1, 1, -1])
    vox = events_to_voxel(ys, xs, ts, ps, 2, RES)
    assert vox.shape == (1, 4, 5, 2)
    np.testing.assert_allclose(vox[0, 0, 0], [1.0, 0.0])
    np.testing.assert_allclose(vox[0, 0, 1], [0.0, 1.0])
    np.testing.assert_allclose(vox[0, 1, 1], [-0.5, -0.5])


def test_voxel_round_ts():
    ts, ys, xs, ps = _events([0.4], [0], [0], [1])
    vox = events_to_voxel(ys, xs, ts, ps, 2, RES, round_ts=True)
    np.testing.assert_allclose(vox[0, 0, 0], [1.0, 0.0])


def test_mask_is_binary():
    _, ys, xs, ps = _events([0, 0, 0], [2, 2, 0], [2, 2, 0], [1, -1, 1])
    m = events_to_mask(ys, xs, ps, RES)
    assert m.shape == (1, 4, 5, 1)
    assert m[0, 2, 2, 0] == 1.0
    assert m[0, 0, 0, 0] == 1.0
    assert m.sum() == 2.0


def test_normalize_timestamps():
    ts = jnp.array([[10.0, 11.0, 12.0]])
    np.testing.assert_allclose(normalize_timestamps(ts), [[0.0, 0.5, 1.0]])


def test_normalize_timestamps_with_padding():
    ts = jnp.array([[10.0, 12.0, 0.0, 0.0]])
    valid = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    out = normalize_timestamps(ts, valid=valid)
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0, 0.0]])


def test_polarity_mask():
    ps = jnp.array([[1.0, -1.0, 1.0]])
    m = polarity_mask(ps)
    np.testing.assert_allclose(m[0], [[1, 0], [0, 1], [1, 0]])


def test_encode_window_shapes_and_padding():
    b, n = 2, 16
    rng = np.random.default_rng(0)
    ev = np.zeros((b, n, 4), np.float32)
    ev[..., 0] = np.sort(rng.uniform(0, 1e-3, (b, n)), axis=1)
    ev[..., 1] = rng.integers(0, RES[0], (b, n))
    ev[..., 2] = rng.integers(0, RES[1], (b, n))
    ev[..., 3] = rng.choice([-1.0, 1.0], (b, n))
    valid = np.ones((b, n), np.float32)
    valid[1, 8:] = 0.0
    out = encode_window(jnp.asarray(ev), RES, num_bins=2, valid=jnp.asarray(valid))
    assert out["event_cnt"].shape == (b, 4, 5, 2)
    assert out["event_voxel"].shape == (b, 4, 5, 2)
    assert out["event_mask"].shape == (b, 4, 5, 1)
    assert out["pol_mask"].shape == (b, n, 2)
    # padded slot contributes only its valid 8 events
    assert out["event_cnt"][1].sum() == 8.0
    assert out["pol_mask"][1, 8:].sum() == 0.0
    # count conservation on the full slot
    assert out["event_cnt"][0].sum() == n
