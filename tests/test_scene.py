"""Spatially-varying scene generator (data/scene.py): GT exactness,
occlusion semantics, and the properties the round-5 evidence relies on.

The quality claims on this data are only as strong as the GT maps, so the
tests pin them analytically: closed-form trajectories vs numerical ODE
integration, emitter displacement vs the map value at the landing pixel,
and layer selection at occlusion boundaries.
"""

import numpy as np
import pytest

from event_flow_tpu.data.scene import (
    MotionLayer,
    Scene,
    SceneObject,
    disk_emitters,
    random_varied_scene,
    varied_eval_scene,
)


def _rotation_layer(q=(64.0, 64.0), w=0.5, s=0.0, t1=30.0):
    return MotionLayer([(0.0, t1, "similarity",
                         {"q": q, "s": s, "w": w})])


def test_similarity_matches_ode_integration():
    """Closed-form trajectory == numerically integrated velocity field
    v(p) = A (p - q), A = [[s, -w], [w, s]]."""
    q = np.array([50.0, 70.0])
    s, w = 0.12, 0.6
    layer = MotionLayer([(0.0, 10.0, "similarity",
                          {"q": tuple(q), "s": s, "w": w})])
    A = np.array([[s, -w], [w, s]])
    p = np.array([20.0, 30.0])
    n, T = 200000, 3.7
    dt = T / n
    for _ in range(n):  # RK2 midpoint
        k1 = A @ (p - q)
        k2 = A @ (p + 0.5 * dt * k1 - q)
        p = p + dt * k2
    exact = layer.apply(np.array([[20.0, 30.0]]), np.array([T]))[0]
    np.testing.assert_allclose(p, exact, atol=1e-4)


def test_piecewise_composition_continuous_and_exact():
    """Multi-segment trajectories are continuous at boundaries and the
    composed affine equals stepping through the segments."""
    segs = [
        (0.0, 1.0, "translate", {"v": (3.0, -2.0)}),
        (1.0, 2.5, "similarity", {"q": (10.0, 10.0), "s": 0.2, "w": -0.8}),
        (2.5, 4.0, "translate", {"v": (-5.0, 1.0)}),
    ]
    layer = MotionLayer(segs)
    p0 = np.array([[4.0, 7.0]])
    eps = 1e-7
    for tb in (1.0, 2.5):
        a = layer.apply(p0, np.array([tb - eps]))[0]
        b = layer.apply(p0, np.array([tb + eps]))[0]
        np.testing.assert_allclose(a, b, atol=1e-4)
    # manual stepping: translate 1s, similarity 1.5s, translate 0.5s
    p = p0[0] + np.array([3.0, -2.0])
    q = np.array([10.0, 10.0])
    tau = 1.5
    k = np.exp(0.2 * tau)
    c, sn = np.cos(-0.8 * tau), np.sin(-0.8 * tau)
    M = k * np.array([[c, -sn], [sn, c]])
    p = q + M @ (p - q)
    p = p + np.array([-5.0, 1.0]) * 0.5
    np.testing.assert_allclose(
        layer.apply(p0, np.array([3.0]))[0], p, atol=1e-9)


def test_gt_disp_is_backward_displacement():
    """gt_disp(p, t, dt) == p(t) - p(t - dt) for the feature that ends at
    p at time t, for a multi-segment motion and dt straddling a
    boundary."""
    segs = [
        (0.0, 2.0, "similarity", {"q": (60.0, 60.0), "s": -0.1, "w": 0.5}),
        (2.0, 4.0, "translate", {"v": (8.0, -3.0)}),
    ]
    layer = MotionLayer(segs)
    p0 = np.array([[30.0, 90.0], [75.0, 40.0]])
    t, dt = 2.04, 0.1  # interval [1.94, 2.04) straddles the boundary
    p_t = layer.apply(p0, np.full(2, t))
    p_prev = layer.apply(p0, np.full(2, t - dt))
    disp = layer.gt_disp(p_t, t, dt)
    np.testing.assert_allclose(disp, p_t - p_prev, atol=1e-9)


def test_gt_map_matches_tracked_emitters():
    """End to end: for a rotation scene, the flow map value at the pixel
    where an emitter lands equals that emitter's true displacement
    (within the sub-pixel rounding bound |grad v| * dt * 0.5)."""
    rng = np.random.default_rng(3)
    res = (128, 128)
    layer = _rotation_layer(w=0.6)
    em = rng.uniform(20, 108, (50, 2))
    sc = Scene(res, layer, em, np.ones(50), objects=[])
    t, dt = 1.3, 0.1
    fm = sc.gt_flow_map(t, dt)  # [2, H, W], fm[0]=dx, fm[1]=dy
    p_t = layer.apply(em, np.full(len(em), t))
    p_prev = layer.apply(em, np.full(len(em), t - dt))
    true_disp = p_t - p_prev
    xi = np.round(p_t[:, 0]).astype(int)
    yi = np.round(p_t[:, 1]).astype(int)
    ok = (xi >= 0) & (xi < 128) & (yi >= 0) & (yi < 128)
    # |grad v| = w -> map-vs-emitter mismatch <= w * dt * 0.5 * sqrt(2)
    tol = 0.6 * dt * 0.5 * np.sqrt(2) + 1e-6
    assert ok.sum() > 30
    np.testing.assert_allclose(fm[0, yi[ok], xi[ok]],
                               true_disp[ok, 0], atol=tol)
    np.testing.assert_allclose(fm[1, yi[ok], xi[ok]],
                               true_disp[ok, 1], atol=tol)


def test_gt_map_spatially_varying():
    """Rotation GT maps are genuinely non-constant (the round-4 gap)."""
    rng = np.random.default_rng(0)
    sc = varied_eval_scene(rng, (128, 128), 8.0, "rotation")
    fm = sc.gt_flow_map(1.0, 0.1)
    mag = np.hypot(fm[0], fm[1])
    assert mag.std() > 0.1 * mag.mean()  # not constant
    # a rotation field's displacement grows ~linearly with radius: pixels
    # near the fixed point move far less than the far field
    assert np.percentile(mag, 95) > 3 * np.percentile(mag, 5)


def test_occlusion_suppresses_background_events():
    """No background events are emitted inside an object's disk (at the
    event's own timestamp)."""
    rng = np.random.default_rng(1)
    res = (64, 64)
    bg = MotionLayer([(0.0, 4.0, "translate", {"v": (10.0, 0.0)})])
    obj_layer = MotionLayer([(0.0, 4.0, "translate", {"v": (-12.0, 5.0)})])
    em = rng.uniform(0, 64, (400, 2))
    c0, r = np.array([32.0, 32.0]), 10.0
    oem, opol = disk_emitters(rng, c0, r)
    obj = SceneObject(obj_layer, c0, r, oem, opol)
    sc = Scene(res, bg, em, np.ones(400), [obj])
    ts, p, pol = sc._layer_events(rng, bg, em, np.ones(400), 20000,
                                  0.0, 4.0, z_index=-1)
    centers = obj.centers_at(ts)
    d = np.linalg.norm(p - centers, axis=1)
    assert (d >= r).all()
    # and the scene as a whole still produces object events there
    ts2, p2, _ = sc._layer_events(rng, obj_layer, oem, opol, 5000,
                                  0.0, 4.0, z_index=0)
    assert len(ts2) > 1000


def test_gt_map_object_wins_inside_disk():
    """Inside an occluder the GT map carries the OBJECT's displacement,
    outside the background's."""
    res = (64, 64)
    bg = MotionLayer([(0.0, 4.0, "translate", {"v": (10.0, 0.0)})])
    obj_layer = MotionLayer([(0.0, 4.0, "translate", {"v": (-12.0, 5.0)})])
    rng = np.random.default_rng(2)
    c0, r = np.array([32.0, 32.0]), 10.0
    oem, opol = disk_emitters(rng, c0, r)
    obj = SceneObject(obj_layer, c0, r, oem, opol)
    sc = Scene(res, bg, np.zeros((1, 2)), np.ones(1), [obj])
    t, dt = 1.0, 0.1
    fm = sc.gt_flow_map(t, dt)
    c_t = obj.centers_at(np.array([t]))[0]
    xi, yi = int(round(c_t[0])), int(round(c_t[1]))
    np.testing.assert_allclose(
        [fm[0, yi, xi], fm[1, yi, xi]], [-1.2, 0.5], atol=1e-6)
    np.testing.assert_allclose(
        [fm[0, 2, 2], fm[1, 2, 2]], [1.0, 0.0], atol=1e-6)


def test_events_stream_contract():
    """Scene.events returns sorted times, in-bounds integer coords,
    binary polarities, and a sane count."""
    rng = np.random.default_rng(5)
    sc = random_varied_scene(rng, (128, 128), 4.0, n_objects=2)
    ts, ys, xs, ps = sc.events(rng, 4.0, 20000.0)
    assert (np.diff(ts) >= 0).all()
    assert ts.min() >= 0 and ts.max() <= 4.0
    assert xs.min() >= 0 and xs.max() <= 127
    assert ys.min() >= 0 and ys.max() <= 127
    assert set(np.unique(ps)) <= {0, 1}
    assert xs.dtype == np.float32 and (xs == np.round(xs)).all()
    # affine motion drops OOB events instead of wrapping; the extended
    # emitter margin keeps the loss bounded
    assert len(ts) > 0.5 * 4.0 * 20000.0


@pytest.mark.parametrize("preset", ["rotation", "zoom", "rotozoom",
                                    "objects"])
def test_eval_presets_build_and_move(preset):
    rng = np.random.default_rng(11)
    sc = varied_eval_scene(rng, (128, 128), 3.2, preset)
    assert len(sc.objects) >= 2
    ts, ys, xs, ps = sc.events(rng, 3.2, 20000.0)
    assert len(ts) > 30000
    fm = sc.gt_flow_map(1.6, 0.1)
    mag = np.hypot(fm[0], fm[1])
    # enough motion that a 0.15 s eval window sees >= ~1.5 px at the
    # motion-rich pixels (FWL separability regime)
    assert np.percentile(mag, 90) * 1.5 > 1.4


def test_zoom_scale_stays_bounded():
    """Alternating zoom keeps the cumulative scale in a usable band
    (emitter density stays roughly constant across the sequence)."""
    rng = np.random.default_rng(4)
    sc = varied_eval_scene(rng, (128, 128), 12.8, "zoom")
    ks = [sc.bg_layer.scale_at(t) for t in np.linspace(0, 12.8, 50)]
    assert 0.5 < min(ks) and max(ks) < 2.0


def test_write_varied_sequence_schema(tmp_path):
    """The writer produces a reference-schema file the H5 stream reads."""
    import h5py

    from event_flow_tpu.data.schema import write_varied_sequence

    p = str(tmp_path / "var.h5")
    write_varied_sequence(p, res=(64, 64), duration=2.0, event_rate=10000,
                          seed=0, preset="rotation", gt_flow_hz=10.0)
    with h5py.File(p, "r") as f:
        assert "events/xs" in f and "flow_dt1" in f
        n_maps = len(f["flow_dt1"])
        assert n_maps == 21
        ts = f["events/ts"][:]
        assert abs(float(f.attrs["t0"]) - ts[0]) < 1e-6
        first = sorted(f["flow_dt1"])[0]
        assert f["flow_dt1"][first].shape == (2, 64, 64)
        assert "timestamp" in f["flow_dt1"][first].attrs
