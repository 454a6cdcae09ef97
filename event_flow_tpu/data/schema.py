"""Reference-schema HDF5 writer (for tests, conversion tools, synthetic
datasets).

Schema (inferred from the reference reader, dataloader/h5.py:66-87,
127-134, 303, 314):
  /events/xs, /events/ys, /events/ts, /events/ps   (ps in {0, 1})
  file attrs: t0 (first event timestamp), duration (seconds)
  /images/<name> datasets with attr ``timestamp``      (optional)
  /flow_dt1/<name>, /flow_dt4/<name> [2, H, W] with attr ``timestamp``
"""

import h5py
import numpy as np

__all__ = ["write_h5_sequence", "write_synthetic_sequence",
           "write_rich_sequence", "write_varied_sequence"]


def write_h5_sequence(path, xs, ys, ts, ps, frames=None, flow_dt1=None,
                      flow_dt4=None):
    """Write one sequence. ``ps`` in {0,1}; ``frames``/``flow_*`` are lists
    of (timestamp, array)."""
    with h5py.File(path, "w") as f:
        f.create_dataset("events/xs", data=np.asarray(xs))
        f.create_dataset("events/ys", data=np.asarray(ys))
        f.create_dataset("events/ts", data=np.asarray(ts, np.float64))
        f.create_dataset("events/ps", data=np.asarray(ps))
        f.attrs["t0"] = float(ts[0]) if len(ts) else 0.0
        f.attrs["duration"] = float(ts[-1] - ts[0]) if len(ts) else 0.0
        for group_name, entries in (
            ("images", frames),
            ("flow_dt1", flow_dt1),
            ("flow_dt4", flow_dt4),
        ):
            if entries:
                for i, (t, arr) in enumerate(entries):
                    d = f.create_dataset(
                        f"{group_name}/{group_name}_{i:06d}",
                        data=np.asarray(arr),
                    )
                    d.attrs["timestamp"] = float(t)


def write_rich_sequence(path, res=(128, 128), duration=30.0,
                        event_rate=20000.0, seed=0, speed_range=(8.0, 40.0),
                        segment_s=1.6, n_structures=200, velocity=None,
                        gt_flow_hz=10.0, t0=10.0):
    """Textured, varied-flow synthetic sequence in the reference schema.

    Scenes are textured emitter sets (points + segments + blobs); motion
    is piecewise-constant velocity resampled every ``segment_s`` seconds
    (log-uniform |v| in ``speed_range`` px/s), or one constant
    ``velocity=(vy, vx)`` for exact-GT evaluation sequences. When
    ``gt_flow_hz`` is set, writes flow_dt1 maps storing the TRUE
    per-interval pixel displacement (x, y), computed by integrating the
    piecewise-constant velocity over each map interval — exact for any
    alignment of the GT grid with segment boundaries. This is the dataset the
    self-supervised metrics need to be meaningful: per-eval-window
    displacement is multi-pixel, so correct flow genuinely sharpens the
    IWE (FWL > 1, reference loss/flow.py:468-500) instead of the
    sub-pixel-motion regime where even GT flow scores FWL < 1.
    """
    from .synthetic import rich_sequence_events

    ts, ys, xs, ps, segments = rich_sequence_events(
        seed, res, duration, event_rate, speed_range=speed_range,
        segment_s=segment_s, n_structures=n_structures, velocity=velocity,
    )
    flow_dt1 = None
    if gt_flow_hz:
        dt = 1.0 / gt_flow_hz
        h, w = res
        flow_dt1 = []
        n_maps = int(round(duration * gt_flow_hz)) + 1
        for i in range(n_maps):
            t = i * dt
            # Both readers consume the map stamped t as the displacement of
            # the window ENDING at t, i.e. over [t - dt, t) (ours
            # data/h5.py idx = ceil(row + window); reference
            # dataloader/h5.py:311-315). Integrate the piecewise-constant
            # velocity over that interval — exact for ANY alignment of the
            # GT grid with the segment boundaries (the actual segment
            # length is duration/round(duration/segment_s), which need not
            # be a multiple of dt; round-4 advisor finding). Segments are
            # extended constantly beyond [0, duration) so the edge maps
            # integrate over a full dt.
            vy = vx = 0.0
            for k, (s0, s1, svy, svx) in enumerate(segments):
                lo = s0 if k > 0 else -np.inf
                hi = s1 if k < len(segments) - 1 else np.inf
                overlap = min(hi, t) - max(lo, t - dt)
                if overlap > 0:
                    vy += svy * overlap
                    vx += svx * overlap
            fm = np.zeros((2, h, w), np.float32)
            fm[0] = vx
            fm[1] = vy
            flow_dt1.append((t0 + t, fm))
    write_h5_sequence(path, xs, ys, t0 + ts, ps, flow_dt1=flow_dt1)
    return path


def write_varied_sequence(path, res=(128, 128), duration=30.0,
                          event_rate=20000.0, seed=0, preset=None,
                          n_objects=2, segment_s=1.6, n_structures=260,
                          gt_flow_hz=10.0, t0=10.0):
    """Spatially-varying synthetic sequence in the reference schema.

    Scenes (data/scene.py) compose a textured background under piecewise
    rotation/zoom/translation fields with independently-moving textured
    occluders; ``flow_dt1`` maps (when ``gt_flow_hz`` is set) store the
    closed-form-EXACT per-pixel displacement over each [t - dt, t) map
    interval, with the topmost layer winning per pixel — the synthetic
    counterpart of MVSEC's gtflow_dt1 structure (reference
    dataloader/h5.py:303-314).

    ``preset=None`` draws a random training scene
    (scene.random_varied_scene); a named preset ('rotation', 'zoom',
    'rotozoom', 'objects') builds one held-out evaluation family
    (scene.varied_eval_scene).
    """
    from .scene import random_varied_scene, varied_eval_scene

    rng = np.random.default_rng(seed)
    if preset is None:
        sc = random_varied_scene(rng, res, duration, segment_s=segment_s,
                                 n_structures=n_structures,
                                 n_objects=n_objects)
    else:
        sc = varied_eval_scene(rng, res, duration, preset,
                               segment_s=segment_s,
                               n_structures=n_structures)
    ts, ys, xs, ps = sc.events(rng, duration, event_rate)
    flow_dt1 = None
    if gt_flow_hz:
        dt = 1.0 / gt_flow_hz
        n_maps = int(round(duration * gt_flow_hz)) + 1
        flow_dt1 = [(t0 + i * dt, sc.gt_flow_map(i * dt, dt))
                    for i in range(n_maps)]
    write_h5_sequence(path, xs, ys, t0 + ts, ps, flow_dt1=flow_dt1)
    return path


def write_synthetic_sequence(path, res=(32, 32), n_events=8000, duration=1.0,
                             velocity=(2.0, 4.0), seed=0, gt_flow_hz=None,
                             t0=10.0, gt_flow_dt4_interval=None,
                             frame_hz=None):
    """Constant-velocity synthetic sequence in the reference schema.

    velocity is (vy, vx) px/second. When ``gt_flow_hz`` is set, writes
    flow_dt1 maps (constant GT displacement per frame interval) so
    gtflow_dt1 / AEE evaluation paths can run end-to-end.
    ``gt_flow_dt4_interval`` (seconds) additionally writes flow_dt4 maps —
    one every interval, displacement = velocity * interval (the MVSEC
    dt4 layout the reference's gtflow_dt4 mode reads,
    dataloader/h5.py:163-168). ``frame_hz`` writes an ``images/`` group
    (uint8 frames: the events of the preceding interval rendered as a
    count image) so the ``frames`` window mode can run.
    """
    from .synthetic import constant_flow_window

    rng = np.random.default_rng(seed)
    h, w = res
    win = constant_flow_window(
        rng, n_events, res, (velocity[0] * duration, velocity[1] * duration),
        sharp_points=24,
    )
    ts = t0 + win[:, 0] * duration
    ys, xs = win[:, 1], win[:, 2]
    ps = (win[:, 3] > 0).astype(np.uint8)

    flow_dt1 = None
    if gt_flow_hz:
        n_maps = int(duration * gt_flow_hz) + 1
        dt = 1.0 / gt_flow_hz
        # GT maps store per-interval pixel displacement (x, y), shape [2,H,W]
        fm = np.zeros((2, h, w), np.float32)
        fm[0] = velocity[1] * dt
        fm[1] = velocity[0] * dt
        flow_dt1 = [(t0 + i * dt, fm) for i in range(n_maps)]

    flow_dt4 = None
    if gt_flow_dt4_interval:
        dt4 = float(gt_flow_dt4_interval)
        n_maps = int(duration / dt4) + 1
        fm4 = np.zeros((2, h, w), np.float32)
        fm4[0] = velocity[1] * dt4
        fm4[1] = velocity[0] * dt4
        flow_dt4 = [(t0 + i * dt4, fm4) for i in range(n_maps)]

    frames = None
    if frame_hz:
        n_maps = int(duration * frame_hz) + 1
        dt = 1.0 / frame_hz
        frames = []
        for i in range(n_maps):
            t = t0 + i * dt
            sel = (ts >= t - dt) & (ts < t)
            img = np.zeros((h, w), np.int64)
            np.add.at(img, (ys[sel].astype(np.int64),
                            xs[sel].astype(np.int64)), 1)
            frames.append((t, np.clip(img * 32, 0, 255).astype(np.uint8)))

    write_h5_sequence(path, xs, ys, ts, ps, flow_dt1=flow_dt1,
                      flow_dt4=flow_dt4, frames=frames)
    return path
