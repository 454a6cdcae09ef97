"""Synthetic event streams for tests, the end-to-end training slice, and
benchmarks (no dataset download needed; the reference relies on external
UZH-FPV/MVSEC/ECD/HQF HDF5 files, README.md:60-78).

Generates events from points moving with constant velocity across the
sensor: a window's events at normalized time t in [0,1] sit at
``pos0 + t * velocity``. The contrast-maximization loss over such a window
has its minimum at flow = velocity/flow_scaling (the property the
reference's tools/demo_iwe.py:69-91 demonstrates), which makes these
streams a training-signal smoke test as well as a benchmark workload.
"""

import os

import numpy as np

__all__ = [
    "constant_flow_window",
    "synthetic_window_stream",
    "textured_emitters",
    "emitter_window",
    "rich_window_stream",
    "rich_sequence_events",
    "sample_speed",
    "ensure_synthetic_dataset",
]


def constant_flow_window(rng, n_events, res, velocity, sharp_points=64):
    """One event window with global constant pixel velocity.

    Args:
      rng: np.random.Generator.
      n_events: number of events.
      res: (H, W).
      velocity: (vy, vx) pixel displacement over the full window.
      sharp_points: number of distinct emitting points (smaller = sharper
        IWE contrast).
    Returns:
      [N, 4] float32 (ts, y, x, p), ts sorted in [0, 1], integer coords.
    """
    h, w = res
    vy, vx = velocity
    ts = np.sort(rng.uniform(0.0, 1.0, n_events)).astype(np.float32)
    base = rng.integers(0, [h, w], size=(sharp_points, 2)).astype(np.float32)
    # polarity is a property of the emitting edge (consistent per point),
    # like a real rising/falling intensity edge — not random per event
    point_pol = rng.choice([-1.0, 1.0], sharp_points).astype(np.float32)
    which = rng.integers(0, sharp_points, n_events)
    pos = base[which] + ts[:, None] * np.array([vy, vx], np.float32)
    pos = np.round(pos)
    # wrap around the sensor (avoids static pile-ups at the border that
    # would break the constant-flow collapse property)
    pos[:, 0] = np.mod(pos[:, 0], h)
    pos[:, 1] = np.mod(pos[:, 1], w)
    ps = point_pol[which]
    return np.stack([ts, pos[:, 0], pos[:, 1], ps], axis=1).astype(np.float32)


def textured_emitters(rng, res, n_structures=200):
    """Emitter pixels of a textured scene: a mix of points, line segments
    and blobs (what real intensity edges look like to an event camera —
    extended contours, not isolated dots).

    Returns (positions [P, 2] float32 (y, x), polarities [P] in {-1, +1});
    polarity is per-structure, like a rising/falling edge.
    """
    h, w = res
    pos, pol = [], []
    kinds = rng.choice(3, n_structures, p=[0.5, 0.35, 0.15])
    for kind in kinds:
        p = float(rng.choice([-1.0, 1.0]))
        c = rng.uniform(0, [h, w]).astype(np.float32)
        if kind == 0:  # point
            pts = c[None]
        elif kind == 1:  # line segment, 1-px spacing
            length = rng.uniform(3.0, 12.0)
            ang = rng.uniform(0.0, 2 * np.pi)
            t = np.arange(0.0, length, 1.0, dtype=np.float32)
            d = np.array([np.sin(ang), np.cos(ang)], np.float32)
            pts = c[None] + t[:, None] * d[None]
        else:  # blob: gaussian cluster
            k = rng.integers(4, 10)
            pts = c[None] + rng.normal(0.0, 1.5, (k, 2)).astype(np.float32)
        pos.append(pts)
        pol.extend([p] * len(pts))
    pos = np.concatenate(pos, axis=0).astype(np.float32)
    pos[:, 0] = np.mod(pos[:, 0], h)
    pos[:, 1] = np.mod(pos[:, 1], w)
    return pos, np.asarray(pol, np.float32)


def emitter_window(rng, emitters, pols, n_events, res, disp):
    """One event window from a given emitter set moving by ``disp``
    (total (dy, dx) pixel displacement over the window). Same contract as
    :func:`constant_flow_window` — [N, 4] (ts, y, x, p), ts sorted in
    [0, 1], integer wrapped coords."""
    h, w = res
    ts = np.sort(rng.uniform(0.0, 1.0, n_events)).astype(np.float32)
    which = rng.integers(0, len(emitters), n_events)
    pos = emitters[which] + ts[:, None] * np.asarray(disp, np.float32)
    pos = np.round(pos)
    pos[:, 0] = np.mod(pos[:, 0], h)
    pos[:, 1] = np.mod(pos[:, 1], w)
    ps = pols[which]
    return np.stack([ts, pos[:, 0], pos[:, 1], ps], axis=1).astype(np.float32)


def sample_speed(rng, lo=0.3, hi=3.0):
    """Log-uniform speed magnitude + uniform direction -> (vy, vx)."""
    mag = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
    ang = float(rng.uniform(0.0, 2 * np.pi))
    return (mag * np.sin(ang), mag * np.cos(ang))


def rich_window_stream(seed, batch, n_events, res, num_windows,
                       disp_range=(0.3, 3.0), n_structures=200,
                       rollover=64):
    """In-memory training stream over textured scenes with varied flow.

    Like :func:`synthetic_window_stream` but (a) scenes are textured
    emitter sets, not isolated points, and (b) each batch slot's
    per-window displacement is resampled (log-uniform magnitude in
    ``disp_range`` px/window, uniform direction) every ``rollover``
    batches — so training sees many flow magnitudes AND directions
    instead of one constant velocity per slot forever. Yields
    [B, T, N, 4] batches; scene positions persist across windows within a
    rollover period (true continuous motion for the recurrent state).
    """
    rng = np.random.default_rng(seed)
    h, w = res

    def _slot():
        em, pol = textured_emitters(rng, res, n_structures)
        disp = np.asarray(sample_speed(rng, *disp_range), np.float32)
        return [em, pol, disp]

    slots = [_slot() for _ in range(batch)]
    count = 0
    while True:
        out = []
        for s in slots:
            wins = []
            for _ in range(num_windows):
                wins.append(emitter_window(rng, s[0], s[1], n_events, res,
                                           s[2]))
                s[0] = s[0] + s[2]  # scene advances with the motion
                s[0][:, 0] = np.mod(s[0][:, 0], h)
                s[0][:, 1] = np.mod(s[0][:, 1], w)
            out.append(np.stack(wins))
        count += 1
        if count % rollover == 0:
            slots = [_slot() for _ in range(batch)]
        yield np.stack(out)  # [B, T, N, 4]


def rich_sequence_events(seed, res, duration, event_rate,
                         speed_range=(8.0, 40.0), segment_s=1.6,
                         n_structures=200, velocity=None):
    """Events + GT velocity timeline for one rich on-disk sequence.

    Motion is piecewise-constant: a new (vy, vx) px/s (log-uniform
    magnitude in ``speed_range``, uniform direction) every ``segment_s``
    seconds — unless ``velocity`` pins one constant (vy, vx) for the whole
    sequence (exact-GT evaluation sequences). The scene is a textured
    emitter set whose positions integrate the velocity, so motion is
    continuous across segment boundaries.

    Returns (ts [N] seconds from 0, ys, xs, ps in {0,1},
    segments [(t_start, t_end, vy, vx), ...]).
    """
    rng = np.random.default_rng(seed)
    h, w = res
    em, pol = textured_emitters(rng, res, n_structures)
    n_seg = max(1, int(round(duration / segment_s)))
    seg_d = duration / n_seg
    ts_all, ys_all, xs_all, ps_all, segments = [], [], [], [], []
    t = 0.0
    for _ in range(n_seg):
        v = (np.asarray(velocity, np.float32) if velocity is not None
             else np.asarray(sample_speed(rng, *speed_range), np.float32))
        n_ev = int(round(event_rate * seg_d))
        win = emitter_window(rng, em, pol, n_ev, res,
                             (v[0] * seg_d, v[1] * seg_d))
        ts_all.append(t + win[:, 0] * seg_d)
        ys_all.append(win[:, 1])
        xs_all.append(win[:, 2])
        ps_all.append((win[:, 3] > 0).astype(np.uint8))
        segments.append((t, t + seg_d, float(v[0]), float(v[1])))
        em = em + v * seg_d
        em[:, 0] = np.mod(em[:, 0], h)
        em[:, 1] = np.mod(em[:, 1], w)
        t += seg_d
    return (np.concatenate(ts_all), np.concatenate(ys_all),
            np.concatenate(xs_all), np.concatenate(ps_all), segments)


def synthetic_window_stream(seed, batch, n_events, res, num_windows,
                            velocity_range=4.0):
    """Yield batches of shape [B, T, N, 4] (T consecutive windows) with a
    per-sequence constant velocity per batch slot; mimics the training
    loader's fixed-event-count windows (configs/train_SNN.yml:6-7)."""
    rng = np.random.default_rng(seed)
    vel = rng.uniform(-velocity_range, velocity_range, size=(batch, 2))
    while True:
        out = np.stack(
            [
                np.stack(
                    [
                        constant_flow_window(rng, n_events, res, vel[b])
                        for _ in range(num_windows)
                    ]
                )
                for b in range(batch)
            ]
        )
        yield out  # [B, T, N, 4]


def ensure_synthetic_dataset(config, root=None, n_sequences=2,
                             n_windows=8.0):
    """Materialize (once, cached) a synthetic on-disk dataset matching an
    eval config's mode/resolution, and return its directory.

    Sized so each sequence yields ~``n_windows`` eval windows: in
    ``events`` mode that is n_windows * window_eval events; in the gtflow
    modes, GT maps at 10 Hz over enough duration for n_windows map
    intervals. Backs ``eval_flow.py --synthetic`` (datasetless smoke
    evaluation — the eval analogue of ``train_flow.py --synthetic``).
    """
    from .schema import write_synthetic_sequence

    mode = config["data"]["mode"]
    res = tuple(int(r) for r in config["loader"]["resolution"])
    window = float(config["data"].get("window", 5000))
    window_eval = float(config["data"].get("window_eval", window))

    # the generated content depends on every sizing input — key them all
    # so a changed recipe regenerates instead of reusing a stale cache
    key = (f"{mode}_{res[0]}x{res[1]}_w{window:g}_we{window_eval:g}"
           f"_{n_sequences}x{n_windows:g}")
    root = root or os.path.join("/tmp", "evflow_synth_eval")
    path = os.path.join(root, key)
    done = os.path.join(path, ".complete")
    if os.path.isfile(done):
        return path + os.sep
    os.makedirs(path, exist_ok=True)

    gt_hz = 10.0
    frame_hz = None
    if mode.startswith("gtflow"):
        intervals = n_windows * (4.0 if mode == "gtflow_dt4" else 1.0)
        duration = max(1.0, intervals / gt_hz)
        n_events = int(duration * 30000)
    elif mode == "time":  # window is SECONDS
        duration = max(1.0, n_windows * window)
        n_events = int(duration * 20000)
    elif mode == "frames":  # window is a frame count; frames at 10 Hz
        frame_hz = 10.0
        duration = max(1.0, n_windows * window / frame_hz)
        n_events = int(duration * 20000)
    else:  # events: fixed-count windows
        duration = max(1.0, n_windows * window / 15000.0)
        n_events = int(max(n_windows * window_eval,
                           n_windows * window, 20000))
    for i in range(n_sequences):
        write_synthetic_sequence(
            os.path.join(path, f"seq_{chr(ord('a') + i)}.h5"),
            res=res,
            n_events=n_events,
            duration=duration,
            velocity=((1.5 + i, 3.0 - i)),
            seed=i,
            gt_flow_hz=gt_hz if mode.startswith("gtflow") else None,
            gt_flow_dt4_interval=(4.0 / gt_hz if mode == "gtflow_dt4"
                                  else None),
            frame_hz=frame_hz,
        )
    with open(done, "w") as f:
        f.write("ok\n")
    return path + os.sep
