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
