"""Materialize the synthetic dataset trees (train + eval splits).

The reference trains on external UZH-FPV HDF5 files and evaluates on
MVSEC/ECD/HQF (reference README.md:60-114) — none of which exist in this
environment. This builds stand-ins with the property that makes the
self-supervised metrics meaningful: textured scenes moving fast enough
that a correct flow estimate sharpens the IWE (held-out FWL > 1 is
achievable — GT flow scores ~2-3), plus exact GT flow maps so the AEE
protocol (reference loss/flow.py:582-628) can be scored against truth.

Two families (``--family``):

- ``rich`` (round 4): piecewise-constant GLOBAL velocity per segment;
  eval split is constant-velocity with exact flow_dt1 maps.
- ``varied`` (round 5): SPATIALLY-VARYING flow — rotation / zoom /
  rotozoom / translation background fields plus 2-3 independently-moving
  textured occluders per scene (data/scene.py), eval split split into the
  four named motion presets with closed-form-exact flow_dt1 maps. This is
  the regime the reference's real datasets exercise (MVSEC gtflow_dt1:
  rotation, zoom, parallax, IMOs — reference dataloader/h5.py:303-314).

Layout (reference schema, data/schema.py):
  <root>/train/seq_00..N.h5     varied motion, no GT maps
  <root>/eval/seq_a..d.h5       held-out motion + exact flow_dt1 maps

Usage:
  python tools/make_synth_dataset.py [--family rich|varied] \
      [--root datasets/synth_rich] [--train 16] [--eval 4] \
      [--duration 30] [--res 128 128]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_flow_tpu.data.schema import (  # noqa: E402
    write_rich_sequence,
    write_varied_sequence,
)
from event_flow_tpu.data.synthetic import sample_speed  # noqa: E402

EVENT_RATE = 20000.0  # ev/s: a 3000-ev eval window spans 0.15 s

EVAL_PRESETS = ("rotation", "zoom", "rotozoom", "objects")


def build(root, n_train=16, n_eval=4, duration=30.0, res=(128, 128),
          event_rate=EVENT_RATE, force=False):
    done = os.path.join(root, ".complete")
    if os.path.isfile(done) and not force:
        return root
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "eval"), exist_ok=True)
    for i in range(n_train):
        p = os.path.join(root, "train", f"seq_{i:02d}.h5")
        write_rich_sequence(p, res=res, duration=duration,
                            event_rate=event_rate, seed=100 + i,
                            speed_range=(8.0, 40.0), segment_s=1.6,
                            n_structures=220, gt_flow_hz=None)
        print(f"wrote {p}")
    # eval: constant velocity per sequence (exact GT), speeds spread over
    # the training range so the metrics cover slow AND fast motion
    # >=20 px/s so a 3000-event (0.15 s) eval window sees >=3 px of motion:
    # below that even GT flow scores FWL ~1.0 (sub-pixel streaks don't
    # sharpen under round-idx warping)
    rng = np.random.default_rng(7)
    for i in range(n_eval):
        v = sample_speed(rng, 20.0, 40.0)
        p = os.path.join(root, "eval", f"seq_{chr(ord('a') + i)}.h5")
        write_rich_sequence(p, res=res, duration=max(8.0, duration / 3),
                            event_rate=event_rate, seed=900 + i,
                            velocity=v, segment_s=1.6, n_structures=220)
        print(f"wrote {p}  velocity (vy,vx)=({v[0]:.2f},{v[1]:.2f}) px/s")
    with open(done, "w") as f:
        f.write("ok\n")
    return root


def build_varied(root, n_train=16, n_eval=4, duration=30.0, res=(128, 128),
                 event_rate=EVENT_RATE, force=False):
    """The spatially-varying family (round 5): train scenes resample
    rotation/zoom/translation fields per segment and carry 2-3 occluders;
    eval scenes are the four named presets with exact GT flow maps."""
    done = os.path.join(root, ".complete")
    if os.path.isfile(done) and not force:
        return root
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "eval"), exist_ok=True)
    rng = np.random.default_rng(13)
    for i in range(n_train):
        p = os.path.join(root, "train", f"seq_{i:02d}.h5")
        write_varied_sequence(p, res=res, duration=duration,
                              event_rate=event_rate, seed=300 + i,
                              preset=None,
                              n_objects=int(rng.integers(2, 4)),
                              gt_flow_hz=None)
        print(f"wrote {p}")
    for i in range(n_eval):
        preset = EVAL_PRESETS[i % len(EVAL_PRESETS)]
        p = os.path.join(root, "eval", f"seq_{chr(ord('a') + i)}.h5")
        write_varied_sequence(p, res=res, duration=max(8.0, duration / 3),
                              event_rate=event_rate, seed=700 + i,
                              preset=preset, gt_flow_hz=10.0)
        print(f"wrote {p}  preset={preset}")
    with open(done, "w") as f:
        f.write("ok\n")
    return root


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["rich", "varied"], default="rich")
    ap.add_argument("--root", default=None,
                    help="default: datasets/synth_<family>")
    ap.add_argument("--train", type=int, default=16)
    ap.add_argument("--eval", type=int, default=4)
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--res", type=int, nargs=2, default=[128, 128])
    ap.add_argument("--force", action="store_true")
    a = ap.parse_args()
    root = a.root or os.path.join("datasets", f"synth_{a.family}")
    fn = build_varied if a.family == "varied" else build
    fn(root, a.train, a.eval, a.duration, tuple(a.res), force=a.force)
