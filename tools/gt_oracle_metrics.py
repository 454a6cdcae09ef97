"""GT-oracle FWL/RSAT on an eval split: the metric ceiling of the data.

Feeds the EXACT ground-truth flow (from each file's ``flow_dt1`` maps)
through the self-supervised metrics as if a perfect model had predicted
it. Two uses:

  1. dataset validation — a discriminative eval split must give GT flow
     an FWL comfortably > 1 (the round-3 lesson: near-static sequences
     score FWL < 1 even for perfect flow, making trained-model FWL
     meaningless);
  2. an "oracle" row for the evidence tables: the upper bound trained
     models are chasing on this data.

Protocol mirrors the eval configs (reference eval_flow.py:160-213):
``window``-event forward passes accumulated until ``window_eval`` events,
then FWL (round-idx warp, var ratio — reference loss/flow.py:468-500) and
RSAT (avg-timestamp ratio — loss/flow.py:503-579) per metric window,
averaged per file.

Usage:
  python tools/gt_oracle_metrics.py <eval_dir> [--window 1000]
      [--window_eval 3000] [--flow_scaling 128] [--limit-windows N]
"""

import argparse
import glob
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_file(path):
    with h5py.File(path, "r") as f:
        t0 = float(f.attrs["t0"])
        ts = np.asarray(f["events/ts"]) - t0
        xs = np.asarray(f["events/xs"], np.float32)
        ys = np.asarray(f["events/ys"], np.float32)
        ps = np.asarray(f["events/ps"], np.float32) * 2.0 - 1.0
        maps, stamps = [], []
        if "flow_dt1" in f:
            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    maps.append(np.asarray(obj))
                    stamps.append(float(obj.attrs["timestamp"]) - t0)
            f["flow_dt1"].visititems(visit)
    order = np.argsort(stamps)
    stamps = np.asarray(stamps)[order]
    maps = np.stack([maps[i] for i in order]) if maps else None
    return ts, ys, xs, ps, stamps, maps


def gt_velocity_at(ts_ev, ys_ev, xs_ev, stamps, maps):
    """Per-event (vy, vx) px/s from the map covering each event time.

    Map stamped t stores the displacement over [t - dt, t) (both readers'
    convention); dt from consecutive stamps. Events past the last map use
    the last map (constant extension)."""
    dt = float(np.median(np.diff(stamps))) if len(stamps) > 1 else 1.0
    # event at time tau is covered by the first map with stamp >= tau
    idx = np.clip(np.searchsorted(stamps, ts_ev, side="left"),
                  0, len(stamps) - 1)
    yi = ys_ev.astype(np.int64)
    xi = xs_ev.astype(np.int64)
    disp_x = maps[idx, 0, yi, xi]
    disp_y = maps[idx, 1, yi, xi]
    return disp_y / dt, disp_x / dt


def oracle_metrics(path, window=1000, window_eval=3000, flow_scaling=128,
                   limit_windows=None):
    import jax.numpy as jnp

    from event_flow_tpu.loss.metrics import fwl, rsat

    ts, ys, xs, ps, stamps, maps = load_file(path)
    assert maps is not None, f"{path} has no flow_dt1 maps"
    passes = window_eval // window
    fwls, rsats = [], []
    n_windows = len(ts) // window_eval
    if limit_windows:
        n_windows = min(n_windows, limit_windows)
    for wi in range(n_windows):
        lo = wi * window_eval
        ev_t, ev_y, ev_x, ev_p = (a[lo:lo + window_eval]
                                  for a in (ts, ys, xs, ps))
        # accumulated event list: ts = pass_idx + normalized-within-pass
        # (the association convention, reference loss/flow.py:87-91)
        t_acc = np.empty(window_eval, np.float64)
        durs = []
        for k in range(passes):
            s = slice(k * window, (k + 1) * window)
            t0k, t1k = ev_t[s][0], ev_t[s][-1]
            d = max(t1k - t0k, 1e-9)
            durs.append(d)
            t_acc[s] = k + (ev_t[s] - t0k) / d
        d_pass = float(np.mean(durs))
        vy, vx = gt_velocity_at(ev_t, ev_y, ev_x, stamps, maps)
        # warp displacement = flow * flow_scaling * (tref - t_acc); one
        # unit of t_acc spans one pass (d_pass seconds), so the per-event
        # oracle flow is v * d_pass / flow_scaling
        flow = np.stack([vy, vx], axis=1) * d_pass / flow_scaling
        el = jnp.asarray(
            np.stack([t_acc, ev_y, ev_x, ev_p], axis=1))[None]
        fl = jnp.asarray(flow, jnp.float32)[None]
        pm = jnp.stack([(el[..., 3] > 0).astype(jnp.float32),
                        (el[..., 3] < 0).astype(jnp.float32)], axis=-1)
        res = (int(ev_y.max()) + 1 if False else None)
        h = int(ys.max()) + 1
        w = int(xs.max()) + 1
        fwls.append(float(fwl(el, fl, passes, (h, w), flow_scaling)[0]))
        rsats.append(float(rsat(el, fl, pm, passes, (h, w),
                                flow_scaling)[0]))
    return float(np.mean(fwls)), float(np.mean(rsats)), n_windows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("eval_dir")
    ap.add_argument("--window", type=int, default=1000)
    ap.add_argument("--window_eval", type=int, default=3000)
    ap.add_argument("--flow_scaling", type=float, default=128)
    ap.add_argument("--limit-windows", type=int, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    files = sorted(glob.glob(os.path.join(args.eval_dir, "*.h5")))
    assert files, f"no .h5 under {args.eval_dir}"
    print(f"# GT-oracle FWL (>1 good) / RSAT (<1 good), "
          f"w{args.window}/we{args.window_eval}, fs={args.flow_scaling}")
    ok = True
    for p in files:
        f, r, n = oracle_metrics(p, args.window, args.window_eval,
                                 args.flow_scaling, args.limit_windows)
        flag = "" if f > 1.05 else "  <-- NOT discriminative"
        ok &= f > 1.05
        print(f"{os.path.basename(p)}: FWL {f:.3f}  RSAT {r:.3f} "
              f"({n} windows){flag}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
