"""Contrast-maximization sanity demo: grid-search a constant flow over an
event window, render the loss heatmap and the best-flow IWE.

TPU-native rebuild of the reference demo (reference: tools/demo_iwe.py):
instead of an interactive OpenCV loop, this evaluates the whole flow grid
as ONE vmapped, jitted computation on the accelerator and saves PNGs
(headless-friendly). Works on real HDF5 data or the built-in synthetic
stream (--synthetic).

Usage:
  python tools/demo_iwe.py --synthetic --out /tmp/demo
  python tools/demo_iwe.py --data datasets/data/ECD --window 30000 \
      --maxdisp 32 --res 48 --out /tmp/demo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None, help="dataset path (.h5 tree)")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--window", type=int, default=20000)
    ap.add_argument("--resolution", type=int, nargs=2, default=[180, 240])
    ap.add_argument("--maxdisp", type=float, default=32.0,
                    help="max displacement (px) searched in each direction")
    ap.add_argument("--res", type=int, default=None,
                    help="heatmap resolution (default: 1-px grid spacing — "
                         "the loss surface is spiky around the optimum)")
    ap.add_argument("--out", default="demo_iwe_out")
    args = ap.parse_args()
    if args.res is None:
        args.res = int(2 * args.maxdisp) + 1

    from event_flow_tpu.loss.warping import LossConfig, event_warping_loss
    from event_flow_tpu.ops.encodings import encode_window
    from event_flow_tpu.ops.iwe import compute_pol_iwe
    from event_flow_tpu.utils.visualization import events_to_image

    if args.synthetic:
        from event_flow_tpu.data.synthetic import constant_flow_window

        res = (64, 64)
        rng = np.random.default_rng(0)
        ev = constant_flow_window(rng, args.window, res, (6.0, -10.0),
                                  sharp_points=24)[None]
        valid = np.ones(ev.shape[:2], np.float32)
    else:
        assert args.data, "--data or --synthetic required"
        from event_flow_tpu.config.parser import default_config, merge_dicts
        from event_flow_tpu.data.h5 import EventStream

        res = tuple(args.resolution)
        cfg = default_config()
        merge_dicts(
            {"data": {"path": args.data, "mode": "events",
                      "window": args.window},
             "loader": {"resolution": list(res), "batch_size": 1}},
            cfg,
        )
        stream = EventStream(cfg)
        batch = stream.next_batch()
        ev, valid = batch["events"], batch["valid"]
        stream.close()

    enc = encode_window(jnp.asarray(ev), res, 2, valid=jnp.asarray(valid))
    # the demo searches pixel displacements directly (flow_scaling=1,
    # reference: tools/demo_iwe.py:44)
    lcfg = LossConfig(res, 1.0, 0.0)
    ev_l = enc["event_list"][:, None]
    pol = enc["pol_mask"][:, None]
    mask = enc["event_mask"][:, None]

    def loss_at(u, v):
        fmap = jnp.zeros((1, 1, *res, 2)).at[..., 0].set(u).at[..., 1].set(v)
        return event_warping_loss([fmap], ev_l, pol, mask, lcfg)

    scale = jnp.linspace(-args.maxdisp, args.maxdisp, args.res)
    uu, vv = jnp.meshgrid(scale, scale)
    heatmap = jax.jit(jax.vmap(loss_at))(uu.ravel(), vv.ravel())
    heatmap = np.asarray(heatmap).reshape(args.res, args.res)

    j, i = np.unravel_index(np.argmin(heatmap), heatmap.shape)
    best_u, best_v = float(scale[i]), float(scale[j])
    print(f"best constant flow: u(x)={best_u:+.2f} px, v(y)={best_v:+.2f} px")

    best = jnp.zeros((1, *res, 2)).at[..., 0].set(best_u).at[..., 1].set(best_v)
    iwe = compute_pol_iwe(best, enc["event_list"], res,
                          enc["pol_mask"][..., 0:1], enc["pol_mask"][..., 1:2],
                          flow_scaling=1, round_idx=True)

    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    axes[0].imshow(heatmap, extent=[-args.maxdisp, args.maxdisp,
                                    args.maxdisp, -args.maxdisp])
    axes[0].plot([best_u], [best_v], "rx")
    axes[0].set_title("loss heatmap (x=u, y=v)")
    axes[1].imshow(events_to_image(np.asarray(enc["event_cnt"])[0])[..., ::-1])
    axes[1].set_title("events")
    axes[2].imshow(events_to_image(np.asarray(iwe)[0])[..., ::-1])
    axes[2].set_title("best-flow IWE")
    path = os.path.join(args.out, "demo_iwe.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
