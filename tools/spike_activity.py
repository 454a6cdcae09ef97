"""Per-layer spike-rate report for a (FireNet-family) checkpoint.

The reference logs per-layer fractions of nonzero outputs as its
energy-efficiency proxy (reference: models/model.py:268-282,
utils/visualization.py:318-357 `vis_activity`). This tool streams K
synthetic windows through a trained or random-init model with activity
logging enabled and prints the running mean per layer — the "spike rates
stay in a sane band" evidence for sustained training runs.

Usage:
  python tools/spike_activity.py --config configs/train_SNN.yml \
      [--run runs/<runid>] [--windows 40] [--res 128]
(without --run, reports the random-init rates for comparison)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ap = argparse.ArgumentParser()
ap.add_argument("--config", default="configs/train_SNN.yml")
ap.add_argument("--run", default="", help="run dir with checkpoints")
ap.add_argument("--windows", type=int, default=40)
ap.add_argument("--res", type=int, default=128)
ap.add_argument("--batch", type=int, default=1)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from event_flow_tpu.config.parser import YAMLConfig
from event_flow_tpu.data.synthetic import constant_flow_window
from event_flow_tpu.models.registry import get_model
from event_flow_tpu.ops.encodings import encode_windows_cf
from event_flow_tpu.utils import checkpoint as ckpt


def main():
    config = YAMLConfig(args.config).config
    res = (args.res, args.res)
    num_bins = int(config["model"].get("num_bins", 2))
    model = get_model(config["model"]["name"], config["model"])

    state = model.zero_state(args.batch, *res)
    rng = np.random.default_rng(0)
    n = int(config["data"].get("window", 1000))

    def window_batch():
        return np.stack([
            constant_flow_window(rng, n, res, (2.0, -2.0), 64)
            for _ in range(args.batch)
        ])[:, None]  # [B, 1, N, 4]

    enc0 = encode_windows_cf(jnp.asarray(window_batch()), res, num_bins)
    vox = jnp.moveaxis(enc0["event_voxel"][:, 0], 1, -1)
    cnt = jnp.moveaxis(enc0["event_cnt"][:, 0], 1, -1)

    params = model.init(jax.random.PRNGKey(0), vox, cnt, state)
    if args.run:
        path = ckpt.latest_checkpoint(args.run)
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {args.run}")
        restored = ckpt.restore_checkpoint(path)

        def refit(tmpl, val):
            flat_v = jax.tree_util.tree_leaves(val)
            flat_t, tdef = jax.tree_util.tree_flatten(tmpl)
            return jax.tree_util.tree_unflatten(
                tdef,
                [np.asarray(v).astype(t.dtype).reshape(t.shape)
                 for v, t in zip(flat_v, flat_t)],
            )

        params = refit(params, restored["params"])
        print(f"restored {path}")
    else:
        print("random init (no --run)")

    @jax.jit
    def step(params, state, events):
        enc = encode_windows_cf(events, res, num_bins)
        vox = jnp.moveaxis(enc["event_voxel"][:, 0], 1, -1)
        cnt = jnp.moveaxis(enc["event_cnt"][:, 0], 1, -1)
        out, state = model.apply(params, vox, cnt, state, log=True)
        return out["activity"], state

    sums, count = {}, 0
    for _ in range(args.windows):
        act, state = step(params, state, jnp.asarray(window_batch()))
        for k, v in act.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1

    print(f"per-layer mean activity over {count} windows "
          f"({config['model']['name']}, {args.res}x{args.res}):")
    for k in sorted(sums):
        print(f"  {k:10s} {sums[k] / count:.4f}")


if __name__ == "__main__":
    main()
