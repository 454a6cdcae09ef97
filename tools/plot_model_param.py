"""Histogram learned model parameters (e.g. per-channel leaks) from a run's
checkpoint (reference: tools/plot_model_param.py reads them from an MLflow
run; here from the orbax checkpoint).

Usage:
  python tools/plot_model_param.py <runid> --param leak [--runs_root runs]
  (matches any parameter path containing the substring; e.g. 'leak',
   'thresh', 'kernel')
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runid")
    ap.add_argument("--param", default="leak")
    ap.add_argument("--runs_root", default="runs")
    ap.add_argument("--transform", choices=["none", "sigmoid"], default="none",
                    help="apply sigmoid to show effective leaks")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from event_flow_tpu.utils import checkpoint as ckpt

    run_dir = os.path.join(args.runs_root, args.runid)
    path = ckpt.latest_checkpoint(run_dir)
    assert path, f"no checkpoint under {run_dir}"
    tree = ckpt.restore_checkpoint(path)["params"]

    values = []
    labels = []
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in key_path)
        if args.param in name:
            v = np.asarray(leaf).ravel()
            if args.transform == "sigmoid":
                v = 1.0 / (1.0 + np.exp(-v))
            values.append(v)
            labels.append(name)
    assert values, f"no parameter matching {args.param!r}"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    allv = np.concatenate(values)
    ax.hist(allv, bins=50, alpha=0.8)
    ax.set_title(f"{args.param} ({len(labels)} tensors, "
                 f"{allv.size} values, transform={args.transform})")
    out = args.out or os.path.join(run_dir, f"param_{args.param}.png")
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print(f"wrote {out} — tensors: {labels[:6]}{'...' if len(labels) > 6 else ''}")


if __name__ == "__main__":
    main()
