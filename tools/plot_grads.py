"""Plot rolling-mean gradient-stat CSVs from a training run
(reference: tools/plot_grads.py; CSVs written when ``vis.store_grads`` is
enabled, see event_flow_tpu/train/loop.py).

Usage: python tools/plot_grads.py <runid> [--runs_root runs] [--window 50]
"""

import argparse
import csv
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runid")
    ap.add_argument("--runs_root", default="runs")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    path = os.path.join(args.runs_root, args.runid, "grads_w.csv")
    series = defaultdict(list)
    with open(path) as f:
        for row in csv.reader(f):
            name, mean_abs = row[0], float(row[1])
            series[name].append(mean_abs)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 5))
    w = args.window
    for name, vals in sorted(series.items()):
        v = np.asarray(vals)
        if len(v) >= w:
            v = np.convolve(v, np.ones(w) / w, mode="valid")
        ax.plot(v, label=name, linewidth=0.8)
    ax.set_yscale("log")
    ax.set_xlabel("update")
    ax.set_ylabel(f"mean |grad| (rolling {w})")
    ax.legend(fontsize=5, ncol=2)
    out = args.out or os.path.join(args.runs_root, args.runid, "grads.png")
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
