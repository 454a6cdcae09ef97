"""Neuron dynamic-range study: spiking activity vs input window size across
parameter initializations.

TPU-native rebuild of the reference study (reference:
tools/compare_dynrange.py): sweeps LIF/ALIF cells over event windows of
increasing size and plots the mean spike rate per window size, for several
leak/threshold inits. All cell evaluations for one sweep run as a single
vmapped, jitted computation.

Usage: python tools/compare_dynrange.py --out /tmp/dynrange
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
    ap.add_argument("--out", default="dynrange_out")
    ap.add_argument("--windows", type=int, nargs="+",
                    default=[250, 500, 1000, 2000, 4000, 8000])
    ap.add_argument("--steps", type=int, default=20,
                    help="recurrent steps per measurement")
    args = ap.parse_args()

    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.models.snn_cells import ConvALIF, ConvLIF
    from event_flow_tpu.ops.encodings import encode_window

    res = (64, 64)
    rng = np.random.default_rng(0)

    inits = {
        "leak N(-4,.1)": {"leak": (-4.0, 0.1), "thresh": (0.8, 0.1)},
        "leak N(-2,.1)": {"leak": (-2.0, 0.1), "thresh": (0.8, 0.1)},
        "leak N(0,.1)": {"leak": (0.0, 0.1), "thresh": (0.8, 0.1)},
    }
    alif_inits = {
        "alif default": {},
        "alif leak_v N(-2,.1)": {"leak_v": (-2.0, 0.1)},
    }

    results = {}
    for family, cell_cls, init_table in (
        ("LIF", ConvLIF, inits),
        ("ALIF", ConvALIF, alif_inits),
    ):
        for name, kw in init_table.items():
            cell = cell_cls(16, 3, **kw)
            key = jax.random.PRNGKey(0)

            def run(params, x, state):
                def body(s, _):
                    z, s = cell.apply(params, x, s)
                    return s, (z != 0).mean()
                _, acts = jax.lax.scan(body, state, None, length=args.steps)
                return acts.mean()

            run_j = jax.jit(run)  # one compile per cell; x shape is fixed
            params = None
            rates = []
            for n in args.windows:
                ev = constant_flow_window(rng, n, res, (4.0, -4.0), 24)[None]
                enc = encode_window(jnp.asarray(ev), res, 2)
                x = enc["event_cnt"]
                state = cell.zero_state(1, *res)
                if params is None:
                    params = cell.init(key, x, state)
                rates.append(float(run_j(params, x, state)))
            results[f"{family} {name}"] = rates
            print(f"{family:5s} {name:22s}", [f"{r:.3f}" for r in rates])

    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    for name, rates in results.items():
        ax.plot(args.windows, rates, marker="o", label=name)
    ax.set_xscale("log")
    ax.set_xlabel("events per window")
    ax.set_ylabel("mean spike rate")
    ax.legend(fontsize=8)
    path = os.path.join(args.out, "dynrange.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
