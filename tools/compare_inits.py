"""Histogram the framework's conv weight-init schemes
(reference: tools/compare_inits.py).

Usage: python tools/compare_inits.py --out /tmp/inits
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="inits_out")
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--cout", type=int, default=32)
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from event_flow_tpu.models.conv import (
        _uniform_fan_in_channels_init,
        torch_conv_kernel_init,
    )

    key = jax.random.PRNGKey(0)
    shape = (args.k, args.k, args.cin, args.cout)
    schemes = {
        "torch default U(+-1/sqrt(Cin k^2))": torch_conv_kernel_init(
            key, shape
        ),
        "snn U(+-1/sqrt(Cin))": _uniform_fan_in_channels_init(key, shape),
        "orthogonal": nn.initializers.orthogonal(column_axis=-1)(
            key, shape, jnp.float32
        ),
        "w_scale 0.01": jax.random.uniform(key, shape, jnp.float32,
                                           -0.01, 0.01),
    }

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.out, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 4))
    for name, w in schemes.items():
        ax.hist(np.asarray(w).ravel(), bins=80, histtype="step", label=name,
                density=True)
        print(f"{name:36s} std={float(np.std(np.asarray(w))):.4f}")
    ax.legend(fontsize=8)
    ax.set_yscale("log")
    path = os.path.join(args.out, "inits.png")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
