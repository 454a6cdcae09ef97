"""A/B the fused conv+LIF Pallas kernel vs the XLA cell path on the chip.

Measures a device-chained N-step cell scan (fwd+bwd, grads wrt params)
at the training-recipe shapes (b8, 128x128, 32ch, k3, bf16 cell compute)
for ConvLIF and ConvLIFRecurrent — the two cells EVFLOW_CELL_IMPL=pallas
actually routes (models/snn_cells.py::_use_fused). Three variants:

  xla             — the default XLA conv + elementwise cell
  pallas          — fused kernel, direct-conv backward (EVFLOW_FUSED_BWD=native)
  pallas-patches  — fused kernel, legacy Pallas im2col dx/dw backward

The scan chains steps on device so the ~34.5 ms tunnel round trip is paid
once per timing read, not per step (see .claude/skills/verify).

Usage: python tools/ab_fused_lif.py [--steps 20] [--iters 5] [--b 8]
"""

import argparse
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from event_flow_tpu.models import policy
from event_flow_tpu.models.snn_cells import ConvLIF, ConvLIFRecurrent
from event_flow_tpu.ops import fused_lif_pallas as _flp


def bench_cell(cell_cls, impl, bwd, b, hw, c, steps, iters):
    policy.set_cell_impl("pallas" if impl.startswith("pallas") else "xla")
    _flp._FUSED_BWD = bwd
    policy.set_cell_compute_dtype("bfloat16")

    cell = cell_cls(features=c, kernel_size=3)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, hw, hw, c), jnp.bfloat16)
    v = jnp.zeros((b, hw, hw, c), jnp.bfloat16)
    z = jnp.zeros((b, hw, hw, c), jnp.bfloat16)
    params = cell.init(key, x, (v, z))

    def step_loss(p, x):
        def body(carry, _):
            st, acc = carry
            out, st = cell.apply(p, x, st)
            return (st, acc + jnp.sum(out.astype(jnp.float32))), None

        (st, acc), _ = jax.lax.scan(body, ((v, z), 0.0), None, length=steps)
        return acc

    fn = jax.jit(jax.grad(step_loss))
    g = fn(params, x)
    jax.block_until_ready(g)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        g = fn(params, x)
        # real host sync (block_until_ready under-reports via the tunnel)
        float(jax.tree_util.tree_leaves(g)[0].ravel()[0])
        times.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(times) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--c", type=int, default=32)
    args = ap.parse_args()

    variants = [("xla", "native"), ("pallas", "native"),
                ("pallas-patches", "patches")]
    for cell_cls in (ConvLIF, ConvLIFRecurrent):
        for impl, bwd in variants:
            ms = bench_cell(cell_cls, impl, bwd, args.b, args.hw, args.c,
                            args.steps, args.iters)
            print(f"{cell_cls.__name__:18s} {impl:15s} "
                  f"{ms:7.3f} ms/step (fwd+bwd)", flush=True)


if __name__ == "__main__":
    main()
