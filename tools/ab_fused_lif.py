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
           [--hw 128] [--c 32] [--cells ff,rec] [--variants xla,pallas,...]

Measured crossover (b8, hw128, --iters 3, 2026-08-17 — raw numbers
include ~1.7 ms/step of amortized tunnel rtt; ranking unaffected):

  ConvLIFRecurrent: XLA wins at c32 (2.88 vs 3.98), the FUSED kernel wins
  at c64 (5.09 vs 4.42, -13%) — and at c256/hw16 (-18%, separate run).
  ConvLIF (ff): XLA wins at every measured width (2.47/2.94/2.81 vs
  3.32/3.90/3.60 at c32/c64/c128) — without the second conv there is no
  fusion win to offset the hand-scheduled kernel's overhead.
  c128 recurrent at hw128 is NOT comparable: the kernel's VMEM gate
  rejects that shape, so earlier "pallas" timings there silently measured
  the XLA fallback (the tool now refuses to mislabel gated shapes).

So the fused kernel's value window is RECURRENT cells where the MXU lanes
fill (c64 at any resolution; c>=128 at <=32x32 images — measured at
c128/hw32, c256/hw16, c512/hw8), where keeping patches + both kernels
VMEM-resident between the two convs beats XLA's two-dispatch schedule.
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
    if impl.startswith("pallas"):
        # a gated shape would silently bench the XLA fallback under a
        # "pallas" label — refuse instead of producing a bogus number
        rec = cell_cls is ConvLIFRecurrent
        if not _flp.fused_lif_available((b, hw, hw, c), 3, 1, cout=c,
                                        rec=rec):
            return None
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
    ap.add_argument("--cells", default="ff,rec",
                    help="comma subset of ff,rec")
    ap.add_argument("--variants", default="xla,pallas,pallas-patches")
    args = ap.parse_args()

    all_variants = {"xla": ("xla", "native"),
                    "pallas": ("pallas", "native"),
                    "pallas-patches": ("pallas-patches", "patches")}
    variants = [all_variants[v] for v in args.variants.split(",")]
    cells = {"ff": ConvLIF, "rec": ConvLIFRecurrent}
    for cell_cls in [cells[c] for c in args.cells.split(",")]:
        for impl, bwd in variants:
            ms = bench_cell(cell_cls, impl, bwd, args.b, args.hw, args.c,
                            args.steps, args.iters)
            if ms is None:
                print(f"{cell_cls.__name__:18s} {impl:15s} "
                      "   SKIP (VMEM gate -> XLA fallback)", flush=True)
                continue
            print(f"{cell_cls.__name__:18s} {impl:15s} "
                  f"{ms:7.3f} ms/step (fwd+bwd)", flush=True)


if __name__ == "__main__":
    main()
