"""Profile-backed roofline for the flagship training update (VERDICT r3 #8).

Captures a ``jax.profiler`` trace of the full LIFFireNet b8 training
update on the real chip, parses the TensorBoard/perfetto
``*.trace.json.gz`` the profiler writes, and attributes device time to
op categories (MXU convs/matmuls, VPU elementwise fusions, HBM
copies/transposes, scatter, infeed) — turning STATUS.md's op-count
roofline argument ("~4% MFU is near the 32-channel ceiling") into a
measured breakdown.

Usage:
  python tools/profile_update.py [--model LIFFireNet] [--updates 3]
      [--outdir /tmp/evflow_profile] [--summary docs/evidence_r4/profile_summary.md]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
# bench fast-path flags (same program bench.py times)
os.environ.setdefault("EVFLOW_CONV_IMPL", "im2col")
os.environ.setdefault("EVFLOW_CONV_DTYPE", "bfloat16")
os.environ.setdefault("EVFLOW_CELL_DTYPE", "bfloat16")
os.environ.setdefault("EVFLOW_REMAT", "convs")
os.environ.setdefault("EVFLOW_CELL_IMPL", "auto")


# op-name -> category heuristics for TPU trace events. Used ONLY as the
# fallback when an event carries no ``hlo_category`` arg: XLA's own
# category is authoritative — e.g. ``select_add_fusion`` / ``bitcast_
# dynamic-update-slice_fusion`` events are "convolution fusion"s (the
# custom conv-backward dw computations) that a name heuristic would
# misfile as VPU elementwise (this exact misattribution shaped the first
# round-5 UNet read of the data).
CATEGORIES = (
    ("conv/matmul (MXU)", ("convolution", "dot", "conv_general")),
    ("scatter", ("scatter",)),
    ("gather", ("gather",)),
    ("copy/layout (HBM)", ("copy", "transpose", "bitcast", "reshape",
                           "all-reduce", "tuple")),
    ("dynamic-slice", ("dynamic-slice", "dynamic-update-slice", "slice",
                       "concatenate", "pad")),
    ("elementwise/fusion (VPU)", ("fusion", "loop_fusion", "add", "multiply",
                                  "select", "compare", "exponential",
                                  "tanh", "divide", "subtract", "maximum",
                                  "reduce", "broadcast", "convert")),
)

# XLA hlo_category -> report bucket
HLO_CATEGORY_MAP = {
    "convolution": "conv/matmul (MXU)",
    "convolution fusion": "conv/matmul (MXU)",
    "dot": "conv/matmul (MXU)",
    "dot fusion": "conv/matmul (MXU)",
    "copy": "copy/layout (HBM)",
    "copy fusion": "copy/layout (HBM)",
    "transpose": "copy/layout (HBM)",
    "concatenate": "concat/slice",
    "concatenate fusion": "concat/slice",
    "dynamic-slice": "concat/slice",
    "dynamic-update-slice": "concat/slice",
    "slice": "concat/slice",
    "pad": "concat/slice",
    "scatter": "scatter",
    "gather": "gather",
    "loop fusion": "elementwise/fusion (VPU)",
    "input fusion": "elementwise/fusion (VPU)",
    "output fusion": "elementwise/fusion (VPU)",
    "custom fusion": "elementwise/fusion (VPU)",
    "fusion": "elementwise/fusion (VPU)",
    "reduce": "elementwise/fusion (VPU)",
}


def categorize(name, hlo_category=None):
    if hlo_category:
        mapped = HLO_CATEGORY_MAP.get(hlo_category.lower())
        if mapped:
            return mapped
        return hlo_category
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def run_and_trace(model_name, updates, outdir):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import init_train_state, make_train_step
    import __graft_entry__ as ge

    res = (128, 128)
    b, t, n = 8, 10, 1024
    if model_name == "LIFFireNet":
        model = ge._flagship()
    else:
        # the exact model config bench.py times (RecEVFlowNet is an ANN:
        # relu activations, no spiking_neuron block)
        import bench
        from event_flow_tpu.models.registry import get_model

        model = get_model(model_name, bench.MODEL_CFGS[model_name])
    tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
    loss_cfg = LossConfig(res, float(max(res)), 0.001, smoothing_mask=True)
    step = jax.jit(make_train_step(model, tx, res, 2, loss_cfg,
                                   micro_batch=4))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), b, res, 2)

    rng = np.random.default_rng(0)
    ev = np.zeros((b, t, n, 4), np.float32)
    ev[..., 0] = np.sort(rng.uniform(0, 1, (b, t, n)), axis=-1)
    ev[..., 1] = rng.integers(0, res[0], (b, t, n))
    ev[..., 2] = rng.integers(0, res[1], (b, t, n))
    ev[..., 3] = rng.choice([-1.0, 1.0], (b, t, n))
    ev = jnp.asarray(ev)
    valid = jnp.ones((b, t, n))
    aug = jnp.zeros((b, 3))
    reset = jnp.asarray(False)

    # compile + warm outside the trace
    state, loss = step(state, ev, valid, aug, reset)
    print(f"warmup loss {float(loss):.4f}")

    with jax.profiler.trace(outdir):
        for _ in range(updates):
            state, loss = step(state, ev, valid, aug, reset)
        _ = float(loss)  # real sync inside the trace window
    return outdir


def parse_trace(outdir, top_k=25):
    pats = sorted(glob.glob(os.path.join(
        outdir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert pats, f"no trace.json.gz under {outdir}"
    with gzip.open(pats[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid whose process_name mentions TPU/device; fall back
    # to "all complete events with a dur" minus obvious host threads
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower()}
    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    flops_by_cat = defaultdict(float)
    total = 0.0
    total_flops = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("Steps") or name in ("tracing", "program"):
            continue
        # drop CONTAINER events (they nest the leaf ops and would double
        # count): the jit program span, while/scan body spans, and the
        # bare-number step markers. Verified on a v5e trace: the remaining
        # leaf ops sum to the measured device ms/update.
        if (name.startswith(("jit_", "while")) or name.isdigit()):
            continue
        args = e.get("args") or {}
        dur = e["dur"] / 1e3  # us -> ms
        cat = categorize(name, args.get("hlo_category"))
        by_name[name] += dur
        by_cat[cat] += dur
        total += dur
        # XLA's own FLOP estimate per op: lets the summary state measured
        # MXU utilization per bucket, not just time shares
        try:
            fl = float(args.get("model_flops", 0) or 0)
        except (TypeError, ValueError):
            fl = 0.0
        flops_by_cat[cat] += fl
        total_flops += fl
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:top_k]
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    return total, cats, top, pid_names, flops_by_cat, total_flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="LIFFireNet")
    ap.add_argument("--updates", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/evflow_profile")
    ap.add_argument("--summary", default=None,
                    help="write a markdown summary here")
    ap.add_argument("--parse-only", action="store_true",
                    help="parse an existing trace dir (no chip run)")
    args = ap.parse_args()

    if not args.parse_only:
        run_and_trace(args.model, args.updates, args.outdir)
    total, cats, top, pids, flops_by_cat, total_flops = parse_trace(
        args.outdir)

    lines = [f"# {args.model} update: device-time attribution",
             "",
             f"trace: {args.outdir}, {args.updates} updates, "
             f"total tracked {total:.1f} ms, "
             f"XLA-estimated {total_flops / 1e9:.1f} GFLOP", "",
             "| category | ms | share | GFLOP | eff TFLOP/s |",
             "|---|---|---|---|---|"]
    for cat, ms in cats:
        fl = flops_by_cat.get(cat, 0.0)
        eff = fl / (ms * 1e-3) / 1e12 if ms > 0 else 0.0
        lines.append(f"| {cat} | {ms:.2f} | {ms / max(total, 1e-9):.1%} "
                     f"| {fl / 1e9:.1f} | {eff:.1f} |")
    lines += ["", "Top ops:", "", "| op | ms |", "|---|---|"]
    for name, ms in top:
        lines.append(f"| `{name[:70]}` | {ms:.2f} |")
    out = "\n".join(lines)
    print(out)
    if args.summary:
        summary_dir = os.path.dirname(args.summary)
        if summary_dir:
            os.makedirs(summary_dir, exist_ok=True)
        with open(args.summary, "w") as f:
            f.write(out + "\n")
        print(f"\nwrote {args.summary}")


if __name__ == "__main__":
    main()
