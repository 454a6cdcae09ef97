"""UNet-family perf A/B: sweep env levers over the real benched update.

The perf ladder (remat mode, micro-batch, scan unroll, cell impl) was
measured on the LIFFireNet flagship; RecEVFlowNet / SpikingRecEVFlowNet
run a different program shape (deep 64-512-channel encoders, ConvGRU /
LIF-recurrent stages, 4-scale decoders), so the flagship's optimum is
not automatically theirs (VERDICT r4 #3). Each variant runs in a FRESH
subprocess (env flags are read at import/trace time) timing the exact
bench.py program via bench.bench_model, compile cache on.

Usage:
  python tools/ab_unet.py --model RecEVFlowNet [--s 4] [--cooldown 45]
  python tools/ab_unet.py --worker --model X   # internal
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> env overrides (on top of bench.py's fast-path defaults)
VARIANTS = {
    "baseline(convs,mb4)": {},
    "remat=full": {"EVFLOW_REMAT": "full"},
    "remat=none": {"EVFLOW_REMAT": "none"},
    "remat=dots": {"EVFLOW_REMAT": "dots"},
    "mb=none": {"AB_MICRO_BATCH": "0"},
    "mb=2": {"AB_MICRO_BATCH": "2"},
    "unroll=2": {"EVFLOW_SCAN_UNROLL": "2"},
    "cells=xla": {"EVFLOW_CELL_IMPL": "xla"},
    # the profile attributes ~30% of the RecEVFlowNet update to the custom
    # conv backward's T-stacked dw data movement (concatenate.741-744 +
    # operand relayout copies) — these two switch its formulation / the
    # conv implementation entirely
    "conv_bwd=moveaxis": {"EVFLOW_CONV_BWD": "moveaxis"},
    "conv=lax": {"EVFLOW_CONV_IMPL": "xla"},
    "conv=lax,remat=none": {"EVFLOW_CONV_IMPL": "xla",
                            "EVFLOW_REMAT": "none"},
    # combos of the measured single-lever wins (mb=none 1.18x, conv=lax
    # 1.12x on RecEVFlowNet)
    "mb=none,conv=lax": {"AB_MICRO_BATCH": "0", "EVFLOW_CONV_IMPL": "xla"},
    "mb=none,conv=lax,remat=none": {"AB_MICRO_BATCH": "0",
                                    "EVFLOW_CONV_IMPL": "xla",
                                    "EVFLOW_REMAT": "none"},
}


def worker(model_name, s, mb_override):
    sys.path.insert(0, REPO)
    import bench  # sets env fast-path defaults + compile cache

    bench.S = s
    if mb_override is not None:
        val = mb_override if mb_override > 0 else None
        bench.MB = val
        bench.MODEL_MB[model_name] = val
    else:
        # sweep baseline = the ladder MB, not the per-model default, so
        # mb variants stay comparable across models
        bench.MODEL_MB.pop(model_name, None)
    # conv impl comes from the variant env (bench.py's module-level
    # setdefault makes it im2col for the baseline), never the per-model
    # bench default — variants must stay comparable across models
    bench.MODEL_CONV_IMPL.pop(model_name, None)

    import signal

    def _timeout(signum, frame):
        raise TimeoutError("TPU worker hang (ab watchdog)")

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(300)
    rtt = bench._measure_rtt_s()
    signal.alarm(1200)
    r = bench.bench_model(model_name, rtt)
    signal.alarm(0)
    print("ABRESULT " + json.dumps({
        "windows_per_sec": round(r["windows_per_sec"], 1),
        "device_ms_per_update": round(r["device_ms_per_update"], 2),
        "mfu": round(r["mfu"], 4) if r["mfu"] else None,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="RecEVFlowNet")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--s", type=int, default=4,
                    help="chained updates per dispatch (compile-size lever)")
    ap.add_argument("--cooldown", type=int, default=45,
                    help="seconds between variants (worker recovery)")
    ap.add_argument("--variants", nargs="*", default=None,
                    help="subset of variant names (default: all)")
    args = ap.parse_args()

    if args.worker:
        mb = os.environ.get("AB_MICRO_BATCH")
        worker(args.model, args.s, int(mb) if mb is not None else None)
        return

    names = args.variants or list(VARIANTS)
    results = {}
    for name in names:
        env = dict(os.environ)
        env.update(VARIANTS[name])
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--model", args.model, "--s", str(args.s)],
            env=env, cwd=REPO, capture_output=True, text=True,
            timeout=1800,
        )
        out = [ln for ln in p.stdout.splitlines()
               if ln.startswith("ABRESULT ")]
        if p.returncode == 0 and out:
            results[name] = json.loads(out[0][len("ABRESULT "):])
            r = results[name]
            print(f"{name:24s} {r['windows_per_sec']:8.1f} w/s  "
                  f"{r['device_ms_per_update']:7.2f} ms dev  "
                  f"mfu={r['mfu']}  ({time.time() - t0:.0f}s)", flush=True)
        else:
            tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
            print(f"{name:24s} FAILED rc={p.returncode}: "
                  + " | ".join(tail), flush=True)
        time.sleep(args.cooldown)

    if results:
        best = max(results.items(), key=lambda kv: kv[1]["windows_per_sec"])
        print(f"\nbest: {best[0]} at {best[1]['windows_per_sec']} w/s")


if __name__ == "__main__":
    main()
