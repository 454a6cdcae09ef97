"""Benchmark: full training-update throughput of the flagship models.

Workload = the reference's training recipe (configs/train_SNN.yml):
batch 8, 128x128, window = 1000 events, loss window = 10 windows -> one
optimizer update per 80 event-windows. One jitted dispatch covers S
chained updates, each with on-device encodings, 10-window lax.scan BPTT,
contrast-max loss, gradients, clip, Adam
(train/step.py::make_train_step_multi).

Reported models:
  - LIFFireNet (the paper's headline SNN)           -> headline metric
  - RecEVFlowNet (the UNet-family headline)         -> extra key
  - SpikingRecEVFlowNet (spiking UNet)              -> extra key

Performance notes (measured, TPU v5e behind the axon tunnel):
  - the host<->device dispatch round trip is ~35 ms and
    ``block_until_ready`` under-reports (async enqueue); the bench chains
    S updates per dispatch, syncs with a host read of the losses, and
    separately measures the round trip with a trivial dispatch so it can
    report device-only time
  - XLA's BPTT backward anti-scales with batch (2.55 ms/window at b8 vs
    1.60 at b4); ``micro_batch=4`` gradient accumulation restores the b4
    per-window rate with identical update semantics (loss sums over batch)

Metric: event-windows/sec (higher is better). Extra keys report
device-only ms/update, the XLA-counted FLOPs per update, and MFU against
the v5e bf16 peak (~197 TFLOPS) — see STATUS.md for the roofline context.

Baseline: the ACTUAL reference implementation (PyTorch, /root/reference)
measured on this host's CPU with the identical workload: 376.3 s/update
= 0.2126 event-windows/s (no GPU exists in this environment; the paper's
hardware is a single CUDA GPU, reference README.md:131). The BASELINE.json
north-star target is >10x the reference on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

_ATTEMPT = int(os.environ.get("EVFLOW_BENCH_ATTEMPT", "0"))
# fastest measured config: im2col-matmul convs with bf16 operands / f32
# accumulation + full-bf16 cell compute (f32 params/loss/accumulation;
# deviation bounds tested in tests/test_conv_dtype.py). Measured ladder at
# the b8 recipe: 553 w/s lax.conv f32 -> 625 im2col+bf16 convs -> bf16
# cells on top (models/policy.py). Retries fall back to the lighter
# lax.conv f32 graph (smaller compile for a degraded worker).
if _ATTEMPT == 0:
    os.environ.setdefault("EVFLOW_CONV_IMPL", "im2col")
    os.environ.setdefault("EVFLOW_CONV_DTYPE", "bfloat16")
    os.environ.setdefault("EVFLOW_CELL_DTYPE", "bfloat16")
    # save-named-conv-outputs remat: the saved residuals are bf16, so the
    # HBM cost undercuts the conv recompute (844 vs 789 w/s measured)
    os.environ.setdefault("EVFLOW_REMAT", "convs")
    # fused conv+LIF Pallas kernel at its measured-win recurrent shapes
    # (UNet deep encoders; full-update A/B 2026-08-18: SpikingRecEVFlowNet
    # 759.8 w/s auto vs 744.6 xla). LIFFireNet's c32 cells stay on XLA
    # via the same gate (models/policy.py::fused_auto_wins).
    os.environ.setdefault("EVFLOW_CELL_IMPL", "auto")
else:
    os.environ["EVFLOW_CONV_IMPL"] = "xla"
    os.environ["EVFLOW_CONV_DTYPE"] = "float32"
    os.environ["EVFLOW_CELL_DTYPE"] = "float32"
    os.environ["EVFLOW_REMAT"] = "full"
    os.environ["EVFLOW_CELL_IMPL"] = "xla"

# persistent XLA compile cache: repeat invocations (or retries after a
# worker crash) reload executables instead of re-running the heavy compile
# that destabilizes the tunnel worker
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

# torch-CPU reference throughput measured on this host (see module docstring)
BASELINE_WINDOWS_PER_SEC = 0.2126
# TPU v5e bf16 peak (MXU); the MFU denominator. The compute here is mixed
# bf16-operand/f32-accumulate, so this is the honest (conservative) peak.
PEAK_FLOPS_BF16 = 197e12

RES = (128, 128)
T, N = 10, 1000
# resilience ladder: the tunnel worker can crash on large compiles; retries
# re-exec with progressively lighter programs (B, micro_batch, S)
B, MB, S = {
    0: (8, 4, 8),
    1: (8, 4, 4),
    2: (4, None, 4),
    3: (4, None, 1),
}.get(_ATTEMPT, (4, None, 1))

# Measured per-family optima (tools/ab_unet.py sweep, r5, real chip,
# docs/evidence_r5/ab_unet_recevflownet.txt): the flagship's levers do
# NOT transfer to the UNet family. RecEVFlowNet at S=4: mb4 grad
# accumulation LOSES (712 -> 841 w/s without it) and the im2col conv
# LOSES (its patch concatenate is the profile's concat/slice bucket;
# lax.conv 798, and mb=none + lax.conv compound to 1054 w/s / 28.1% MFU,
# 1.48x baseline). The c32 flagship keeps mb4 + im2col (both measured
# wins there: XLA's scan BPTT anti-scales with batch at that width, and
# im2col's huge-M matmul amortizes the 32-lane padding). The ab_unet
# worker overrides these per-run via bench.MODEL_MB / EVFLOW_CONV_IMPL.
MODEL_MB = {
    "RecEVFlowNet": None,
    "SpikingRecEVFlowNet": None,
}
MODEL_CONV_IMPL = {
    "RecEVFlowNet": "xla",
    "SpikingRecEVFlowNet": "xla",
}

SNN_NEURON = {
    "leak": [-4.0, 0.1],
    "thresh": [0.8, 0.1],
    "learn_leak": True,
    "learn_thresh": True,
    "hard_reset": True,
}

MODEL_CFGS = {
    "LIFFireNet": {
        "name": "LIFFireNet",
        "encoding": "cnt",
        "num_bins": 2,
        "base_num_channels": 32,
        "kernel_size": 3,
        "mask_output": True,
        "activations": ["arctanspike", "arctanspike"],
        "spiking_neuron": SNN_NEURON,
    },
    # reference train_ANN.yml recipe (RecEVFlowNet block)
    "RecEVFlowNet": {
        "name": "RecEVFlowNet",
        "encoding": "cnt",
        "num_bins": 2,
        "base_num_channels": 32,
        "kernel_size": 3,
        "mask_output": True,
        "activations": ["relu", None],
    },
    "SpikingRecEVFlowNet": {
        "name": "SpikingRecEVFlowNet",
        "encoding": "cnt",
        "num_bins": 2,
        "base_num_channels": 32,
        "kernel_size": 3,
        "mask_output": True,
        "activations": ["arctanspike", "arctanspike"],
        "spiking_neuron": SNN_NEURON,
    },
}


def _measure_rtt_s():
    """Host<->device round trip of a trivial dispatch + host read."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))  # compile
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


def _step_flops(step_fn, *args):
    """MXU FLOPs of one update, counted from the jaxpr (scan bodies are
    multiplied by trip count — XLA's compiled.cost_analysis() counts a
    while body ONCE, undercounting the 10-window scan BPTT ~100x). Traced
    abstractly: no device execution. See utils/flops.py."""
    try:
        from event_flow_tpu.utils.flops import flops_of_fn

        return float(flops_of_fn(step_fn, *args))
    except Exception:
        return None


def bench_model(model_name, rtt_s):
    """Time S-chained full training updates of ``model_name`` at the b8
    recipe; returns windows/s plus device-only timing and MFU."""
    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import (init_train_state, make_train_step,
                                           make_train_step_multi)

    model_cfg = MODEL_CFGS[model_name]
    mb = MODEL_MB.get(model_name, MB)
    # per-model conv impl (read at trace time): always reset the global so
    # sequential bench_model calls can't leak one model's impl to the next
    from event_flow_tpu.models.conv import set_conv_impl
    set_conv_impl(MODEL_CONV_IMPL.get(
        model_name, os.environ.get("EVFLOW_CONV_IMPL", "auto")))
    model = get_model(model_name, model_cfg)
    tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
    loss_cfg = LossConfig(RES, float(max(RES)), 0.001, smoothing_mask=True)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)

    rng = np.random.default_rng(0)

    def one_update():
        return np.stack([
            np.stack([constant_flow_window(rng, N, RES, (2.0, -2.0), 64)
                      for _ in range(T)])
            for _ in range(B)
        ])

    if S > 1:
        jitted = jax.jit(make_train_step_multi(
            model, tx, RES, 2, loss_cfg, micro_batch=mb))
        args0 = (jnp.asarray(np.stack([one_update() for _ in range(S)])),
                 jnp.ones((S, B, T, N)), jnp.zeros((S, B, 3)),
                 jnp.zeros((S,), bool))
        last = lambda losses: losses[-1]
    else:
        jitted = jax.jit(make_train_step(
            model, tx, RES, 2, loss_cfg, micro_batch=mb))
        args0 = (jnp.asarray(one_update()), jnp.ones((B, T, N)),
                 jnp.zeros((B, 3)), jnp.asarray(False))
        last = lambda loss: loss

    step = jitted.lower(state, *args0).compile()
    flops_total = _step_flops(jitted, state, *args0)

    def run(st):
        st, losses = step(st, *args0)
        float(last(losses))
        return st

    # warmup; host read per dispatch is the only reliable sync on
    # the axon tunnel (block_until_ready under-reports)
    state = run(state)

    # several timed dispatches so the median is robust to tunnel jitter
    iters = max(4, 16 // S)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state = run(state)
        times.append(time.perf_counter() - t0)
    dispatch_s = float(np.median(times))
    dt = dispatch_s / S  # per update, host-inclusive

    # device-only estimate: one dispatch pays one tunnel round trip for
    # S chained updates; everything else is device execution
    device_dt = max(dispatch_s - rtt_s, 1e-9) / S

    flops_per_update = flops_total / S if flops_total else None
    mfu = (flops_per_update / device_dt / PEAK_FLOPS_BF16
           if flops_per_update else None)

    return {
        "windows_per_sec": B * T / dt,
        "ms_per_update": dt * 1e3,
        "device_ms_per_update": device_dt * 1e3,
        "flops_per_update": flops_per_update,
        "mfu": mfu,
    }


def main():
    # Watchdog stage 1: the tunnel worker has a failure mode where even
    # backend init (jax.devices()) hangs indefinitely — no exception, no
    # progress. Arm a short alarm around first device contact so a hung
    # worker turns into the same cooldown+re-exec path as a crash.
    import signal

    def _timeout(signum, frame):
        raise TimeoutError("UNAVAILABLE: TPU worker hang (watchdog)")

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(420)
    rtt_s = _measure_rtt_s()
    # Watchdog stage 2: generous budget for the compile-heavy benches
    # (a healthy 3-model run is ~20-25 min through the tunnel).
    signal.alarm(3000)
    flagship = bench_model("LIFFireNet", rtt_s)

    cfg_tag = f"b{B}" + (f" mb{MB}" if MB else "") + f" S{S}"
    result = {
        "metric": "train_event_windows_per_sec",
        "value": round(flagship["windows_per_sec"], 2),
        "unit": f"event-windows/s (LIFFireNet {cfg_tag} 128x128 "
                "w1000, full update)",
        "vs_baseline": round(
            flagship["windows_per_sec"] / BASELINE_WINDOWS_PER_SEC, 1
        ),
        "tunnel_rtt_ms": round(rtt_s * 1e3, 2),
        "device_ms_per_update": round(flagship["device_ms_per_update"], 2),
        "mfu": round(flagship["mfu"], 4) if flagship["mfu"] else None,
        "flops_per_update": flagship["flops_per_update"],
    }

    # UNet-family entries (VERDICT r2 #1); failures degrade to omission so
    # a worker crash mid-extra-bench can't take down the headline number
    if _ATTEMPT == 0 and os.environ.get("EVFLOW_BENCH_UNET", "1") != "0":
        for name, key in (("RecEVFlowNet", "recevflownet"),
                          ("SpikingRecEVFlowNet", "spikingrecevflownet")):
            try:
                # re-arm per stage: a swallowed watchdog TimeoutError
                # consumes the (one-shot) alarm, and the next stage would
                # otherwise dispatch to a hung worker unprotected
                signal.alarm(1200)
                r = bench_model(name, rtt_s)
                result[f"{key}_windows_per_sec"] = round(
                    r["windows_per_sec"], 2)
                result[f"{key}_device_ms_per_update"] = round(
                    r["device_ms_per_update"], 2)
                if r["mfu"]:
                    result[f"{key}_mfu"] = round(r["mfu"], 4)
            except Exception as e:  # noqa: BLE001 — degraded worker
                import sys

                print(f"# {name} bench failed: {type(e).__name__}",
                      file=sys.stderr, flush=True)
                break

    # eval steady-state entry (VERDICT r2 #3): the full ECD-recipe eval
    # protocol (model + FWL/RSAT association folded into chunked
    # dispatches) at batch 1. Last in order + guarded: a worker crash
    # here can't take down the training numbers above.
    # Each recipe is measured EVFLOW_BENCH_EVAL_REPEATS times (default 5,
    # VERDICT r4 #5: the tunnel's transfer term varies ~2x run-to-run);
    # reported value = median across repeats, *_iqr = inter-quartile range
    # so BENCH_rN states its own reproducibility.
    if _ATTEMPT == 0 and os.environ.get("EVFLOW_BENCH_EVAL", "1") != "0":
        try:
            signal.alarm(1800)  # fresh watchdog for the eval stage
            import importlib.util
            import sys

            repeats = int(os.environ.get("EVFLOW_BENCH_EVAL_REPEATS", "5"))

            def med_iqr(samples):
                q1, q2, q3 = np.percentile(samples, [25, 50, 75])
                return float(q2), float(q3 - q1)

            spec = importlib.util.spec_from_file_location(
                "bench_eval",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tools", "bench_eval.py"))
            be = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(be)
            for recipe in ("ECD", "MVSEC"):
                paths = be.ensure_dataset("/tmp/evflow_eval_bench", 1, 64,
                                          recipe)
                cfg = be.make_config(1, os.path.dirname(paths[0]), -1,
                                     recipe)
                # latency mode (sync per flush) yields the host->device
                # transfer / dispatch decomposition; throughput mode (no
                # per-chunk sync — the production Evaluator never syncs)
                # is the headline steady state. Same methodology as
                # tools/bench_eval.py, so STATUS and bench agree.
                samples = {"steady": [], "lat": [], "transfer": [],
                           "dispatch": []}
                for _ in range(repeats):
                    _, lat_ms, _, _, decomp = be.run_eval(cfg,
                                                          sync_each=True)
                    _, steady_ms, _, _, _ = be.run_eval(cfg,
                                                        sync_each=False)
                    if np.isfinite(steady_ms):
                        samples["steady"].append(steady_ms)
                    if np.isfinite(lat_ms):
                        samples["lat"].append(lat_ms)
                        if "transfer_ms" in decomp:
                            samples["transfer"].append(
                                decomp["transfer_ms"])
                        if "dispatch_ms" in decomp:
                            samples["dispatch"].append(
                                decomp["dispatch_ms"])
                key = f"eval_{recipe.lower()}"
                if samples["steady"]:
                    med, iqr = med_iqr(samples["steady"])
                    result[f"{key}_ms_per_window_b1"] = round(med, 2)
                    result[f"{key}_ms_per_window_b1_iqr"] = round(iqr, 2)
                    result[f"{key}_windows_per_sec_b1"] = round(1e3 / med, 1)
                if samples["lat"]:
                    med, iqr = med_iqr(samples["lat"])
                    result[f"{key}_latency_ms_per_window_b1"] = round(med, 2)
                    result[f"{key}_latency_ms_per_window_b1_iqr"] = round(
                        iqr, 2)
                for nm, field in (("transfer", "transfer_ms_per_window_b1"),
                                  ("dispatch", "dispatch_ms_per_window_b1")):
                    if samples[nm]:
                        med, iqr = med_iqr(samples[nm])
                        result[f"{key}_{field}"] = round(med, 2)
                        result[f"{key}_{field}_iqr"] = round(iqr, 2)
                result[f"{key}_repeats"] = len(samples["steady"])
        except Exception as e:  # noqa: BLE001 — degraded worker
            import sys

            print(f"# eval bench failed: {type(e).__name__}",
                  file=sys.stderr, flush=True)

    signal.alarm(0)
    print(json.dumps(result))


if __name__ == "__main__":
    # The axon TPU tunnel's remote worker intermittently crashes under
    # heavy programs and recovers after a cooldown. A poisoned jax backend
    # can't retry in-process, so re-exec a fresh interpreter a few times,
    # degrading the program size each attempt.
    import sys
    import time as _time

    attempt = int(os.environ.get("EVFLOW_BENCH_ATTEMPT", "0"))
    try:
        main()
    except Exception as e:  # jax runtime errors don't share a base class
        # cancel any pending watchdog alarm: it must not fire inside the
        # cooldown sleep or survive execv into the re-exec'd child
        import signal as _signal

        _signal.alarm(0)
        transient = "UNAVAILABLE" in str(e) or "crashed" in str(e)
        if transient and attempt < 3:
            # escalating cooldowns: crash mode recovers in ~5-10 min, but
            # the total-outage mode (worker needs an external restart) can
            # take much longer — later attempts wait longer
            cooldown = (240, 420, 900)[attempt]
            print(f"# TPU worker unavailable (attempt {attempt + 1}); "
                  f"cooling down {cooldown}s and re-exec'ing",
                  file=sys.stderr, flush=True)
            _time.sleep(cooldown)
            os.environ["EVFLOW_BENCH_ATTEMPT"] = str(attempt + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
