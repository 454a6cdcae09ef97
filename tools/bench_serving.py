"""Serving-latency benchmark: InferenceEngine step/step_many A/B across
precision modes (f32 / bf16 cells / int8 convs).

Times the streaming serving path (eval/predict.py) on the current
backend: per-window latency for single-window `step` dispatches and for
the S-window `step_many` throughput form. Timing uses a true host read
per timed repetition (`block_until_ready` under-reports through the
tunneled TPU — only a host read syncs; see STATUS.md).

Usage:
  python tools/bench_serving.py                    # all modes, LIFFireNet
  python tools/bench_serving.py --model FireNet --modes f32,int8 --hw 128
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def build_engine(model_name, res, mode):
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.config.parser import default_config
    from event_flow_tpu.eval.predict import InferenceEngine
    from event_flow_tpu.models.registry import get_model

    from event_flow_tpu.models.conv import set_conv_compute_dtype
    from event_flow_tpu.models.policy import set_cell_compute_dtype

    set_conv_compute_dtype("bfloat16" if mode == "bf16" else "float32")
    set_cell_compute_dtype("bfloat16" if mode == "bf16" else "float32")

    cfg = default_config()
    cfg["loader"]["resolution"] = list(res)
    cfg["model"] = {
        "name": model_name, "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 32, "kernel_size": 3, "mask_output": True,
    }
    if "LIF" in model_name or "Spiking" in model_name:
        cfg["model"]["activations"] = ["arctanspike", "arctanspike"]
        cfg["model"]["spiking_neuron"] = {
            "leak": [-4.0, 0.1], "thresh": [0.8, 0.1]
        }
    else:
        cfg["model"]["activations"] = ["relu", None]
    model = get_model(model_name, cfg["model"])
    state = model.zero_state(1, *res)
    x = jnp.zeros((1, *res, 2))
    params = model.init(jax.random.PRNGKey(0), x, x, state)
    return InferenceEngine(
        cfg, model, params, quantize="int8" if mode == "int8" else None
    )


def time_engine(engine, res, n_events, s, iters):
    from event_flow_tpu.data.synthetic import constant_flow_window

    rng = np.random.default_rng(0)
    many = np.stack([constant_flow_window(rng, n_events, res, (2.0, -3.0), 32)
                     for _ in range(s)])
    one = many[0]

    # warmup (compile) both forms
    float(np.asarray(engine.step(one)).sum())
    float(np.asarray(engine.step_many(many)).sum())

    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f = engine.step(one)
        float(np.asarray(f).sum())  # host read = real sync
        ts.append(time.perf_counter() - t0)
    step_ms = float(np.median(ts)) * 1e3

    tm = []
    for _ in range(iters):
        t0 = time.perf_counter()
        f = engine.step_many(many)
        float(np.asarray(f).sum())
        tm.append(time.perf_counter() - t0)
    many_ms = float(np.median(tm)) * 1e3 / s
    return step_ms, many_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="LIFFireNet")
    ap.add_argument("--hw", type=int, nargs=2, default=(180, 240),
                    help="serving resolution (default: the ECD 180 240)")
    ap.add_argument("--events", type=int, default=1000)
    ap.add_argument("--s", type=int, default=16,
                    help="windows per step_many dispatch")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--modes", default="f32,bf16,int8")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    res = tuple(args.hw)
    print(f"backend={jax.default_backend()} model={args.model} "
          f"res={res} events={args.events} S={args.s}")
    print(f"{'mode':8s} {'step ms/win':>12s} {'step_many ms/win':>17s}")
    for mode in args.modes.split(","):
        engine = build_engine(args.model, res, mode)
        step_ms, many_ms = time_engine(engine, res, args.events, args.s,
                                       args.iters)
        print(f"{mode:8s} {step_ms:12.2f} {many_ms:17.2f}")


if __name__ == "__main__":
    main()
