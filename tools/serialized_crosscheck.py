"""Cross-platform check for serialized serving artifacts
(event_flow_tpu/eval/serialized.py): export on the CPU backend, serve the
SAME artifact on the TPU chip, and compare per-window flows.

This is the claim the artifact format makes — "built on a dev host,
serves on either backend" (the reference can only re-pickle whole torch
models per environment, utils/utils.py:36-37) — checked on real hardware.

Two stages in two processes (jax pins one default platform per process):
  --stage export   (spawned, CPU-pinned): build a small LIFFireNet
                   engine, export the artifact for (cpu, tpu), run the
                   live engine over S windows, save reference flows.
  main     (TPU): restore SerializedEngine, run the same windows,
                   compare.

Cross-platform oracle (measured on v5e 2026-08-19): the model is a
THRESHOLDED SNN — a ulp-level platform difference (TPU conv accumulation
order, transcendental implementations) can flip a binary spike, which
cascades into an isolated O(1e-2) flow delta downstream. Element-wise
allclose is therefore the wrong check across platforms; the check here is
(a) >= 97% of flow elements within 1e-3, (b) max |delta| <= 0.05 on the
[-1, 1] tanh flow (observed: 98.4% within 2e-5, max 0.016). The
same-platform form (--cpu: export on cpu, serve on cpu) stays strict at
rtol/atol 2e-5.

Usage (healthy chip): timeout 900 python tools/serialized_crosscheck.py
"""

import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RES = (32, 32)
S, N = 6, 400
ART = "/tmp/evflow_serialized_xcheck"


def _windows():
    from event_flow_tpu.data.synthetic import constant_flow_window

    rng = np.random.default_rng(7)
    return np.stack(
        [constant_flow_window(rng, N, RES, (1.5, -2.0), 8) for _ in range(S)]
    )


def _build_engine():
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.config.parser import default_config
    from event_flow_tpu.eval.predict import InferenceEngine
    from event_flow_tpu.models.registry import get_model

    cfg = default_config()
    cfg["loader"]["resolution"] = list(RES)
    cfg["model"] = {
        "name": "LIFFireNet", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 8, "kernel_size": 3, "mask_output": True,
        "activations": ["arctanspike", "arctanspike"],
        "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1]},
    }
    model = get_model("LIFFireNet", cfg["model"])
    state = model.zero_state(1, *RES)
    x = jnp.zeros((1, *RES, 2))
    params = model.init(jax.random.PRNGKey(3), x, x, state)
    return InferenceEngine(cfg, model, params)


def stage_export():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from event_flow_tpu.eval.serialized import export_engine

    engine = _build_engine()
    export_engine(engine, ART, n_events=N, platforms=("cpu", "tpu"))
    flows = np.stack([np.asarray(engine.step(w)) for w in _windows()])
    np.save(os.path.join(ART, "ref_flows.npy"), flows)
    print(f"exported on {jax.default_backend()}; "
          f"ref flows {flows.shape} saved")


def main(cpu=False):
    import jax

    if cpu:  # cpu-to-cpu smoke form (no chip needed)
        jax.config.update("jax_platforms", "cpu")
    from event_flow_tpu.eval.serialized import SerializedEngine

    # stage 1 in a fresh CPU-pinned process (this one owns the TPU)
    env = dict(os.environ)
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--stage", "export"],
        check=True, env=env,
    )

    backend = jax.default_backend()
    eng = SerializedEngine(ART)
    flows = np.stack([np.asarray(eng.step(w)) for w in _windows()])
    ref = np.load(os.path.join(ART, "ref_flows.npy"))
    err = float(np.max(np.abs(flows - ref)))
    if backend == "cpu":
        # same platform: the artifact must reproduce the live engine
        np.testing.assert_allclose(flows, ref, rtol=2e-5, atol=2e-5)
    else:
        # cross platform: spike-flip-aware oracle (see module docstring)
        frac_close = float(np.mean(np.abs(flows - ref) <= 1e-3))
        assert frac_close >= 0.97, (
            f"only {frac_close:.1%} of flow elements within 1e-3")
        assert err <= 0.05, f"max |delta| {err:.3g} > 0.05"
        print(f"cross-platform: {frac_close:.2%} of elements within 1e-3")
    print(f"serialized artifact (exported on cpu) serves on {backend}: "
          f"max|Δflow| = {err:.3g} over {S} windows — OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="main", choices=["main", "export"])
    ap.add_argument("--cpu", action="store_true",
                    help="serve on cpu too (smoke form, no chip needed)")
    args = ap.parse_args()
    if args.stage == "export":
        stage_export()
    else:
        main(cpu=args.cpu)
