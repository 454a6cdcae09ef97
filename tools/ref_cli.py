"""The single copy of the reference-CLI invocation contract.

Both the head-to-head tests (tests/test_ref_cli_subprocess.py) and the
AEE parity tool (tools/aee_parity.py) shell out to the UNMODIFIED
``/root/reference/eval_flow.py`` through the shims in ``tests/ref_shims``
(directory-backed mlflow stand-in, progress/hdf5plugin stubs). The subtle
parts of that contract live here once: which ours-only config keys the
reference parser must never see, the shim environment, the stored-params
layout the reference trainer logs, and the metrics_N.yml parse.
"""

import os
import subprocess
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("EVFLOW_REFERENCE", "/root/reference")
SHIMS = os.path.join(REPO, "tests", "ref_shims")

# config keys only this framework understands; strip them before handing
# the YAML to the reference parser (extend BOTH tool and tests at once by
# extending these)
OURS_ONLY_DATA_KEYS = ("max_events",)
OURS_ONLY_METRICS_KEYS = ("reference_accounting",)


def reference_eval_config(eval_cfg):
    """Copy of an eval config with every ours-only key stripped."""
    ref_cfg = dict(eval_cfg)
    ref_cfg["data"] = {k: v for k, v in eval_cfg["data"].items()
                       if k not in OURS_ONLY_DATA_KEYS}
    ref_cfg["metrics"] = {k: v for k, v in eval_cfg["metrics"].items()
                          if k not in OURS_ONLY_METRICS_KEYS}
    return ref_cfg


def stored_reference_layout(run_params):
    """Re-nest our stored params.yml into the layout the reference trainer
    logs (spiking_neuron split out of the model block — MLflow char limit;
    the reference's combine_entries re-nests it, configs/parser.py:117-127)."""
    model = dict(run_params["model"])
    sn = model.pop("spiking_neuron", None) or {}
    return {
        "experiment": run_params.get("experiment", "Default"),
        "model": model,
        "spiking_neuron": sn,
        "loss": run_params.get("loss", {}),
        "optimizer": run_params.get("optimizer", {}),
    }


def run_reference_cli(workdir, mlruns, runid, eval_cfg, timeout=900):
    """Run the unmodified reference eval_flow.py on an exported MLflow run.

    Writes the reference-safe config into ``workdir``, invokes the shimmed
    subprocess, and returns the parsed metrics_0.yml as
    ``{metric: {filename: float}}``. Raises RuntimeError with the tail of
    the subprocess output on failure."""
    cfg_path = os.path.join(str(workdir), "ref_eval.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(reference_eval_config(eval_cfg), f)
    results_root = os.path.join(str(workdir), "ref_results") + "/"
    os.makedirs(results_root, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIMS
    env["EVFLOW_REFERENCE"] = REF
    proc = subprocess.run(
        [sys.executable, os.path.join(SHIMS, "run_ref_eval.py"), runid,
         "--config", cfg_path, "--path_mlflow", str(mlruns),
         "--path_results", results_root],
        capture_output=True, text=True, env=env, timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference CLI failed:\n{proc.stdout[-3000:]}\n"
            f"{proc.stderr[-3000:]}")
    metrics_yml = os.path.join(results_root, runid, "metrics_0.yml")
    if not os.path.isfile(metrics_yml):
        raise RuntimeError(
            f"reference CLI wrote no metrics_0.yml:\n{proc.stdout[-2000:]}")
    with open(metrics_yml) as f:
        raw = yaml.safe_load(f)
    return {m: {fn: float(v) for fn, v in table.items()}
            for m, table in raw.items()}
