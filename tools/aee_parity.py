"""Synthetic-GT AEE parity: a trained run vs the UNMODIFIED reference CLI.

The north-star acceptance metric (SURVEY.md §6: AEE within 1 % of the
reference) has no real MVSEC data in this environment, but the rich
synthetic eval split carries EXACT ground-truth ``flow_dt1`` maps
(data/schema.py::write_rich_sequence — constant velocity per sequence),
so both claims are measurable without any dataset download:

  1. **AEE vs GT** for the trained model (is the learned flow good?),
  2. **AEE ours-vs-reference** on the SAME weights and files (is the
     evaluator faithful?): the run's params export to a reference MLflow
     whole-model artifact (tools/export_torch.py), the unmodified
     ``/root/reference/eval_flow.py`` runs as a subprocess (shimmed via
     tests/ref_shims — directory-backed mlflow, progress stubs), and our
     CLI evaluates the native checkpoint on the same files.

Reference protocol: loss/flow.py:582-628 (AEE + %outlier),
eval_flow.py:198-213 (gtflow windows, dt rescale), configs/eval_MVSEC.yml.

Usage:
  python tools/aee_parity.py <runid> [--config configs/eval_rich_AEE.yml]
      [--runs_root runs] [--cpu]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("EVFLOW_REFERENCE", "/root/reference")
SHIMS = os.path.join(REPO, "tests", "ref_shims")
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _stored_reference_layout(run_params):
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


def _export_run(run_dir, run_params, mlruns, runid):
    """Trained params -> reference MLflow run dir (params.yml + model.pth)."""
    from event_flow_tpu.config.parser import combine_entries
    from event_flow_tpu.utils import checkpoint as ckpt
    from tools.export_torch import export_torch_checkpoint

    # model cfg with spiking_neuron merged in (how get_model consumes it)
    model_cfg = combine_entries(dict(run_params))["model"]
    path = ckpt.latest_checkpoint(run_dir)
    assert path is not None, f"no checkpoints under {run_dir}"
    params = ckpt.restore_checkpoint(path)["params"]

    out = os.path.join(mlruns, runid)
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "params.yml"), "w") as f:
        yaml.safe_dump(_stored_reference_layout(run_params), f)
    pth = export_torch_checkpoint(params, model_cfg["name"], model_cfg,
                                  out, mlflow_layout=True)
    return pth


def _run_reference_cli(workdir, mlruns, runid, eval_cfg):
    cfg_path = os.path.join(workdir, "ref_eval.yml")
    ref_cfg = dict(eval_cfg)
    # ours-only keys the reference parser doesn't know
    ref_cfg["data"] = {k: v for k, v in eval_cfg["data"].items()
                       if k != "max_events"}
    ref_cfg["metrics"] = {k: v for k, v in eval_cfg["metrics"].items()
                          if k != "reference_accounting"}
    with open(cfg_path, "w") as f:
        yaml.safe_dump(ref_cfg, f)
    results_root = os.path.join(workdir, "ref_results") + "/"
    os.makedirs(results_root, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIMS
    env["EVFLOW_REFERENCE"] = REF
    proc = subprocess.run(
        [sys.executable, os.path.join(SHIMS, "run_ref_eval.py"), runid,
         "--config", cfg_path, "--path_mlflow", mlruns,
         "--path_results", results_root],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference CLI failed:\n{proc.stdout[-3000:]}\n"
            f"{proc.stderr[-3000:]}")
    with open(os.path.join(results_root, runid, "metrics_0.yml")) as f:
        raw = yaml.safe_load(f)
    return {m: {fn: float(v) for fn, v in table.items()}
            for m, table in raw.items()}


def _run_ours(runid, cfg_path, runs_root):
    import eval_flow

    args = argparse.Namespace(
        runid=runid, config=cfg_path, runs_root=runs_root,
        path_results="results_inference/", debug=True, torch_weights=None,
    )
    return eval_flow.test(args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runid")
    ap.add_argument("--config", default="configs/eval_rich_AEE.yml")
    ap.add_argument("--runs_root", default="runs")
    ap.add_argument("--keep", action="store_true",
                    help="keep the temp export dir")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    run_dir = os.path.join(args.runs_root, args.runid)
    with open(os.path.join(run_dir, "params.yml")) as f:
        run_params = yaml.safe_load(f)
    with open(args.config) as f:
        eval_cfg = yaml.safe_load(f)
    # the reference shim chdirs into /root/reference (run_ref_eval.py), so
    # the dataset path must be absolute for its H5Loader glob
    eval_cfg["data"]["path"] = (
        os.path.abspath(eval_cfg["data"]["path"]) + "/")
    # the reference merges stored run params under the eval YAML itself
    # (its parser does this from mlruns); ours does the same in
    # eval_flow.test — no manual merge needed on either side.

    workdir = tempfile.mkdtemp(prefix="aee_parity_")
    try:
        mlruns = os.path.join(workdir, "mlruns")
        _export_run(run_dir, run_params, mlruns, args.runid)
        print(f"exported {args.runid} -> {mlruns}")

        ours = _run_ours(args.runid, args.config, args.runs_root)
        ref = _run_reference_cli(workdir, mlruns, args.runid, eval_cfg)

        report = {"runid": args.runid, "files": {}}
        deltas = []
        for fname, ref_aee in sorted(ref.get("AEE", {}).items()):
            our_aee = ours["AEE"].get(fname)
            rel = (abs(our_aee - ref_aee) / max(abs(ref_aee), 1e-9)
                   if our_aee is not None else None)
            report["files"][fname] = {
                "AEE_ours": our_aee, "AEE_reference": ref_aee,
                "rel_delta": rel,
            }
            if rel is not None:
                deltas.append(rel)
        report["max_rel_delta"] = max(deltas) if deltas else None
        report["mean_AEE_ours"] = float(np.mean(
            [v["AEE_ours"] for v in report["files"].values()]))
        report["mean_AEE_reference"] = float(np.mean(
            [v["AEE_reference"] for v in report["files"].values()]))
        print(json.dumps(report, indent=2))
        ok = report["max_rel_delta"] is not None and (
            report["max_rel_delta"] < 0.01)
        print(f"PARITY {'OK' if ok else 'FAIL'}: max rel delta "
              f"{report['max_rel_delta']}")
        return 0 if ok else 1
    finally:
        if args.keep:
            print(f"kept {workdir}")
        else:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
