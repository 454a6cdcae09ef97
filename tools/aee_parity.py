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
import sys
import tempfile

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.ref_cli import (  # noqa: E402  (needs the sys.path insert)
    run_reference_cli,
    stored_reference_layout,
)


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
        yaml.safe_dump(stored_reference_layout(run_params), f)
    pth = export_torch_checkpoint(params, model_cfg["name"], model_cfg,
                                  out, mlflow_layout=True)
    return pth


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
        ref = run_reference_cli(workdir, mlruns, args.runid, eval_cfg,
                                timeout=3600)

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
        # a file the reference saw but ours skipped leaves AEE_ours=None;
        # still print the report (with PARITY FAIL via missing deltas)
        # instead of crashing np.mean after two expensive eval runs
        ours_vals = [v["AEE_ours"] for v in report["files"].values()
                     if v["AEE_ours"] is not None]
        report["mean_AEE_ours"] = (
            float(np.mean(ours_vals)) if ours_vals else None)
        report["mean_AEE_reference"] = float(np.mean(
            [v["AEE_reference"] for v in report["files"].values()]))
        if len(ours_vals) != len(report["files"]):
            report["missing_from_ours"] = [
                f for f, v in report["files"].items()
                if v["AEE_ours"] is None]
        print(json.dumps(report, indent=2))
        ok = (report["max_rel_delta"] is not None
              and report["max_rel_delta"] < 0.01
              and "missing_from_ours" not in report)
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
