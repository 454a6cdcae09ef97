"""Head-to-head against the reference's ACTUAL eval_flow.py CLI.

The protocol-parity tests (test_eval_protocol_parity.py) import the
reference's real H5Loader / loss.flow classes but drive them with a
transcription of the reference inference loop, because the script itself
is module-level code needing mlflow. This test closes that last gap: it
executes the UNMODIFIED /root/reference/eval_flow.py as a subprocess
(environment shimmed via tests/ref_shims/ — a directory-backed mlflow
stand-in, progress/hdf5plugin stubs, torch.load default restored) and
compares its metrics_0.yml against OUR eval_flow CLI entry evaluating the
exact same weights (one .pth file read by both) on the same synthetic
tree.

Weight flow: OUR flax init -> tools/export_torch.py MLflow layout ->
reference load_model (utils/utils.py:8-25) AND our --torch_weights import
— so the exporter, the importer round trip, and both CLIs' protocol are
all under test at once.
"""

import argparse
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference checkout not available"),
]
torch = pytest.importorskip("torch")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIMS = os.path.join(REPO, "tests", "ref_shims")
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.ref_cli import (  # noqa: E402  (needs the sys.path insert)
    run_reference_cli,
    stored_reference_layout,
)

MODEL_BLOCK = {
    "name": "FireNet",
    "encoding": "cnt",
    "round_encoding": False,
    "norm_input": False,
    "num_bins": 2,
    "base_num_channels": 16,
    "kernel_size": 3,
    "activations": ["relu", None],
    "mask_output": True,
    "spiking_neuron": None,
}
LIF_SN = {
    "leak": [-4.0, 0.1],
    "thresh": [0.8, 0.1],
    "learn_leak": True,
    "learn_thresh": True,
    "hard_reset": True,
}
LIF_BLOCK = {
    **MODEL_BLOCK,
    "name": "LIFFireNet",
    "activations": ["arctanspike", "arctanspike"],
    "spiking_neuron": LIF_SN,
}


def _write_dataset(tmp_path, res=(48, 48), gt_flow_hz=None):
    from event_flow_tpu.data.schema import write_synthetic_sequence

    ddir = tmp_path / "data"
    ddir.mkdir()
    for i, vel in enumerate([(3.0, 5.0), (-4.0, 2.0)]):
        write_synthetic_sequence(
            str(ddir / f"seq{i}.h5"), res=res, n_events=30000, duration=1.0,
            velocity=vel, seed=11 + i, gt_flow_hz=gt_flow_hz,
        )
    return str(ddir) + "/"


def _make_run(tmp_path, block, runid="headtohead"):
    """Fake MLflow run dir: params.yml + exported whole-model artifact."""
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.models.registry import get_model
    from tools.export_torch import export_torch_checkpoint

    res = (48, 48)
    model_cfg = dict(block)
    model = get_model(model_cfg["name"], model_cfg)
    state = model.zero_state(1, *res)
    voxel = jnp.zeros((1, *res, model_cfg["num_bins"]))
    cnt = jnp.zeros((1, *res, 2))
    params = model.init(jax.random.PRNGKey(42), voxel, cnt, state)

    mlruns = tmp_path / "mlruns"
    run_dir = mlruns / runid
    run_dir.mkdir(parents=True)
    # the stored-params layout the reference trainer logs (shared contract:
    # tools/ref_cli.py::stored_reference_layout)
    stored = stored_reference_layout({
        "experiment": "Default",
        "model": block,
        "loss": {"overwrite_intermediate": False,
                 "flow_regul_weight": 0.001, "clip_grad": 100.0},
        "optimizer": {"name": "Adam", "lr": 0.0002},
    })
    with open(run_dir / "params.yml", "w") as f:
        yaml.safe_dump(stored, f)
    pth = export_torch_checkpoint(params, model_cfg["name"], model_cfg,
                                  str(run_dir), mlflow_layout=True)
    return str(mlruns), runid, pth


def _eval_yaml(data_path, mode, window, window_eval, metrics, res,
               max_events=None):
    cfg = {
        "data": {"path": data_path, "mode": mode, "window": window,
                 "window_eval": window_eval},
        "model": {"mask_output": True},
        "metrics": {"name": list(metrics), "flow_scaling": max(res)},
        "loader": {"batch_size": 1, "resolution": list(res), "augment": [],
                   "seed": 0, "gpu": 0},
        "vis": {"enabled": False, "px": 400, "bars": False,
                "activity": False, "store": False},
        "hot_filter": {"enabled": False, "max_px": 100, "min_obvs": 5,
                       "max_rate": 0.8},
    }
    if max_events is not None:
        cfg["data"]["max_events"] = max_events  # ours-only: static bucket
    return cfg


def _run_reference_cli(tmp_path, mlruns, runid, cfg):
    # shared invocation contract: tools/ref_cli.py
    return run_reference_cli(tmp_path, mlruns, runid, cfg, timeout=900)


def _run_ours(tmp_path, mlruns, runid, pth, cfg):
    import eval_flow

    cfg_path = tmp_path / "our_eval.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    args = argparse.Namespace(
        runid=runid, config=str(cfg_path), runs_root=mlruns,
        path_results=str(tmp_path / "our_results"), debug=True,
        torch_weights=pth,
    )
    return eval_flow.test(args)


def _assert_tables_close(ref, ours, atol=1e-3):
    assert set(ref.keys()) == set(ours.keys()), (ref.keys(), ours.keys())
    for metric in ref:
        assert set(ref[metric].keys()) == set(ours[metric].keys()), (
            metric, ref[metric].keys(), ours[metric].keys())
        for fname, v in ref[metric].items():
            np.testing.assert_allclose(ours[metric][fname], v, atol=atol,
                                       rtol=1e-3,
                                       err_msg=f"{metric}/{fname}")


def test_reference_cli_events_fwl_rsat(tmp_path):
    """Stateful SNN through the real reference CLI: FWL/RSAT tables match
    ours to <=1e-3 on the same weights and files.

    This run is what surfaced the reference CLI's metric-shadowing quirk
    (eval_flow.py:184-190): the filename-creation loop rebinds the outer
    ``metric`` variable, crediting each file's FIRST eval window's FWL to
    the RSAT bucket. Ours reproduces it only under
    ``metrics.reference_accounting: true`` (eval/harness.py::_drain); the
    default keeps correct per-metric buckets."""
    res = (48, 48)
    data_path = _write_dataset(tmp_path, res=res)
    mlruns, runid, pth = _make_run(tmp_path, LIF_BLOCK)
    cfg = _eval_yaml(data_path, "events", 2000, 6000, ["FWL", "RSAT"], res)
    cfg["metrics"]["reference_accounting"] = True
    ref = _run_reference_cli(tmp_path, mlruns, runid, cfg)
    assert ref.get("FWL"), "reference CLI produced no FWL results"
    ours = _run_ours(tmp_path, mlruns, runid, pth, cfg)
    _assert_tables_close(ref, ours)

    # and the quirk is REAL: correct accounting must differ on this data
    cfg["metrics"]["reference_accounting"] = False
    ours_correct = _run_ours(tmp_path, mlruns, runid, pth, cfg)
    deltas = [abs(ours_correct["FWL"][f] - ref["FWL"][f])
              for f in ref["FWL"]]
    assert max(deltas) > 1e-4, (
        "expected the reference shadowing quirk to shift FWL tables; "
        "did the reference fix it?")


def test_reference_cli_metric_order_rsat_fwl(tmp_path):
    """The shadowing quirk follows the CONFIG's metric order: with
    metrics [RSAT, FWL] the reference credits each file's first RSAT
    window to the FWL bucket (the last list entry), the mirror image of
    the [FWL, RSAT] case. Our reference_accounting emulation must enqueue
    records in config order to reproduce it (eval/harness.py::_flush_chunk)."""
    res = (48, 48)
    data_path = _write_dataset(tmp_path, res=res)
    mlruns, runid, pth = _make_run(tmp_path, LIF_BLOCK, runid="h2h_order")
    cfg = _eval_yaml(data_path, "events", 2000, 6000, ["RSAT", "FWL"], res)
    cfg["metrics"]["reference_accounting"] = True
    ref = _run_reference_cli(tmp_path, mlruns, runid, cfg)
    assert ref.get("RSAT"), "reference CLI produced no RSAT results"
    ours = _run_ours(tmp_path, mlruns, runid, pth, cfg)
    _assert_tables_close(ref, ours)


def test_reference_cli_gtflow_aee(tmp_path):
    """AEE protocol through the real reference CLI (gtflow_dt1 windows,
    dt_gt/dt_input rescaling, per-file averaging)."""
    res = (48, 48)
    data_path = _write_dataset(tmp_path, res=res, gt_flow_hz=8)
    mlruns, runid, pth = _make_run(tmp_path, MODEL_BLOCK, runid="h2h_aee")
    cfg = _eval_yaml(data_path, "gtflow_dt1", 1, 1, ["AEE"], res,
                     max_events=8192)
    ref = _run_reference_cli(tmp_path, mlruns, runid, cfg)
    assert ref.get("AEE"), "reference CLI produced no AEE results"
    ours = _run_ours(tmp_path, mlruns, runid, pth, cfg)
    _assert_tables_close(ref, ours)
