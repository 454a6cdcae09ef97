"""Head-to-head eval-protocol parity against the reference evaluator.

Runs the ACTUAL reference pipeline — H5Loader + custom_collate + torch
FireNet + FWL/RSAT/AEE classes, driven by a faithful transcription of the
reference inference loop (reference: eval_flow.py:119-258; the script
itself needs mlflow/cv2 which are not installed) — and OUR eval_flow.test()
CLI entry on the same synthetic H5 files with the same transplanted
weights, and asserts the per-file metric tables agree to <= 1e-3.

This covers the full protocol: windowing cadence, the
``num_events >= window_eval`` accumulation gate, AEE ``dt_gt/dt_input``
rescaling and every-round(1/window) cadence, and per-file averaging.
"""

import argparse
import os
import sys
import types

import numpy as np
import pytest
import yaml

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)
torch = pytest.importorskip("torch")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the reference dataloader imports `progress.bar.Bar` (a progress-bar
# package not installed here); stub the display-only dependency
if "progress" not in sys.modules:
    try:
        import progress.bar  # noqa: F401
    except ImportError:
        pkg = types.ModuleType("progress")
        bar = types.ModuleType("progress.bar")

        class _Bar:
            avg = 1.0

            def __init__(self, *a, **k):
                pass

            def next(self):
                pass

            def finish(self):
                pass

        bar.Bar = _Bar
        pkg.bar = bar
        sys.modules["progress"] = pkg
        sys.modules["progress.bar"] = bar

# hdf5plugin only registers compression filters the reference datasets use;
# the synthetic files here are uncompressed
if "hdf5plugin" not in sys.modules:
    try:
        import hdf5plugin  # noqa: F401
    except ImportError:
        sys.modules["hdf5plugin"] = types.ModuleType("hdf5plugin")


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

# stateful SNN flagship (configs/train_SNN.yml recipe, smaller channels)
LIF_BLOCK = {
    **MODEL_BLOCK,
    "name": "LIFFireNet",
    "activations": ["arctanspike", "arctanspike"],
    "spiking_neuron": {
        "leak": [-4.0, 0.1],
        "thresh": [0.8, 0.1],
        "learn_leak": True,
        "learn_thresh": True,
        "hard_reset": True,
    },
}

# multi-scale UNet headline (configs/train_ANN.yml RecEVFlowNet recipe)
REC_BLOCK = {
    **MODEL_BLOCK,
    "name": "RecEVFlowNet",
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


def _make_config(data_path, mode, window, window_eval, metrics, res,
                 block=MODEL_BLOCK):
    return {
        "data": {"path": data_path, "mode": mode, "window": window,
                 "window_eval": window_eval},
        "model": dict(block),
        "metrics": {"name": list(metrics), "flow_scaling": max(res)},
        "loss": {"overwrite_intermediate": False, "flow_regul_weight": 0.001,
                 "clip_grad": None},
        "loader": {"batch_size": 1, "resolution": list(res), "augment": [],
                   "augment_prob": [], "seed": 0, "gpu": 0},
        "vis": {"enabled": False, "px": 400, "bars": False,
                "activity": False, "store": False},
        "hot_filter": {"enabled": False, "max_px": 100, "min_obvs": 5,
                       "max_rate": 0.8},
    }


def _ref_model(seed=0, block=MODEL_BLOCK):
    import models.model as ref_models

    cls = getattr(ref_models, block["name"])
    for klass in cls.__mro__:
        if "kwargs" in vars(klass):
            klass.kwargs = [{} for _ in klass.kwargs]
    torch.manual_seed(seed)
    m = cls(dict(block))
    m.eval()
    return m


def run_reference_eval(config, model):
    """Transcription of the reference inference loop
    (reference: eval_flow.py:119-239, result averaging :246-258)."""
    import loss.flow as ref_loss
    from dataloader.h5 import H5Loader

    device = torch.device("cpu")
    metric_classes = {"FWL": ref_loss.FWL, "RSAT": ref_loss.RSAT,
                      "AEE": ref_loss.AEE}
    criteria = [
        metric_classes[m](config, device,
                          flow_scaling=config["metrics"]["flow_scaling"])
        for m in config["metrics"]["name"]
    ]
    data = H5Loader(config, config["model"]["num_bins"])
    dataloader = torch.utils.data.DataLoader(
        data, drop_last=True, batch_size=config["loader"]["batch_size"],
        collate_fn=data.custom_collate, num_workers=0,
    )

    idx_AEE = 0
    val_results = {}
    end_test = False
    with torch.no_grad():
        while True:
            for inputs in dataloader:
                if data.new_seq:
                    data.new_seq = False
                    model.reset_states()
                if data.seq_num >= len(data.files):
                    end_test = True
                    break
                x = model(inputs["event_voxel"].to(device),
                          inputs["event_cnt"].to(device))
                for metric in criteria:
                    metric.event_flow_association(x["flow"], inputs)
                for i, metric in enumerate(config["metrics"]["name"]):
                    if criteria[i].num_events >= config["data"]["window_eval"]:
                        if config["loss"]["overwrite_intermediate"]:
                            criteria[i].overwrite_intermediate_flow(x["flow"])
                        if metric == "AEE" and inputs["dt_gt"] <= 0.0:
                            continue
                        if metric == "AEE":
                            idx_AEE += 1
                            if idx_AEE != np.round(
                                1.0 / config["data"]["window"]
                            ):
                                continue
                        val_metric = criteria[i]()
                        if metric == "AEE":
                            idx_AEE = 0
                        for batch in range(config["loader"]["batch_size"]):
                            filename = data.files[
                                data.batch_idx[batch] % len(data.files)
                            ].split("/")[-1]
                            entry = val_results.setdefault(
                                filename, {}
                            ).setdefault(
                                metric, {"metric": 0.0, "it": 0, "percent": 0.0}
                            )
                            entry["it"] += 1
                            if metric == "AEE":
                                entry["metric"] += float(
                                    val_metric[0][batch].cpu().numpy()
                                )
                                entry["percent"] += float(
                                    val_metric[1][batch].cpu().numpy()
                                )
                            else:
                                entry["metric"] += float(
                                    val_metric[batch].cpu().numpy()
                                )
                        criteria[i].reset()
            if end_test:
                break

    out = {}
    for metric in config["metrics"]["name"]:
        out[metric] = {}
        if metric == "AEE":
            out["AEE_percent"] = {}
        for fname, entry in val_results.items():
            if metric not in entry:
                continue
            out[metric][fname] = entry[metric]["metric"] / entry[metric]["it"]
            if metric == "AEE":
                out["AEE_percent"][fname] = (
                    entry[metric]["percent"] / entry[metric]["it"]
                )
    return out


def run_ours(config, tmp_path, ref_model, tag):
    """Our eval_flow CLI entry on the same config + transplanted weights."""
    sys.path.insert(0, "/root/repo")
    import eval_flow

    sd_path = tmp_path / f"{tag}_sd.pth"
    torch.save(ref_model.state_dict(), str(sd_path))
    cfg_path = tmp_path / f"{tag}_eval.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    args = argparse.Namespace(
        runid="parity", config=str(cfg_path),
        runs_root=str(tmp_path / "runs"),
        path_results=str(tmp_path / "results"), debug=True,
        torch_weights=str(sd_path),
    )
    return eval_flow.test(args)


def _assert_tables_close(ref, ours, atol=1e-3):
    assert set(ref.keys()) == set(ours.keys()), (ref.keys(), ours.keys())
    for metric in ref:
        assert set(ref[metric].keys()) == set(ours[metric].keys()), (
            metric, ref[metric].keys(), ours[metric].keys()
        )
        for fname, v in ref[metric].items():
            np.testing.assert_allclose(
                ours[metric][fname], v, atol=atol, rtol=1e-3,
                err_msg=f"{metric}/{fname}",
            )


def test_events_mode_fwl_rsat_protocol_parity(tmp_path):
    res = (48, 48)
    data_path = _write_dataset(tmp_path, res=res)
    # window < window_eval exercises the accumulation gate (3 windows/eval)
    config = _make_config(data_path, "events", 2000, 6000,
                          ["FWL", "RSAT"], res)
    model = _ref_model(seed=3)
    ref_results = run_reference_eval(config, model)
    our_results = run_ours(config, tmp_path, model, "events")
    assert ref_results["FWL"], "reference produced no FWL windows"
    _assert_tables_close(ref_results, our_results)


def test_gtflow_aee_protocol_parity(tmp_path):
    res = (48, 48)
    data_path = _write_dataset(tmp_path, res=res, gt_flow_hz=8)
    config = _make_config(data_path, "gtflow_dt1", 1, 1, ["AEE"], res)
    model = _ref_model(seed=4)
    ref_results = run_reference_eval(config, model)
    our_results = run_ours(config, tmp_path, model, "gtflow")
    assert ref_results["AEE"], "reference produced no AEE windows"
    _assert_tables_close(ref_results, our_results)


def test_stateful_snn_protocol_parity(tmp_path):
    """LIFFireNet (the paper's headline SNN): the recurrent membrane /
    spike state carries across EVERY window of a sequence, so any state
    divergence compounds into the metric tables."""
    res = (48, 48)
    data_path = _write_dataset(tmp_path, res=res)
    config = _make_config(data_path, "events", 2000, 6000,
                          ["FWL", "RSAT"], res, block=LIF_BLOCK)
    model = _ref_model(seed=5, block=LIF_BLOCK)
    ref_results = run_reference_eval(config, model)
    our_results = run_ours(config, tmp_path, model, "lif")
    assert ref_results["FWL"], "reference produced no FWL windows"
    _assert_tables_close(ref_results, our_results)


def test_multiscale_unet_protocol_parity(tmp_path):
    """RecEVFlowNet (the UNet-family headline): multi-scale flow list +
    ConvGRU encoder state; eval consumes the highest-resolution scale
    (reference: loss/flow.py:350)."""
    res = (48, 48)
    data_path = _write_dataset(tmp_path, res=res)
    config = _make_config(data_path, "events", 2000, 6000,
                          ["FWL", "RSAT"], res, block=REC_BLOCK)
    model = _ref_model(seed=6, block=REC_BLOCK)
    ref_results = run_reference_eval(config, model)
    our_results = run_ours(config, tmp_path, model, "rec")
    assert ref_results["FWL"], "reference produced no FWL windows"
    _assert_tables_close(ref_results, our_results)


def test_gtflow_dt4_fractional_window_parity(tmp_path):
    """gtflow_dt4 with window=0.25: fractional event windows between
    interpolated map-index points (reference: dataloader/h5.py:208-223)
    and the AEE cadence of every round(1/window)=4 windows
    (reference: eval_flow.py:170-180)."""
    res = (48, 48)
    from event_flow_tpu.data.schema import write_synthetic_sequence

    ddir = tmp_path / "data"
    ddir.mkdir()
    for i, vel in enumerate([(3.0, 5.0), (-4.0, 2.0)]):
        write_synthetic_sequence(
            str(ddir / f"seq{i}.h5"), res=res, n_events=30000, duration=1.0,
            velocity=vel, seed=21 + i, gt_flow_dt4_interval=0.2,
        )
    config = _make_config(str(ddir) + "/", "gtflow_dt4", 0.25, 0.25,
                          ["AEE"], res)
    model = _ref_model(seed=7)
    ref_results = run_reference_eval(config, model)
    our_results = run_ours(config, tmp_path, model, "dt4")
    assert ref_results["AEE"], "reference produced no AEE windows"
    _assert_tables_close(ref_results, our_results)
