"""eval_flow.py CLI end-to-end (OS subprocesses, CPU backend): the
file-sharded multi-process workflow (--shard I/N) produces per-file
result YAMLs that merge to exactly the single-process run's results."""

import os
import subprocess
import sys

import pytest
import yaml

import jax.numpy as jnp

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    """Tiny trained run + 2-file synthetic dataset + eval config."""
    import jax

    from event_flow_tpu.data.schema import write_synthetic_sequence
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.utils.checkpoint import save_checkpoint
    from event_flow_tpu.utils.tracking import Tracker

    root = tmp_path_factory.mktemp("evalcli")
    res = (16, 16)
    data = root / "data"
    data.mkdir()
    for i in range(2):
        write_synthetic_sequence(
            str(data / f"seq{i}.h5"), res=res, n_events=4000, duration=1.0,
            velocity=(2.0 + i, -1.0), seed=i,
        )

    model_cfg = {
        "name": "FireNet", "encoding": "cnt", "num_bins": 2,
        "base_num_channels": 4, "kernel_size": 3, "mask_output": True,
        "activations": ["relu", None],
    }
    model = get_model("FireNet", model_cfg)
    state = model.zero_state(1, *res)
    x = jnp.zeros((1, *res, 2))
    params = model.init(jax.random.PRNGKey(0), x, x, state)
    t = Tracker(runs_root=str(root / "runs"))
    t.log_params({"model": model_cfg,
                  "loader": {"resolution": list(res), "batch_size": 1}})
    save_checkpoint(os.path.join(t.dir, "checkpoints", "best"),
                    {"params": params})

    cfg = root / "eval.yml"
    yaml.safe_dump(
        {"data": {"path": str(data) + os.sep, "mode": "events",
                  "window": 500, "window_eval": 1000},
         "loader": {"resolution": list(res), "batch_size": 1,
                    "augment": []},
         "metrics": {"name": ["FWL", "RSAT"], "flow_scaling": 16},
         "hot_filter": {"enabled": False}},
        open(cfg, "w"),
    )
    return root, t.runid, str(cfg)


def _run_eval(root, runid, cfg, results_dir, shard=None):
    cmd = [sys.executable, os.path.join(REPO, "eval_flow.py"), runid,
           "--config", cfg, "--runs_root", str(root / "runs"),
           "--path_results", results_dir + os.sep, "--cpu"]
    if shard:
        cmd += ["--shard", shard]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                       cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    path = os.path.join(results_dir, runid, "metrics_0.yml")
    with open(path) as f:
        return yaml.safe_load(f)


def test_sharded_cli_matches_single_process(setup, tmp_path):
    root, runid, cfg = setup
    single = _run_eval(root, runid, cfg, str(tmp_path / "single"))
    merged = {}
    for shard in ("0/2", "1/2"):
        part = _run_eval(root, runid, cfg,
                         str(tmp_path / f"shard{shard[0]}"), shard=shard)
        for metric, per_file in part.items():
            merged.setdefault(metric, {}).update(per_file)

    assert merged.keys() == single.keys()
    for metric, per_file in single.items():
        assert merged[metric].keys() == per_file.keys(), metric
        for fname, val in per_file.items():
            assert float(merged[metric][fname]) == pytest.approx(
                float(val), rel=1e-6
            ), (metric, fname)
    # the shards actually split the files (one each)
    part0 = yaml.safe_load(
        open(tmp_path / "shard0" / runid / "metrics_0.yml"))
    assert len(part0["FWL"]) == 1
