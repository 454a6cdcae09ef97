"""train_flow.py CLI end-to-end (OS subprocess, CPU backend): synthetic
training writes a full exit checkpoint (through the async-save path) and
--resume restores it exactly through the CLI."""

import os
import re
import subprocess
import sys

import yaml

REPO = os.path.join(os.path.dirname(__file__), "..")


def _small_cfg(path):
    cfg = yaml.safe_load(
        open(os.path.join(REPO, "configs", "train_SNN.yml")))
    cfg["loader"]["batch_size"] = 1
    cfg["loader"]["resolution"] = [32, 32]
    cfg["model"]["base_num_channels"] = 4
    cfg["data"]["window"] = 300
    cfg["data"]["window_loss"] = 600
    yaml.safe_dump(cfg, open(path, "w"))
    return path


def _train(cfg, runs_root, extra=()):
    cmd = [sys.executable, os.path.join(REPO, "train_flow.py"),
           "--config", cfg, "--runs_root", runs_root,
           "--synthetic", "--max_updates", "2", "--cpu", *extra]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                       cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def test_train_cli_checkpoint_and_resume(tmp_path):
    cfg = _small_cfg(str(tmp_path / "train.yml"))
    runs = str(tmp_path / "runs")

    out1 = _train(cfg, runs)
    m = re.search(r"run dir: .*[/\\](\S+)", out1)
    assert m, out1
    runid = m.group(1)
    run_dir = os.path.join(runs, runid)
    # the exit path wrote the FULL checkpoint through the async writer
    # and finalize() joined it before the process returned
    assert os.path.exists(os.path.join(run_dir, "checkpoints", "latest"))
    assert os.path.exists(os.path.join(run_dir, "params.yml"))

    out2 = _train(cfg, runs, extra=("--resume", runid))
    assert f"resumed run {runid}" in out2, out2
    assert "stopping after" in out2


def test_train_cli_synthetic_rich(tmp_path):
    """`--synthetic rich` trains datasetless on the textured varied-flow
    stream (data/synthetic.py::rich_window_stream) through the same CLI
    path as the constant-flow default."""
    cfg = _small_cfg(str(tmp_path / "train.yml"))
    runs = str(tmp_path / "runs")
    cmd = [sys.executable, os.path.join(REPO, "train_flow.py"),
           "--config", cfg, "--runs_root", runs,
           "--synthetic", "rich", "--max_updates", "2", "--cpu"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                       cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "stopping after" in r.stdout
