"""Lightweight experiment tracking (replaces the reference's MLflow glue:
utils/utils.py, utils/mlflow.py).

Run layout:
  runs/<runid>/params.yml        - full config (log_params)
  runs/<runid>/metrics.csv       - step metrics (log_metric)
  runs/<runid>/train_diff.txt    - git diff artifact (save_diff,
                                   utils/utils.py:53-59)
  runs/<runid>/checkpoints/...   - orbax checkpoints (best / latest)
Eval results (reference: utils/mlflow.py:8-40):
  <results>/<runid>/eval_N.yml / metrics_N.yml with auto-incremented N.
"""

import csv
import os
import subprocess
import time
import uuid

import yaml

__all__ = ["Tracker", "log_eval_config", "log_eval_results",
           "create_model_dir"]


class Tracker:
    def __init__(self, experiment="Default", runs_root="runs", runid=None):
        self.runid = runid or time.strftime("%Y%m%d_%H%M%S_") + uuid.uuid4().hex[:6]
        self.dir = os.path.join(runs_root, self.runid)
        os.makedirs(self.dir, exist_ok=True)
        self.experiment = experiment
        self._metrics_path = os.path.join(self.dir, "metrics.csv")
        self._metrics_header_written = os.path.exists(self._metrics_path)

    def log_params(self, config):
        with open(os.path.join(self.dir, "params.yml"), "w") as f:
            yaml.safe_dump(config, f)

    def load_params(self):
        with open(os.path.join(self.dir, "params.yml")) as f:
            return yaml.safe_load(f)

    def log_metric(self, name, value, step):
        new = not os.path.exists(self._metrics_path)
        with open(self._metrics_path, "a", newline="") as f:
            w = csv.writer(f)
            if new:
                w.writerow(["step", "name", "value", "time"])
            w.writerow([step, name, float(value), time.time()])

    def save_csv(self, rows, filename):
        """Append stat rows to an artifact CSV (reference grads CSVs,
        utils/utils.py:40-50)."""
        path = os.path.join(self.dir, filename)
        with open(path, "a", newline="") as f:
            w = csv.writer(f)
            for row in rows:
                w.writerow(row)

    def save_diff(self, filename="train_diff.txt"):
        """Store the working-tree git diff (reference: utils/utils.py:53-59)."""
        try:
            diff = subprocess.run(
                ["git", "diff"], capture_output=True, text=True, timeout=30
            ).stdout
        except Exception:
            diff = "(git diff unavailable)"
        with open(os.path.join(self.dir, filename), "w") as f:
            f.write(diff)

    def checkpoint_dir(self, tag):
        path = os.path.join(self.dir, "checkpoints", tag)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return path


def create_model_dir(path_results, runid):
    """(reference: utils/utils.py:28-33)"""
    path = os.path.join(path_results, runid)
    os.makedirs(path, exist_ok=True)
    return path


def _next_eval_id(path_results):
    n = 0
    while os.path.exists(os.path.join(path_results, f"eval_{n}.yml")):
        n += 1
    return n


def log_eval_config(path_results, runid, config):
    """Store eval settings as eval_N.yml; returns N
    (reference: utils/mlflow.py:8-26)."""
    eval_id = _next_eval_id(path_results)
    with open(os.path.join(path_results, f"eval_{eval_id}.yml"), "w") as f:
        yaml.safe_dump({"runid": runid, **config}, f)
    return eval_id


def log_eval_results(path_results, eval_id, results):
    """Store per-file metric averages as metrics_N.yml
    (reference: utils/mlflow.py:29-40)."""
    out = {
        metric: {k: str(v) for k, v in vals.items()}
        for metric, vals in results.items()
    }
    with open(os.path.join(path_results, f"metrics_{eval_id}.yml"), "w") as f:
        yaml.safe_dump(out, f)
