"""Minimal mlflow stand-in for running the UNMODIFIED reference scripts
as subprocesses (mlflow is not installed in this environment).

The reference uses mlflow as (a) a params store — ``get_run(id)`` returns
stringified config dicts that ``configs/parser.py::merge_configs`` re-
``eval()``s — and (b) an artifact dir — ``run.info.artifact_uri`` +
``/model/data/model.pth`` is ``torch.load``ed (reference:
utils/utils.py:8-25, utils/mlflow.py). This shim serves both from a plain
directory tree:

  <tracking_uri>/<runid>/params.yml                  (yaml config dict)
  <tracking_uri>/<runid>/artifacts/model/data/model.pth

Logging entry points are no-ops: the reference also writes its results
as plain YAMLs next to them (utils/mlflow.py:log_results), which is what
the head-to-head test reads back.
"""

import os

import yaml

_tracking_uri = ""


def set_tracking_uri(uri):
    global _tracking_uri
    _tracking_uri = uri or ""


def get_tracking_uri():
    return _tracking_uri


class _Obj:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def get_run(runid):
    run_dir = os.path.join(_tracking_uri, runid)
    with open(os.path.join(run_dir, "params.yml")) as f:
        params = yaml.safe_load(f)
    # mlflow stringifies params; merge_configs eval()s dict-looking ones
    flat = {k: (repr(v) if isinstance(v, dict) else str(v))
            for k, v in params.items()}
    return _Obj(
        data=_Obj(params=flat),
        info=_Obj(artifact_uri=os.path.join(run_dir, "artifacts")),
    )


def set_experiment(*a, **k):
    pass


def start_run(*a, **k):
    pass


def log_artifact(*a, **k):
    pass


def log_text(*a, **k):
    pass


def end_run(*a, **k):
    pass


def get_artifact_uri(artifact_path=""):
    return os.path.join(_tracking_uri, artifact_path)
