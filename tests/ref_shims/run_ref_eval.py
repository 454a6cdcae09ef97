"""Execute the UNMODIFIED reference eval_flow.py at script level.

Usage (subprocess):
  PYTHONPATH=tests/ref_shims python tests/ref_shims/run_ref_eval.py \
      <runid> --config <abs eval.yml> --path_mlflow <mlruns root> \
      --path_results <out dir>/

The reference code is executed verbatim via runpy; only the ENVIRONMENT
is shimmed: the mlflow/progress/hdf5plugin modules it imports are served
by this directory (mlflow is not installed), and torch.load's default is
restored to weights_only=False — torch >= 2.6 changed the default, and
the reference predates that and loads a whole pickled model
(reference: utils/utils.py:19).
"""

import functools
import os
import runpy
import sys

import torch

torch.load = functools.partial(torch.load, weights_only=False)

REF = os.environ.get("EVFLOW_REFERENCE", "/root/reference")
sys.path.insert(0, REF)
os.chdir(REF)
sys.argv = ["eval_flow.py"] + sys.argv[1:]
runpy.run_path(os.path.join(REF, "eval_flow.py"), run_name="__main__")
