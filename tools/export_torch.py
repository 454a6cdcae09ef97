"""Export event_flow_tpu flax params to a reference-compatible PyTorch
``state_dict`` — the exact inverse of ``tools/import_torch.py``.

Lets a model trained under this framework run in the reference PyTorch
code (restored by state_dict copy, reference: utils/utils.py:8-25), which
closes the migration loop in both directions and gives a second
independent check of weight-layout parity.

The torch key names/shapes are taken from a *template* state_dict: either
built by instantiating the reference model class (``/root/reference`` on
sys.path, the default here) or loaded from a file via ``--template`` when
the reference checkout isn't available. Values are mapped through the
same canonical-path scheme the importer uses (container prefixes ->
``unet``, ``encoders.0`` -> ``encoders_0``, ``weight`` -> ``kernel``,
HWIO -> OIHW transpose, per-channel neuron vectors ``(C,)`` -> ``(C,1,1)``);
torch-only buffers (``act_width``, BN running stats) keep the template's
values, which the reference derives from config at construction.

Usage:
  python tools/export_torch.py runs/<runid> --config configs/train_SNN.yml \
      --out model.pth                      # raw state_dict
  python tools/export_torch.py runs/<runid> --config ... --out run_dir \
      --mlflow-layout                      # <out>/artifacts/model/data/model.pth
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.import_torch import (  # noqa: E402
    _CHANNEL_VECS,
    _canon_flax_path,
    _canon_torch_key,
)


def _invert_value(leaf_name, v, tmpl_shape):
    """Inverse of import_torch._convert_value for one leaf."""
    if leaf_name in ("weight", "weight_v") and v.ndim == 4:
        v = np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW
    elif leaf_name in _CHANNEL_VECS or leaf_name == "weight_g":
        v = v.reshape(tmpl_shape)  # (C,) -> (C,1,1) / weight-norm g shape
    if v.shape != tuple(tmpl_shape):
        raise ValueError(
            f"shape mismatch for {leaf_name}: flax {v.shape} vs "
            f"torch template {tuple(tmpl_shape)}"
        )
    return v


def params_to_state_dict(params, template_sd, strict=True, print_map=False):
    """Map a flax params pytree onto the torch ``template_sd`` layout.

    Returns a new state_dict (torch tensors) with every weight replaced by
    the flax value; torch-only buffers keep the template's values.
    ``strict`` requires every flax leaf to be consumed and every non-buffer
    torch entry to be covered.
    """
    import jax
    import torch

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    by_canon = {}
    for path, leaf in flat:
        cpath = _canon_flax_path(tuple(k.key for k in path))
        assert cpath not in by_canon, f"canonical collision at {cpath}"
        by_canon[cpath] = np.asarray(jax.device_get(leaf), dtype=np.float32)

    out = {}
    consumed = set()
    uncovered = []
    for key, tmpl in template_sd.items():
        cpath, leaf_name = _canon_torch_key(key)
        if cpath is None:  # torch-only buffer (act_width, BN stats)
            out[key] = tmpl.detach().clone()
            continue
        if cpath not in by_canon:
            uncovered.append(key)
            out[key] = tmpl.detach().clone()
            continue
        v = _invert_value(leaf_name, by_canon[cpath], tuple(tmpl.shape))
        if print_map:
            print(f"{'/'.join(cpath):60s} -> {key} {v.shape}")
        out[key] = torch.tensor(np.ascontiguousarray(v))
        consumed.add(cpath)

    leftover = sorted(set(by_canon) - consumed)
    if strict and (uncovered or leftover):
        raise ValueError(
            "export incomplete; torch keys with no flax source: "
            + ", ".join(uncovered)
            + "; flax params with no torch target: "
            + ", ".join("/".join(p) for p in leftover)
        )
    return out


def build_reference_model(model_name, model_cfg, reference="/root/reference"):
    """Instantiate the reference torch model class to serve as the export
    template (and as the whole-model pickle when requested)."""
    if os.path.isdir(reference) and reference not in sys.path:
        sys.path.append(reference)
    import models.model as ref_models  # the reference package

    cls = getattr(ref_models, model_name)
    # the reference FireNet family mutates a CLASS-level shared kwargs list
    # (reference model.py:159, :171-173); reset so earlier constructions in
    # this process don't leak neuron kwargs across variants
    for klass in cls.__mro__:
        if "kwargs" in vars(klass):
            klass.kwargs = [{} for _ in klass.kwargs]
    m = cls(dict(model_cfg))
    m.eval()
    return m


def export_torch_checkpoint(params, model_name, model_cfg, out,
                            template=None, mlflow_layout=False,
                            strict=True):
    """flax params -> torch checkpoint file. Returns the written path.

    ``template``: optional path to a torch state_dict file to use as the
    key/shape template instead of instantiating the reference model.
    ``mlflow_layout``: write ``<out>/artifacts/model/data/model.pth`` as a
    whole pickled reference model (the layout ``mlflow.pytorch.log_model``
    produces and the reference's load_model consumes).
    """
    import torch

    ref_model = None
    if template is not None:
        template_sd = torch.load(template, map_location="cpu",
                                 weights_only=True)
        if mlflow_layout:
            raise ValueError("--mlflow-layout needs the reference model "
                             "class; incompatible with --template")
    else:
        ref_model = build_reference_model(model_name, model_cfg)
        template_sd = ref_model.state_dict()

    sd = params_to_state_dict(params, template_sd, strict=strict)

    if mlflow_layout:
        ref_model.load_state_dict(sd, strict=True)
        path = os.path.join(out, "artifacts", "model", "data", "model.pth")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        torch.save(ref_model, path)
    else:
        path = out
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        torch.save(sd, path)
    return path


def _load_params(src, model_name, model_cfg):
    """Load flax params from a run dir or a checkpoint path."""
    from event_flow_tpu.utils import checkpoint as ckpt

    path = src
    if os.path.isdir(src):
        found = ckpt.latest_checkpoint(src)
        if found is not None:
            path = found
    restored = ckpt.restore_checkpoint(path)
    return restored["params"] if "params" in restored else restored


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint",
                    help="run dir (uses checkpoints/best) or checkpoint path")
    ap.add_argument("--config", default=None,
                    help="YAML with the model block (train or eval config)")
    ap.add_argument("--model", default=None, help="model name override")
    ap.add_argument("--out", required=True,
                    help="output .pth path (or run dir with --mlflow-layout)")
    ap.add_argument("--template", default=None,
                    help="torch state_dict file to use as the key template "
                         "(when /root/reference is unavailable)")
    ap.add_argument("--mlflow-layout", action="store_true",
                    help="write a whole pickled model under "
                         "<out>/artifacts/model/data/model.pth")
    ap.add_argument("--print-map", action="store_true")
    args = ap.parse_args()

    from event_flow_tpu.config.parser import YAMLConfig

    model_cfg = {}
    if args.config:
        model_cfg = dict(YAMLConfig(args.config).config.get("model", {}))
    if args.model:
        model_cfg["name"] = args.model
    name = model_cfg.get("name")
    assert name, "give --model or a --config with a model.name"

    params = _load_params(args.checkpoint, name, model_cfg)
    if args.print_map:
        import torch

        tmpl = (torch.load(args.template, map_location="cpu",
                           weights_only=True) if args.template
                else build_reference_model(name, model_cfg).state_dict())
        params_to_state_dict(params, tmpl, print_map=True)

    path = export_torch_checkpoint(
        params, name, model_cfg, args.out,
        template=args.template, mlflow_layout=args.mlflow_layout,
    )
    n = sum(np.asarray(v).size
            for v in __import__("jax").tree_util.tree_leaves(params))
    print(f"exported {name}: {n} parameters -> {path}")


if __name__ == "__main__":
    main()
