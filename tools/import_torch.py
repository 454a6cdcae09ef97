"""Import reference PyTorch checkpoints into event_flow_tpu flax params.

The reference releases pretrained models as MLflow artifacts: a whole
pickled torch model at ``<run>/artifacts/model/data/model.pth`` restored by
state_dict copy (reference: utils/utils.py:8-25). This tool converts any of

  * a raw ``state_dict`` file (``torch.save(model.state_dict(), ...)``),
  * a whole pickled model (``mlflow.pytorch.log_model`` layout), or
  * an MLflow run directory (searched for ``model/data/model.pth``)

into the flax params pytree of the matching event_flow_tpu model — all 19
model classes (models/registry.py) — so released reference weights run
under this framework (eval_flow.py ``--torch_weights``).

Mapping is name-canonical, not per-model: both the torch state_dict keys
and the flax param paths are normalized to a shared canonical form
(container prefixes like ``multires_unetrec`` -> ``unet``; ``encoders.0``
-> ``encoders_0``; ``conv2d``/``transposed_conv2d``/``deconv`` -> ``conv``;
``weight`` -> ``kernel``; OIHW -> HWIO transpose; per-channel neuron
params ``(C,1,1)`` -> ``(C,)``), then matched exactly. Weight-normed convs
(``weight_g``/``weight_v``, spiking_submodules.py:87-88) map onto the
``kernel``+``g`` reparameterization of models/conv.py.

Usage:
  python tools/import_torch.py <model.pth|run_dir> --config configs/eval_MVSEC.yml \
      --out runs/<runid>            # writes runs/<runid>/checkpoints/best
  python tools/import_torch.py <model.pth> --model LIFFireNet --print-map
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# leaf names that are per-channel neuron parameters stored (C,1,1) in torch
_CHANNEL_VECS = {
    "leak", "thresh", "leak_v", "leak_t", "leak_pt", "add_pt", "t0", "t1",
}
# torch buffers that have no flax counterpart
_SKIP_LEAVES = {"act_width", "num_batches_tracked", "running_mean",
                "running_var"}
# top-level UNet container attributes in the reference model classes
# (model.py: self.multires_unetrec / self.multires_unet / self.unetrecurrent)
_UNET_PREFIXES = {"multires_unetrec", "multires_unet", "unetrecurrent"}


def _canon_segment(seg):
    """Normalize one module-path segment to the shared canonical form."""
    if seg in _UNET_PREFIXES:
        return "unet"
    if seg in ("conv2d", "transposed_conv2d", "deconv"):
        return "conv"
    if seg == "Gates":
        return "gates"
    if seg == "norm_layer":
        return "norm"
    return seg


def _canon_torch_key(key):
    """Canonical path for a torch state_dict key, or None to skip."""
    parts = key.split(".")
    leaf = parts[-1]
    if leaf in _SKIP_LEAVES:
        return None, None
    # merge list indices: encoders.0 -> encoders_0
    segs = []
    for p in parts[:-1]:
        if p.isdigit() and segs:
            segs[-1] = f"{segs[-1]}_{p}"
        else:
            segs.append(_canon_segment(p))
    if leaf == "weight":
        # BN/IN affine scale lives on the norm layer itself
        lf = "scale" if segs and segs[-1] == "norm" else "kernel"
    elif leaf == "weight_v":
        lf = "kernel"
    elif leaf == "weight_g":
        lf = "g"
    else:
        lf = leaf
    return tuple(segs + [lf]), leaf


def _canon_flax_path(path):
    segs = [_canon_segment(str(k)) for k in path]
    if segs and segs[0] == "params":  # flax collection root
        segs = segs[1:]
    return tuple(segs)


def _to_numpy(t):
    return np.asarray(t.detach().cpu().numpy()) if hasattr(t, "detach") \
        else np.asarray(t)


def _convert_value(leaf_name, value):
    v = _to_numpy(value).astype(np.float32)
    if leaf_name in ("weight", "weight_v") and v.ndim == 4:
        return np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
    if leaf_name in _CHANNEL_VECS or leaf_name == "weight_g":
        return v.reshape(-1)
    return v


def state_dict_to_params(state_dict, target_params, strict=True,
                         print_map=False):
    """Map a reference torch ``state_dict`` onto ``target_params`` (the
    flax params pytree from ``model.init``). Returns a new params pytree
    with every leaf replaced by the transplanted weight.

    ``strict`` requires every target leaf to be covered and every
    non-buffer torch entry to be consumed.
    """
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    by_canon = {}
    for path, leaf in flat:
        cpath = _canon_flax_path(tuple(k.key for k in path))
        assert cpath not in by_canon, f"canonical collision at {cpath}"
        by_canon[cpath] = (path, leaf)

    out = {cp: None for cp in by_canon}
    unused = []
    for key, value in state_dict.items():
        cpath, leaf_name = _canon_torch_key(key)
        if cpath is None:
            continue
        if cpath not in by_canon:
            unused.append(key)
            continue
        v = _convert_value(leaf_name, value)
        tgt = by_canon[cpath][1]
        if v.shape != tuple(tgt.shape):
            raise ValueError(
                f"shape mismatch for {key} -> {'/'.join(cpath)}: "
                f"torch {v.shape} vs flax {tuple(tgt.shape)}"
            )
        if print_map:
            print(f"{key:60s} -> {'/'.join(cpath)} {v.shape}")
        out[cpath] = v

    missing = [cp for cp, v in out.items() if v is None]
    if strict and (missing or unused):
        raise ValueError(
            "import incomplete; missing flax params: "
            + ", ".join("/".join(m) for m in missing)
            + "; unused torch keys: " + ", ".join(unused)
        )

    leaves = []
    for path, leaf in flat:
        cpath = _canon_flax_path(tuple(k.key for k in path))
        v = out[cpath]
        leaves.append(leaf if v is None else v.astype(np.float32))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_torch_state_dict(path, allow_pickle=True):
    """Load a state_dict from a raw file, a pickled model, or an MLflow
    run/artifact directory (reference layout, utils/utils.py:8-25).

    ``allow_pickle`` gates the fallback to ``weights_only=False`` needed
    for the reference's whole-model MLflow pickles — full pickle load
    executes arbitrary code from the file, so a warning is emitted and
    ``--no-pickle`` disables it for untrusted checkpoints."""
    import pickle
    import warnings

    import torch

    if os.path.isdir(path):
        candidates = [
            os.path.join(path, "model", "data", "model.pth"),
            os.path.join(path, "artifacts", "model", "data", "model.pth"),
            os.path.join(path, "data", "model.pth"),
            os.path.join(path, "model.pth"),
        ]
        for c in candidates:
            if os.path.isfile(c):
                path = c
                break
        else:
            raise FileNotFoundError(
                f"no model.pth under {path} (tried MLflow layouts)"
            )
    # whole-model pickles need the reference package importable
    if "/root/reference" not in sys.path and os.path.isdir("/root/reference"):
        sys.path.append("/root/reference")
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except (pickle.UnpicklingError, RuntimeError, AttributeError):
        # weights_only=True rejects whole-model pickles (the reference's
        # mlflow.pytorch.log_model layout); other exceptions propagate.
        if not allow_pickle:
            raise
        warnings.warn(
            f"{path} is not a weights-only checkpoint; retrying with full "
            "pickle load (executes code from the file — pass "
            "allow_pickle=False / --no-pickle to forbid)",
            stacklevel=2,
        )
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise TypeError(f"unsupported checkpoint object {type(obj)}")
    return obj


def import_torch_checkpoint(path, model_name, model_cfg, res=(128, 128),
                            strict=True, allow_pickle=True):
    """checkpoint file/dir -> flax params for ``model_name``."""
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.models.registry import get_model

    model = get_model(model_name, model_cfg)
    h, w = res
    state = model.zero_state(1, h, w)
    voxel = jnp.zeros((1, h, w, int(model_cfg.get("num_bins", 2))))
    cnt = jnp.zeros((1, h, w, 2))
    target = model.init(jax.random.PRNGKey(0), voxel, cnt, state)
    sd = load_torch_state_dict(path, allow_pickle=allow_pickle)
    return state_dict_to_params(sd, target, strict=strict)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="model.pth / state_dict / MLflow run dir")
    ap.add_argument("--config", default=None,
                    help="YAML with the model block (train or eval config)")
    ap.add_argument("--model", default=None, help="model name override")
    ap.add_argument("--out", default=None,
                    help="run dir to write checkpoints/best into")
    ap.add_argument("--print-map", action="store_true")
    ap.add_argument("--no-pickle", action="store_true",
                    help="refuse the full-pickle fallback (untrusted files)")
    args = ap.parse_args()

    from event_flow_tpu.config.parser import YAMLConfig

    model_cfg = {}
    if args.config:
        model_cfg = dict(YAMLConfig(args.config).config.get("model", {}))
    if args.model:
        model_cfg["name"] = args.model
    name = model_cfg.get("name")
    assert name, "give --model or a --config with a model.name"

    params = import_torch_checkpoint(args.checkpoint, name, model_cfg,
                                     allow_pickle=not args.no_pickle)
    n = sum(np.asarray(v).size
            for v in __import__("jax").tree_util.tree_leaves(params))
    print(f"imported {name}: {n} parameters")

    if args.out:
        from event_flow_tpu.utils.checkpoint import save_checkpoint

        path = save_checkpoint(
            os.path.join(args.out, "checkpoints", "best"), {"params": params}
        )
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
