"""Export a trained run as a serialized serving artifact (StableHLO).

CLI front-end for ``eval/serialized.py::export_engine``: loads a run's
params (orbax checkpoint, or a reference torch checkpoint via
``--torch_weights``), builds the jitted streaming step, and writes the
self-contained artifact directory a `SerializedEngine` (or any
jax.export consumer) can serve with no model/config code.

Usage:
  python tools/export_serving.py runs/<runid> --config configs/eval_ECD.yml \
      --out artifact/ --events 15000 --s 16
  python tools/export_serving.py any --config ... --torch_weights model.pth \
      --out artifact/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run", help="run dir (uses latest checkpoint) or 'any' "
                               "with --torch_weights")
    ap.add_argument("--config", required=True,
                    help="eval YAML (model block + resolution)")
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--events", type=int, default=15000,
                    help="static window event capacity (shorter windows "
                         "pad+mask)")
    ap.add_argument("--s", type=int, default=None,
                    help="also export the S-window step_many form")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="export with int8 serving convs")
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated jax.export lowering platforms")
    ap.add_argument("--torch_weights", default=None,
                    help="reference torch checkpoint instead of a run dir")
    ap.add_argument("--cpu", action="store_true",
                    help="run the export on the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from event_flow_tpu.config.parser import YAMLConfig
    from event_flow_tpu.eval.predict import InferenceEngine
    from event_flow_tpu.eval.serialized import export_engine
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.utils import checkpoint as ckpt

    parser = YAMLConfig(args.config)
    config = parser.config
    if not args.torch_weights:
        # the model block comes from the run's stored training config
        # (same merge as eval_flow.py / reference configs/parser.py:98-115)
        import yaml

        params_yml = os.path.join(args.run, "params.yml")
        stored = (yaml.safe_load(open(params_yml))
                  if os.path.isfile(params_yml) else {})
        if stored:
            config = parser.merge_configs(stored)
    assert config.get("model", {}).get("name"), (
        "no model block: give a config with model.name or a run dir with "
        "stored params"
    )
    res = tuple(config["loader"]["resolution"])
    model = get_model(config["model"]["name"], config["model"])
    state = model.zero_state(args.batch, *res)
    x = jnp.zeros((args.batch, *res, config["model"]["num_bins"]))
    params = model.init(jax.random.PRNGKey(0), x, x, state)
    if args.torch_weights:
        from tools.import_torch import import_torch_checkpoint

        params = import_torch_checkpoint(
            args.torch_weights, config["model"]["name"], config["model"],
            res=res,
        )
    else:
        path = ckpt.latest_checkpoint(args.run)
        assert path is not None, f"no checkpoint under {args.run}"
        restored = ckpt.restore_checkpoint(path)
        params = restored["params"] if "params" in restored else restored

    engine = InferenceEngine(config, model, params, batch=args.batch,
                             quantize=args.quantize)
    out = export_engine(engine, args.out, n_events=args.events, s=args.s,
                        platforms=tuple(args.platforms.split(",")))
    sizes = {f: os.path.getsize(os.path.join(out, f))
             for f in sorted(os.listdir(out))}
    total = sum(sizes.values())
    print(f"exported {config['model']['name']} -> {out} "
          f"({total / 1e6:.2f} MB: "
          + ", ".join(f"{f} {s / 1e6:.2f}" for f, s in sizes.items()) + ")")


if __name__ == "__main__":
    main()
