"""Evaluation / inference entry point.

TPU-native rebuild of the reference evaluator (reference: eval_flow.py):
same YAML configs and metric protocols (AEE on gtflow modes, FWL/RSAT on
events mode), per-file result YAMLs, optional visualization dumps.

Usage:
  python eval_flow.py <runid> --config configs/eval_ECD.yml
  python eval_flow.py <runid> --config configs/eval_MVSEC.yml --debug
"""

import argparse
import os

# persistent XLA compile cache (same as bench.py/train_flow.py): repeat
# invocations reload executables instead of re-compiling
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def test(args):
    from event_flow_tpu.config.parser import YAMLConfig
    from event_flow_tpu.data.h5 import EventStream
    from event_flow_tpu.eval.harness import Evaluator
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.ops.hot_filter import init_hot_state
    from event_flow_tpu.utils import checkpoint as ckpt
    from event_flow_tpu.utils.tracking import (
        create_model_dir,
        log_eval_config,
        log_eval_results,
    )
    from event_flow_tpu.utils.visualization import Visualization

    parser = YAMLConfig(args.config)
    config = parser.config

    # merge the ENTIRE stored training config under the eval config
    # (reference: configs/parser.py:98-115 — stored run params are the
    # base, the eval YAML wins on conflicts; this is how non-model train
    # settings like loss.overwrite_intermediate survive into eval)
    run_dir = os.path.join(args.runs_root, args.runid)
    # (direct read, not Tracker: its constructor mkdirs the run dir, which
    # would create ghost runs for --torch_weights / unknown runids)
    params_yml = os.path.join(run_dir, "params.yml")
    if os.path.isfile(params_yml):
        import yaml

        stored = yaml.safe_load(open(params_yml))
    else:
        # no local training run (e.g. --torch_weights against released
        # reference weights): the eval config must carry the model block
        stored = {}
    if stored:
        config = parser.merge_configs(stored)

    if getattr(args, "synthetic", False):
        # datasetless smoke evaluation: materialize (cached) synthetic
        # sequences matching the config's mode/resolution
        from event_flow_tpu.data.synthetic import ensure_synthetic_dataset

        config["data"]["path"] = ensure_synthetic_dataset(config)
        print(f"synthetic dataset: {config['data']['path']}")

    # asserts (reference: eval_flow.py:53-72)
    metrics = config.get("metrics", {}).get("name", [])
    if "AEE" in metrics:
        assert config["data"]["mode"] in ("gtflow_dt1", "gtflow_dt4"), (
            "AEE computation not possible without ground truth mode"
        )
        assert config["data"]["window"] <= 1, (
            "AEE computation not compatible with window > 1"
        )
        assert np.isclose((1.0 / config["data"]["window"]) % 1.0, 0.0), (
            "AEE computation not compatible with windows whose inverse is "
            "not a round number"
        )
    if config["loader"]["batch_size"] > 1:
        config.setdefault("vis", {})["enabled"] = False
        config["vis"]["store"] = False

    # results dir + eval id (reference: eval_flow.py:74-82)
    if not args.debug:
        path_results = create_model_dir(args.path_results, args.runid)
        eval_id = log_eval_config(path_results, args.runid, config)
    else:
        path_results, eval_id = None, -1

    # model + restored params
    model = get_model(config["model"]["name"], config["model"])
    res = tuple(config["loader"]["resolution"])
    b = config["loader"]["batch_size"]
    import jax
    import jax.numpy as jnp

    state = model.zero_state(b, *res)
    voxel = jnp.zeros((b, *res, config["model"]["num_bins"]))
    cnt = jnp.zeros((b, *res, 2))
    params = model.init(jax.random.PRNGKey(0), voxel, cnt, state)
    if getattr(args, "torch_weights", None):
        # released reference weights (MLflow torch artifact or state_dict)
        from tools.import_torch import import_torch_checkpoint

        params = import_torch_checkpoint(
            args.torch_weights, config["model"]["name"], config["model"],
            res=res,
        )
        print(f"imported torch weights from {args.torch_weights}")
    else:
        path = ckpt.latest_checkpoint(run_dir)
        if path is not None:
            restored = ckpt.restore_checkpoint(path)
            params = restored["params"]
            print(f"restored params from {path}")
        else:
            print("WARNING: no checkpoint found; evaluating random init")

    if getattr(args, "quantize", None):
        # whole-process serving quantization (metric-level accuracy
        # check for int8 deployment; models/conv.py::_conv2d_int8)
        from event_flow_tpu.models.conv import set_conv_quant

        set_conv_quant(args.quantize)
        print(f"conv quantization: {args.quantize}")

    vis = None
    if config.get("vis", {}).get("enabled") or config.get("vis", {}).get("store"):
        vis = Visualization(config, eval_id=eval_id, path_results=path_results)

    mesh = None
    if getattr(args, "dp", False):
        from event_flow_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        n = max(d for d in range(1, n_dev + 1) if b % d == 0)
        if n < n_dev:
            print(f"WARNING: batch_size {b} is not divisible by the "
                  f"{n_dev} visible devices; using only {n} "
                  f"device{'s' if n > 1 else ' — DP is effectively OFF'}"
                  " (raise loader.batch_size for full parallelism)")
        mesh = make_mesh(n)
        print(f"data-parallel eval: {b} slots over {n} devices")
    evaluator = Evaluator(config, model, params, mesh=mesh)
    if getattr(args, "shard", None):
        # coarse multi-process eval: files are independent, so each
        # process takes a disjoint round-robin subset and the per-file
        # result YAMLs merge trivially
        i, n = (int(v) for v in args.shard.split("/"))
        assert 0 <= i < n, args.shard
        config["loader"]["process_shard"] = (i, n)
    stream = EventStream(config)
    hot_state = init_hot_state(b, res)
    model_state = state
    activity_log = None
    from event_flow_tpu.data.progress import ProgressPrinter

    bar = ProgressPrinter(enabled=config.get("vis", {}).get("bars", False))
    while stream.seq_num < len(stream.files):
        batch = stream.next_batch()
        if stream.seq_num >= len(stream.files):
            break
        if batch["new_seq"]:
            activity_log = None
        model_state, hot_state, win = evaluator.process_batch(
            stream, params, model_state, hot_state, batch
        )
        bar.tick(stream.slot_filename(0))
        if config.get("vis", {}).get("activity") and win["activity"]:
            from event_flow_tpu.utils.visualization import vis_activity

            act = {k: float(v) for k, v in win["activity"].items()}
            activity_log = vis_activity(
                act, activity_log,
                path=os.path.join(path_results or ".", "activity.png")
                if path_results else None,
            )
        if vis is not None:
            flow_vis = np.asarray(win["flow"])
            if model.mask_output:
                flow_vis = flow_vis * np.asarray(win["event_mask"])
            vis_batch = {"event_cnt": win["event_cnt"]}
            if "frames" in batch:
                vis_batch["frames"] = batch["frames"]
            if config["vis"].get("enabled"):
                vis.update(vis_batch, flow_vis, win["iwe"],
                           events_window=win.get("events_window"),
                           masked_window_flow=win.get("flow_window"),
                           iwe_window=win.get("iwe_window"))
            if config["vis"].get("store"):
                vis.store(
                    stream.slot_filename(0).split(".")[0],
                    vis_batch, flow_vis, win["iwe"],
                    ts=stream.last_proc_timestamp,
                    events_window=win.get("events_window"),
                    masked_window_flow=win.get("flow_window"),
                    iwe_window=win.get("iwe_window"),
                )
    bar.finish()
    stream.close()

    results = evaluator.results()
    for metric, vals in results.items():
        for fname, v in sorted(vals.items()):
            print(f"{metric:12s} {fname:30s} {v:.6f}")
    if not args.debug:
        log_eval_results(path_results, eval_id, results)
        print(f"results stored under {path_results}/metrics_{eval_id}.yml")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("runid", help="training run id (under --runs_root)")
    ap.add_argument("--config", default="configs/eval_flow.yml")
    ap.add_argument("--runs_root", default="runs")
    ap.add_argument("--path_results", default="results_inference/")
    ap.add_argument("--debug", action="store_true", help="don't save stuff")
    ap.add_argument(
        "--torch_weights", default=None,
        help="reference torch checkpoint (model.pth / state_dict / MLflow "
             "run dir) to evaluate instead of this run's checkpoints",
    )
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="evaluate with int8 serving convs (metric-level "
                         "accuracy check for quantized deployment)")
    ap.add_argument("--shard", default=None, metavar="I/N",
                    help="evaluate only the I-th of N round-robin file "
                         "shards (run N processes for a full sweep; "
                         "per-file results merge trivially)")
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel eval: shard the batch slots over "
                         "all visible devices (batch_size %% devices == 0)")
    ap.add_argument("--synthetic", action="store_true",
                    help="evaluate on cached synthetic sequences matching "
                         "the config's mode/resolution (no dataset needed)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. when the TPU worker "
                         "is unavailable)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    test(args)
