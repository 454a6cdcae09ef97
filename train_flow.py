"""Training entry point.

TPU-native rebuild of the reference trainer (reference: train_flow.py):
same YAML configs, same protocol (window accumulation, sequence resets,
per-epoch best-model checkpointing), with the whole loss window compiled
into one jitted lax.scan step.

Usage:
  python train_flow.py --config configs/train_SNN.yml
  python train_flow.py --config configs/train_ANN.yml --prev_runid <id>
  python train_flow.py --config configs/train_SNN.yml --synthetic \
      --max_updates 50        # no dataset needed (constant-flow stream)
Optional data parallelism over all visible devices: --dp.
"""

import argparse
import os

# persistent XLA compile cache (same as bench.py): repeat invocations and
# retries after a worker crash reload executables instead of re-running
# the heavy b8 train-step compile that destabilizes the tunnel worker
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np


def train(args):
    from event_flow_tpu.config.parser import YAMLConfig
    from event_flow_tpu.train.loop import Trainer
    from event_flow_tpu.utils.tracking import Tracker

    # programmatic-entry contract: callers may pass a bare Namespace with
    # only the fields they care about; every CLI flag's default is filled
    # in here so adding a new flag can never break embedding users
    # (round-4 regression: an unguarded args.bf16 read broke exact-resume)
    for action in build_arg_parser()._actions:
        if action.dest != "help" and not hasattr(args, action.dest):
            setattr(args, action.dest, action.default)

    parser = YAMLConfig(args.config)
    config = parser.config
    if config["data"]["mode"] == "frames":
        raise ValueError(
            "Training pipeline not compatible with frames mode "
            "(reference: train_flow.py:43-45)"
        )
    if getattr(args, "bf16", False) and not config.get("spiking_neuron"):
        print(
            "WARNING: bf16 long-horizon TRAINING is validated for the "
            "spiking families (state bounded by the neuron dynamics). A "
            "100-epoch ANN RecEVFlowNet run collapsed into tanh-head "
            "saturation at ~200 updates under bf16 and trained cleanly "
            "in f32 (STATUS.md round-4 findings) — prefer f32 for ANN "
            "training; bf16 inference/serving is unaffected."
        )

    tracker = Tracker(config.get("experiment", "Default"),
                      runs_root=args.runs_root)
    tracker.log_params(config)
    tracker.save_diff("train_diff.txt")
    print(f"run dir: {tracker.dir}")

    mesh = None
    if args.dp:
        import jax

        from event_flow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(len(jax.devices()))
        print(f"data parallel over {len(jax.devices())} devices")

    # training-time visualization (reference: train_flow.py:63-64,176)
    vis = None
    if getattr(args, "vis", False):
        config.setdefault("vis", {})["enabled"] = True
        config["vis"].setdefault("store", True)  # headless: keep artifacts
    if config.get("vis", {}).get("enabled"):
        from event_flow_tpu.utils.visualization import Visualization

        vis = Visualization(config, eval_id=-1, path_results=tracker.dir)

    trainer = Trainer(config, tracker=tracker, mesh=mesh, vis=vis)
    from event_flow_tpu.models.model_util import describe_model
    print(describe_model(trainer.model, trainer.state.params,
                         name=config["model"]["name"]))
    if args.prev_runid:
        trainer.load_params(os.path.join(args.runs_root, args.prev_runid))
        print(f"restored params from {args.prev_runid}")

    # stream
    if args.synthetic:
        stream = _SyntheticStream(config, style=args.synthetic)
    elif args.native:
        from event_flow_tpu.data.native_loader import NativeEventStream

        stream = NativeEventStream(config)
        print("using native prefetching loader")
    else:
        from event_flow_tpu.data.h5 import EventStream

        stream = EventStream(config)
        stream.shuffle()

    n_epochs = config["loader"].get("n_epochs", 100)
    epoch = 0
    if args.resume:
        epoch = trainer.resume(
            os.path.join(args.runs_root, args.resume), stream)
        print(f"resumed run {args.resume} at epoch {epoch}")
    verbose = config.get("vis", {}).get("verbose", True)
    if args.profile:
        import jax

        jax.profiler.start_trace(os.path.join(tracker.dir, "profile"))
    while epoch < n_epochs:
        batch = stream.next_batch()
        loss = trainer.feed(batch)
        if loss is not None:
            stream.samples += config["loader"]["batch_size"]
            if verbose:
                # running_mean covers the updates whose device results have
                # landed (the Trainer keeps 2 updates in flight; show a
                # placeholder until the first one does)
                mean = (f"{trainer.running_mean():.6f}"
                        if trainer.synced_updates else "--")
                print(
                    f"Epoch {epoch:04d} [{stream.seq_num:03d}/"
                    f"{len(stream.files):03d}] loss {mean}",
                    end="\r",
                )
            if args.max_updates and trainer.updates >= args.max_updates:
                print(f"\nstopping after {trainer.updates} updates")
                trainer.end_epoch(stream, epoch)
                trainer.save_full_checkpoint(stream, epoch)
                trainer.finalize()
                if args.profile:
                    import jax

                    jax.profiler.stop_trace()
                    print(f"profile trace in {tracker.dir}/profile")
                return tracker.runid
        if stream.seq_num >= len(stream.files):
            mean = trainer.end_epoch(stream, epoch)
            trainer.save_full_checkpoint(stream, epoch)
            if verbose:
                print(f"\nEpoch {epoch:04d} done, mean loss {mean:.6f}")
            stream.seq_num = stream.seq_num % len(stream.files)
            epoch += 1
    trainer.finalize()
    return tracker.runid


class _SyntheticStream:
    """Stream-shaped wrapper over the synthetic generators, for
    datasetless training. ``style`` selects the scene model: ``const``
    (per-slot constant-velocity point scenes) or ``rich`` (textured
    scenes with per-rollover resampled flow magnitude AND direction,
    data/synthetic.py::rich_window_stream — the datasetless counterpart
    of the rich on-disk dataset)."""

    ROLLOVER = 64  # batches per scene (both generators resample then)

    def __init__(self, config, style="const"):
        from event_flow_tpu.data.synthetic import (
            rich_window_stream,
            synthetic_window_stream,
        )

        self.batch_size = config["loader"]["batch_size"]
        self.files = ["synthetic"]
        self.seq_num = 0
        self.samples = 0
        self.batch_idx = list(range(self.batch_size))
        self.batch_row = [0.0] * self.batch_size
        n = int(config["data"]["window"])
        res = tuple(config["loader"]["resolution"])
        seed = config["loader"].get("seed", 0)
        if style == "rich":
            self._gen = rich_window_stream(
                seed, self.batch_size, n, res, 1, rollover=self.ROLLOVER
            )
        else:
            self._gen = synthetic_window_stream(
                seed, self.batch_size, n, res, 1
            )
        self._count = 0

    def next_batch(self):
        ev = next(self._gen)[:, 0]
        self._count += 1
        # flag the FIRST batch of each new scene so the recurrent state
        # resets with the content (rich_window_stream resamples its slots
        # after every ROLLOVER yields; const has no scene change and just
        # gets the same periodic pseudo-rollover)
        new_seq = self._count > 1 and (self._count - 1) % self.ROLLOVER == 0
        if new_seq:
            self.seq_num += 1
        return {
            "events": ev,
            "valid": np.ones(ev.shape[:2], np.float32),
            "aug_flags": np.zeros((self.batch_size, 3), np.float32),
            "new_seq": new_seq,
        }


def build_arg_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/train_flow.yml")
    ap.add_argument("--prev_runid", default="",
                    help="restore params from a previous run")
    ap.add_argument("--runs_root", default="runs")
    ap.add_argument("--synthetic", nargs="?", const="const", default=None,
                    choices=["const", "rich"],
                    help="train datasetless on a synthetic stream: 'const' "
                         "(default) = per-slot constant flow, 'rich' = "
                         "textured scenes with varied flow")
    ap.add_argument("--native", action="store_true",
                    help="use the C++ prefetching loader (events mode)")
    ap.add_argument("--resume", default="",
                    help="resume a run exactly (params+optimizer+cursor)")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace into the run dir")
    ap.add_argument("--vis", action="store_true",
                    help="render input events + predicted flow during "
                         "training (live if DISPLAY, else PNG store tree "
                         "in the run dir)")
    ap.add_argument("--max_updates", type=int, default=0)
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel over all visible devices")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed precision: bf16 conv operands + cell "
                         "compute, f32 params/loss (models/policy.py)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. when the TPU worker "
                         "is unavailable); must win over any platform pin, "
                         "so it is applied before any computation")
    return ap


if __name__ == "__main__":
    args = build_arg_parser().parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.bf16:
        from event_flow_tpu.models.conv import set_conv_compute_dtype
        from event_flow_tpu.models.policy import set_cell_compute_dtype
        set_conv_compute_dtype("bfloat16")
        set_cell_compute_dtype("bfloat16")
        # the measured-best remat pairing: saving the (now bf16) named
        # conv outputs undercuts both the conv recompute and the f32
        # accumulator saves (STATUS.md ladder; overridable via env)
        os.environ.setdefault("EVFLOW_REMAT", "convs")
    train(args)
