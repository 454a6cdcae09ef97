"""End-to-end training throughput INCLUDING the host input pipeline.

bench.py measures the device-side update (synthetic device-resident
windows); this tool measures the full production path — HDF5 sequences on
disk -> native C++ prefetching loader (or the Python EventStream) ->
host window assembly -> jitted train step — so prefetch overlap can be
verified rather than assumed (the reference's loader is single-threaded
and serializes with the step, reference: configs/parser.py:86
num_workers=0).

    python tools/bench_e2e.py --updates 30 [--python-loader] [--bf16]

Writes a synthetic dataset in the reference HDF5 schema to --workdir
(default /tmp/evflow_e2e) on first use, converts it to .evpack files for
the native loader, then trains LIFFireNet at the paper recipe (b8 128^2,
1000-event windows, 10-window BPTT) and prints end-to-end windows/s and
the host-only assembly rate for comparison.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_config(batch, path, micro_batch):
    return {
        "experiment": "bench_e2e",
        "data": {"mode": "events", "path": path, "window": 1000,
                 "window_loss": 10000},
        "model": {
            "name": "LIFFireNet", "encoding": "cnt", "num_bins": 2,
            "base_num_channels": 32, "kernel_size": 3, "mask_output": True,
            "activations": ["arctanspike", "arctanspike"],
            "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1],
                               "learn_leak": True, "learn_thresh": True,
                               "hard_reset": True},
        },
        "loader": {"resolution": [128, 128], "batch_size": batch, "seed": 0,
                   "augment": ["Horizontal", "Vertical", "Polarity"],
                   "augment_prob": [0.5, 0.5, 0.5],
                   "micro_batch": micro_batch},
        "optimizer": {"name": "Adam", "lr": 2e-4},
        "loss": {"flow_regul_weight": 0.001, "clip_grad": 100.0},
        "hot_filter": {"enabled": False},
        "vis": {},
    }


def ensure_dataset(workdir, batch, updates, t_windows, window):
    """One .h5 sequence per batch slot, enough events to cover the run."""
    from event_flow_tpu.data.schema import write_synthetic_sequence

    os.makedirs(workdir, exist_ok=True)
    n_events = (updates + 6) * t_windows * window
    paths = []
    for s in range(batch):
        p = os.path.join(workdir, f"seq_{s:02d}.h5")
        if not os.path.exists(p):
            write_synthetic_sequence(
                p, res=(128, 128), n_events=n_events, duration=10.0,
                velocity=(20.0 * (1 + s % 3), -15.0), seed=s,
            )
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--updates", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--micro_batch", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/evflow_e2e")
    ap.add_argument("--python-loader", action="store_true",
                    help="use the Python EventStream instead of the "
                         "native C++ prefetching loader")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 conv + cell compute (models/policy.py)")
    args = ap.parse_args()

    if args.bf16:
        from event_flow_tpu.models.conv import set_conv_compute_dtype
        from event_flow_tpu.models.policy import set_cell_compute_dtype
        set_conv_compute_dtype("bfloat16")
        set_cell_compute_dtype("bfloat16")

    from event_flow_tpu.train.loop import Trainer

    T, W = 10, 1000
    config = make_config(args.batch, args.workdir, args.micro_batch)
    ensure_dataset(args.workdir, args.batch, args.updates, T, W)

    if args.python_loader:
        from event_flow_tpu.data.h5 import EventStream
        stream = EventStream(config)
        tag = "python EventStream"
    else:
        from event_flow_tpu.data.native_loader import (NativeEventStream,
                                                       convert_h5_dir)
        packs = convert_h5_dir(args.workdir)
        stream = NativeEventStream(config, packs=packs)
        tag = "native C++ prefetch loader"

    # host-only assembly rate (no device work): how fast can the loader
    # hand out windows by itself
    t0 = time.perf_counter()
    for _ in range(3 * T):
        stream.next_batch()
    host_rate = 3 * T * args.batch / (time.perf_counter() - t0)

    trainer = Trainer(config)
    done, warmup = 0, 3
    t_start = None
    while done < args.updates + warmup:
        loss = trainer.feed(stream.next_batch())
        if loss is None:
            continue
        done += 1
        if done == warmup:
            trainer.drain_losses()  # fences warmup before the clock starts
            t_start = time.perf_counter()
    trainer.drain_losses()  # fence: count only completed updates
    dt = time.perf_counter() - t_start
    e2e = args.updates * T * args.batch / dt
    print(f"host pipeline ({tag}) alone: {host_rate:8.0f} windows/s")
    print(f"end-to-end train (b{args.batch} mb{args.micro_batch} "
          f"{'bf16' if args.bf16 else 'f32'}): {e2e:8.1f} windows/s "
          f"({dt / args.updates * 1e3:.1f} ms/update incl. host)")
    if hasattr(stream, "close"):
        stream.close()


if __name__ == "__main__":
    main()
