"""Breakdown profiler for the UNet-family training update on the real chip.

Times, at the b8 recipe (128^2, T=10 windows, w1000):
  1. full training update (grad + Adam)
  2. sequence forward only (scan, no loss/grad)
  3. sequence forward + loss value (no grad)
  4. loss only, precomputed flows: all scales vs highest scale only

Each phase is timed as the median of several dispatches with a host read
as the sync (the tunnel's ~35 ms round trip is reported separately and
subtracted). Run: python tools/profile_unet.py [--model RecEVFlowNet]
[--mb 4] [--xla-conv] [--f32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ap = argparse.ArgumentParser()
ap.add_argument("--model", default="RecEVFlowNet")
ap.add_argument("--b", type=int, default=8)
ap.add_argument("--mb", type=int, default=0, help="micro_batch (0=off)")
ap.add_argument("--iters", type=int, default=6)
ap.add_argument("--f32", action="store_true")
ap.add_argument("--xla-conv", action="store_true")
ap.add_argument("--remat", default=None, help="override EVFLOW_REMAT")
ap.add_argument("--phases", default="update,fwd,fwdloss,fwdgrad,loss",
                help="comma subset of update|fwd|fwdloss|fwdgrad|loss — "
                     "each phase is a separate heavy compile; the tunnel "
                     "worker tolerates ~2 per cooldown")
args = ap.parse_args()
PHASES = set(args.phases.split(","))

if not args.f32:
    os.environ.setdefault("EVFLOW_CONV_IMPL",
                          "xla" if args.xla_conv else "im2col")
    os.environ.setdefault("EVFLOW_CONV_DTYPE", "bfloat16")
    os.environ.setdefault("EVFLOW_CELL_DTYPE", "bfloat16")
    os.environ.setdefault("EVFLOW_REMAT", args.remat or "convs")
else:
    os.environ["EVFLOW_CONV_IMPL"] = "xla"
    os.environ["EVFLOW_CONV_DTYPE"] = "float32"
    os.environ["EVFLOW_CELL_DTYPE"] = "float32"
    os.environ["EVFLOW_REMAT"] = args.remat or "full"

import jax
import jax.numpy as jnp
import numpy as np

from event_flow_tpu.data.synthetic import constant_flow_window
from event_flow_tpu.loss.warping import LossConfig, event_warping_loss
from event_flow_tpu.models.registry import get_model
from event_flow_tpu.train.optim import make_optimizer
from event_flow_tpu.train.step import (init_train_state, make_train_step,
                                       make_sequence_forward)

RES = (128, 128)
T, N = 10, 1000
B = args.b

SNN = {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1], "learn_leak": True,
       "learn_thresh": True, "hard_reset": True}
CFGS = {
    "RecEVFlowNet": {"activations": ["relu", None], "spiking_neuron": None},
    "SpikingRecEVFlowNet": {"activations": ["arctanspike", "arctanspike"],
                            "spiking_neuron": SNN},
    "LIFFireNet": {"activations": ["arctanspike", "arctanspike"],
                   "spiking_neuron": SNN},
    "EVFlowNet": {"activations": ["relu", None], "spiking_neuron": None},
    "E2VID": {"activations": ["relu", None], "spiking_neuron": None},
}
model_cfg = {
    "name": args.model, "encoding": "cnt", "num_bins": 2,
    "base_num_channels": 32, "kernel_size": 3, "mask_output": True,
    **CFGS[args.model],
}

model = get_model(args.model, model_cfg)
tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
loss_cfg = LossConfig(RES, float(max(RES)), 0.001, smoothing_mask=True)
state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)
rng = np.random.default_rng(0)
ev = jnp.asarray(np.stack([
    np.stack([constant_flow_window(rng, N, RES, (2.0, -2.0), 64)
              for _ in range(T)]) for _ in range(B)
]))
valid = jnp.ones((B, T, N))
aug = jnp.zeros((B, 3))


def timed(name, fn, *fargs):
    out = fn(*fargs)  # compile
    jax.tree_util.tree_map(
        lambda x: np.asarray(x).ravel()[0], out)  # host sync
    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = fn(*fargs)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{name:44s} {ms:8.1f} ms", flush=True)
    return ms


# tunnel round trip
f_id = jax.jit(lambda x: x + 1.0)
rtt = timed("tunnel rtt (trivial dispatch)", f_id, jnp.zeros(()))

# 1. full update
if "update" in PHASES:
    step = jax.jit(make_train_step(model, tx, RES, 2, loss_cfg,
                                   micro_batch=args.mb or None))
    timed("full update (grad+Adam)", lambda s: step(s, ev, valid, aug,
                                                    jnp.asarray(False))[1],
          state)

seq_fwd = make_sequence_forward(model, RES, 2)

# 2. forward only
if "fwd" in PHASES:
    fwd = jax.jit(
        lambda p, ms: seq_fwd(p, ms, ev, valid, aug)[1][0][0].sum())
    timed("sequence forward only", fwd, state.params, state.model_state)


# 3. forward + loss (no grad)
def fwd_loss(p, ms):
    _, flows, ev_list, pol, mask = seq_fwd(p, ms, ev, valid, aug)
    return event_warping_loss(list(flows), ev_list, pol, mask, loss_cfg)


if "fwdloss" in PHASES:
    fl = jax.jit(fwd_loss)
    timed("forward + loss value (no grad)", fl, state.params,
          state.model_state)

# 2b. gradient of the sequence forward alone (no loss): isolates the
# scan-BPTT backward cost from the loss and its transposes
if "fwdonlygrad" in PHASES:
    def fwd_sum(p, ms):
        _, flows, *_ = seq_fwd(p, ms, ev, valid, aug)
        return sum(u.sum() + v.sum() for u, v in flows)

    gf = jax.jit(lambda p, ms: jax.grad(
        lambda pp: fwd_sum(pp, ms))(p)["params"])
    timed("grad of forward only (no loss)",
          lambda p, ms: jax.tree_util.tree_leaves(gf(p, ms))[0],
          state.params, state.model_state)

# 3b. forward + loss grad (no optimizer)
if "fwdgrad" in PHASES:
    gl = jax.jit(lambda p, ms: jax.grad(
        lambda pp: fwd_loss(pp, ms))(p)["params"])
    timed("forward + loss grad (no Adam)",
          lambda p, ms: jax.tree_util.tree_leaves(gl(p, ms))[0],
          state.params, state.model_state)

# 4. loss only with precomputed flows
if "loss" in PHASES:
    _, flows, ev_list, pol, mask = jax.jit(
        lambda p, ms: seq_fwd(p, ms, ev, valid, aug))(
        state.params, state.model_state)
    flows = [tuple(np.asarray(c) for c in f) for f in flows]
    flows = [tuple(jnp.asarray(c) for c in f) for f in flows]

    loss_all = jax.jit(lambda fls, e, p, m: event_warping_loss(
        list(fls), e, p, m, loss_cfg))
    timed(f"loss only ({len(flows)} scales)", loss_all, flows, ev_list, pol,
          mask)
    timed("loss only (1 scale)", loss_all, flows[-1:], ev_list, pol, mask)

    g1 = jax.jit(lambda fls, e, p, m: jax.grad(
        lambda f: event_warping_loss(list(f), e, p, m, loss_cfg))(fls)[0][0])
    timed(f"loss grad wrt flows ({len(flows)} scales)", g1, flows, ev_list,
          pol, mask)
print(f"(rtt ~{rtt:.1f} ms is included in every row)")
