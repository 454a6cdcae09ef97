"""SPMD data parallelism over a ``jax.sharding.Mesh``.

New capability relative to the reference, which is strictly single-process
single-device (reference: configs/parser.py:83-86, SURVEY.md §2.7). The
training batch (``configs/train_SNN.yml:38`` batch 8) shards across chips
on a 1-D ``data`` mesh axis; parameters and optimizer state are replicated;
recurrent model state is per-sample and therefore sharded with the batch.
Gradient all-reduce rides ICI via the collectives XLA inserts for the
jit-with-shardings program — no hand-written NCCL analogue (the
scaling-book recipe: pick a mesh, annotate shardings, let XLA do the rest).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_train_step"]


def make_mesh(n_devices=None, axis_name="data", devices=None):
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_2d(dp, ep, devices=None):
    """2-D mesh (data x event): batch shards over ``data``; the per-event
    axis of the loss (the workload's long-sequence dimension, SURVEY.md
    §2.7/§5) shards over ``event``. The IWE scatter then runs on per-device
    event shards and XLA SPMD all-reduces the accumulator images over the
    ``event`` axis on ICI."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * ep, (dp, ep, len(devices))
    arr = np.array(devices[: dp * ep]).reshape(dp, ep)
    return Mesh(arr, ("data", "event"))


def batch_sharding(mesh, axis_name="data"):
    """Shard the leading (batch) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _model_state_shardings(model_state, mesh, axis_name):
    """Per-leaf: batch-sharded for rank>=1 state tensors, replicated for
    scalar placeholders (stateless cells)."""
    batch_s = batch_sharding(mesh, axis_name)
    repl = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda s: batch_s if getattr(s, "ndim", 0) >= 1 else repl,
        model_state,
    )


def shard_train_step(train_step, mesh, state_template, axis_name="data"):
    """Jit a train step with data-parallel shardings.

    TrainState layout: params/opt_state replicated, model_state sharded on
    batch; batch arrays (events/valid/aug) sharded on batch; loss replicated.
    With a 2-D (data, event) mesh the event axis of the raw windows also
    shards, so the loss's per-event warp/gather/scatter splits across
    devices and the IWE accumulators combine by XLA-inserted all-reduce.
    XLA SPMD inserts the gradient all-reduce (psum over ``data``) on ICI.

    ``state_template`` is a TrainState used only for pytree structure
    (scalar model-state leaves stay replicated).
    """
    batch_s = batch_sharding(mesh, axis_name)
    repl = replicated(mesh)
    if "event" in mesh.axis_names:
        # events [B, T, N, 4]: B on data, N on event
        events_s = NamedSharding(mesh, P(axis_name, None, "event"))
        valid_s = events_s
    else:
        events_s = valid_s = batch_s

    from ..train.step import TrainState

    state_shardings = TrainState(
        params=repl,
        opt_state=repl,
        model_state=_model_state_shardings(
            state_template.model_state, mesh, axis_name
        ),
    )
    from ..train.loop import _donate_argnums

    jitted = jax.jit(
        train_step,
        in_shardings=(state_shardings, events_s, valid_s, batch_s, repl,
                      repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=_donate_argnums(),
    )

    def stepper(state, events, valid, aug, reset, t_live=None):
        # fixed 6-arg jit signature; all-live when the caller doesn't gate
        # on accumulated events (events-mode training)
        if t_live is None:
            t_live = jnp.asarray(events.shape[1])
        return jitted(state, events, valid, aug, reset, t_live)

    return stepper


def shard_state(state, mesh, axis_name="data"):
    """Place an existing TrainState according to the DP layout."""
    repl = replicated(mesh)
    params = jax.device_put(state.params, repl)
    opt_state = jax.device_put(state.opt_state, repl)
    model_state = jax.tree_util.tree_map(
        lambda s, sh: jax.device_put(s, sh),
        state.model_state,
        _model_state_shardings(state.model_state, mesh, axis_name),
    )
    type_ = type(state)
    return type_(params, opt_state, model_state)
