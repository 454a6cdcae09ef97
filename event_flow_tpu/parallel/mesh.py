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

__all__ = ["make_mesh", "make_mesh_2d", "make_mesh_3d", "batch_sharding",
           "replicated", "param_shardings", "shard_train_step",
           "shard_state"]


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


def make_mesh_3d(dp, ep, mp, devices=None):
    """3-D mesh (data x event x model): adds tensor parallelism over the
    channel dimension. Conv kernels shard on their OUTPUT-channel (HWIO
    minor) axis, per-channel neuron params (leak/thresh) and the channel
    axis of the recurrent state shard to match, so each device holds and
    updates C/mp channels of every layer. XLA GSPMD propagates the layout
    through the im2col matmuls and LIF elementwise dynamics and inserts
    the boundary collectives (all-gather of activations where a layer
    consumes all input channels, psum of gradients over ``data``/``event``)
    — the scaling-book recipe, no hand-written collectives."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * ep * mp, (dp, ep, mp, len(devices))
    arr = np.array(devices[: dp * ep * mp]).reshape(dp, ep, mp)
    return Mesh(arr, ("data", "event", "model"))


def batch_sharding(mesh, axis_name="data"):
    """Shard the leading (batch) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _shard_channels(mesh, shape, lead_axis=None):
    """PartitionSpec sharding the minor (channel) axis over ``model`` when
    it divides evenly and is a real channel dim (>= 8 — skips the C=2 flow
    head and event-list minor dims), optionally sharding axis 0 too."""
    mp = mesh.shape.get("model", 1)
    ndim = len(shape)
    spec = [None] * ndim
    if lead_axis is not None and ndim >= 1:
        spec[0] = lead_axis
    if (mp > 1 and ndim >= 1 and (ndim >= 2 or lead_axis is None)
            and shape[-1] % mp == 0 and shape[-1] >= 8):
        spec[-1] = "model"
    return NamedSharding(mesh, P(*spec))


def param_shardings(tree, mesh):
    """Tensor-parallel layout for a params (or optimizer-state) pytree:
    every array whose minor axis is a shardable channel dim shards over
    ``model``; everything else (scalars, the C=2 flow head, Adam counts)
    replicates. Shape-based, so it applies unchanged to Adam's mu/nu."""
    repl = replicated(mesh)

    def rule(s):
        if getattr(s, "ndim", 0) >= 1:
            return _shard_channels(mesh, s.shape)
        return repl

    return jax.tree_util.tree_map(rule, tree)


def _model_state_shardings(model_state, mesh, axis_name):
    """Per-leaf: batch-sharded for rank>=1 state tensors (plus the channel
    axis over ``model`` on a 3-D mesh), replicated for scalar placeholders
    (stateless cells)."""
    repl = replicated(mesh)

    def rule(s):
        if getattr(s, "ndim", 0) < 1:
            return repl
        return _shard_channels(mesh, s.shape, lead_axis=axis_name)

    return jax.tree_util.tree_map(rule, model_state)


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

    tp = mesh.shape.get("model", 1) > 1
    state_shardings = TrainState(
        params=param_shardings(state_template.params, mesh) if tp else repl,
        opt_state=(param_shardings(state_template.opt_state, mesh)
                   if tp else repl),
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
    """Place an existing TrainState according to the mesh layout (params
    replicated on a dp/ep mesh, channel-sharded on a 3-D tp mesh)."""
    repl = replicated(mesh)
    if mesh.shape.get("model", 1) > 1:
        params = jax.tree_util.tree_map(
            jax.device_put, state.params, param_shardings(state.params, mesh))
        opt_state = jax.tree_util.tree_map(
            jax.device_put, state.opt_state,
            param_shardings(state.opt_state, mesh))
    else:
        params = jax.device_put(state.params, repl)
        opt_state = jax.device_put(state.opt_state, repl)
    model_state = jax.tree_util.tree_map(
        lambda s, sh: jax.device_put(s, sh),
        state.model_state,
        _model_state_shardings(state.model_state, mesh, axis_name),
    )
    type_ = type(state)
    return type_(params, opt_state, model_state)
