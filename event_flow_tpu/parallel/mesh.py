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


def batch_sharding(mesh, axis_name="data"):
    """Shard the leading (batch) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_train_step(train_step, mesh, axis_name="data"):
    """Jit a train step with data-parallel shardings.

    TrainState layout: params/opt_state replicated, model_state sharded on
    batch; batch arrays (events/valid/aug) sharded on batch; loss replicated.
    XLA SPMD inserts the gradient all-reduce (psum over ``data``) on ICI.
    """
    batch_s = batch_sharding(mesh, axis_name)
    repl = replicated(mesh)

    from ..train.step import TrainState

    state_shardings = TrainState(
        params=repl, opt_state=repl, model_state=batch_s
    )
    return jax.jit(
        train_step,
        in_shardings=(state_shardings, batch_s, batch_s, batch_s, repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,),
    )


def shard_state(state, mesh, axis_name="data"):
    """Place an existing TrainState according to the DP layout."""
    batch_s = batch_sharding(mesh, axis_name)
    repl = replicated(mesh)
    params = jax.device_put(state.params, repl)
    opt_state = jax.device_put(state.opt_state, repl)
    model_state = jax.device_put(state.model_state, batch_s)
    type_ = type(state)
    return type_(params, opt_state, model_state)
