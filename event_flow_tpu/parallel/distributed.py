"""Multi-process (multi-host) data parallelism.

New capability relative to the reference (strictly single-process,
SURVEY.md §2.7). One JAX process per host (or per chip-group) joins a
coordination service; every process runs the SAME jitted SPMD program over
a global mesh, feeds its own host-local file shard through its local
stream, and XLA's collectives (gradient psum over ``data``) ride ICI/DCN.

Pieces:
  - ``init_distributed``: ``jax.distributed.initialize`` wrapper (no-op for
    single-process runs).
  - ``process_file_shard``: disjoint per-process file assignment for
    EventStream (round-robin by index, the per-host HDF5 sharding of
    SURVEY.md §2.7).
  - ``global_batch``: host-local numpy batch -> globally-sharded
    ``jax.Array`` on a mesh whose ``data`` axis spans processes.

Testable without a pod: 2 CPU processes with virtual devices
(tests/test_multiprocess.py) produce the same loss as one process on the
full batch.
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["init_distributed", "process_file_shard", "global_batch",
           "global_state", "global_put"]


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Join (or start, for process 0) the distributed coordination service.

    No-op when ``num_processes`` in (None, 0, 1). Returns
    (process_index, process_count).
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    return jax.process_index(), jax.process_count()


def process_file_shard(files, process_id=None, process_count=None):
    """Disjoint round-robin file shard for this process. Every process must
    call with the same (sorted) ``files`` list."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    shard = files[pid::pcount]
    if not shard:
        raise ValueError(
            f"process {pid}/{pcount} got no files (have {len(files)})"
        )
    return shard


def _batch_spec(mesh, ndim, axis_name="data"):
    # rank-0 leaves (scalars like new_seq) replicate; rank>=1 shard batch
    if ndim == 0:
        return P()
    return P(axis_name, *([None] * (ndim - 1)))


def _agree_scalar(x):
    """Per-process scalars (e.g. a process-local ``new_seq`` flag) cannot
    be marked replicated while their values differ across processes —
    XLA is free to read any replica. Reduce with max (logical OR for
    flags) so every process holds the same, global value: a rollover on
    ANY process resets everyone, which is the reference's global-reset
    semantics (train_flow.py:100-105) generalized to multi-host."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    gathered = np.asarray(multihost_utils.process_allgather(x))
    return np.asarray(gathered.max(), dtype=x.dtype)


def global_batch(mesh, tree, axis_name="data"):
    """Host-local batch pytree -> global jax.Arrays sharded on ``axis_name``.

    Each process passes its LOCAL slots (global batch = concat over
    processes in process order). Works single-process too (plain
    device_put with the sharding).
    """

    def one(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, _batch_spec(mesh, x.ndim, axis_name))
        if x.ndim == 0:
            return jax.device_put(_agree_scalar(x), sharding)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(one, tree)


def global_put(mesh, x, spec):
    """Full host-local value -> global jax.Array with arbitrary ``spec``.

    Unlike :func:`global_batch` (which assumes each process holds only its
    LOCAL slots of a batch-axis shard), every process passes the SAME
    full-size ``x`` and this places each addressable shard explicitly —
    the right tool when a mesh axis that spans processes is NOT the batch
    axis (e.g. a ``{data, event}`` mesh whose event axis crosses hosts:
    every host can materialize the full window but owns only an event
    slice). Works for replicated specs and single-process too.
    """
    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arrays = [
        jax.device_put(x[idx], d)
        for d, idx in sharding.addressable_devices_indices_map(
            x.shape).items()
    ]
    return jax.make_array_from_single_device_arrays(x.shape, sharding,
                                                    arrays)


def global_state(mesh, state, batch_sharded_leaves=True, axis_name="data"):
    """Replicate params/opt_state and batch-shard model state globally.

    ``state`` leaves are host-local full-size arrays for params/opt (every
    process passes identical values) and LOCAL batch slices for model state.
    """
    from .mesh import _model_state_shardings
    from ..train.step import TrainState

    repl = NamedSharding(mesh, P())

    def put(x, sharding):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        if sharding.spec == P():
            # replicated: every process contributes the same full value
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx]
            )
        return jax.make_array_from_process_local_data(sharding, x)

    params = jax.tree_util.tree_map(lambda x: put(x, repl), state.params)
    opt_state = jax.tree_util.tree_map(lambda x: put(x, repl),
                                       state.opt_state)
    ms_shardings = _model_state_shardings(state.model_state, mesh, axis_name)
    model_state = jax.tree_util.tree_map(
        put, state.model_state, ms_shardings
    )
    return TrainState(params, opt_state, model_state)
