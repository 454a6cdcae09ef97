"""Multi-process data parallelism: 2 CPU processes, one global mesh.

Launches two real OS processes that join a jax.distributed coordination
service (2 virtual CPU devices each -> a 4-device global ``data`` mesh),
run the SAME jitted train step on per-process halves of a global batch,
and checks both report the identical loss — which also matches a
single-process run on the full batch (parallel/distributed.py; SURVEY.md
§2.7 multi-host DP)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")

from event_flow_tpu.parallel.distributed import (
    init_distributed, global_batch, global_state)
from event_flow_tpu.parallel.mesh import make_mesh, shard_train_step
from event_flow_tpu.data.synthetic import constant_flow_window
from event_flow_tpu.loss.warping import LossConfig
from event_flow_tpu.models.registry import get_model
from event_flow_tpu.train.optim import make_optimizer
from event_flow_tpu.train.step import init_train_state, make_train_step

init_distributed(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()

RES, B, T, N = (32, 32), 4, 2, 200
B_local = B // nproc
cfg = {"name": "FireNet", "encoding": "cnt", "num_bins": 2,
       "base_num_channels": 4, "kernel_size": 3,
       "activations": ["relu", None], "mask_output": True,
       "spiking_neuron": None}
model = get_model("FireNet", cfg)
tx = make_optimizer("Adam", 1e-3, clip_grad=100.0)
loss_cfg = LossConfig(RES, float(max(RES)), 0.001, smoothing_mask=True)
step = make_train_step(model, tx, RES, 2, loss_cfg)

mesh = make_mesh()  # all 4 global devices
state_local = init_train_state(
    model, tx, jax.random.PRNGKey(0), B_local, RES, 2)
state = global_state(mesh, state_local)
sharded = shard_train_step(step, mesh, state_local)

# deterministic global batch; each process takes its slots
rng = np.random.default_rng(0)
ev_g = np.stack([np.stack([
    constant_flow_window(rng, N, RES, (2.0, -2.0), 12) for _ in range(T)])
    for _ in range(B)])
va_g = np.ones((B, T, N), np.float32)
aug_g = np.zeros((B, 3), np.float32)
lo = pid * B_local
batch = global_batch(mesh, {
    "events": ev_g[lo:lo + B_local],
    "valid": va_g[lo:lo + B_local],
    "aug": aug_g[lo:lo + B_local],
})
import jax.numpy as jnp
losses = []
for _ in range(2):
    state, loss = sharded(state, batch["events"], batch["valid"],
                          batch["aug"], jnp.asarray(False))
    losses.append(float(loss))
print("LOSSES", pid, " ".join(f"{l:.9f}" for l in losses), flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="subprocess CPU test")
def test_two_process_dp_matches_single_process(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSSES"):
                _, pid, *vals = line.split()
                losses[int(pid)] = [float(v) for v in vals]
    assert set(losses) == {0, 1}, outs
    # both processes computed the same (globally-reduced) losses
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # single-process oracle on the full batch
    import jax

    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import init_train_state, make_train_step

    import jax.numpy as jnp

    RES, B, T, N = (32, 32), 4, 2, 200
    cfg = {"name": "FireNet", "encoding": "cnt", "num_bins": 2,
           "base_num_channels": 4, "kernel_size": 3,
           "activations": ["relu", None], "mask_output": True,
           "spiking_neuron": None}
    model = get_model("FireNet", cfg)
    tx = make_optimizer("Adam", 1e-3, clip_grad=100.0)
    loss_cfg = LossConfig(RES, float(max(RES)), 0.001, smoothing_mask=True)
    step = jax.jit(make_train_step(model, tx, RES, 2, loss_cfg))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)
    rng = np.random.default_rng(0)
    ev = jnp.asarray(np.stack([np.stack([
        constant_flow_window(rng, N, RES, (2.0, -2.0), 12)
        for _ in range(T)]) for _ in range(B)]))
    va = jnp.ones((B, T, N))
    aug = jnp.zeros((B, 3))
    ref = []
    for _ in range(2):
        state, loss = step(state, ev, va, aug, jnp.asarray(False))
        ref.append(float(loss))
    np.testing.assert_allclose(losses[0], ref, rtol=2e-4)


WORKER_2D = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh, PartitionSpec as P
from event_flow_tpu.parallel.distributed import (
    init_distributed, global_put)
from event_flow_tpu.parallel.mesh import shard_train_step
from event_flow_tpu.parallel.mesh import _model_state_shardings
from event_flow_tpu.data.synthetic import constant_flow_window
from event_flow_tpu.loss.warping import LossConfig
from event_flow_tpu.models.registry import get_model
from event_flow_tpu.train.optim import make_optimizer
from event_flow_tpu.train.step import (TrainState, init_train_state,
                                       make_train_step)

init_distributed(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()

# {data:2, event:2} mesh whose EVENT axis spans the two OS processes:
# global device order is [p0d0, p0d1, p1d0, p1d1]; the transpose puts
# devices of DIFFERENT processes in each event row, so the loss's IWE
# all-reduce over ``event`` is a real cross-process collective (the
# gradient psum over ``data`` stays process-local — the inverse of the
# 1-D DP test's layout).
arr = np.array(jax.devices()).reshape(nproc, 2).T
mesh = Mesh(arr, ("data", "event"))
for d in range(2):
    procs = {arr[d, e].process_index for e in range(2)}
    assert len(procs) == nproc, f"event axis does not span processes: {procs}"

RES, B, T, N = (32, 32), 4, 2, 200
cfg = {"name": "FireNet", "encoding": "cnt", "num_bins": 2,
       "base_num_channels": 4, "kernel_size": 3,
       "activations": ["relu", None], "mask_output": True,
       "spiking_neuron": None}
model = get_model("FireNet", cfg)
tx = make_optimizer("Adam", 1e-3, clip_grad=100.0)
loss_cfg = LossConfig(RES, float(max(RES)), 0.001, smoothing_mask=True)
step = make_train_step(model, tx, RES, 2, loss_cfg)

# every process materializes the SAME full-size state/batch (deterministic
# seeds) and global_put places each device's shard explicitly
state_full = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)
ms_shardings = _model_state_shardings(state_full.model_state, mesh, "data")
state = TrainState(
    params=jax.tree_util.tree_map(
        lambda x: global_put(mesh, x, P()), state_full.params),
    opt_state=jax.tree_util.tree_map(
        lambda x: global_put(mesh, x, P()), state_full.opt_state),
    model_state=jax.tree_util.tree_map(
        lambda x, sh: global_put(mesh, x, sh.spec),
        state_full.model_state, ms_shardings),
)
sharded = shard_train_step(step, mesh, state_full)

rng = np.random.default_rng(0)
ev_g = np.stack([np.stack([
    constant_flow_window(rng, N, RES, (2.0, -2.0), 12) for _ in range(T)])
    for _ in range(B)])
events = global_put(mesh, ev_g, P("data", None, "event"))
valid = global_put(mesh, np.ones((B, T, N), np.float32),
                   P("data", None, "event"))
aug = global_put(mesh, np.zeros((B, 3), np.float32), P("data"))

import jax.numpy as jnp
losses = []
for _ in range(2):
    state, loss = sharded(state, events, valid, aug, jnp.asarray(False))
    losses.append(float(loss))
print("LOSSES", pid, " ".join(f"{l:.9f}" for l in losses), flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="subprocess CPU test")
def test_two_process_2d_mesh_event_axis_spans_processes(tmp_path):
    """VERDICT r4 #4: a 2-D {data, event} global mesh over 2 OS processes
    with the non-DP (event) axis crossing the process boundary; losses
    must agree across processes and with the single-process full-batch
    oracle."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker2d.py"
    script.write_text(WORKER_2D)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSSES"):
                _, pid, *vals = line.split()
                losses[int(pid)] = [float(v) for v in vals]
    assert set(losses) == {0, 1}, outs
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    np.testing.assert_allclose(losses[0], _single_process_oracle(),
                               rtol=2e-4)


def _single_process_oracle():
    """Two full-batch updates of the shared tiny-FireNet recipe on the
    default (single-device) backend; both multi-process tests compare
    against this."""
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import init_train_state, make_train_step

    RES, B, T, N = (32, 32), 4, 2, 200
    cfg = {"name": "FireNet", "encoding": "cnt", "num_bins": 2,
           "base_num_channels": 4, "kernel_size": 3,
           "activations": ["relu", None], "mask_output": True,
           "spiking_neuron": None}
    model = get_model("FireNet", cfg)
    tx = make_optimizer("Adam", 1e-3, clip_grad=100.0)
    loss_cfg = LossConfig(RES, float(max(RES)), 0.001, smoothing_mask=True)
    step = jax.jit(make_train_step(model, tx, RES, 2, loss_cfg))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)
    rng = np.random.default_rng(0)
    ev = jnp.asarray(np.stack([np.stack([
        constant_flow_window(rng, N, RES, (2.0, -2.0), 12)
        for _ in range(T)]) for _ in range(B)]))
    va = jnp.ones((B, T, N))
    aug = jnp.zeros((B, 3))
    ref = []
    for _ in range(2):
        state, loss = step(state, ev, va, aug, jnp.asarray(False))
        ref.append(float(loss))
    return ref


def test_process_file_shard_disjoint_cover():
    from event_flow_tpu.parallel.distributed import process_file_shard

    files = [f"f{i}.h5" for i in range(7)]
    shards = [process_file_shard(files, p, 3) for p in range(3)]
    flat = [f for s in shards for f in s]
    assert sorted(flat) == sorted(files)
    assert len(set(flat)) == len(files)
    with pytest.raises(ValueError):
        process_file_shard(files[:1], 1, 2)
