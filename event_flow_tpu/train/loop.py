"""Host-side training loop: buffer windows, drive the jitted scan step,
manage epochs / resets / checkpoints.

Mirrors the reference's training protocol (reference: train_flow.py:89-192):
  - accumulate T = window_loss/window windows, then one optimizer update
    (the reference's num_events >= window_loss gate, train_flow.py:141)
  - a sequence rollover (``new_seq``) discards the partial accumulation and
    resets recurrent state before the next update (train_flow.py:100-105 —
    the reset happens before the rolled batch is consumed)
  - per-epoch (one pass over the file list) mean-loss logging and
    best-model checkpointing (train_flow.py:107-127)
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..loss.warping import LossConfig
from ..models.registry import get_model
from ..utils import checkpoint as ckpt
from ..utils.tracking import Tracker
from .optim import make_optimizer
from .step import TrainState, init_train_state, make_train_step

__all__ = ["Trainer"]


def _donate_argnums():
    """Buffer donation for the train step: on by default, off on the axon
    TPU tunnel (its PJRT plugin fails donated executions)."""
    import os

    env = os.environ.get("EVFLOW_DONATE")
    if env is not None:
        return (0,) if env == "1" else ()
    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        version = ""
    return () if "axon" in version else (0,)


class Trainer:
    def __init__(self, config, tracker: Tracker = None, mesh=None, vis=None):
        self.config = config
        self.res = tuple(config["loader"]["resolution"])
        self.num_bins = config["model"]["num_bins"]
        self.batch_size = config["loader"]["batch_size"]
        window = config["data"]["window"]
        window_loss = config["data"].get("window_loss", window)
        self.mode = config["data"].get("mode", "events")
        if self.mode == "events":
            # fixed-count windows: the reference's num_events gate fires
            # after exactly window_loss/window forwards (train_flow.py:141)
            self.t_windows = max(1, int(round(window_loss / window)))
            self.window_loss = None
        else:
            # time/gtflow modes: windows carry variable event counts; gate
            # the update on ACCUMULATED events like the reference, padded
            # to a static t_max so the jitted scan keeps one shape
            self.window_loss = window_loss
            self.t_windows = int(config["data"].get("t_max_windows", 16))
        self.tracker = tracker

        self.model = get_model(config["model"]["name"], config["model"])
        self.tx = make_optimizer(
            config["optimizer"]["name"],
            config["optimizer"]["lr"],
            clip_grad=config.get("loss", {}).get("clip_grad"),
        )
        loss_cfg = LossConfig(
            resolution=self.res,
            flow_scaling=float(max(self.res)),
            flow_regul_weight=config["loss"]["flow_regul_weight"],
            smoothing_mask=config["model"].get("mask_output", False),
            overwrite_intermediate=config["loss"].get(
                "overwrite_intermediate", False
            ),
        )
        self.loss_cfg = loss_cfg
        store_grads = config.get("vis", {}).get("store_grads", False)
        self.store_grads = store_grads
        # training-time visualization (reference: train_flow.py:64,164-177
        # — live rendering of input events + predicted flow, batch 1 only)
        self.vis = vis
        self.vis_every = max(1, int(config.get("vis", {})
                                    .get("train_every", 1)))
        self.with_vis = bool(vis is not None and mesh is None
                             and self.batch_size == 1)
        step = make_train_step(
            self.model, self.tx, self.res, self.num_bins, loss_cfg,
            round_encoding=config["model"].get("round_encoding", False),
            with_grad_stats=store_grads,
            micro_batch=config["loader"].get("micro_batch"),
            with_vis=self.with_vis,
        )
        self.state = init_train_state(
            self.model, self.tx, jax.random.PRNGKey(
                config["loader"].get("seed", 0)
            ),
            self.batch_size, self.res, self.num_bins,
        )
        if mesh is not None:
            from ..parallel.mesh import shard_state, shard_train_step

            self.step = shard_train_step(step, mesh, self.state)
            self.state = shard_state(self.state, mesh)
        else:
            # donate the carried TrainState buffers (params/opt/state are
            # rebound every update) — except on the axon TPU tunnel, whose
            # PJRT plugin rejects aliased input/output buffers with
            # INVALID_ARGUMENT (observed 2026-08-16; override with
            # EVFLOW_DONATE=1/0)
            self.step = jax.jit(step, donate_argnums=_donate_argnums())
        self.mesh = mesh

        # accumulation buffers
        self._events = []
        self._valid = []
        self._pending_reset = True  # fresh start
        self.train_loss = 0.0
        self.best_loss = 1.0e6
        self.updates = 0
        self.synced_updates = 0
        # in-flight device losses: reading a loss back is a full host sync
        # (~35 ms on a tunneled TPU), so keep up to 2 updates in flight and
        # only sync the one that is surely done — the dispatch pipeline
        # stays full and the host assembles the next window batch while
        # the device computes
        self._loss_q = []

    def load_params(self, run_dir):
        """Restore params from a previous run's best checkpoint
        (reference: utils/utils.py:8-25 via --prev_runid)."""
        path = ckpt.latest_checkpoint(run_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {run_dir}")
        restored = ckpt.restore_checkpoint(path)
        self.state = TrainState(
            restored["params"], self.state.opt_state, self.state.model_state
        )

    def resume(self, run_dir, stream):
        """Exact-resume from a full checkpoint: params + optimizer state +
        stream cursor + epoch (new capability vs the reference, which can
        only warm-start weights). Returns the restored epoch."""
        path = ckpt.latest_checkpoint(run_dir, prefer=("latest",))
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {run_dir}")
        restored = ckpt.restore_checkpoint(path)

        def refit(template):
            flat_r = jax.tree_util.tree_leaves(restored[template[0]])
            flat_t, tdef = jax.tree_util.tree_flatten(template[1])
            return jax.tree_util.tree_unflatten(
                tdef,
                [np.asarray(r).astype(t.dtype).reshape(t.shape)
                 for r, t in zip(flat_r, flat_t)],
            )

        opt_state = refit(("opt_state", self.state.opt_state))
        if "model_state" in restored:
            model_state = refit(("model_state", self.state.model_state))
            self._pending_reset = False
        else:
            model_state = self.state.model_state
            self._pending_reset = True
        self.state = TrainState(restored["params"], opt_state, model_state)
        if hasattr(stream, "batch_row") and "batch_row" in restored:
            stream.batch_row = [float(r) for r in restored["batch_row"]]
            stream.batch_idx = [int(i) for i in restored["batch_idx"]]
            files = [str(f) for f in restored["files"]]
            if set(files) == set(stream.files):
                stream.files = files
        return int(restored.get("epoch", 0))

    def feed(self, batch):
        """Feed one stream batch; returns the loss as a LAZY device array
        when an update fired, else None.

        The return is deliberately NOT a Python float: converting it
        (``float(loss)``) forces a host sync that costs a full ~35 ms
        tunnel round trip per update — exactly what the 2-deep in-flight
        loss queue exists to hide. Callers that need host values should
        read ``running_mean()`` (lagged, sync-free) or call
        ``drain_losses()`` at epoch/checkpoint boundaries.

        Update cadence matches the reference's accumulated-event gate
        (train_flow.py:141): in ``events`` mode that is exactly
        window_loss/window windows; in time/gtflow modes windows accumulate
        until the event count reaches ``window_loss`` (measured as the max
        over batch slots — identical to the reference at its batch size 1),
        capped at ``data.t_max_windows`` and zero-padded to that static
        shape with the live-window count passed into the step."""
        if batch.get("new_seq"):
            # drop the partial loss window, reset recurrent state
            self._events, self._valid = [], []
            self._pending_reset = True
        self._events.append(batch["events"])
        self._valid.append(batch["valid"])
        self._aug = batch["aug_flags"]
        t_live = len(self._events)
        if self.window_loss is None:
            if t_live < self.t_windows:
                return None
        else:
            counts = np.asarray(self._valid).sum(axis=(0, 2))  # per slot
            if counts.max() < self.window_loss and t_live < self.t_windows:
                return None
        ev = np.stack(self._events, axis=1)  # [B,T,N,4]
        va = np.stack(self._valid, axis=1)
        if t_live < self.t_windows:
            pad = self.t_windows - t_live
            ev = np.concatenate(
                [ev, np.zeros((*ev.shape[:1], pad, *ev.shape[2:]),
                              ev.dtype)], axis=1)
            va = np.concatenate(
                [va, np.zeros((va.shape[0], pad, va.shape[2]), va.dtype)],
                axis=1)
        ev = jnp.asarray(ev)
        va = jnp.asarray(va)
        aug = jnp.asarray(self._aug)
        reset = jnp.asarray(self._pending_reset)
        if self.window_loss is None:
            out = self.step(self.state, ev, va, aug, reset)
        else:
            out = self.step(self.state, ev, va, aug, reset,
                            jnp.asarray(t_live))
        vis_arrays = None
        if self.with_vis:
            out, vis_arrays = out[:-1], out[-1]
        if self.store_grads:
            self.state, loss, (stats, gnorm) = out
        else:
            self.state, loss = out
            stats = None
        self._events, self._valid = [], []
        self._pending_reset = False
        self.updates += 1
        if self.tracker and stats is not None:
            rows = [
                (name, *np.asarray(v).tolist())
                for name, v in _flatten_stats(stats)
            ]
            self.tracker.save_csv(rows, "grads_w.csv")
        if vis_arrays is not None and self.updates % self.vis_every == 0:
            # host render, off the device hot path (the np.asarray sync
            # costs one tunnel round trip every ``vis_every`` updates);
            # reference renders input events + masked flow per update
            # (train_flow.py:164-177)
            flow_vis = np.asarray(vis_arrays["flow"])
            if getattr(self.model, "mask_output", False):
                flow_vis = flow_vis * np.asarray(vis_arrays["event_mask"])
            vis_batch = {"event_cnt": np.asarray(vis_arrays["event_cnt"])}
            self.vis.update(vis_batch, flow_vis, None)
            if self.config.get("vis", {}).get("store"):
                self.vis.store("train", vis_batch, flow_vis, None)
        self._loss_q.append(loss)
        if len(self._loss_q) > 2:
            self.train_loss += float(self._loss_q.pop(0))
            self.synced_updates += 1
        return loss

    def drain_losses(self):
        """Sync all in-flight losses into ``train_loss`` (epoch ends,
        checkpoints, tests)."""
        while self._loss_q:
            self.train_loss += float(self._loss_q.pop(0))
            self.synced_updates += 1

    def running_mean(self):
        """Progress-display loss over the updates whose results have
        actually landed (``train_loss`` lags ``updates`` by up to 2
        in-flight updates). Uses the SAME normalization as the epoch-end
        mean (train_loss / (samples + 1), reference train_flow.py:108
        with samples counting batch elements) so the two displays agree
        in scale."""
        return self.train_loss / (self.synced_updates * self.batch_size + 1)

    def end_epoch(self, stream, epoch):
        """Epoch bookkeeping: mean loss, best checkpoint
        (reference: train_flow.py:107-127)."""
        self.drain_losses()
        samples = max(stream.samples, 1)
        mean_loss = self.train_loss / (samples + 1)
        if self.tracker:
            self.tracker.log_metric("loss", mean_loss, step=epoch)
        if mean_loss < self.best_loss:
            self.best_loss = mean_loss
            if self.tracker:
                # async: the device->host snapshot happens here, the
                # orbax write happens off the hot path (finalize() or any
                # restore joins it)
                ckpt.save_checkpoint_async(
                    self.tracker.checkpoint_dir("best"),
                    {"params": jax.device_get(self.state.params)},
                )
        stream.samples = 0
        self.train_loss = 0.0
        self.synced_updates = 0
        return mean_loss

    def finalize(self):
        """Training-exit barrier: sync pending losses and join in-flight
        async checkpoint writes (call before process exit)."""
        self.drain_losses()
        ckpt.wait_for_async_saves()

    def save_full_checkpoint(self, stream, epoch, tag="latest"):
        """Full resumable checkpoint: params + optimizer + stream cursor."""
        if not self.tracker:
            return
        ckpt.save_checkpoint_async(
            self.tracker.checkpoint_dir(tag),
            {
                "params": jax.device_get(self.state.params),
                "opt_state": jax.device_get(self.state.opt_state),
                "model_state": jax.device_get(self.state.model_state),
                "epoch": epoch,
                "batch_idx": list(stream.batch_idx),
                "batch_row": [float(r) for r in stream.batch_row],
                "files": list(stream.files),
            },
        )


def _flatten_stats(stats):
    flat = jax.tree_util.tree_flatten_with_path(stats)[0]
    for path, v in flat:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        yield name, v
