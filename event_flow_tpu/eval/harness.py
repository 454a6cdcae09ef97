"""Evaluation harness: the accumulate-until-``window_eval`` protocol with
per-file result aggregation.

TPU-native rebuild of the reference's inference loop
(reference: eval_flow.py:114-258). One jitted step per event window runs
the on-device encodings (+ hot-pixel filter), the model forward, and the
per-event flow gather from the highest-resolution prediction
(loss/flow.py:344-356); the host accumulates K = window_eval/window window
buffers and invokes the jitted metric kernels, mirroring the reference's
``num_events >= window_eval`` gate (eval_flow.py:165) and the AEE cadence
of every round(1/window) windows (eval_flow.py:170-180).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import augment_events
from ..loss.metrics import aee as aee_fn
from ..loss.metrics import fwl as fwl_fn
from ..loss.metrics import rsat as rsat_fn
from ..ops.encodings import encode_window
from ..ops.hot_filter import apply_hot_filter, init_hot_state
from ..ops.iwe import compute_pol_iwe, gather_event_flow

__all__ = ["Evaluator"]


class Evaluator:
    def __init__(self, config, model, params, metrics=None):
        self.config = config
        self.model = model
        self.params = params
        self.res = tuple(config["loader"]["resolution"])
        self.num_bins = config["model"]["num_bins"]
        self.flow_scaling = config.get("metrics", {}).get("flow_scaling", 128)
        self.metrics = metrics or config.get("metrics", {}).get("name", [])
        self.mode = config["data"]["mode"]
        window = config["data"]["window"]
        window_eval = config["data"].get("window_eval", window)
        if self.mode == "events":
            self.k_windows = max(1, int(round(window_eval / window)))
        else:
            self.k_windows = 1  # AEE: num_events = inf (flow.py:590-592)
        self.aee_every = (
            int(round(1.0 / window)) if self.mode.startswith("gtflow") else 1
        )
        self.hot_cfg = config.get("hot_filter", {"enabled": False})
        # per-layer activity logging (reference: eval_flow.py:134-136 with
        # vis.activity; FireNet family only, model.py:268-282)
        self.log_activity = bool(config.get("vis", {}).get("activity", False))
        self.overwrite_intermediate = bool(
            config.get("loss", {}).get("overwrite_intermediate", False)
        )
        self.want_window_vis = bool(
            (config.get("vis", {}).get("enabled")
             or config.get("vis", {}).get("store"))
            and self.k_windows > 1
        )
        self._step = jax.jit(self._window_step)
        self._results = {}
        self._buffers = []
        self._pending = []  # queued device-array metric records
        self._idx_aee = None  # per-slot cadence counters, sized lazily

    # -- jitted per-window step ------------------------------------------

    def _window_step(self, params, model_state, hot_state, events, valid,
                     aug, reset):
        events = augment_events(events, aug, self.res)
        enc = encode_window(
            events, self.res, self.num_bins, valid=valid,
            round_ts=self.config["model"].get("round_encoding", False),
        )
        if self.hot_cfg.get("enabled"):
            enc, hot_state = apply_hot_filter(
                enc, hot_state, reset=reset,
                max_px=self.hot_cfg.get("max_px", 100),
                min_obvs=self.hot_cfg.get("min_obvs", 5),
                max_rate=self.hot_cfg.get("max_rate", 0.8),
            )
        model_state = jax.tree_util.tree_map(
            lambda s: jnp.where(jnp.any(reset > 0), jnp.zeros_like(s), s),
            model_state,
        )
        out, model_state = self.model.apply(
            params, enc["event_voxel"], enc["event_cnt"], model_state,
            log=self.log_activity,
        )
        flow_last = out["flow"][-1]  # [B, H, W, 2] highest resolution
        event_flow = gather_event_flow(flow_last, enc["event_list"], self.res)
        iwe = compute_pol_iwe(
            flow_last, enc["event_list"], self.res,
            enc["pol_mask"][..., 0:1], enc["pol_mask"][..., 1:2],
            flow_scaling=self.flow_scaling, round_idx=True,
        )
        return model_state, hot_state, {
            "event_list": enc["event_list"],
            "pol_mask": enc["pol_mask"],
            "event_mask": enc["event_mask"],
            "event_flow": event_flow,
            "flow_last": flow_last,
            "iwe": iwe,
            "event_cnt": enc["event_cnt"],
            "activity": out["activity"],
        }

    # -- jitted metric kernels -------------------------------------------

    @partial(jax.jit, static_argnums=(0,))
    def _compute_fwl_rsat(self, stacked):
        ev, flow, pol = self._flatten_windows(stacked)
        out = {}
        if "FWL" in self.metrics:
            out["FWL"] = fwl_fn(ev, flow, self.k_windows, self.res,
                                self.flow_scaling)
        if "RSAT" in self.metrics:
            out["RSAT"] = rsat_fn(ev, flow, pol, self.k_windows, self.res,
                                  self.flow_scaling)
        return out

    def _flatten_windows(self, stacked):
        """[K][B,N,...] buffers -> accumulated arrays with per-pass ts
        offsets (loss/flow.py:368). With ``loss.overwrite_intermediate``
        every event's flow is re-gathered from the LAST window's flow map
        (loss/flow.py:398-418)."""
        ev = jnp.stack(stacked["event_list"], axis=1)  # [B,K,N,4]
        b, k, n, _ = ev.shape
        ts = ev[..., 0] + jnp.arange(k, dtype=ev.dtype)[None, :, None]
        ev_off = jnp.concatenate([ts[..., None], ev[..., 1:]], axis=-1)
        ev_off = ev_off.reshape(b, k * n, 4)
        if self.overwrite_intermediate:
            last_map = stacked["flow_last"][-1]
            flow = gather_event_flow(
                last_map, ev.reshape(b, k * n, 4), self.res
            )
        else:
            flow = jnp.stack(stacked["event_flow"], axis=1).reshape(
                b, k * n, 2
            )
        pol = jnp.stack(stacked["pol_mask"], axis=1).reshape(b, k * n, 2)
        return ev_off, flow, pol

    # -- window visualization helpers (reference: loss/flow.py:432-465,
    #    used by eval_flow.py:202-210 when window < window_eval) ----------

    @partial(jax.jit, static_argnums=(0,))
    def _window_vis(self, stacked):
        ev, flow, pol = self._flatten_windows(stacked)
        # accumulated (unwarped) event image
        lin = (
            ev[..., 1].astype(jnp.int32) * self.res[1]
            + ev[..., 2].astype(jnp.int32)
        )
        lin = jnp.clip(lin, 0, self.res[0] * self.res[1] - 1)
        ones = jnp.ones_like(ev[..., :1])
        from ..ops.iwe import get_interpolation, interpolate_multi
        from ..ops.scatter import scatter_add

        events_img = scatter_add(
            lin, jnp.concatenate([ones * pol[..., 0:1],
                                  ones * pol[..., 1:2]], axis=-1),
            self.res[0] * self.res[1],
        ).reshape(-1, *self.res, 2)
        # accumulated IWE at tref = K
        idx, w = get_interpolation(ev, flow, float(self.k_windows), self.res,
                                   self.flow_scaling, round_idx=True)
        iwe = interpolate_multi(
            idx, jnp.concatenate([w * pol[..., 0:1], w * pol[..., 1:2]],
                                 axis=-1), self.res)
        # per-pass-masked average flow (loss/flow.py:443-452)
        masks = jnp.stack(stacked["event_mask"], axis=1)  # [B,K,H,W,1]
        flows = jnp.stack(stacked["flow_last"], axis=1)  # [B,K,H,W,2]
        avg_flow = (flows * masks).sum(1) / (masks.sum(1) + 1e-9)
        return {"events_window": events_img, "iwe_window": iwe,
                "flow_window": avg_flow}

    @partial(jax.jit, static_argnums=(0,))
    def _compute_aee(self, flow_last, gtflow, event_mask, dt_input, dt_gt):
        return aee_fn(flow_last, gtflow, event_mask, dt_input, dt_gt,
                      self.flow_scaling)

    # -- host protocol ----------------------------------------------------

    def reset(self):
        self._buffers = []

    def process_batch(self, stream, params, model_state, hot_state, batch):
        """Consume one stream batch; returns (model_state, hot_state,
        vis dict or None). Accumulates metrics into per-file results."""
        b = len(batch["events"])
        reset = jnp.full((b,), 1.0 if batch["new_seq"] else 0.0)
        if batch["new_seq"]:
            self.reset()
        model_state, hot_state, win = self._step(
            params, model_state, hot_state,
            jnp.asarray(batch["events"]), jnp.asarray(batch["valid"]),
            jnp.asarray(batch["aug_flags"]), reset,
        )
        self._buffers.append(win)
        vis = {"flow": win["flow_last"], "iwe": win["iwe"],
               "event_mask": win["event_mask"], "event_cnt": win["event_cnt"],
               "activity": win["activity"]}

        if len(self._buffers) >= self.k_windows:
            stacked = {
                key: [w[key] for w in self._buffers]
                for key in self._buffers[0]
            }
            filenames = [
                stream.slot_filename(slot) for slot in range(b)
            ]
            if "FWL" in self.metrics or "RSAT" in self.metrics:
                vals = self._compute_fwl_rsat(stacked)
                for name, arr in vals.items():
                    self._accumulate(name, arr, filenames)
            if self.want_window_vis:
                # merge accumulated-window renders into the vis dict
                # (events_window / iwe_window / flow_window)
                vis.update(self._window_vis(stacked))
            if "AEE" in self.metrics and "gtflow" in batch:
                # per-slot cadence counters: windows without valid GT don't
                # advance a slot's cadence (reference: eval_flow.py:170-174
                # continues before the idx_AEE increment; the reference only
                # ever runs AEE at batch 1 — per-slot counters generalize
                # that correctly to batch > 1, where slots stream different
                # files)
                if self._idx_aee is None:
                    self._idx_aee = np.zeros(b, np.int64)
                ok = np.asarray(batch["dt_gt"]) > 0.0
                self._idx_aee += ok
                fire = ok & (self._idx_aee >= self.aee_every)
                if fire.any():
                    a, pct = self._compute_aee(
                        win["flow_last"], jnp.asarray(batch["gtflow"]),
                        win["event_mask"], jnp.asarray(batch["dt_input"]),
                        jnp.asarray(batch["dt_gt"]),
                    )
                    self._accumulate("AEE", a, filenames, percent=pct,
                                     slot_mask=fire)
                self._idx_aee[self._idx_aee >= self.aee_every] = 0
            self.reset()
        return model_state, hot_state, vis

    def _accumulate(self, metric, values, filenames, percent=None,
                    slot_mask=None):
        """Queue one metric record. Values stay DEVICE arrays — reading
        one back is a full host sync (~35 ms on a tunneled TPU), so the
        per-window loop only enqueues and ``results()`` drains everything
        in one pass; the dispatch pipeline stays full (same pattern as the
        Trainer's in-flight loss queue)."""
        self._pending.append((metric, values, list(filenames), percent,
                              slot_mask))

    def _drain(self):
        """Sync all queued metric records into the per-file running means
        (reference: eval_flow.py:183-199). ONE device_get fetches every
        queued array together — per-record reads would pay the ~35 ms
        tunnel round trip each."""
        if not self._pending:
            return
        fetched = jax.device_get(
            [(v, p) for _, v, _, p, _ in self._pending]
        )
        for (metric, _, filenames, _, slot_mask), (values, percent) in zip(
            self._pending, fetched
        ):
            for slot, fname in enumerate(filenames):
                if slot_mask is not None and not slot_mask[slot]:
                    continue
                entry = self._results.setdefault(fname, {}).setdefault(
                    metric, {"metric": 0.0, "it": 0, "percent": 0.0}
                )
                entry["metric"] += float(values[slot])
                entry["it"] += 1
                if percent is not None:
                    entry["percent"] += float(percent[slot])
        self._pending = []

    def results(self):
        """Per-file averages (reference: eval_flow.py:246-258)."""
        self._drain()
        out = {}
        for metric in self.metrics:
            out[metric] = {}
            if metric == "AEE":
                out["AEE_percent"] = {}
            for fname, entry in self._results.items():
                if metric not in entry:
                    continue
                e = entry[metric]
                out[metric][fname] = e["metric"] / max(e["it"], 1)
                if metric == "AEE":
                    out["AEE_percent"][fname] = e["percent"] / max(e["it"], 1)
        return out

    def run(self, stream, params=None, max_batches=None):
        """Full inference loop (reference: eval_flow.py:119-239): iterate the
        stream until every file has been visited once (seq_num >= #files)."""
        params = params if params is not None else self.params
        b = stream.batch_size
        h, w = self.res
        model_state = self.model.zero_state(b, h, w)
        hot_state = init_hot_state(b, self.res)
        n = 0
        while stream.seq_num < len(stream.files):
            batch = stream.next_batch()
            if stream.seq_num >= len(stream.files):
                break
            model_state, hot_state, _ = self.process_batch(
                stream, params, model_state, hot_state, batch
            )
            n += 1
            if max_batches and n >= max_batches:
                break
        return self.results()
