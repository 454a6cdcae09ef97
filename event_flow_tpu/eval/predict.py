"""Streaming inference engine: low-latency per-window flow prediction.

The serving-side counterpart of the training stack: one jitted step turns a
raw event window into a dense flow map (+ optional IWE), carrying the
recurrent state across calls — the deployment shape of the reference's
eval loop (reference: eval_flow.py:119-152) without metrics machinery.

    engine = InferenceEngine(config, model, params)
    for window in camera:                  # [N, 4] (ts, y, x, p)
        flow = engine.step(window)         # [H, W, 2], device-resident
    engine.reset()                         # at sequence changes
"""

import threading

import jax
import jax.numpy as jnp

from ..models.policy import cell_compute_dtype
from ..ops.encodings import encode_window
from ..ops.hot_filter import apply_hot_filter, init_hot_state
from ..ops.iwe import compute_pol_iwe

__all__ = ["InferenceEngine"]

# serializes trace-time flips of the module-level conv quant policy, so
# an engine tracing on another thread can't bake a concurrent engine's
# policy into its program (RLock: _many_fn's trace re-enters _fn)
_TRACE_LOCK = threading.RLock()


class InferenceEngine:
    def __init__(self, config, model, params, batch=1, with_iwe=False,
                 quantize=None):
        """``quantize='int8'``: serve with int8 convs (per-channel weight
        scales, dynamic per-tensor activation scale — models/conv.py
        ``_conv2d_int8``). The v5e MXU runs int8 at 2x its bf16 rate and
        operand bytes halve; hidden-layer spike inputs quantize exactly.
        Scoped to this engine's traces — concurrent engines are
        unaffected."""
        assert quantize in (None, "none", "int8"), quantize
        self.quantize = None if quantize == "none" else quantize
        self.res = tuple(config["loader"]["resolution"])
        self.num_bins = config["model"]["num_bins"]
        self.model = model
        self.params = params
        self.batch = batch
        self.with_iwe = with_iwe
        self.flow_scaling = config.get("metrics", {}).get("flow_scaling", 128)
        self.hot_cfg = config.get("hot_filter", {"enabled": False})
        self.round_encoding = config["model"].get("round_encoding", False)
        # serving honors the cell compute-precision policy (models/policy.py):
        # the recurrent state is carried in the policy dtype, flow leaves f32
        self._cdtype = cell_compute_dtype()
        self._state = model.zero_state(batch, *self.res, dtype=self._cdtype)
        self._hot = init_hot_state(batch, self.res)
        # instance-owned jits (not decorated methods): the compiled
        # executables are GC'd with the engine instead of keying `self`
        # (and the params it references) into jax's global jit cache
        self._step = jax.jit(self._fn)
        self._step_many_jit = jax.jit(self._many_fn)

    def _fn(self, params, state, hot, events, valid):
        enc = encode_window(events, self.res, self.num_bins, valid=valid,
                            round_ts=self.round_encoding)
        if self.hot_cfg.get("enabled"):
            enc, hot = apply_hot_filter(
                enc, hot,
                max_px=self.hot_cfg.get("max_px", 100),
                min_obvs=self.hot_cfg.get("min_obvs", 5),
                max_rate=self.hot_cfg.get("max_rate", 0.8),
            )
        from ..models import conv as _conv

        # trace-time scoped quant policy: this body runs while jax traces
        # the jitted step, so flipping the module policy here (and
        # restoring it) quantizes exactly this engine's convs; the lock
        # keeps a concurrent thread's trace from reading the flipped value
        with _TRACE_LOCK:
            prev = _conv._CONV_QUANT
            if self.quantize:
                _conv._CONV_QUANT = self.quantize
            try:
                out, state = self.model.apply(
                    params,
                    enc["event_voxel"].astype(self._cdtype),
                    enc["event_cnt"].astype(self._cdtype),
                    state,
                )
            finally:
                _conv._CONV_QUANT = prev
        flow = out["flow"][-1].astype(jnp.float32)
        iwe = None
        if self.with_iwe:
            iwe = compute_pol_iwe(
                flow, enc["event_list"], self.res,
                enc["pol_mask"][..., 0:1], enc["pol_mask"][..., 1:2],
                flow_scaling=self.flow_scaling, round_idx=True,
            )
        return state, hot, flow, iwe

    def step(self, events, valid=None):
        """events: [N, 4] or [B, N, 4] raw window. Returns flow
        [B, H, W, 2] (device array; don't block on it unless needed)."""
        ev = jnp.asarray(events)
        if ev.ndim == 2:
            ev = ev[None]
        if valid is None:
            valid = jnp.ones(ev.shape[:2])
        self._state, self._hot, flow, iwe = self._step(
            self.params, self._state, self._hot, ev, valid
        )
        self.last_iwe = iwe
        return flow

    def step_many(self, events, valid=None):
        """Throughput form of ``step``: S windows in ONE dispatch via a
        device-side scan (the recurrent state still carries window to
        window, exactly as S ``step`` calls would). On a tunneled host
        this pays the ~35 ms dispatch round trip once per S windows
        instead of once per window — the serving analogue of the eval
        harness's chunked dispatch (eval/harness.py::_chunk_step).

        events: [S, N, 4] or [S, B, N, 4]; returns flow [S, B, H, W, 2].
        """
        ev = jnp.asarray(events)
        if ev.ndim == 3:
            ev = ev[:, None]
        if valid is None:
            valid = jnp.ones(ev.shape[:3])
        self._state, self._hot, flows = self._step_many_jit(
            self.params, self._state, self._hot, ev, valid
        )
        return flows

    def _many_fn(self, params, state, hot, events, valid):
        def body(carry, xs):
            st, h = carry
            ev, va = xs
            st, h, flow, _ = self._fn(params, st, h, ev, va)
            return (st, h), flow

        (state, hot), flows = jax.lax.scan(body, (state, hot),
                                           (events, valid))
        return state, hot, flows

    def reset(self):
        """Sequence boundary (reference: eval_flow.py:123-126)."""
        self._state = self.model.zero_state(self.batch, *self.res,
                                            dtype=self._cdtype)
        self._hot = init_hot_state(self.batch, self.res)
