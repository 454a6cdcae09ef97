"""Serialized serving artifacts: ship a compiled inference step, not code.

``export_engine`` lowers an InferenceEngine's jitted step (and optionally
its S-window ``step_many`` form) to StableHLO via ``jax.export`` and
writes a self-contained artifact directory:

    step.bin / step_many.bin   serialized Exported functions
    leaves.npz                 params + initial recurrent/hot state leaves
    meta.json                  leaf counts, shapes, platforms, window size

``SerializedEngine`` restores the artifact and serves it with the same
``step()/step_many()/reset()`` surface as the live engine — with NO model
code, config parsing, or flax on the consumer side; the deployment story
the reference's whole-model pickles approximate (reference:
utils/utils.py:36-37) without arbitrary code execution.

Functions are exported with a flat leaf calling convention (pytree
structures don't survive serialization boundaries robustly), and by
default for both ``cpu`` and ``tpu`` so an artifact built on a dev host
serves on either backend.
"""

import json
import os

import numpy as np

import jax
from jax import export as jexport

__all__ = ["export_engine", "SerializedEngine"]

_DEFAULT_PLATFORMS = ("cpu", "tpu")


def _flatten(engine, n_events):
    params_leaves, params_def = jax.tree_util.tree_flatten(engine.params)
    state_leaves, state_def = jax.tree_util.tree_flatten(engine._state)
    hot_leaves, hot_def = jax.tree_util.tree_flatten(engine._hot)
    ev = jax.ShapeDtypeStruct((engine.batch, n_events, 4), np.float32)
    valid = jax.ShapeDtypeStruct((engine.batch, n_events), np.float32)
    return (params_leaves, params_def, state_leaves, state_def,
            hot_leaves, hot_def, ev, valid)


def export_engine(engine, path, n_events, s=None, platforms=None):
    """Write a serialized serving artifact for ``engine`` to directory
    ``path``. ``n_events`` fixes the (static) window event capacity;
    shorter windows pad and mask via ``valid`` exactly as in live serving.
    ``s`` additionally exports the S-window ``step_many`` form.
    """
    platforms = tuple(platforms or _DEFAULT_PLATFORMS)
    (p_leaves, p_def, s_leaves, s_def, h_leaves, h_def, ev, valid) = \
        _flatten(engine, n_events)
    np_, ns_, nh_ = len(p_leaves), len(s_leaves), len(h_leaves)

    def flat_step(*args):
        params = jax.tree_util.tree_unflatten(p_def, args[:np_])
        state = jax.tree_util.tree_unflatten(s_def, args[np_:np_ + ns_])
        hot = jax.tree_util.tree_unflatten(
            h_def, args[np_ + ns_:np_ + ns_ + nh_])
        events, va = args[np_ + ns_ + nh_:]
        state, hot, flow, _ = engine._fn(params, state, hot, events, va)
        return tuple(jax.tree_util.tree_leaves(state)
                     + jax.tree_util.tree_leaves(hot)
                     + [flow.astype(np.float32)])

    specs = ([jax.ShapeDtypeStruct(x.shape, x.dtype)
              for x in p_leaves + s_leaves + h_leaves] + [ev, valid])
    exported = jexport.export(jax.jit(flat_step), platforms=platforms)(*specs)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "step.bin"), "wb") as f:
        f.write(exported.serialize())

    if s is not None:
        ev_s = jax.ShapeDtypeStruct((s, engine.batch, n_events, 4),
                                    np.float32)
        valid_s = jax.ShapeDtypeStruct((s, engine.batch, n_events),
                                       np.float32)

        def flat_many(*args):
            params = jax.tree_util.tree_unflatten(p_def, args[:np_])
            state = jax.tree_util.tree_unflatten(s_def, args[np_:np_ + ns_])
            hot = jax.tree_util.tree_unflatten(
                h_def, args[np_ + ns_:np_ + ns_ + nh_])
            events, va = args[np_ + ns_ + nh_:]
            state, hot, flows = engine._many_fn(params, state, hot,
                                                events, va)
            return tuple(jax.tree_util.tree_leaves(state)
                         + jax.tree_util.tree_leaves(hot)
                         + [flows.astype(np.float32)])

        specs_s = specs[:-2] + [ev_s, valid_s]
        exported_s = jexport.export(jax.jit(flat_many),
                                    platforms=platforms)(*specs_s)
        with open(os.path.join(path, "step_many.bin"), "wb") as f:
            f.write(exported_s.serialize())

    leaves = {}
    for i, x in enumerate(p_leaves):
        leaves[f"p{i}"] = np.asarray(jax.device_get(x))
    for i, x in enumerate(s_leaves):
        leaves[f"s{i}"] = np.asarray(jax.device_get(x))
    for i, x in enumerate(h_leaves):
        leaves[f"h{i}"] = np.asarray(jax.device_get(x))
    np.savez(os.path.join(path, "leaves.npz"), **leaves)

    meta = {
        "n_params": np_, "n_state": ns_, "n_hot": nh_,
        "batch": engine.batch, "n_events": n_events,
        "resolution": list(engine.res), "platforms": list(platforms),
        "s": s,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return path


class SerializedEngine:
    """Serve an ``export_engine`` artifact. Mirrors InferenceEngine's
    surface (``step``, ``step_many``, ``reset``) but depends only on
    jax + the artifact — no model/config/flax code."""

    def __init__(self, path):
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        with open(os.path.join(path, "step.bin"), "rb") as f:
            self._exported = jexport.deserialize(f.read())
        many_path = os.path.join(path, "step_many.bin")
        self._exported_many = None
        if os.path.isfile(many_path):
            with open(many_path, "rb") as f:
                self._exported_many = jexport.deserialize(f.read())
        data = np.load(os.path.join(path, "leaves.npz"))
        m = self.meta
        self._params = [data[f"p{i}"] for i in range(m["n_params"])]
        self._state0 = [data[f"s{i}"] for i in range(m["n_state"])]
        self._hot0 = [data[f"h{i}"] for i in range(m["n_hot"])]
        self.reset()

    @property
    def batch(self):
        return self.meta["batch"]

    @property
    def n_events(self):
        return self.meta["n_events"]

    def _prep(self, events, valid, many=False):
        ev = np.asarray(events, dtype=np.float32)
        want = 4 if many else 3
        if ev.ndim == want - 1:
            ev = ev[:, None] if many else ev[None]
        cap = self.n_events
        if ev.shape[-2] > cap:
            raise ValueError(
                f"window has {ev.shape[-2]} events > artifact capacity {cap}"
            )
        if valid is None:
            valid = np.ones(ev.shape[:-1], np.float32)
        else:
            valid = np.asarray(valid, np.float32)
        if ev.shape[-2] < cap:  # pad to the exported static shape
            pad = [(0, 0)] * (ev.ndim - 2) + [(0, cap - ev.shape[-2]), (0, 0)]
            ev = np.pad(ev, pad)
            valid = np.pad(valid, pad[:-1])
        return ev, valid

    def step(self, events, valid=None):
        """events: [N,4] or [B,N,4] (N <= artifact capacity; auto-padded).
        Returns flow [B, H, W, 2]."""
        ev, valid = self._prep(events, valid)
        out = self._exported.call(*self._params, *self._state, *self._hot,
                                  ev, valid)
        ns, nh = self.meta["n_state"], self.meta["n_hot"]
        self._state = list(out[:ns])
        self._hot = list(out[ns:ns + nh])
        return out[-1]

    def step_many(self, events, valid=None):
        """events: [S,N,4] or [S,B,N,4] with S == the exported chunk size.
        Returns flow [S, B, H, W, 2]."""
        if self._exported_many is None:
            raise ValueError("artifact was exported without step_many "
                             "(pass s= to export_engine)")
        ev, valid = self._prep(events, valid, many=True)
        if ev.shape[0] != self.meta["s"]:
            raise ValueError(
                f"step_many expects S={self.meta['s']}, got {ev.shape[0]}"
            )
        out = self._exported_many.call(*self._params, *self._state,
                                       *self._hot, ev, valid)
        ns, nh = self.meta["n_state"], self.meta["n_hot"]
        self._state = list(out[:ns])
        self._hot = list(out[ns:ns + nh])
        return out[-1]

    def reset(self):
        """Sequence boundary — restore the exported initial state."""
        self._state = list(self._state0)
        self._hot = list(self._hot0)
