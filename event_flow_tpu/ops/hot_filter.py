"""On-device hot-pixel filter.

TPU-native rebuild of the reference's host-side hot-pixel removal
(reference: dataloader/encodings.py:88-103, dataloader/base.py:224-243):
a per-batch-slot accumulator of "pixel saw events this window" counts; once
``min_obvs`` windows have been seen, up to ``max_px`` highest-rate pixels
with rate > ``max_rate`` are masked out.

The reference's sequential argmax loop (zero the max, repeat, stop early)
is equivalent to: mask the pixels that are BOTH in the top-``max_px`` rates
AND above ``max_rate`` — expressed here with one ``jax.lax.top_k`` + a
scatter, which is how it stays inside the jitted step.

State is functional: ``(hot_events [B,H,W], hot_idx [B])`` carried by the
caller; sequence rollovers reset per-slot state via ``reset`` masks
(reference: base.py:55-58).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["HotFilterState", "init_hot_state", "update_hot_state", "hot_mask"]


class HotFilterState(NamedTuple):
    hot_events: jnp.ndarray  # [B, H, W] windows-with-events counts
    hot_idx: jnp.ndarray  # [B] windows seen


def init_hot_state(batch, res, dtype=jnp.float32):
    h, w = res
    return HotFilterState(
        jnp.zeros((batch, h, w), dtype), jnp.zeros((batch,), jnp.int32)
    )


def update_hot_state(state: HotFilterState, event_cnt, reset=None):
    """Accumulate this window's activity (reference: base.py:232-235).
    event_cnt: [B, H, W, 2]; reset: optional [B] mask zeroing a slot first."""
    hot_events, hot_idx = state
    if reset is not None:
        r = reset.reshape(-1, 1, 1)
        hot_events = jnp.where(r > 0, 0.0, hot_events)
        hot_idx = jnp.where(reset > 0, 0, hot_idx)
    update = (jnp.sum(event_cnt, axis=-1) > 0).astype(hot_events.dtype)
    return HotFilterState(hot_events + update, hot_idx + 1)


def hot_mask(state: HotFilterState, max_px=100, min_obvs=5, max_rate=0.8):
    """Binary keep-mask [B, H, W] (reference: encodings.py:88-103)."""
    hot_events, hot_idx = state
    b, h, w = hot_events.shape
    denom = jnp.maximum(hot_idx, 1).astype(hot_events.dtype)
    rate = hot_events / denom[:, None, None]
    flat = rate.reshape(b, h * w)
    top_vals, top_idx = jax.lax.top_k(flat, max_px)
    kill = top_vals > max_rate  # [B, max_px]
    mask_flat = jnp.ones_like(flat)
    mask_flat = jax.vmap(
        lambda m, i, k: m.at[i].min(1.0 - k.astype(m.dtype))
    )(mask_flat, top_idx, kill)
    active = (hot_idx > min_obvs)[:, None]
    mask_flat = jnp.where(active, mask_flat, 1.0)
    return mask_flat.reshape(b, h, w)


def apply_hot_filter(enc, state: HotFilterState, reset=None, max_px=100,
                     min_obvs=5, max_rate=0.8):
    """Update state with this window and mask the encodings
    (reference: h5.py:289-295 multiplies cnt/voxel/mask by the hot mask).

    enc: dict from ops.encodings.encode_window. Returns (enc', new_state).
    """
    new_state = update_hot_state(state, enc["event_cnt"], reset=reset)
    mask = hot_mask(new_state, max_px, min_obvs, max_rate)[..., None]
    out = dict(enc)
    for key in ("event_cnt", "event_voxel", "event_mask"):
        out[key] = enc[key] * mask
    return out, new_state
