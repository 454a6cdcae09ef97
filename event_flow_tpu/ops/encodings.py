"""On-device, batched event->tensor encodings.

TPU-native redesign of the reference's CPU-dataloader encodings
(reference: dataloader/encodings.py:30-103, dataloader/base.py:148-222).
Instead of running per-sample ``index_put_`` scatters on the host inside the
DataLoader, the raw event list [B, N, 4] ships to the device once and all
encodings are computed inside the jitted step as vectorized scatter-adds
(BASELINE.json north star: "vectorized on-device preprocessing stage").

Conventions:
  - event list layout [B, N, 4] = (ts, y, x, p), matching the reference
    (dataloader/base.py:198-208 stacks [ts, ys, xs, ps]).
  - polarity p in {-1, +1} (base.py:83 maps {0,1} -> {-1,+1}).
  - padded/invalid events are signalled with a [B, N] ``valid`` mask; they
    contribute to nothing.
  - images are NHWC (TPU-native), i.e. [B, H, W, C].
"""

import jax.numpy as jnp

from .scatter import scatter_add

__all__ = [
    "event_image",
    "events_to_channels",
    "events_to_voxel",
    "events_to_mask",
    "normalize_timestamps",
    "format_events",
    "encode_window",
]


def _linear_idx(ys, xs, res):
    """Row-major linearization y*W + x with clamping; returns (idx, inbounds)."""
    h, w = res
    yi = ys.astype(jnp.int32)
    xi = xs.astype(jnp.int32)
    inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    return yi * w + xi, inb


def event_image(ys, xs, vals, res, valid=None):
    """Accumulate per-event values into an image.

    Batched equivalent of ``events_to_image`` with accumulate=True
    (reference: dataloader/encodings.py:30-45).

    Args:
      ys, xs: [B, N] float or int event coordinates.
      vals:   [B, N] or [B, N, C] per-event values.
      res:    (H, W).
      valid:  optional [B, N] mask.
    Returns:
      [B, H, W] (if vals was rank 2) or [B, H, W, C].
    """
    h, w = res
    squeeze = vals.ndim == 2
    if squeeze:
        vals = vals[..., None]
    idx, inb = _linear_idx(ys, xs, res)
    mask = inb if valid is None else (inb & (valid > 0))
    vals = vals * mask[..., None].astype(vals.dtype)
    img = scatter_add(idx, vals, h * w)
    img = img.reshape(img.shape[0], h, w, img.shape[-1])
    return img[..., 0] if squeeze else img


def events_to_channels(ys, xs, ps, res, valid=None):
    """Two-channel per-polarity event-count image [B, H, W, 2]
    (reference: dataloader/encodings.py:70-85 — both channels count
    positively: pos channel accumulates p*1{p>0}, neg channel p*-1{p<0})."""
    pos = jnp.where(ps > 0, ps, 0.0)
    neg = jnp.where(ps < 0, -ps, 0.0)
    vals = jnp.stack([pos, neg], axis=-1)
    return event_image(ys, xs, vals, res, valid=valid)


def events_to_voxel(ys, xs, ts, ps, num_bins, res, round_ts=False, valid=None):
    """Voxel grid with temporal bilinear weights [B, H, W, num_bins]
    (reference: dataloader/encodings.py:48-67): per-bin weight
    ``max(0, 1 - |ts*(B-1) - b|)``; events add signed polarity.

    ``ts`` must be normalized to [0, 1] over the window
    (dataloader/base.py:85). All bins are built with ONE channelled scatter.
    """
    tb = ts * (num_bins - 1)
    if round_ts:
        tb = jnp.round(tb)
    bins = jnp.arange(num_bins, dtype=tb.dtype)
    # [B, N, num_bins]
    weights = jnp.maximum(0.0, 1.0 - jnp.abs(tb[..., None] - bins))
    vals = ps[..., None] * weights
    return event_image(ys, xs, vals, res, valid=valid)


def events_to_mask(ys, xs, ps, res, valid=None):
    """[B, H, W, 1] binary mask of pixels with >= 1 event.

    The reference builds it with ``index_put_(accumulate=False)`` of |p|
    (dataloader/base.py:159-171) — all written values are 1, so
    last-write-wins equals (count > 0)."""
    cnt = event_image(ys, xs, jnp.abs(ps), res, valid=valid)
    return (cnt > 0).astype(cnt.dtype)[..., None]


def normalize_timestamps(ts, valid=None):
    """Normalize window timestamps to [0, 1] (reference:
    dataloader/base.py:84-85, ``(ts - ts[0]) / (ts[-1] - ts[0])``).

    With a validity mask, uses first/last *valid* timestamps (events are
    time-ordered within a window). Empty windows map to zeros.
    """
    if valid is None:
        t0 = ts[..., :1]
        t1 = ts[..., -1:]
    else:
        big = jnp.finfo(ts.dtype).max
        t0 = jnp.min(jnp.where(valid > 0, ts, big), axis=-1, keepdims=True)
        t1 = jnp.max(jnp.where(valid > 0, ts, -big), axis=-1, keepdims=True)
        any_valid = jnp.any(valid > 0, axis=-1, keepdims=True)
        t0 = jnp.where(any_valid, t0, 0.0)
        t1 = jnp.where(any_valid, t1, 0.0)
    denom = jnp.where(t1 - t0 > 0, t1 - t0, 1.0)
    out = (ts - t0) / denom
    if valid is not None:
        out = out * (valid > 0)
    return out


def format_events(events, valid=None):
    """Raw device window -> normalized event list (ts to [0,1]; polarity
    assumed already in {-1,+1}). ``events`` is [B, N, 4] = (ts, y, x, p)."""
    ts = normalize_timestamps(events[..., 0], valid=valid)
    return jnp.stack([ts, events[..., 1], events[..., 2], events[..., 3]], axis=-1)


def polarity_mask(ps, valid=None):
    """[B, N, 2] (pos, neg) indicator mask (reference:
    dataloader/base.py:210-222)."""
    pos = (ps > 0).astype(jnp.float32)
    neg = (ps < 0).astype(jnp.float32)
    m = jnp.stack([pos, neg], axis=-1)
    if valid is not None:
        m = m * (valid > 0)[..., None]
    return m


def encode_windows_cf(events, res, num_bins, valid=None, round_ts=False):
    """Channels-FIRST batched multi-window encoding.

    Like ``encode_windows`` but every large array keeps a big minor dim so
    nothing lane-pads on TPU (see ops/scatter.py::scatter_add_cf):
      event_cnt [B,T,2,H,W], event_voxel [B,T,nb,H,W],
      event_mask [B,T,H,W], event_list [B,T,N,4], pol_mask [B,T,N,2].
    The per-window NHWC transpose for the conv stack happens inside the
    scan body (one window's working set, not T stacked buffers).
    """
    from .scatter import scatter_add_cf

    b, t, n, _ = events.shape
    h, w = res
    flat = events.reshape(b * t, n, 4)
    fvalid = valid.reshape(b * t, n) if valid is not None else None
    ev = format_events(flat, valid=fvalid)
    ts, ys, xs, ps = ev[..., 0], ev[..., 1], ev[..., 2], ev[..., 3]

    idx, inb = _linear_idx(ys, xs, res)
    mask = inb if fvalid is None else (inb & (fvalid > 0))
    maskf = mask.astype(ps.dtype)

    pos = jnp.where(ps > 0, ps, 0.0) * maskf
    neg = jnp.where(ps < 0, -ps, 0.0) * maskf
    tb = ts * (num_bins - 1)
    if round_ts:
        tb = jnp.round(tb)
    planes = [pos, neg]
    for bi in range(num_bins):
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(tb - bi))
        planes.append(ps * wgt * maskf)
    vals_cf = jnp.stack(planes, axis=1)  # [B*T, 2+nb, N]

    img = scatter_add_cf(idx, vals_cf, h * w).reshape(
        b, t, 2 + num_bins, h, w
    )
    cnt = img[:, :, :2]
    voxel = img[:, :, 2:]
    emask = ((cnt[:, :, 0] + cnt[:, :, 1]) > 0).astype(cnt.dtype)

    pol = polarity_mask(ps, valid=fvalid).reshape(b, t, n, 2)
    return {
        "event_list": ev.reshape(b, t, n, 4),
        "event_cnt": cnt,
        "event_voxel": voxel,
        "event_mask": emask,
        "pol_mask": pol,
    }


def encode_windows(events, res, num_bins, valid=None, round_ts=False):
    """Batched multi-window encoding with ONE scatter for everything.

    The per-window formulation issues 3 scatter-adds per window (count,
    voxel, mask) — 30 serialized TPU scatters per 10-window training step.
    Here the count and voxel channels of ALL windows go through a single
    channelled scatter over a [B*T] batch axis, and the mask falls out of
    the count image ((pos+neg) > 0 — the reference's accumulate=False
    index_put_ of |p| is exactly that, dataloader/base.py:159-171).

    Args:
      events: [B, T, N, 4] raw windows (ts unnormalized, y, x, p).
      valid:  [B, T, N] mask.
    Returns dict:
      event_list [B,T,N,4] (ts normalized per window), event_cnt
      [B,T,H,W,2], event_voxel [B,T,H,W,num_bins], event_mask [B,T,H,W,1],
      pol_mask [B,T,N,2].
    """
    b, t, n, _ = events.shape
    h, w = res
    flat = events.reshape(b * t, n, 4)
    fvalid = valid.reshape(b * t, n) if valid is not None else None
    ev = format_events(flat, valid=fvalid)
    ts, ys, xs, ps = ev[..., 0], ev[..., 1], ev[..., 2], ev[..., 3]

    idx, inb = _linear_idx(ys, xs, res)
    mask = inb if fvalid is None else (inb & (fvalid > 0))
    maskf = mask.astype(ps.dtype)

    pos = jnp.where(ps > 0, ps, 0.0)
    neg = jnp.where(ps < 0, -ps, 0.0)
    tb = ts * (num_bins - 1)
    if round_ts:
        tb = jnp.round(tb)
    bins = jnp.arange(num_bins, dtype=tb.dtype)
    vox_w = jnp.maximum(0.0, 1.0 - jnp.abs(tb[..., None] - bins))
    vals = jnp.concatenate(
        [jnp.stack([pos, neg], axis=-1), ps[..., None] * vox_w], axis=-1
    ) * maskf[..., None]  # [B*T, N, 2+num_bins]

    img = scatter_add(idx, vals, h * w).reshape(b, t, h, w, 2 + num_bins)
    cnt = img[..., :2]
    voxel = img[..., 2:]
    emask = ((cnt[..., 0] + cnt[..., 1]) > 0).astype(cnt.dtype)[..., None]

    pol = polarity_mask(ps, valid=fvalid).reshape(b, t, n, 2)
    return {
        "event_list": ev.reshape(b, t, n, 4),
        "event_cnt": cnt,
        "event_voxel": voxel,
        "event_mask": emask,
        "pol_mask": pol,
    }


def encode_window(events, res, num_bins, valid=None, round_ts=False):
    """Full per-window on-device encoding pass.

    Args:
      events: [B, N, 4] (ts_raw, y, x, p) with p in {-1,+1}; ts need not be
              normalized yet.
      res: (H, W); num_bins: voxel bins; valid: [B, N] mask.
    Returns dict with (all NHWC):
      event_list     [B, N, 4]  ts normalized to [0,1]
      event_cnt      [B, H, W, 2]
      event_voxel    [B, H, W, num_bins]
      event_mask     [B, H, W, 1]
      pol_mask       [B, N, 2]
    """
    out = encode_windows(
        events[:, None], res, num_bins,
        valid=None if valid is None else valid[:, None],
        round_ts=round_ts,
    )
    return {k: v[:, 0] for k, v in out.items()}
