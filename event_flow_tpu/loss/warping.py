"""Contrast-maximization ("image of warped events") training loss.

TPU-native rebuild of the reference's ``EventWarping``
(reference: loss/flow.py:26-301). The reference accumulates state across
forward passes by concatenating growing tensors (loss/flow.py:84-116); here
the training step scans the model over a fixed number of passes T and hands
the loss the *stacked* static-shape arrays, so the whole 10-window BPTT
graph lives inside one jit:

    flow_maps[s] : [B, T, H, W, 2] array OR (u, v) tuple of [B, T, H, W]
    event_list   : [B, T, N, 4]      (ts in [0,1], y, x, p)
    pol_mask     : [B, T, N, 2]      (pos, neg)
    event_mask   : [B, T, H, W, 1] or [B, T, H, W]

TPU LAYOUT NOTE: arrays tile their trailing two dims to (8, 128), so any
big buffer with a small minor dim (C=2 flow maps, C=16 scatter payloads)
pads up to 64x in HBM. The loss therefore computes CHANNELS-FIRST
internally — scalar [.., M] / [.., H, W] planes everywhere — and the
training step passes flow maps as (u, v) tuples so the padded [B,T,H,W,2]
form is never materialized.

Equivalences to the reference's accumulator:
  - timestamp offset per pass (flow.py:90): ts + t
  - per-event flow gathered from that pass's flow map (flow.py:73-84)
  - ``overwrite_intermediate`` (flow.py:121-150): gather all events from the
    final pass's map; single flow map in the smoothness term; event mask
    collapsed with max over passes

Loss per scale (flow.py:176-299): forward (tref=T) and backward (tref=0)
per-polarity average-timestamp images, squared, normalized by the count
image, by max_ts and by the number of nonzero IWE pixels; plus Charbonnier
smoothness over 4 spatial neighbor directions and the temporal (pass) axis.
NOTE (quirk preserved deliberately): the Charbonnier is applied to the SUM
of the x- and y-component differences, sqrt((du+dv)^2+eps)
(flow.py:273-277) — this is what trained the released models.
"""

import os
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.iwe import get_interpolation_compact_cf, interpolate_compact_cf
from ..ops.iwe_matmul import bilinear_splat_cf, gather_planes_cf

__all__ = ["LossConfig", "event_warping_loss"]

# IWE accumulation backend for the training loss:
#   'scatter' — compact channelled scatter-add (ops/iwe.py + ops/scatter.py)
#   'matmul'  — factorized row/col matmul splat (ops/iwe_matmul.py); the
#               TPU fast path: no scatter in forward OR backward
#   'auto'    — matmul on TPU, scatter elsewhere
_IWE_IMPL = os.environ.get("EVFLOW_IWE_IMPL", "auto")


def set_iwe_impl(name):
    global _IWE_IMPL
    assert name in ("scatter", "matmul", "auto"), name
    _IWE_IMPL = name


def _iwe_impl():
    if _IWE_IMPL != "auto":
        return _IWE_IMPL
    return "matmul" if jax.default_backend() == "tpu" else "scatter"


@dataclass(frozen=True)
class LossConfig:
    resolution: Tuple[int, int]
    flow_scaling: float  # defaults to max(resolution) (flow.py:40)
    flow_regul_weight: float
    smoothing_mask: bool = False  # model.mask_output (flow.py:42)
    overwrite_intermediate: bool = False
    loss_scaling: bool = True  # normalize by nonzero-IWE pixels (flow.py:221)


def _split_uv(fmap):
    """Accept [B,T,H,W,2] or (u, v); return scalar planes [B,T,H,W]."""
    if isinstance(fmap, (tuple, list)):
        return fmap[0], fmap[1]
    return fmap[..., 0], fmap[..., 1]


def _per_event_flows(u, v, lin, overwrite, t_live=None):
    """Gather per-event flow from each pass's map.

    u, v: [B, T, H, W]; lin: [B, T, N] linear pixel indices.
    Returns (fy, fx) [B, T, N] — the warp uses (y, x) = (v, u)
    (reference swaps components at the gather, iwe.py:115-119).
    With overwrite, every pass gathers from the LAST LIVE pass's map
    (flow.py:398-418; pass t_live-1 when trailing windows are padding)."""
    b, t, h, w = u.shape
    uf = u.reshape(b, t, h * w)
    vf = v.reshape(b, t, h * w)
    if overwrite:
        if t_live is None:
            last_u, last_v = uf[:, -1:], vf[:, -1:]
        else:
            idx = jnp.full((b, 1, h * w), t_live - 1)
            last_u = jnp.take_along_axis(uf, idx, axis=1)
            last_v = jnp.take_along_axis(vf, idx, axis=1)
        uf = jnp.broadcast_to(last_u, uf.shape)
        vf = jnp.broadcast_to(last_v, vf.shape)
    if _iwe_impl() == "matmul":
        # channel-stacked gather with a matmul (scatter-free) transpose
        n = lin.shape[-1]
        uv = jnp.stack([uf, vf], axis=2).reshape(b * t, 2, h * w)
        g = gather_planes_cf(uv, lin.reshape(b * t, n), (h, w))
        g = g.reshape(b, t, 2, n)
        return g[:, :, 1], g[:, :, 0]
    fx = jnp.take_along_axis(uf, lin, axis=2)
    fy = jnp.take_along_axis(vf, lin, axis=2)
    return fy, fx


def _ts_image_loss(ts, ys, xs, fy, fx, pos, neg, backward, max_ts,
                   cfg: LossConfig, event_axis=None):
    """One warp direction's loss term (flow.py:196-259), channels-first:
    one compact scatter produces the pos/neg count and pos/neg
    (tref-relative) timestamp images. All operands are [B, M] planes.
    ``backward`` (static bool) selects tref=0, else tref=max_ts.
    Under ``shard_map`` (``event_axis`` set) each device scatters its
    event shard locally and the accumulator images combine by an explicit
    ``psum`` over the event mesh axis — the one collective of the loss."""
    res = cfg.resolution
    tref = 0.0 if backward else max_ts
    # forward warp accumulates ts, backward accumulates (max_ts - ts)
    # (flow.py:206-211 vs :239-244)
    ts_w = (max_ts - ts) if backward else ts
    payload = jnp.stack([pos, neg, ts_w * pos, ts_w * neg], axis=1)  # [B,4,M]
    if _iwe_impl() == "matmul":
        wy = ys + (tref - ts) * fy * cfg.flow_scaling
        wx = xs + (tref - ts) * fx * cfg.flow_scaling
        img = bilinear_splat_cf(wy, wx, payload, res)  # [B, 4, H, W]
    else:
        idx, w4 = get_interpolation_compact_cf(
            ts, ys, xs, fy, fx, tref, res, cfg.flow_scaling
        )  # [B, M], [B, 4, M]
        stack = (w4[:, :, None, :] * payload[:, None, :, :]).reshape(
            payload.shape[0], 16, payload.shape[-1]
        )
        img = interpolate_compact_cf(idx, stack, res, 4)  # [B, 4, H, W]
    if event_axis is not None:
        img = jax.lax.psum(img, event_axis)
    iwe = img[:, 0:2]
    iwe_ts = img[:, 2:4]

    ts_img = iwe_ts / (iwe + 1e-9) / max_ts  # (flow.py:212-215)
    per_batch = jnp.sum(ts_img**2, axis=(1, 2, 3))  # pos+neg together
    if cfg.loss_scaling:
        nonzero_px = (iwe[:, 0] + iwe[:, 1]) > 0
        denom = jnp.sum(nonzero_px, axis=(1, 2)).astype(ts_img.dtype)
        per_batch = per_batch / (denom + 1e-9)
    return jnp.sum(per_batch)


def _smoothness(u, v, mask, cfg: LossConfig, t_live=None, live_t=None):
    """Charbonnier smoothness over 4 spatial directions + pass axis
    (flow.py:262-294). u, v, mask: [B, T, H, W]. With padded passes
    (``t_live``), pad maps are masked out and the pass normalization uses
    the live count."""
    m = mask
    apply_mask = cfg.smoothing_mask
    if live_t is not None:
        lm = live_t.astype(u.dtype)[None, :, None, None]
        m = (m if cfg.smoothing_mask else jnp.ones_like(u)) * lm
        apply_mask = True

    def charb(d):
        return jnp.sqrt(d**2 + 1e-6)

    flow_dx = charb((u[..., :, :-1] - u[..., :, 1:]) + (v[..., :, :-1] - v[..., :, 1:]))
    flow_dy = charb((u[..., :-1, :] - u[..., 1:, :]) + (v[..., :-1, :] - v[..., 1:, :]))
    flow_dr = charb(
        (u[..., :-1, :-1] - u[..., 1:, 1:]) + (v[..., :-1, :-1] - v[..., 1:, 1:])
    )
    flow_ur = charb(
        (u[..., 1:, :-1] - u[..., :-1, 1:]) + (v[..., 1:, :-1] - v[..., :-1, 1:])
    )
    use_dt = not cfg.overwrite_intermediate
    if use_dt:
        flow_dt = charb((u[:, :-1] - u[:, 1:]) + (v[:, :-1] - v[:, 1:]))

    if apply_mask:  # (flow.py:184-190, :280-286)
        flow_dx = flow_dx * (m[..., :, :-1] * m[..., :, 1:])
        flow_dy = flow_dy * (m[..., :-1, :] * m[..., 1:, :])
        flow_dr = flow_dr * (m[..., :-1, :-1] * m[..., 1:, 1:])
        flow_ur = flow_ur * (m[..., 1:, :-1] * m[..., :-1, 1:])
        if use_dt:
            flow_dt = flow_dt * (m[:, :-1] * m[:, 1:])

    components = 4
    total = flow_dx.sum() + flow_dy.sum() + flow_dr.sum() + flow_ur.sum()
    if use_dt:
        total = total + flow_dt.sum()
        components += 1
    total = total / components
    # passes normalization (flow.py:294) — live passes when padded
    total = total / (u.shape[1] if t_live is None else t_live)
    return total


def event_warping_loss(flow_maps: Sequence, event_list, pol_mask,
                       event_mask, cfg: LossConfig, t_live=None,
                       axes: Optional[Tuple[str, str]] = None):
    """Full loss over all flow scales (flow.py:176-301).

    Args (shapes in module docstring). ``flow_maps`` is a list over scales;
    each entry is either a [B,T,H,W,2] array (x, y) or a (u, v) tuple of
    [B,T,H,W] planes (preferred on TPU — avoids lane padding). Invalid /
    padded events must have zero ``pol_mask`` and coordinates that fail the
    feasibility mask.

    ``t_live`` (optional traced scalar): number of REAL passes when the
    window axis is zero-padded to a static T (variable-length loss windows,
    time/gtflow training modes). The reference's ``max_ts`` is the number
    of forwards actually accumulated (flow.py:90, :196) — with padding that
    is t_live, and pad flow maps drop out of the smoothness term.

    ``axes`` = (data_axis, event_axis) runs the loss under ``shard_map``
    (parallel/shard_loss.py): events/pol_mask arrive as per-device event
    shards (flow maps replicated over the event axis, batch sharded over
    data), the IWE accumulator images combine by an explicit ``psum`` over
    the event axis, and the final batch-summed scalar psums over data.
    Either element may be None to skip that collective.

    Returns scalar loss (summed over batch, like the reference).
    """
    data_axis, event_axis = axes if axes is not None else (None, None)
    b, t, n, _ = event_list.shape
    h, w = cfg.resolution
    if t_live is None:
        max_ts = float(t)
        live_t = None
    else:
        max_ts = t_live.astype(event_list.dtype)
        live_t = jnp.arange(t) < t_live

    # scalar event planes [B, T*N] (ts offset per pass, flow.py:90)
    ts = (
        event_list[..., 0]
        + jnp.arange(t, dtype=event_list.dtype)[None, :, None]
    ).reshape(b, t * n)
    ys = event_list[..., 1].reshape(b, t * n)
    xs = event_list[..., 2].reshape(b, t * n)
    pos = pol_mask[..., 0].reshape(b, t * n)
    neg = pol_mask[..., 1].reshape(b, t * n)

    lin = (
        event_list[..., 1].astype(jnp.int32) * w
        + event_list[..., 2].astype(jnp.int32)
    )
    lin = jnp.clip(lin, 0, h * w - 1)  # [B, T, N]

    mask = event_mask[..., 0] if event_mask.ndim == 5 else event_mask
    if cfg.overwrite_intermediate:
        mask_sm = (jnp.sum(mask, axis=1, keepdims=True) > 0).astype(mask.dtype)
    else:
        mask_sm = mask

    total = 0.0
    for fmap in flow_maps:
        u, v = _split_uv(fmap)
        fy, fx = _per_event_flows(u, v, lin, cfg.overwrite_intermediate,
                                  t_live=t_live)
        fy = fy.reshape(b, t * n)
        fx = fx.reshape(b, t * n)
        fw = _ts_image_loss(ts, ys, xs, fy, fx, pos, neg, False, max_ts,
                            cfg, event_axis=event_axis)
        bw = _ts_image_loss(ts, ys, xs, fy, fx, pos, neg, True, max_ts,
                            cfg, event_axis=event_axis)
        if cfg.overwrite_intermediate:
            if t_live is None:
                u_sm, v_sm = u[:, -1:], v[:, -1:]
            else:
                idx = jnp.full((b, 1, 1, 1), t_live - 1)
                u_sm = jnp.take_along_axis(u, jnp.broadcast_to(
                    idx, (b, 1, *u.shape[2:])), axis=1)
                v_sm = jnp.take_along_axis(v, jnp.broadcast_to(
                    idx, (b, 1, *v.shape[2:])), axis=1)
            sm = _smoothness(u_sm, v_sm, mask_sm, cfg)
        else:
            sm = _smoothness(u, v, mask_sm, cfg, t_live=t_live,
                             live_t=live_t)
        total = total + fw + bw + cfg.flow_regul_weight * sm

    total = total / len(flow_maps)
    if data_axis is not None:
        # batch is sharded over the data axis; the reference's loss sums
        # over batch, so the per-shard partial sums combine by psum
        total = jax.lax.psum(total, data_axis)
    return total
