"""Contrast-maximization ("image of warped events") training loss.

TPU-native rebuild of the reference's ``EventWarping``
(reference: loss/flow.py:26-301). The reference accumulates state across
forward passes by concatenating growing tensors (loss/flow.py:84-116); here
the training step scans the model over a fixed number of passes T and hands
the loss the *stacked* static-shape arrays, so the whole 10-window BPTT
graph lives inside one jit:

    flow_maps[s] : [B, T, H, W, 2]   per-scale, per-pass flow maps (x, y)
    event_list   : [B, T, N, 4]      (ts in [0,1], y, x, p)
    pol_mask     : [B, T, N, 2]      (pos, neg)
    event_mask   : [B, T, H, W, 1]

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

from dataclasses import dataclass
from typing import Sequence, Tuple

import jax.numpy as jnp

from ..ops.iwe import get_interpolation_compact, interpolate_compact

__all__ = ["LossConfig", "event_warping_loss"]


@dataclass(frozen=True)
class LossConfig:
    resolution: Tuple[int, int]
    flow_scaling: float  # defaults to max(resolution) (flow.py:40)
    flow_regul_weight: float
    smoothing_mask: bool = False  # model.mask_output (flow.py:42)
    overwrite_intermediate: bool = False
    loss_scaling: bool = True  # normalize by nonzero-IWE pixels (flow.py:221)


def _per_event_flows(flow_map_tbhwc, event_list, res, overwrite):
    """Gather per-event flow from each pass's map ([B,T,H,W,2] -> [B,T,N,2]
    as (y,x)); with overwrite, every pass gathers from the final map.
    One batched take_along_axis over all passes."""
    b, t, n, _ = event_list.shape
    h, w = res
    if overwrite:
        maps = jnp.broadcast_to(
            flow_map_tbhwc[:, -1:], (b, t, h, w, 2)
        )
    else:
        maps = flow_map_tbhwc
    flat = maps.reshape(b, t, h * w, 2)
    lin = (
        event_list[..., 1].astype(jnp.int32) * w
        + event_list[..., 2].astype(jnp.int32)
    )
    lin = jnp.clip(lin, 0, h * w - 1)
    g = jnp.take_along_axis(flat, lin[..., None], axis=2)  # [B,T,N,2] (x,y)
    return g[..., ::-1]  # -> (y, x)


def _ts_image_loss(event_list_flat, event_flow_flat, pol_flat, tref, max_ts,
                   cfg: LossConfig):
    """One warp direction's loss term (flow.py:196-259): scatter the
    pos/neg count and pos/neg (tref-relative) timestamp images in a single
    channelled scatter, normalize, square, sum."""
    res = cfg.resolution
    # compact bilinear scatter: one index row per event, the 4 neighbor
    # weights x 4 payload channels ride as a 16-channel payload
    # (4x fewer scatter rows than the reference's 4N expansion)
    idx, w4 = get_interpolation_compact(
        event_list_flat, event_flow_flat, tref, res, cfg.flow_scaling
    )  # [B, M], [B, M, 4]
    ts = event_list_flat[..., 0:1]
    # forward warp accumulates ts, backward accumulates (max_ts - ts)
    # (flow.py:206-211 vs :239-244)
    ts_w = ts if tref != 0 else (max_ts - ts)
    payload = jnp.concatenate([pol_flat, ts_w * pol_flat], axis=-1)  # [B,M,4]
    stack = (w4[..., :, None] * payload[..., None, :]).reshape(
        *payload.shape[:2], 16
    )
    img = interpolate_compact(idx, stack, res, 4)  # [B,H,W,4]
    iwe = img[..., 0:2]
    iwe_ts = img[..., 2:4]

    ts_img = iwe_ts / (iwe + 1e-9) / max_ts  # (flow.py:212-215)
    per_batch = jnp.sum(ts_img**2, axis=(1, 2, 3))  # pos+neg together
    if cfg.loss_scaling:
        nonzero_px = (iwe[..., 0] + iwe[..., 1]) > 0
        denom = jnp.sum(nonzero_px, axis=(1, 2)).astype(ts_img.dtype)
        per_batch = per_batch / (denom + 1e-9)
    return jnp.sum(per_batch)


def _smoothness(flow_map_tbhwc, event_mask, cfg: LossConfig):
    """Charbonnier smoothness over 4 spatial directions + pass axis
    (flow.py:262-294). flow_map [B,T,H,W,2]; event_mask [B,T,H,W,1]."""
    u = flow_map_tbhwc[..., 0]  # x component [B,T,H,W]
    v = flow_map_tbhwc[..., 1]
    m = event_mask[..., 0]

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

    if cfg.smoothing_mask:  # (flow.py:184-190, :280-286)
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
    total = total / flow_map_tbhwc.shape[1]  # passes (flow.py:294)
    return total


def event_warping_loss(flow_maps: Sequence[jnp.ndarray], event_list, pol_mask,
                       event_mask, cfg: LossConfig):
    """Full loss over all flow scales (flow.py:176-301).

    Args (shapes in module docstring). ``flow_maps`` is a list over scales,
    each entry already at full resolution (model contract). Invalid/padded
    events must have zero ``pol_mask`` and coordinates inside the frame
    (or will be purged by feasibility masking).

    Returns scalar loss (summed over batch, like the reference).
    """
    b, t, n, _ = event_list.shape
    res = cfg.resolution
    max_ts = float(t)

    # ts offset per pass (flow.py:90) and flatten passes into the event axis
    ts_off = event_list[..., 0] + jnp.arange(t, dtype=event_list.dtype)[None, :, None]
    events = jnp.concatenate([ts_off[..., None], event_list[..., 1:]], axis=-1)
    events_flat = events.reshape(b, t * n, 4)
    pol_flat = pol_mask.reshape(b, t * n, 2)

    if cfg.overwrite_intermediate:
        mask_sm = (jnp.sum(event_mask, axis=1, keepdims=True) > 0).astype(
            event_mask.dtype
        )  # (flow.py:149-150)
    else:
        mask_sm = event_mask

    total = 0.0
    for fmap in flow_maps:
        ef = _per_event_flows(fmap, event_list, res, cfg.overwrite_intermediate)
        ef_flat = ef.reshape(b, t * n, 2)
        fw = _ts_image_loss(events_flat, ef_flat, pol_flat, max_ts, max_ts, cfg)
        bw = _ts_image_loss(events_flat, ef_flat, pol_flat, 0.0, max_ts, cfg)
        fmap_sm = fmap[:, -1:] if cfg.overwrite_intermediate else fmap
        sm = _smoothness(fmap_sm, mask_sm, cfg)
        total = total + fw + bw + cfg.flow_regul_weight * sm

    return total / len(flow_maps)
