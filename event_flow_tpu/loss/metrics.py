"""Validation metrics: FWL, RSAT, AEE.

TPU-native rebuild of the reference's validation losses
(reference: loss/flow.py:304-628). Pure functions over accumulated
evaluation-window arrays; the stateful accumulate-until-``window_eval``
protocol (eval_flow.py:160-213) lives in eval/harness.py.

Inputs follow the training-loss layout: accumulated events with per-pass
timestamp offsets, per-event flows gathered at association time from the
highest-resolution flow map (flow.py:350).
"""

import jax
import jax.numpy as jnp

from ..ops.iwe import get_interpolation, interpolate_multi
from ..ops.iwe_matmul import bilinear_splat_cf

__all__ = ["fwl", "rsat", "aee", "spatial_variance"]


def _round_iwe(event_list, event_flow, tref, res, flow_scaling, vals):
    """Round-idx IWE of per-event value channels [B, M, C] -> [B, H, W, C].

    Two equivalent backends (same semantics as the reference's
    round-idx scatter, utils/iwe.py:59-63 + :89-91):
      - TPU: one-hot matmul splat (ops/iwe_matmul.py) — rounded coords
        make the row/col interpolation matrices exact one-hot and
        off-grid events drop out automatically, no scatter op;
      - elsewhere: the compact scatter path (get_interpolation +
        interpolate_multi), which also zeroes out-of-bounds rows.
    """
    if jax.default_backend() == "tpu":
        ts = event_list[..., 0:1]
        warped = jnp.round(
            event_list[..., 1:3] + (tref - ts) * event_flow * flow_scaling
        )
        img = bilinear_splat_cf(
            warped[..., 0], warped[..., 1], jnp.moveaxis(vals, -1, 1), res
        )
        return jnp.moveaxis(img, 1, -1)
    idx, w = get_interpolation(
        event_list, event_flow, tref, res, flow_scaling, round_idx=True
    )
    return interpolate_multi(idx, w * vals, res)


def spatial_variance(x):
    """Per-image variance over pixels (reference: loss/flow.py:13-23).
    x: [B, H, W, C] -> [B] (variance over H*W*C... the reference reshapes
    [B, C, 1, -1] and vars over the last axis, i.e. per-channel; with C=1
    IWEs both agree)."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    return jnp.var(flat, axis=1, ddof=0)


def fwl(event_list, event_flow, passes, res, flow_scaling=128):
    """Flow Warp Loss: var(IWE) / var(IE), round-idx warping
    (reference: loss/flow.py:468-500). Higher is better; 1.0 = no gain.

    event_list: [B, M, 4] accumulated events (ts offset per pass);
    event_flow: [B, M, 2] per-event flow (y, x); passes: number of
    accumulated windows (tref).
    Returns [B].
    """
    ones = jnp.ones_like(event_list[..., :1])
    iwe = _round_iwe(event_list, event_flow, float(passes), res,
                     flow_scaling, ones)
    ie = _round_iwe(event_list, event_flow * 0.0, float(passes), res,
                    flow_scaling, ones)
    return spatial_variance(iwe) / spatial_variance(ie)


def _avg_ts_sq_sum(img, max_ts):
    """Sum of squared per-pixel/per-polarity average timestamps, normalized
    by nonzero-pixel count (reference: loss/flow.py:556-577).
    img: [B, H, W, 4] = (pos count, neg count, pos ts, neg ts)."""
    iwe, iwe_ts = img[..., 0:2], img[..., 2:4]
    ts_img = iwe_ts / (iwe + 1e-9) / max_ts
    s = jnp.sum(ts_img**2, axis=(1, 2, 3))
    nonzero = jnp.sum((iwe[..., 0] + iwe[..., 1]) > 0, axis=(1, 2))
    return s / (nonzero.astype(s.dtype) + 1e-9)


def rsat(event_list, event_flow, pol_mask, passes, res, flow_scaling=128):
    """Ratio of the Squared Averaged Timestamps, warped vs unwarped
    (reference: loss/flow.py:503-579). Lower is better. Returns [B]."""
    max_ts = float(passes)
    ts = event_list[..., 0:1]
    vals = jnp.concatenate([pol_mask, ts * pol_mask], axis=-1)  # [B,M,4]
    fw = _avg_ts_sq_sum(
        _round_iwe(event_list, event_flow, max_ts, res, flow_scaling, vals),
        max_ts)
    zero = _avg_ts_sq_sum(
        _round_iwe(event_list, event_flow * 0.0, max_ts, res, flow_scaling,
                   vals),
        max_ts)
    return fw / zero


def aee(flow_map, gtflow, event_mask, dt_input, dt_gt, flow_scaling=128):
    """Average endpoint error + outlier percentage
    (reference: loss/flow.py:582-628).

    flow_map: [B, H, W, 2] latest prediction (x, y); gtflow: [B, H, W, 2];
    event_mask: [B, H, W, 1] mask of the last pass; dt_input/dt_gt: [B].
    Masked to pixels with >=1 event AND nonzero ground truth; outliers are
    error > 3 px and > 5% of GT flow magnitude.
    NOTE: the reference sums outliers over the whole batch before dividing
    by per-sample pixel counts (flow.py:625-626) — a batch>1 bug it never
    hits (MVSEC eval is batch 1); we count per sample.
    Returns (aee [B], percent [B]).
    """
    scale = dt_gt / jnp.maximum(dt_input, 1e-12)
    flow = flow_map * flow_scaling * scale[:, None, None, None]
    flow_mag = jnp.sqrt(jnp.sum(flow**2, axis=-1))
    error = jnp.sqrt(jnp.sum((flow - gtflow) ** 2, axis=-1))

    ev_mask = event_mask[..., 0] > 0
    gt_mask = ~((gtflow[..., 0] == 0.0) & (gtflow[..., 1] == 0.0))
    mask = ev_mask & gt_mask

    error = jnp.where(mask, error, 0.0)
    flow_mag = jnp.where(mask, flow_mag, 0.0)
    num_valid = jnp.sum(mask, axis=(1, 2)).astype(error.dtype)
    aee_val = jnp.sum(error, axis=(1, 2)) / (num_valid + 1e-9)
    outliers = (error > 3.0) & (error > 0.05 * flow_mag)
    percent = jnp.sum(outliers, axis=(1, 2)) / (num_valid + 1e-9)
    return aee_val, percent
