"""Image of warped events (IWE): per-event flow gather, bilinear warp,
scatter-add.

TPU-native rebuild of the reference's warping primitives
(reference: utils/iwe.py:4-153). Math is kept exactly equivalent; the
implementation is batched, static-shape, and built on the channelled
scatter-add (ops/scatter.py) so one scatter produces the
pos/neg x count/timestamp image stack at once.

Event list layout is [B, N, 4] = (ts, y, x, p); flow vectors are (y, x)
per event (reference: utils/iwe.py:24-28).
"""

import jax.numpy as jnp

from .scatter import scatter_add

__all__ = [
    "purge_unfeasible",
    "get_interpolation",
    "interpolate",
    "deblur_events",
    "compute_pol_iwe",
    "gather_event_flow",
]


def purge_unfeasible(coords, res):
    """Zero out-of-bounds warped coordinates and return the feasibility mask
    (reference: utils/iwe.py:4-17).

    coords: [B, M, 2] (y, x). Returns (masked coords, mask [B, M, 1]).
    """
    h, w = res
    y, x = coords[..., 0:1], coords[..., 1:2]
    mask = ((y >= 0) & (y < h) & (x >= 0) & (x < w)).astype(coords.dtype)
    return coords * mask, mask


def get_interpolation(events, flow, tref, res, flow_scaling, round_idx=False):
    """Warp events by their flow and compute scatter indices + weights
    (reference: utils/iwe.py:20-74).

    Warp: ``x' = x + (tref - t) * flow * flow_scaling`` (iwe.py:37).
    round_idx=True: nearest-pixel, weights 1 (M = N).
    round_idx=False: 4 bilinear neighbors (top-left/top-right/bottom-left/
    bottom-right, concatenated along the event axis -> M = 4N) with weights
    ``prod(max(0, 1 - |x' - idx|))`` (iwe.py:48-68).

    Returns:
      idx     [B, M] int32 linear indices (row-major y*W + x), clamped
      weights [B, M, 1] interpolation weights (0 for out-of-bounds)
    """
    h, w = res
    ts = events[..., 0:1]
    coords = events[..., 1:3]
    warped = coords + (tref - ts) * flow * flow_scaling  # [B, N, 2]

    if round_idx:
        idx_f = jnp.round(warped)
        weights = jnp.ones_like(idx_f[..., :1])
        idx_f, mask = purge_unfeasible(idx_f, res)
        weights = weights * mask
    else:
        top_y = jnp.floor(warped[..., 0:1])
        bot_y = top_y + 1.0
        left_x = jnp.floor(warped[..., 1:2])
        right_x = left_x + 1.0
        # neighbor order matches the reference concat (iwe.py:53-57):
        # top-left, top-right, bottom-left, bottom-right
        idx_f = jnp.concatenate(
            [
                jnp.concatenate([top_y, left_x], axis=-1),
                jnp.concatenate([top_y, right_x], axis=-1),
                jnp.concatenate([bot_y, left_x], axis=-1),
                jnp.concatenate([bot_y, right_x], axis=-1),
            ],
            axis=1,
        )  # [B, 4N, 2]
        warped4 = jnp.concatenate([warped] * 4, axis=1)
        per_axis = jnp.maximum(0.0, 1.0 - jnp.abs(warped4 - idx_f))
        idx_f, mask = purge_unfeasible(idx_f, res)
        weights = jnp.prod(per_axis, axis=-1, keepdims=True) * mask

    lin = (idx_f[..., 0] * w + idx_f[..., 1]).astype(jnp.int32)
    lin = jnp.clip(lin, 0, h * w - 1)
    return lin, weights


def interpolate(idx, weights, res, polarity_mask=None):
    """Scatter-add weights into an image [B, 1, H, W]... here NHWC:
    returns [B, H, W, 1] (reference: utils/iwe.py:77-92)."""
    h, w = res
    if polarity_mask is not None:
        weights = weights * polarity_mask
    iwe = scatter_add(idx, weights, h * w)
    return iwe.reshape(iwe.shape[0], h, w, 1)


def interpolate_multi(idx, weight_stack, res):
    """Channelled scatter: one scatter for C weight planes sharing indices.

    weight_stack: [B, M, C] -> [B, H, W, C]. Used by the loss to build the
    pos/neg count and pos/neg timestamp images in a single scatter-add
    (the reference issues 4 separate scatter_add_ calls per direction,
    loss/flow.py:202-211)."""
    h, w = res
    iwe = scatter_add(idx, weight_stack, h * w)
    return iwe.reshape(iwe.shape[0], h, w, weight_stack.shape[-1])


def get_interpolation_compact(events, flow, tref, res, flow_scaling):
    """Bilinear warp in compact form: ONE index row per event.

    The classic formulation (get_interpolation, matching the reference)
    expands each event to 4 neighbor rows -> a 4N-row scatter. TPU scatter
    cost scales with index rows, so here each event contributes a single
    row — the top-left neighbor in a (H+2, W+2) zero-padded grid — and the
    4 bilinear weights ride as payload channels. ``interpolate_compact``
    combines the shifted padded images. Numerically identical to the
    reference path (tests assert it).

    Returns:
      idx_pad  [B, N] int32 linear indices into the padded grid
      weights  [B, N, 4] bilinear weights (tl, tr, bl, br), zero where the
               corresponding neighbor is out of bounds
    """
    h, w = res
    ts = events[..., 0:1]
    coords = events[..., 1:3]
    warped = coords + (tref - ts) * flow * flow_scaling  # [B, N, 2]

    top_y = jnp.floor(warped[..., 0])
    left_x = jnp.floor(warped[..., 1])
    dy = warped[..., 0] - top_y  # in [0, 1)
    dx = warped[..., 1] - left_x
    w_tl = (1.0 - dy) * (1.0 - dx)
    w_tr = (1.0 - dy) * dx
    w_bl = dy * (1.0 - dx)
    w_br = dy * dx
    weights = jnp.stack([w_tl, w_tr, w_bl, w_br], axis=-1)

    # per-neighbor feasibility (reference purges each of the 4 rows
    # independently, iwe.py:64-68)
    ys = jnp.stack([top_y, top_y, top_y + 1, top_y + 1], axis=-1)
    xs = jnp.stack([left_x, left_x + 1, left_x, left_x + 1], axis=-1)
    feas = ((ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)).astype(weights.dtype)
    weights = weights * feas

    # top-left index in the padded grid; clamp keeps far-out warps benign
    # (their weights are already zero)
    py = jnp.clip(top_y + 1, 0, h).astype(jnp.int32)
    px = jnp.clip(left_x + 1, 0, w).astype(jnp.int32)
    idx_pad = py * (w + 2) + px
    return idx_pad, weights


def get_interpolation_compact_cf(ts, ys, xs, fy, fx, tref, res, flow_scaling):
    """Channels-first compact bilinear warp from scalar event planes.

    All inputs are [B, M] (lane dim = M on TPU, so nothing pads):
    ts/ys/xs event coordinates, (fy, fx) per-event flow. Returns
    (idx_pad [B, M], w4_cf [B, 4, M]) with neighbor order tl/tr/bl/br.
    Same math as ``get_interpolation_compact``.
    """
    h, w = res
    wy = ys + (tref - ts) * fy * flow_scaling
    wx = xs + (tref - ts) * fx * flow_scaling
    top_y = jnp.floor(wy)
    left_x = jnp.floor(wx)
    dy = wy - top_y
    dx = wx - left_x
    w4 = jnp.stack(
        [
            (1.0 - dy) * (1.0 - dx),
            (1.0 - dy) * dx,
            dy * (1.0 - dx),
            dy * dx,
        ],
        axis=1,
    )  # [B, 4, M]
    yn = jnp.stack([top_y, top_y, top_y + 1, top_y + 1], axis=1)
    xn = jnp.stack([left_x, left_x + 1, left_x, left_x + 1], axis=1)
    feas = ((yn >= 0) & (yn < h) & (xn >= 0) & (xn < w)).astype(w4.dtype)
    w4 = w4 * feas
    py = jnp.clip(top_y + 1, 0, h).astype(jnp.int32)
    px = jnp.clip(left_x + 1, 0, w).astype(jnp.int32)
    return py * (w + 2) + px, w4


def interpolate_compact_cf(idx_pad, stack_cf, res, num_channels):
    """Channels-first compact scatter: stack_cf [B, 4*C, M] laid out
    neighbor-major -> [B, C, H, W]. No lane padding anywhere (the scatter
    input/output keep M / cells minor)."""
    from .scatter import scatter_add_cf

    h, w = res
    b = idx_pad.shape[0]
    img = scatter_add_cf(idx_pad, stack_cf, (h + 2) * (w + 2))
    img = img.reshape(b, 4, num_channels, h + 2, w + 2)
    tl = img[:, 0, :, 1:h + 1, 1:w + 1]
    tr = img[:, 1, :, 1:h + 1, 0:w]
    bl = img[:, 2, :, 0:h, 1:w + 1]
    br = img[:, 3, :, 0:h, 0:w]
    return tl + tr + bl + br


def interpolate_compact(idx_pad, weight_stack, res, num_channels):
    """Scatter compact bilinear contributions and combine shifts.

    weight_stack: [B, N, 4*C] laid out neighbor-major: the 4 neighbor
    weights each multiplied by the C payload channels
    (w_tl*c0..w_tl*c{C-1}, w_tr*c0.., w_bl.., w_br..).
    Returns [B, H, W, C].
    """
    h, w = res
    b = idx_pad.shape[0]
    img = scatter_add(idx_pad, weight_stack, (h + 2) * (w + 2))
    img = img.reshape(b, h + 2, w + 2, 4, num_channels)
    tl = img[:, 1:h + 1, 1:w + 1, 0]
    tr = img[:, 1:h + 1, 0:w, 1]
    bl = img[:, 0:h, 1:w + 1, 2]
    br = img[:, 0:h, 0:w, 3]
    return tl + tr + bl + br


def gather_event_flow(flow_map, events, res):
    """Per-event flow lookup from a dense flow map
    (reference: utils/iwe.py:108-119, loss/flow.py:64-84).

    flow_map: [B, H, W, 2] with channels (x, y) — the model predicts
    (x, y) displacement (reference model contract, models/model.py:107).
    events:   [B, N, 4]; coordinates are integer pixel locations.
    Returns [B, N, 2] per-event flow as (y, x) — note the reference swaps
    components during the gather (iwe.py:115-119: event_flow = [flowy, flowx]).
    """
    h, w = res
    lin = (
        events[..., 1].astype(jnp.int32) * w + events[..., 2].astype(jnp.int32)
    )
    lin = jnp.clip(lin, 0, h * w - 1)
    flat = flow_map.reshape(flow_map.shape[0], h * w, 2)
    g = jnp.take_along_axis(flat, lin[..., None], axis=1)  # [B, N, 2] (x, y)
    return g[..., ::-1]  # -> (y, x)


def deblur_events(flow_map, event_list, res, flow_scaling=128, round_idx=True,
                  polarity_mask=None):
    """Warp events to tref=1 with per-event flow gathered from ``flow_map``
    and scatter an IWE [B, H, W, 1] (reference: utils/iwe.py:95-129)."""
    event_flow = gather_event_flow(flow_map, event_list, res)
    idx, weights = get_interpolation(
        event_list, event_flow, 1.0, res, flow_scaling, round_idx=round_idx
    )
    if not round_idx and polarity_mask is not None:
        polarity_mask = jnp.concatenate([polarity_mask] * 4, axis=1)
    return interpolate(idx, weights, res, polarity_mask=polarity_mask)


def compute_pol_iwe(flow_map, event_list, res, pos_mask, neg_mask,
                    flow_scaling=128, round_idx=True):
    """Per-polarity IWE [B, H, W, 2] (reference: utils/iwe.py:132-153)."""
    event_flow = gather_event_flow(flow_map, event_list, res)
    idx, weights = get_interpolation(
        event_list, event_flow, 1.0, res, flow_scaling, round_idx=round_idx
    )
    if not round_idx:
        pos_mask = jnp.concatenate([pos_mask] * 4, axis=1)
        neg_mask = jnp.concatenate([neg_mask] * 4, axis=1)
    stack = jnp.concatenate([weights * pos_mask, weights * neg_mask], axis=-1)
    return interpolate_multi(idx, stack, res)
