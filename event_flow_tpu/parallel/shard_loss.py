"""Explicit shard_map formulation of the contrast-max loss.

The annotation-based SPMD path (parallel/mesh.py) lets XLA choose where
to insert collectives for the event-axis sharding; this module is the
explicitly-programmed alternative from the scaling-book recipe: shard the
per-event axis with ``shard_map``, scatter each device's event shard into
local IWE accumulator images, and combine them with ONE ``psum`` over the
``event`` mesh axis per warp direction (loss/warping.py::_ts_image_loss).
The final batch-summed scalar psums over ``data``.

Why it can beat the annotated path: XLA's SPMD partitioner must reason
about the scatter op's sharding and may all-gather the *event operands*
(4 planes x M events) instead of all-reducing the much smaller [B,4,H,W]
accumulator images; the shard_map version pins the communication pattern
to the accumulator all-reduce by construction.

The per-event compute (warp, bilinear weights, gather) is embarrassingly
parallel over events — SURVEY.md §2.7's "long-sequence" axis for this
workload — so the only cross-device traffic is the image reduction.
"""

from functools import partial

from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map

    _CHECK_KW = {"check_vma": False}
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

    _CHECK_KW = {"check_rep": False}

from ..loss.warping import LossConfig, event_warping_loss

__all__ = ["make_sharded_loss"]


def make_sharded_loss(mesh, cfg: LossConfig, data_axis="data",
                      event_axis="event"):
    """Build loss(flow_maps, event_list, pol_mask, event_mask[, t_live])
    running under shard_map on ``mesh``.

    Sharding contract (matches parallel/mesh.py::shard_train_step):
      flow maps (u, v) [B,T,H,W]  -> P(data)        (replicated over event)
      event_list [B,T,N,4]        -> P(data, None, event)
      pol_mask   [B,T,N,2]        -> P(data, None, event)
      event_mask [B,T,H,W]        -> P(data)
    Returns a replicated scalar identical to the unsharded loss: invalid
    events carry zero pol_mask and out-of-bounds coordinates, so shard
    boundaries need no special casing.
    """
    mask_spec = P(data_axis)
    stack_spec = P(None, data_axis)  # [S*2, B, T, H, W]: batch on dim 1
    ev_spec = P(data_axis, None, event_axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(stack_spec, ev_spec, ev_spec, mask_spec, P()),
        out_specs=P(),
        # psum establishes replication; skip the static checker
        **_CHECK_KW,
    )
    def _sharded(uv_stack, event_list, pol_mask, event_mask, t_live):
        # flow maps travel as one stacked [S*2, B, T, H, W] array so the
        # in_specs stay a fixed 5-tuple for any number of scales
        flows = [(uv_stack[2 * s], uv_stack[2 * s + 1])
                 for s in range(uv_stack.shape[0] // 2)]
        return event_warping_loss(
            flows, event_list, pol_mask, event_mask, cfg, t_live=t_live,
            axes=(data_axis, event_axis),
        )

    def loss_fn(flow_maps, event_list, pol_mask, event_mask, t_live=None):
        import jax.numpy as jnp

        planes = []
        for fmap in flow_maps:
            u, v = (fmap[0], fmap[1]) if isinstance(fmap, (tuple, list)) \
                else (fmap[..., 0], fmap[..., 1])
            planes += [u, v]
        uv_stack = jnp.stack(planes)
        mask = event_mask[..., 0] if event_mask.ndim == 5 else event_mask
        if t_live is None:
            # traced all-live count is numerically identical to the static
            # path (max_ts == T, all-ones live mask) and keeps ONE shard_map
            t_live = jnp.asarray(event_list.shape[1])
        return _sharded(uv_stack, event_list, pol_mask, mask, t_live)

    return loss_fn
