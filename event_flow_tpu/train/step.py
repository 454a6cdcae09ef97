"""The jitted training step: ``lax.scan`` over the loss window, BPTT,
optimizer update.

TPU-native rebuild of the reference's Python training loop
(reference: train_flow.py:97-171). The reference runs T=window_loss/window
(=10) forward passes accumulating autograd graph + loss state, then calls
``backward()``; here the T windows are a ``lax.scan`` inside ONE jitted
step, so XLA sees the whole BPTT graph: encodings, model, loss, gradients,
clip, Adam update — one compiled program per update, zero host round-trips.

State semantics:
  - model recurrent state is the scan carry across windows and is carried
    across steps (truncated BPTT: ``stop_gradient`` between steps replaces
    ``model.detach_states()``, train_flow.py:170)
  - a per-step ``reset`` flag zeroes the carried state, replacing
    ``model.reset_states()`` at sequence changes (train_flow.py:100-105)
  - per-window event encodings are computed on-device inside the scan
    (replaces the host-side DataLoader encodings, dataloader/base.py:148-222)
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..data.augment import augment_events
from ..loss.warping import LossConfig, event_warping_loss
from ..models.policy import cell_compute_dtype
from ..ops.encodings import encode_windows_cf

__all__ = ["TrainState", "make_train_step", "make_train_step_multi",
           "make_sequence_forward"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    model_state: Any


def _pack_state(tree):
    """Merge each state leaf's trailing (W, C) dims.

    TPU arrays tile their last two dims to (8, 128) lanes: an NHWC state
    leaf with C=32 lane-pads 4x in HBM, and the scan carry + its remat
    saves are materialized in that padded layout (measured: 14 saved
    carries x [10,8,128,128,32] = 9 GB instead of 2.2 GB at the training
    recipe, the main HBM-pressure/bandwidth cost of the backward). A
    [..., W*C] leaf has a large minor dim and is stored unpadded; the
    unpacked view inside the scan body fuses into its consumers."""
    return jax.tree_util.tree_map(
        lambda s: s.reshape(*s.shape[:-2], s.shape[-2] * s.shape[-1])
        if s.ndim >= 2 else s,
        tree,
    )


def _unpack_state(tree, template):
    return jax.tree_util.tree_map(
        lambda s, t: s.reshape(t.shape), tree, template
    )


def make_sequence_forward(model, res, num_bins, round_encoding=False,
                          remat=True, augment=True, with_cnt=False):
    """Build f(params, model_state, events, valid, aug_flags[, t_live]) ->
    (new_state, flows_per_scale [B,T,H,W,2], event_list, pol_mask, event_mask)
    (+ the channels-first [B,T,2,H,W] count images when ``with_cnt`` — for
    training-time visualization).

    events: [B, T, N, 4] raw windows (ts any scale, y, x, p in {-1,+1});
    valid: [B, T, N] mask; aug_flags: [B, 3].

    ``t_live`` (optional scalar) marks windows [t_live:] as PADDING: the
    recurrent state freezes through them and their (all-invalid) events
    contribute nothing to encodings/loss. This is how variable-length loss
    windows (time/gtflow training modes, where the reference gates updates
    on accumulated event count, train_flow.py:141) map onto a static-shape
    scan: the host pads to T_max and passes the live count. Genuinely
    empty-but-real windows (the <10-events zeroing, reference h5.py:235-239)
    are NOT frozen — the reference still runs the model on those.
    """

    state_template = [None]

    # Rematerialization policy for the scan body (EVFLOW_REMAT):
    #   'full' (default) — save only the carry, recompute the whole window
    #   forward in the backward pass (minimum HBM, maximum recompute);
    #   'dots' — save matmul/conv outputs, recompute elementwise only;
    #   'convs' — save only the named (compute-dtype) conv outputs;
    #   'none' — no remat, XLA saves what it wants.
    # Measured at the b8 recipe (bf16 cells + im2col convs, v5e):
    # convs 117-121 ms/update < full 125 < none 148 < dots 155. 'dots'
    # loses because XLA saves the f32 dot accumulators; 'convs' saves the
    # bf16-cast named outputs — half the bytes — and skips the conv
    # recompute. 'full' stays the library default (dtype-agnostic);
    # bench.py opts into 'convs' (844 vs 789 w/s end to end).
    import os

    remat_mode = os.environ.get("EVFLOW_REMAT", "full")

    def body(state, xt):
        params, (voxel_cf, cnt_cf, live) = xt[0], xt[1]
        # per-window NHWC transpose for the conv stack (one window's
        # working set; the T-stacked buffers stay channels-first)
        voxel = jnp.moveaxis(voxel_cf, 1, -1)
        cnt = jnp.moveaxis(cnt_cf, 1, -1)
        out, new_state = model.apply(
            params, voxel, cnt, _unpack_state(state, state_template[0])
        )
        new_state = _pack_state(new_state)
        if live is not None:
            new_state = jax.tree_util.tree_map(
                lambda n, o: jnp.where(live, n, o), new_state, state
            )
        # flow maps return as (u, v) scalar planes: a stacked [T,B,H,W,2]
        # buffer would lane-pad 64x on TPU. Cast to f32 at the model
        # boundary: the contrast-max loss always runs in f32 regardless of
        # the cell compute dtype (models/policy.py).
        flows = tuple(
            (f[..., 0].astype(jnp.float32), f[..., 1].astype(jnp.float32))
            for f in out["flow"]
        )
        return new_state, flows

    if remat and remat_mode != "none":
        if remat_mode == "dots":
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.dots_saveable
            )
        elif remat_mode == "convs":
            # save only the named conv outputs (models/conv.py) — in the
            # compute dtype, so bf16 cells save bf16 residuals — and
            # recompute just the elementwise dynamics in the backward
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out"),
            )
        else:
            body = jax.checkpoint(body)

    def sequence_forward(params, model_state, events, valid, aug_flags,
                         t_live=None):
        # All T windows' encodings in ONE channels-first scatter, outside
        # the scan (30 serialized per-window TPU scatters otherwise).
        b, t, n, _ = events.shape
        if augment:
            events = augment_events(
                events.reshape(b, t * n, 4), aug_flags, res
            ).reshape(b, t, n, 4)
        if t_live is not None:
            live_t = (jnp.arange(t) < t_live)
            valid = (jnp.ones((b, t, n)) if valid is None else valid) \
                * live_t[None, :, None]
        enc = encode_windows_cf(events, res, num_bins, valid=valid,
                                round_ts=round_encoding)
        # cell compute-precision boundary (models/policy.py): encodings and
        # recurrent state enter the scan in the policy dtype; flow maps
        # leave it in f32 (cast in ``body``) and the carried state is cast
        # back below so the external TrainState stays f32.
        cdtype = cell_compute_dtype()
        vox_t = jnp.moveaxis(enc["event_voxel"], 1, 0).astype(cdtype)
        cnt_t = jnp.moveaxis(enc["event_cnt"], 1, 0).astype(cdtype)
        model_state_c = jax.tree_util.tree_map(
            lambda s: s.astype(cdtype), model_state
        )

        def scan_body(state, xs):
            return body(state, (params, xs))

        state_template[0] = model_state_c
        xs = (vox_t, cnt_t, live_t if t_live is not None else None)
        state, flows = jax.lax.scan(
            scan_body, _pack_state(model_state_c), xs,
            unroll=int(os.environ.get("EVFLOW_SCAN_UNROLL", "1")),
        )
        state = _unpack_state(state, model_state_c)
        state = jax.tree_util.tree_map(
            lambda s, t: s.astype(t.dtype), state, model_state
        )
        # [T, B, H, W] -> [B, T, H, W] per plane; keep (u, v) tuple form
        flows = tuple(
            (jnp.moveaxis(u, 0, 1), jnp.moveaxis(v, 0, 1)) for u, v in flows
        )
        out = (state, flows, enc["event_list"], enc["pol_mask"],
               enc["event_mask"])
        if with_cnt:
            out += (enc["event_cnt"],)
        return out

    return sequence_forward


def make_train_step(model, optimizer, res, num_bins, loss_cfg: LossConfig,
                    round_encoding=False, remat=True, augment=True,
                    with_grad_stats=False, micro_batch=None, with_vis=False):
    """Build the jittable train step.

    step(state: TrainState, events [B,T,N,4], valid [B,T,N],
         aug_flags [B,3], reset: bool/scalar) -> (TrainState, loss)
    With ``with_grad_stats``, returns (TrainState, loss, stats) where stats
    is a pytree of per-tensor (mean|g|, min|g|, max|g|) plus the global
    norm — the reference's gradient-health CSVs (utils/gradients.py:4-11).

    ``with_vis``: additionally return a display dict — the last live
    window's flow map [B,H,W,2] (x, y), count image [B,H,W,2] and event
    mask [B,H,W,1] — for training-time visualization
    (reference: train_flow.py:164-177 ``vis.update``). Return becomes
    (state, loss, vis) / (state, loss, (stats, gnorm), vis).

    ``micro_batch``: process the batch in sequential chunks of this size,
    accumulating gradients, then apply ONE optimizer update. Numerically
    identical (the loss is a sum over batch, loss/flow.py:296-299 — so
    gradients add), but substantially faster at the training recipe's b8
    on TPU v5e: XLA's BPTT backward anti-scales with batch (measured
    2.55 ms/window at b8 vs 1.60 at b4 — layout-copy and fusion
    scheduling degrade with the larger working set), and micro-batching
    restores the b4 per-window rate while keeping the recipe semantics.
    """
    seq_fwd = make_sequence_forward(
        model, res, num_bins, round_encoding=round_encoding, remat=remat,
        augment=augment, with_cnt=with_vis,
    )

    def _last_live(x, t_live):
        """Index the last LIVE window on axis 1 ([B, T, ...])."""
        if t_live is None:
            return x[:, -1]
        idx = jnp.clip(t_live - 1, 0, x.shape[1] - 1)
        return jax.lax.dynamic_index_in_dim(x, idx, axis=1, keepdims=False)

    def loss_fn(params, model_state, events, valid, aug_flags, t_live):
        out = seq_fwd(
            params, model_state, events, valid, aug_flags, t_live=t_live
        )
        new_state, flows, ev_list, pol, mask = out[:5]
        loss = event_warping_loss(list(flows), ev_list, pol, mask, loss_cfg,
                                  t_live=t_live)
        if not with_vis:
            return loss, (new_state, None)
        u, v = flows[-1]
        m = mask[..., 0] if mask.ndim == 5 else mask
        vis = {
            # (x, y) component order like the reference flow maps
            "flow": jnp.stack([_last_live(u, t_live),
                               _last_live(v, t_live)], axis=-1),
            "event_cnt": jnp.moveaxis(
                _last_live(out[5], t_live), 1, -1),  # [B,2,H,W] -> NHWC
            "event_mask": _last_live(m, t_live)[..., None],
        }
        return loss, (new_state, jax.lax.stop_gradient(vis))

    def _value_and_grad(params, model_state, events, valid, aug_flags,
                        t_live):
        b = events.shape[0]
        if not micro_batch or micro_batch >= b or b % micro_batch:
            if micro_batch and micro_batch < b:
                import warnings

                warnings.warn(
                    f"micro_batch={micro_batch} does not divide "
                    f"batch={b}; gradient accumulation disabled — "
                    "running the full batch in one backward",
                    stacklevel=2,
                )
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, model_state, events, valid, aug_flags, t_live
            )
        k = b // micro_batch

        def chunk_leaf(x):
            # batch-first leaves split into k chunks; scalar placeholder
            # leaves (stateless cells) broadcast across chunks
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == b:
                return x.reshape(k, micro_batch, *x.shape[1:])
            return jnp.broadcast_to(x, (k, *jnp.shape(x)))

        def chunk(tree):
            return jax.tree_util.tree_map(chunk_leaf, tree)

        def body(carry, xs):
            loss_acc, grads_acc = carry
            ms, ev, va, ag = xs
            (loss, (new_ms, vis)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, ms, ev, va, ag, t_live)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (loss_acc + loss, grads_acc), (new_ms, vis)

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        (loss, grads), (new_ms, vis) = jax.lax.scan(
            body, (0.0, zero_grads),
            (chunk(model_state), chunk(events), chunk(valid),
             chunk(aug_flags)),
        )
        new_model_state = jax.tree_util.tree_map(
            lambda x, t: x.reshape(b, *x.shape[2:])
            if getattr(t, "ndim", 0) >= 1 and t.shape[0] == b else x[0],
            new_ms, model_state,
        )
        if vis is not None:
            # [k, micro_batch, ...] vis leaves -> [b, ...]
            vis = jax.tree_util.tree_map(
                lambda x: x.reshape(b, *x.shape[2:]), vis
            )
        return (loss, (new_model_state, vis)), grads

    def train_step(state: TrainState, events, valid, aug_flags, reset,
                   t_live=None):
        # masked state reset at sequence changes (train_flow.py:100-105)
        model_state = jax.tree_util.tree_map(
            lambda s: jnp.where(reset, jnp.zeros_like(s), s),
            state.model_state,
        )
        (loss, (new_model_state, vis)), grads = _value_and_grad(
            state.params, model_state, events, valid, aug_flags, t_live)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        # truncated BPTT boundary (train_flow.py:170)
        new_model_state = jax.lax.stop_gradient(new_model_state)
        new_state = TrainState(new_params, new_opt_state, new_model_state)
        out = (new_state, loss)
        if with_grad_stats:
            stats = jax.tree_util.tree_map(
                lambda g: jnp.stack(
                    [jnp.abs(g).mean(), jnp.abs(g).min(), jnp.abs(g).max()]
                ),
                grads,
            )
            out += ((stats, optax.global_norm(grads)),)
        if with_vis:
            out += (vis,)
        return out

    return train_step


def make_train_step_multi(model, optimizer, res, num_bins,
                          loss_cfg: LossConfig, **kwargs):
    """S chained optimizer updates in ONE dispatch.

    step(state, events [S,B,T,N,4], valid [S,B,T,N], aug [S,B,3],
         reset [S]) -> (state, losses [S])

    The host<->device dispatch round trip costs ~35 ms on a tunneled TPU
    (measured); per-update host reads cap throughput regardless of device
    speed. Scanning S updates inside one executable amortizes it to ~35/S
    ms — the host feeds S loss-windows of data and reads S losses back
    once.
    """
    assert "with_grad_stats" not in kwargs or not kwargs["with_grad_stats"]
    assert "with_vis" not in kwargs or not kwargs["with_vis"]
    step = make_train_step(model, optimizer, res, num_bins, loss_cfg,
                           **kwargs)

    def multi_step(state: TrainState, events, valid, aug_flags, resets):
        def body(st, xs):
            ev, va, aug, rs = xs
            st, loss = step(st, ev, va, aug, rs)
            return st, loss

        return jax.lax.scan(body, state, (events, valid, aug_flags, resets))

    return multi_step


def init_train_state(model, optimizer, key, batch, res, num_bins):
    """Initialize params / optimizer / recurrent state for a model."""
    h, w = res
    # zero_state tuples alias one zeros buffer across leaves (e.g. LIF's
    # (v, z)); donation (donate_argnums on the train step) rejects the
    # same buffer appearing twice, so materialize distinct leaves
    model_state = jax.tree_util.tree_map(
        lambda s: s.copy(), model.zero_state(batch, h, w)
    )
    voxel = jnp.zeros((batch, h, w, num_bins))
    cnt = jnp.zeros((batch, h, w, 2))
    params = model.init(key, voxel, cnt, model_state)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, model_state)
