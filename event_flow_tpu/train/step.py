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
from ..ops.encodings import encode_windows_cf

__all__ = ["TrainState", "make_train_step", "make_sequence_forward"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    model_state: Any


def make_sequence_forward(model, res, num_bins, round_encoding=False,
                          remat=True, augment=True):
    """Build f(params, model_state, events, valid, aug_flags) ->
    (new_state, flows_per_scale [B,T,H,W,2], event_list, pol_mask, event_mask).

    events: [B, T, N, 4] raw windows (ts any scale, y, x, p in {-1,+1});
    valid: [B, T, N] mask; aug_flags: [B, 3].
    """

    def body(state, xt):
        params, (voxel_cf, cnt_cf) = xt[0], xt[1]
        # per-window NHWC transpose for the conv stack (one window's
        # working set; the T-stacked buffers stay channels-first)
        voxel = jnp.moveaxis(voxel_cf, 1, -1)
        cnt = jnp.moveaxis(cnt_cf, 1, -1)
        out, state = model.apply(params, voxel, cnt, state)
        # flow maps return as (u, v) scalar planes: a stacked [T,B,H,W,2]
        # buffer would lane-pad 64x on TPU
        flows = tuple((f[..., 0], f[..., 1]) for f in out["flow"])
        return state, flows

    if remat:
        body = jax.checkpoint(body)

    def sequence_forward(params, model_state, events, valid, aug_flags):
        # All T windows' encodings in ONE channels-first scatter, outside
        # the scan (30 serialized per-window TPU scatters otherwise).
        if augment:
            b, t, n, _ = events.shape
            events = augment_events(
                events.reshape(b, t * n, 4), aug_flags, res
            ).reshape(b, t, n, 4)
        enc = encode_windows_cf(events, res, num_bins, valid=valid,
                                round_ts=round_encoding)
        vox_t = jnp.moveaxis(enc["event_voxel"], 1, 0)  # [T,B,C,H,W]
        cnt_t = jnp.moveaxis(enc["event_cnt"], 1, 0)

        def scan_body(state, xs):
            return body(state, (params, xs))

        state, flows = jax.lax.scan(scan_body, model_state, (vox_t, cnt_t))
        # [T, B, H, W] -> [B, T, H, W] per plane; keep (u, v) tuple form
        flows = tuple(
            (jnp.moveaxis(u, 0, 1), jnp.moveaxis(v, 0, 1)) for u, v in flows
        )
        return (state, flows, enc["event_list"], enc["pol_mask"],
                enc["event_mask"])

    return sequence_forward


def make_train_step(model, optimizer, res, num_bins, loss_cfg: LossConfig,
                    round_encoding=False, remat=True, augment=True,
                    with_grad_stats=False):
    """Build the jittable train step.

    step(state: TrainState, events [B,T,N,4], valid [B,T,N],
         aug_flags [B,3], reset: bool/scalar) -> (TrainState, loss)
    With ``with_grad_stats``, returns (TrainState, loss, stats) where stats
    is a pytree of per-tensor (mean|g|, min|g|, max|g|) plus the global
    norm — the reference's gradient-health CSVs (utils/gradients.py:4-11).
    """
    seq_fwd = make_sequence_forward(
        model, res, num_bins, round_encoding=round_encoding, remat=remat,
        augment=augment,
    )

    def loss_fn(params, model_state, events, valid, aug_flags):
        new_state, flows, ev_list, pol, mask = seq_fwd(
            params, model_state, events, valid, aug_flags
        )
        loss = event_warping_loss(list(flows), ev_list, pol, mask, loss_cfg)
        return loss, new_state

    def train_step(state: TrainState, events, valid, aug_flags, reset):
        # masked state reset at sequence changes (train_flow.py:100-105)
        model_state = jax.tree_util.tree_map(
            lambda s: jnp.where(reset, jnp.zeros_like(s), s),
            state.model_state,
        )
        (loss, new_model_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, model_state, events, valid, aug_flags)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        # truncated BPTT boundary (train_flow.py:170)
        new_model_state = jax.lax.stop_gradient(new_model_state)
        new_state = TrainState(new_params, new_opt_state, new_model_state)
        if with_grad_stats:
            stats = jax.tree_util.tree_map(
                lambda g: jnp.stack(
                    [jnp.abs(g).mean(), jnp.abs(g).min(), jnp.abs(g).max()]
                ),
                grads,
            )
            gnorm = optax.global_norm(grads)
            return new_state, loss, (stats, gnorm)
        return new_state, loss

    return train_step


def init_train_state(model, optimizer, key, batch, res, num_bins):
    """Initialize params / optimizer / recurrent state for a model."""
    h, w = res
    model_state = model.zero_state(batch, h, w)
    voxel = jnp.zeros((batch, h, w, num_bins))
    cnt = jnp.zeros((batch, h, w, 2))
    params = model.init(key, voxel, cnt, model_state)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, model_state)
