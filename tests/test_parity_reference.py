"""Numerical parity against the reference PyTorch implementation.

These tests run the *actual* reference loss (mounted read-only at
/root/reference) on identical inputs and require near-bitwise agreement.
Skipped automatically when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)
torch = pytest.importorskip("torch")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from event_flow_tpu.data.synthetic import constant_flow_window  # noqa: E402
from event_flow_tpu.loss.warping import LossConfig, event_warping_loss  # noqa: E402
from event_flow_tpu.ops import iwe as jiwe  # noqa: E402

RES = (32, 32)


def _windows(t=3, n=300, vel=(2.0, -1.0), seed=7):
    rng = np.random.default_rng(seed)
    return [constant_flow_window(rng, n, RES, vel, sharp_points=12) for _ in range(t)]


def _rand_flow_maps(t, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.normal(0, 0.05, (2, *RES)).astype(np.float32) for _ in range(t)]


def _torch_inputs(wev):
    ev = torch.from_numpy(wev[None].copy())
    ps = ev[:, :, 3]
    pol = torch.stack([(ps > 0).float(), (ps < 0).float()], dim=2)
    mask = torch.zeros((1, 1, *RES))
    mask[0, 0, wev[:, 1].astype(int), wev[:, 2].astype(int)] = 1
    return ev, pol, mask


def test_event_warping_loss_matches_reference():
    from loss.flow import EventWarping  # reference

    wins = _windows()
    fmaps = _rand_flow_maps(len(wins))

    config = {
        "loader": {"resolution": list(RES)},
        "loss": {"flow_regul_weight": 0.01},
        "model": {"mask_output": True},
    }
    lf = EventWarping(config, torch.device("cpu"))
    for wev, fm in zip(wins, fmaps):
        ev, pol, mask = _torch_inputs(wev)
        lf.event_flow_association([torch.from_numpy(fm[None])], ev, pol, mask)
    ref_val = float(lf())

    # ours: [1, T, N, 4] events; flow maps [1, T, H, W, 2] NHWC
    ev_j = jnp.asarray(np.stack(wins))[None]
    pol_j = jnp.stack(
        [
            jnp.stack([(w[:, 3] > 0), (w[:, 3] < 0)], axis=-1).astype(jnp.float32)
            for w in wins
        ]
    )[None]
    mask_np = np.zeros((1, len(wins), *RES, 1), np.float32)
    for t, w in enumerate(wins):
        mask_np[0, t, w[:, 1].astype(int), w[:, 2].astype(int), 0] = 1
    fmap_j = jnp.asarray(
        np.stack([np.moveaxis(f, 0, -1) for f in fmaps])
    )[None]  # [1,T,H,W,2]

    cfg = LossConfig(RES, float(max(RES)), 0.01, smoothing_mask=True)
    ours = float(
        event_warping_loss([fmap_j], ev_j, pol_j, jnp.asarray(mask_np), cfg)
    )
    np.testing.assert_allclose(ours, ref_val, rtol=1e-4)


def test_get_interpolation_matches_reference():
    from utils.iwe import get_interpolation as ref_interp

    wins = _windows(t=1)
    wev = wins[0]
    rng = np.random.default_rng(0)
    eflow = rng.normal(0, 0.03, (wev.shape[0], 2)).astype(np.float32)

    ridx, rw = ref_interp(
        torch.from_numpy(wev[None].copy()),
        torch.from_numpy(eflow[None]),
        1, list(RES), 32, round_idx=False,
    )
    jidx, jw = jiwe.get_interpolation(
        jnp.asarray(wev)[None], jnp.asarray(eflow)[None], 1.0, RES, 32,
        round_idx=False,
    )
    np.testing.assert_allclose(np.asarray(jw)[..., 0], rw[..., 0].numpy(), atol=1e-5)
    # where weights are nonzero, the linearized indices must agree
    nz = rw[..., 0].numpy() > 1e-7
    np.testing.assert_array_equal(
        np.asarray(jidx)[nz], ridx[..., 0].numpy().astype(np.int64)[nz]
    )


def test_compute_pol_iwe_matches_reference():
    from utils.iwe import compute_pol_iwe as ref_pol_iwe

    wins = _windows(t=1)
    wev = wins[0]
    fm = _rand_flow_maps(1)[0]

    ev, pol, _ = _torch_inputs(wev)
    ref = ref_pol_iwe(
        torch.from_numpy(fm[None]), ev, list(RES),
        pol[:, :, 0:1], pol[:, :, 1:2], flow_scaling=32, round_idx=True,
    ).numpy()  # [1,2,H,W]

    pol_j = jnp.stack(
        [(wev[:, 3] > 0), (wev[:, 3] < 0)], axis=-1
    ).astype(jnp.float32)[None]
    ours = jiwe.compute_pol_iwe(
        jnp.asarray(np.moveaxis(fm, 0, -1))[None], jnp.asarray(wev)[None], RES,
        pol_j[..., 0:1], pol_j[..., 1:2], flow_scaling=32, round_idx=True,
    )  # [1,H,W,2]
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 1), ref, atol=1e-5
    )
