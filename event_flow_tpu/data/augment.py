"""On-device event augmentation.

Rebuild of the reference's host-side per-batch-slot augmentation
(reference: dataloader/base.py:88-146): horizontal / vertical / polarity
flips with per-slot Bernoulli flags redrawn at sequence changes. Here the
flags ship with the batch as a [B, 3] float mask and the flips are masked
arithmetic inside the jitted step (no host work, no recompilation).

Flag order: (Horizontal, Vertical, Polarity).
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["augment_events", "draw_augment_flags", "augment_flowmap_np",
           "augment_frames_np"]


def augment_events(events, flags, res):
    """events [B, N, 4] (ts, y, x, p); flags [B, 3] in {0,1}.
    Horizontal flips x (base.py:102-104), vertical flips y (:106-108),
    polarity negates p (:110-112)."""
    h, w = res
    fh = flags[:, 0:1]
    fv = flags[:, 1:2]
    fp = flags[:, 2:3]
    ts, ys, xs, ps = (events[..., i] for i in range(4))
    xs = jnp.where(fh > 0, (w - 1) - xs, xs)
    ys = jnp.where(fv > 0, (h - 1) - ys, ys)
    ps = jnp.where(fp > 0, -ps, ps)
    return jnp.stack([ts, ys, xs, ps], axis=-1)


def draw_augment_flags(rng, batch_size, mechanisms, probs):
    """Host-side flag draw (reference: base.py:29-32, :60-64). Returns
    [B, 3] float32 in canonical (H, V, P) order regardless of the config's
    mechanism order."""
    order = ["Horizontal", "Vertical", "Polarity"]
    flags = np.zeros((batch_size, 3), np.float32)
    for mech, p in zip(mechanisms, probs):
        if mech in order:
            col = order.index(mech)
            flags[:, col] = (rng.random(batch_size) < p).astype(np.float32)
    return flags


def augment_flowmap_np(flowmap, flags_row):
    """Host-side GT-flow augmentation with sign correction
    (reference: base.py:131-146). flowmap [2, H, W] (x, y); flags (h, v, p)."""
    fm = flowmap
    if flags_row[0] > 0:
        fm = np.flip(fm, 2).copy()
        fm[0] *= -1.0
    if flags_row[1] > 0:
        fm = np.flip(fm, 1).copy()
        fm[1] *= -1.0
    return fm


def augment_frames_np(img, flags_row):
    """Host-side APS-frame augmentation (reference: base.py:116-129)."""
    if flags_row[0] > 0:
        img = np.flip(img, 1)
    if flags_row[1] > 0:
        img = np.flip(img, 0)
    return img
