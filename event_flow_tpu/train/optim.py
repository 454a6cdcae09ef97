"""Optimizer registry (optax) — replaces the reference's
``eval(config["optimizer"]["name"])(params, lr)`` over ``torch.optim``
(reference: train_flow.py:86). Gradient clipping matches
``clip_grad_norm_`` (train_flow.py:157-158): global-norm clip applied to
the gradients before the optimizer update."""

import optax

__all__ = ["make_optimizer", "OPTIMIZERS"]

OPTIMIZERS = {
    "Adam": optax.adam,       # torch Adam defaults: b1=0.9, b2=0.999, eps=1e-8
    "AdamW": optax.adamw,
    "SGD": optax.sgd,
    "RMSprop": optax.rmsprop,
}


def make_optimizer(name, lr, clip_grad=None):
    if name not in OPTIMIZERS:
        raise KeyError(f"Unknown optimizer {name!r}; available: {sorted(OPTIMIZERS)}")
    tx = OPTIMIZERS[name](learning_rate=lr)
    if clip_grad is not None:
        tx = optax.chain(optax.clip_by_global_norm(float(clip_grad)), tx)
    return tx
