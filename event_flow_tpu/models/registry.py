"""Explicit model registry — replaces the reference's
``eval(config["model"]["name"])`` pattern (reference: train_flow.py:81,
eval_flow.py:93; SURVEY.md §5 'sharp edges')."""

from .evflownet import UNET_VARIANTS, make_unet_model
from .firenet import FIRENET_VARIANTS, make_firenet

__all__ = ["get_model", "available_models"]

_FACTORIES = {}

for _name in FIRENET_VARIANTS:
    _FACTORIES[_name] = make_firenet
for _name in UNET_VARIANTS:
    _FACTORIES[_name] = make_unet_model


def register_model(name, factory):
    _FACTORIES[name] = factory


def available_models():
    return sorted(_FACTORIES)


def get_model(name, model_cfg):
    """Build a model by config name. ``model_cfg`` is the reference-schema
    ``config["model"]`` dict (with ``spiking_neuron`` nested)."""
    if name not in _FACTORIES:
        raise KeyError(
            f"Unknown model {name!r}; available: {available_models()}"
        )
    return _FACTORIES[name](name, model_cfg)
