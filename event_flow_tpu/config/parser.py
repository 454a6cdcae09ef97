"""YAML config system, byte-compatible with the reference's config schema.

Rebuild of the reference YAMLParser (reference: configs/parser.py:6-127):
same hard-coded defaults, same recursive merge-over-defaults, same
``spiking_neuron`` re-nesting under ``model``. The two sharp edges of the
reference are fixed (SURVEY.md §5): no ``eval()`` of config strings (stored
run params are parsed as YAML), and device selection is JAX-native.
"""

import copy

import numpy as np
import yaml

__all__ = ["default_config", "load_config", "merge_dicts", "YAMLConfig"]


def default_config():
    """Hard-coded defaults (reference: configs/parser.py:32-66)."""
    return {
        "experiment": "Default",
        "data": {"mode": "events", "window": 5000},
        "loader": {
            "resolution": [180, 240],
            "batch_size": 1,
            "augment": [],
            "gpu": 0,  # kept for config compatibility; unused on TPU
            "seed": 0,
        },
        "hot_filter": {
            "enabled": True,
            "max_px": 100,
            "min_obvs": 5,
            "max_rate": 0.8,
        },
        "model": {},
        "spiking_neuron": {},
        "vis": {"bars": False},
    }


def merge_dicts(src, dst):
    """Recursive merge of ``src`` into ``dst`` (reference: parser.py:72-81)."""
    for key, val in src.items():
        if isinstance(val, dict):
            node = dst.setdefault(key, {})
            if isinstance(node, dict):
                merge_dicts(val, node)
            else:
                dst[key] = copy.deepcopy(val)
        else:
            dst[key] = val
    return dst


def combine_entries(config):
    """Re-nest ``spiking_neuron`` under ``model`` (reference: parser.py:117-127;
    the split exists for MLflow's param char limit)."""
    if "spiking_neuron" in config:
        config["model"]["spiking_neuron"] = config.pop("spiking_neuron")
    return config


def load_config(path, combine=True):
    """Load a reference-schema YAML over the defaults."""
    with open(path) as fid:
        user = yaml.safe_load(fid) or {}
    cfg = default_config()
    merge_dicts(user, cfg)
    if combine:
        combine_entries(cfg)
    return cfg


class YAMLConfig:
    """Thin convenience wrapper mirroring the reference's YAMLParser API
    (``.config``, seeding, run-param merge)."""

    def __init__(self, path=None, combine=True):
        if path is None:
            self._config = combine_entries(default_config())
        else:
            self._config = load_config(path, combine=combine)
        self.init_seeds()

    @property
    def config(self):
        return self._config

    def init_seeds(self):
        np.random.seed(self._config["loader"].get("seed", 0))

    def merge_configs(self, stored_params):
        """Overlay stored run params (strings) with this config
        (reference: parser.py:98-115). Stored values are parsed with
        yaml.safe_load instead of eval()."""
        config = {}
        for key, val in stored_params.items():
            if isinstance(val, str):
                try:
                    config[key] = yaml.safe_load(val)
                except yaml.YAMLError:
                    config[key] = val
            else:
                config[key] = val
        merge_dicts(self._config, config)
        combine_entries(config)
        return config
