"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/collective tests exercise pjit/shard_map without TPU hardware
(SURVEY.md §4 item 4)."""

import os

# force CPU: the ambient environment presets JAX_PLATFORMS=axon (TPU);
# unit tests run on a virtual 8-device CPU mesh instead
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("EVFLOW_SCATTER_IMPL", "xla")

import jax  # noqa: E402

# the axon sitecustomize force-selects the TPU backend via jax.config, which
# overrides the env var — override it back after import
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import sys  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_reference_shared_kwargs():
    """The reference FireNet family mutates a CLASS-level shared kwargs
    list (reference: model.py:159, :171-173); reset it between tests so
    models built by one test don't leak neuron kwargs into another."""
    mod = sys.modules.get("models.model")
    if mod is not None:
        for obj in list(vars(mod).values()):
            if isinstance(obj, type) and "kwargs" in vars(obj):
                obj.kwargs = [{} for _ in obj.kwargs]
    yield
