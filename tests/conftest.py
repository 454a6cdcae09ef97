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
