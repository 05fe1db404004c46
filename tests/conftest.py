"""Test harness: run everything on CPU with 8 virtual devices so sharding
logic is exercised without TPU hardware (SURVEY.md §4).

NOTE: the axon sitecustomize force-registers the TPU backend and sets
``jax_platforms='axon,cpu'`` regardless of env vars, so we must override via
``jax.config`` AFTER importing jax but BEFORE any backend initialisation —
otherwise every test dispatch silently rides the TPU tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8
