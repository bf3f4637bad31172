"""Test configuration: run on a virtual 8-device CPU mesh.

This is the jax-native way to exercise multi-device sharding without TPU
hardware (SURVEY.md §4). The axon sitecustomize pre-imports jax with
JAX_PLATFORMS=axon, so plain env vars are too late — use jax.config.update,
and set XLA_FLAGS before any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() >= 8, jax.devices()
