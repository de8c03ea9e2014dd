"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4).

NB: this image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the
remote TPU tunnel), so a plain env default is not enough — we must override
the live jax config. CPU keeps tests hermetic and avoids tunnel compiles.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
