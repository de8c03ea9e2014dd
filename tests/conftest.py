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


def pytest_configure(config):
    """Build native/libtasas.so (and the tasas CLI twins) when a compiler is
    available, so tests/test_data_eval.py's native golden test runs un-skipped
    in fresh checkouts (VERDICT r4 item 8)."""
    import shutil
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native = os.path.join(root, "native")
    if os.path.exists(os.path.join(native, "libtasas.so")):
        return
    if shutil.which("make") and (shutil.which("g++") or shutil.which("c++")):
        subprocess.run(["make", "-C", native], check=False, timeout=120,
                       capture_output=True)
