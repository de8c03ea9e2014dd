"""Backend dispatch for the TPU-only Pallas kernels.

One source of truth for "should the compiled Mosaic kernels run here" —
previously three call sites each tested ``platform != "cpu"``, which would
route a CUDA/ROCm backend onto TPU-only kernels and crash at lowering.

The test cannot be ``platform == "tpu"``: the build environment reaches its
chip through a tunnel plugin whose platform string is not "tpu" (e.g.
"axon"), while its device_kind still names the TPU generation. So: a
backend is kernel-capable unless it is a known non-TPU platform.
"""

from __future__ import annotations

import jax

_NON_TPU = ("cpu", "gpu", "cuda", "rocm", "metal")


def is_tpu_backend() -> bool:
    """True when the default backend should run compiled Pallas TPU kernels
    (interpret mode / XLA formulations are used otherwise)."""
    return jax.devices()[0].platform.lower() not in _NON_TPU
