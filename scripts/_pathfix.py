"""Bootstrap for scripts/ CLIs: repo root on sys.path + platform override.

Import this first (``import _pathfix``) — Python puts the script's own
directory on sys.path, so it resolves without any environment setup.

Two environment fixes in one place:
- puts the repo root on sys.path so ``tailored_avsr_tpu`` (and the top-level
  ``bench`` module) import without PYTHONPATH;
- honors an explicit ``JAX_PLATFORMS`` override: this image's sitecustomize
  pre-imports jax pinned to the axon TPU tunnel, so the env var alone is
  ignored once jax's config is set — CPU dress rehearsals
  (``JAX_PLATFORMS=cpu``) would otherwise silently hang on tunnel init.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

_want = _os.environ.get("JAX_PLATFORMS")
if _want:
    import jax as _jax

    if _jax.config.jax_platforms != _want:
        _jax.config.update("jax_platforms", _want)
