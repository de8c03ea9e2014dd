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

# persistent compiled-executable cache shared by every CLI in this image: a
# flagship graph re-compile through the axon remote-compile path costs
# 10-25 min, a cache hit ~2 min (measured: overfit v6 epoch-1 157 s vs v5
# cold 25 min). jax reads the env var at first compile, so setting it here
# (before any jit) is sufficient.
_cache = _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_r5")
try:
    _os.makedirs(_cache, exist_ok=True)
except OSError:
    pass

_want = _os.environ.get("JAX_PLATFORMS")
if _want:
    import jax as _jax

    if _jax.config.jax_platforms != _want:
        _jax.config.update("jax_platforms", _want)
