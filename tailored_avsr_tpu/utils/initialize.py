"""Parameter re-initialization (espnet ``initialize``).

Capability parity with espnet2.torch_utils.initialize as optionally invoked by
the reference task builders (/root/reference/src/tasks/avsr.py:713-715,
``init: xavier_uniform | xavier_normal | kaiming_uniform | kaiming_normal``):
re-draw every >=2-D kernel with the chosen scheme, zero the biases, reset
LayerNorm/BatchNorm scales to 1 / biases to 0 (embedding tables keep their
normal init, matching espnet's behavior).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

_INITS = {
    "xavier_uniform": jax.nn.initializers.xavier_uniform,
    "xavier_normal": jax.nn.initializers.xavier_normal,
    "kaiming_uniform": lambda: jax.nn.initializers.he_uniform(),
    "kaiming_normal": lambda: jax.nn.initializers.he_normal(),
}


def initialize(variables: Dict[str, Any], init: str, seed: int = 0) -> Dict[str, Any]:
    if init not in _INITS:
        raise ValueError(f"unknown init: {init} (choices: {sorted(_INITS)})")
    maker = _INITS[init]()
    rng = jax.random.PRNGKey(seed)

    def re_init(path, x):
        if not hasattr(x, "ndim"):
            return x
        name = str(getattr(path[-1], "key", path[-1]))
        # stable across processes/runs: Python's hash() is salted per
        # interpreter, which would desync multi-host replicas and break
        # seeded reproducibility
        import zlib

        path_str = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        key = jax.random.fold_in(rng, zlib.crc32(path_str.encode()) & 0x7FFFFFFF)
        if name == "kernel" and x.ndim >= 2:
            return maker(key, x.shape, x.dtype)
        if name in ("bias",):
            return jnp.zeros_like(x)
        if name == "scale":
            return jnp.ones_like(x)
        return x

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map_with_path(re_init, variables["params"])
    return out
