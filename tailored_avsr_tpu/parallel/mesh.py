"""Device mesh construction and sharding rules (pjit data/model parallelism).

The reference has NO distributed runtime (SURVEY.md §2.4/§5.8: a vestigial
DataParallel hook, one pinned GPU). The TPU-native design replaces it with a
``jax.sharding.Mesh``:

- 1-D ('data',) mesh for parity-scale runs: batch sharded over data, params
  replicated; XLA inserts the gradient all-reduce over ICI.
- 2-D ('data', 'model') mesh kept open for tensor parallelism (the models are
  43-104M params, so TP is optional headroom, not a requirement).

Everything is expressed with NamedSharding constraints on jit boundaries —
no explicit collectives; XLA chooses ICI-riding all-reduces.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_pallas_over_data(call, mesh, batch: int, n_arrays: int, n_outs: int):
    """shard_map ``call`` (n leading batch-dim-0 array args + one trailing
    scalar) over the mesh's 'data' axis — or return it unchanged when there
    is no 'data' axis or the batch doesn't divide it.

    GSPMD has no partitioning rule for a pallas_call, so under a mesh the
    silent alternative is full operand replication; this keeps the beam
    decode's Pallas kernels (group attend, cache column writes) per-shard.
    Used by ops.attention.attend_kv_anc and decode.beam_search's cache
    writers — one source of truth for the specs and the check_vma stance.
    """
    if mesh is None or "data" not in mesh.shape or batch % mesh.shape["data"]:
        return call
    bs = P("data")
    # check_vma=False: pallas_call declares no varying-mesh-axes metadata,
    # so the replication checker cannot analyze it
    return jax.shard_map(
        call, mesh=mesh,
        in_specs=tuple([bs] * n_arrays) + (P(),),
        out_specs=bs if n_outs == 1 else tuple([bs] * n_outs),
        check_vma=False,
    )


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place array leaves with the leading (batch) axis split over 'data'."""
    sharding = NamedSharding(mesh, P("data"))

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_jit(fn, mesh: Mesh, donate_argnums=()):
    """jit a step so batch args arrive data-sharded and outputs replicate.

    With sharded inputs, plain jit under the mesh context lets XLA propagate
    shardings and insert the grad all-reduce; this helper just standardises
    the pattern.
    """

    jfn = jax.jit(fn, donate_argnums=donate_argnums)

    def wrapped(*args, **kwargs):
        with mesh:
            return jfn(*args, **kwargs)

    return wrapped
