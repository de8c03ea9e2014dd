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


def tp_param_spec(path, x, model_parallel: int) -> P:
    """Megatron-style tensor-parallel PartitionSpec for one parameter.

    Column-parallel (output dim over 'model'): the OPENING matmul of each
    FFN/cgMLP pair and the attention q/k/v/pos projections — their outputs
    stay sharded through the elementwise middle. Row-parallel (input dim
    over 'model'): the CLOSING matmul (w_2 / channel_proj2 / linear_out) —
    XLA inserts the psum over 'model' after it. Per-head rel-pos u/v biases
    shard over the head axis. Everything else replicates (the models are
    43-104M params — SURVEY.md §2.4 keeps TP optional headroom).

    Works on any pytree whose path CONTAINS the parameter names — optimizer
    moment trees (optax mu/nu) carry the same path suffix as params, so the
    same rule shards them consistently.
    """
    if model_parallel <= 1 or not hasattr(x, "ndim"):
        return P()
    names = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
    if x.ndim == 2 and x.shape[-1] % model_parallel == 0 and (
        "w_1" in names
        or "channel_proj1" in names
        or "linear_q" in names
        or "linear_k" in names
        or "linear_v" in names
        or "linear_pos" in names
    ):
        return P(None, "model")
    if x.ndim == 2 and x.shape[0] % model_parallel == 0 and (
        "w_2" in names or "channel_proj2" in names or "linear_out" in names
    ):
        return P("model", None)
    if x.ndim == 2 and (
        "pos_bias_u" in names or "pos_bias_v" in names
    ) and x.shape[0] % model_parallel == 0:
        return P("model", None)  # (heads, d_k): shard over heads
    return P()  # replicate


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState on the mesh: params and optimizer moments get the
    tensor-parallel specs (``tp_param_spec`` — with model_parallel == 1 that
    degenerates to full replication, i.e. plain data parallelism), batch
    stats and step replicate.

    The optimizer state is sharded by the SAME path rules: optax moment
    trees (mu/nu) embed the parameter path, so each moment leaf lands on the
    same devices as its parameter — no replicated Adam state at TP > 1.
    """
    model_par = int(mesh.shape.get("model", 1))

    def place_tp(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, x: jax.device_put(
                x, NamedSharding(mesh, tp_param_spec(path, x, model_par))
            ) if hasattr(x, "ndim") else x,
            tree,
        )

    rep = NamedSharding(mesh, P())
    return state.replace(
        step=jax.device_put(state.step, rep),
        params=place_tp(state.params),
        batch_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state.batch_stats
        ),
        opt_state=place_tp(state.opt_state),
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
