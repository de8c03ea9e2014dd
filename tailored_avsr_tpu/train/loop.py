"""Jitted train/eval steps and the TrainState.

TPU-native counterpart of the reference's hand-rolled epoch loop
(/root/reference/avsr_main.py:27-82): one jitted train step (value_and_grad +
optax update, grad accumulation inside the optimizer), one jitted eval step
returning loss stats + greedy CTC ids for host-side CER (the checkpoint-
selection metric, ref avsr_main.py:218-230).

Data parallelism: steps are built mesh-aware — params/opt_state replicated,
batch sharded over the 'data' axis — via parallel/sharding helpers; on a
single device they degrade to plain jit.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables: Dict[str, Any], tx) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(
    model,
    tx,
    donate: bool = True,
    compute_dtype=None,
    remat: bool = False,
) -> Callable:
    """Returns jitted (state, batch_tuple, rng) -> (state, stats).

    ``compute_dtype`` (e.g. jnp.bfloat16) enables mixed precision: the f32
    master params are cast for the forward/backward (grad-of-cast casts the
    gradients back to f32), losses accumulate in f32 — the TPU-native
    replacement for the reference's dead AMP flag (SURVEY.md §2.4).

    ``remat`` wraps the forward in ``jax.checkpoint`` (matmul outputs kept,
    everything else rematerialized in the backward): activation memory drops
    to ~the matmul outputs, buying larger per-chip batches at ~1/3 extra
    forward FLOPs — the standard TPU memory/compute trade.
    """

    def _cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    def loss_fn(params, batch_stats, batch, rng):
        rngs = {
            name: jax.random.fold_in(rng, i)
            for i, name in enumerate(("dropout", "skip", "specaug", "mlm"))
        }
        params = _cast(params)
        batch = tuple(
            _cast(b) if hasattr(b, "dtype") and b.dtype == jnp.float32 else b
            for b in batch
        )
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            (loss, stats), new_vars = model.apply(
                variables, *batch, deterministic=False, rngs=rngs,
                mutable=["batch_stats"],
            )
            new_bs = new_vars.get("batch_stats", batch_stats)
        else:
            loss, stats = model.apply(
                variables, *batch, deterministic=False, rngs=rngs
            )
            new_bs = batch_stats
        return loss, (stats, new_bs)

    if remat:
        loss_fn = jax.checkpoint(
            loss_fn,
            policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
        )

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (stats, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        scalar_stats = {
            k: v for k, v in stats.items() if isinstance(v, jnp.ndarray) and v.ndim == 0
        }
        return new_state, scalar_stats

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model) -> Callable:
    """Returns jitted (state, batch_tuple) -> stats incl. greedy CTC ids."""

    def step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        loss, stats = model.apply(
            variables, *batch, deterministic=True, return_ctc_argmax=True
        )
        out = {
            k: v for k, v in stats.items() if isinstance(v, jnp.ndarray) and v.ndim == 0
        }
        out["ctc_argmax"] = stats["ctc_argmax"]
        out["ctc_argmax_lens"] = stats["ctc_argmax_lens"]
        return out

    return jax.jit(step)
