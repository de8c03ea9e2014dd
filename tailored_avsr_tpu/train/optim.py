"""Optimizers and LR schedules: Noam, OneCycle, Adam/AdamW (+ accumulation).

Capability parity with /root/reference/src/utils/scheduler.py and
src/schedulers/noam.py: Noam lr = factor * d^-0.5 * min(step^-0.5,
step * warmup^-1.5) wrapping Adam(b1=0.9, b2=0.98, eps=1e-9); OneCycle over
steps_per_epoch * epochs with grad-accumulation-aware step counts (:11-17);
optional grad clipping; accum_grad via optax.MultiSteps (averaged grads, the
same math as the reference's loss/accum_grad + summed backward).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(model_size: int, factor: float, warmup: int) -> optax.Schedule:
    def schedule(step):
        s = step + 1.0  # torch _LRScheduler starts at step 1
        return factor * model_size ** -0.5 * jnp.minimum(s ** -0.5, s * warmup ** -1.5)

    return schedule


def onecycle_schedule(
    peak_lr: float, total_steps: int, pct_start: float = 0.3
) -> optax.Schedule:
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1),
        peak_value=peak_lr,
        pct_start=pct_start,
    )


def set_optimizer(
    training_settings: dict,
    model_size: int,
    steps_per_epoch: int,
    frozen_mask=None,
):
    """Build (optax transform, schedule) from the reference's training_settings.

    Returns a MultiSteps-wrapped optimizer when accum_grad > 1. ``frozen_mask``
    is a pytree of bools (True = frozen) implementing freeze_e2e.
    """
    name = training_settings.get("optimizer", "adam")
    sched_name = training_settings.get("scheduler", "noam")
    lr = float(training_settings.get("learning_rate", 1e-3))
    accum = int(training_settings.get("accum_grad", 1))
    warmup = int(training_settings.get("warmup_steps", 25000))
    epochs = int(training_settings.get("epochs", 1))
    grad_clip = float(training_settings.get("grad_clip", -1.0))

    if sched_name == "noam":
        schedule = noam_schedule(
            model_size, float(training_settings.get("noam_factor", 1.0)), warmup
        )
        b1, b2, eps = 0.9, 0.98, 1e-9  # ref noam.py:72-81
    elif sched_name == "onecycle":
        total = max(1, steps_per_epoch // max(accum, 1)) * epochs
        schedule = onecycle_schedule(lr, total)
        b1, b2, eps = 0.9, 0.999, 1e-8
    elif sched_name in (None, "none", "constant"):
        schedule = optax.constant_schedule(lr)
        b1, b2, eps = 0.9, 0.999, 1e-8
    else:
        raise ValueError(f"unknown scheduler: {sched_name}")

    if name == "adam":
        tx = optax.adam(schedule, b1=b1, b2=b2, eps=eps)
    elif name == "adamw":
        tx = optax.adamw(
            schedule, b1=b1, b2=b2, eps=eps,
            weight_decay=float(training_settings.get("weight_decay", 0.01)),
        )
    else:
        raise ValueError(f"unknown optimizer: {name}")

    chain = []
    if frozen_mask is not None:
        # zero frozen-module gradients FIRST: the reference's
        # requires_grad=False means frozen params contribute nothing to the
        # global-norm clip and accumulate no optimizer moments (zeroing after
        # Adam would still let them inflate the clip norm and skew the
        # trainable parameters' updates)
        chain.append(optax.masked(optax.set_to_zero(), frozen_mask))
    if grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(tx)
    if frozen_mask is not None:
        # and zero the frozen UPDATES too (adamw's decoupled weight decay
        # would otherwise shrink frozen params even with zero gradients)
        chain.append(optax.masked(optax.set_to_zero(), frozen_mask))
    tx = optax.chain(*chain)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule
