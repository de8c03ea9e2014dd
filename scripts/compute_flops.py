#!/usr/bin/env python
"""Parameter counts and forward-pass FLOPs of a configured model.

Working replacement for /root/reference/src/scripts/compute_flops.py (fvcore,
broken imports as shipped): uses XLA's own cost analysis of the jitted forward
graph — the number the TPU actually executes."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument("--seconds", type=float, default=4.0, help="utterance length")
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tailored_avsr_tpu.data import get_tokenizer_converter
    from tailored_avsr_tpu.tasks import ASRTask, AVSRTask
    from tailored_avsr_tpu.utils import load_config

    config = load_config(args.config_file)
    _, converter = get_tokenizer_converter(config)
    task_cls = AVSRTask if config.task == "avsr" else ASRTask
    model = task_cls.build_model(config, converter.token_list)

    b = args.batch_size
    frames = int(args.seconds * 25)
    samples = frames * 640
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(3, 20, (b, 10)), jnp.int32)
    tlens = jnp.full((b,), 10, jnp.int32)
    if config.task == "avsr":
        margs = (
            jnp.asarray(rng.randn(b, samples), jnp.float32),
            jnp.full((b,), samples, jnp.int32),
            jnp.asarray(rng.randn(b, frames, 88, 88), jnp.float32),
            jnp.full((b,), frames, jnp.int32),
            text, tlens,
        )
    elif config.task == "vsr":
        margs = (
            jnp.asarray(rng.randn(b, frames, 88, 88), jnp.float32),
            jnp.full((b,), frames, jnp.int32), text, tlens,
        )
    else:
        margs = (
            jnp.asarray(rng.randn(b, samples), jnp.float32),
            jnp.full((b,), samples, jnp.int32), text, tlens,
        )

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mlm": jax.random.PRNGKey(1)}, *margs
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"parameters: {n_params / 1e6:.2f}M")

    lowered = jax.jit(
        lambda v, *a: model.apply(v, *a, method="encode")
    ).lower(variables, *margs[:-2])
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    print(f"encode FLOPs ({args.seconds:.1f}s x batch {b}): {flops / 1e9:.2f} G")


if __name__ == "__main__":
    main()
