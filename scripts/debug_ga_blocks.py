#!/usr/bin/env python
"""Dump what the compiled kernel actually reads from its K and V blocks."""
import _pathfix  # noqa: F401

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(pos_ref, q_ref, knew_ref, vnew_ref, anc_ref, k_ref, v_ref,
                 kout_ref, vout_ref, qout_ref, ancout_ref):
    kout_ref[...] = k_ref[...]
    vout_ref[...] = v_ref[...]
    qout_ref[...] = q_ref[...]
    ancout_ref[...] = anc_ref[...]


def run(k, v, q, k_new, v_new, anc, pos):
    b, h, km, lc, dk = k.shape
    hb = h
    row3 = lambda i, j, pos_ref: (i, 0, 0)
    row = lambda i, j, pos_ref: (i, j, 0, 0)
    row5 = lambda i, j, pos_ref: (i, j, 0, 0, 0)
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hb),
            in_specs=[
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, km, lc), row3),
                pl.BlockSpec((1, hb, km, lc, dk), row5),
                pl.BlockSpec((1, hb, km, lc, dk), row5),
            ],
            out_specs=[
                pl.BlockSpec((1, hb, km, lc, dk), row5),
                pl.BlockSpec((1, hb, km, lc, dk), row5),
                pl.BlockSpec((1, hb, km, dk), row),
                pl.BlockSpec((1, km, lc), row3),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, km, lc, dk), k.dtype),
            jax.ShapeDtypeStruct((b, h, km, lc, dk), v.dtype),
            jax.ShapeDtypeStruct((b, h, km, dk), q.dtype),
            jax.ShapeDtypeStruct((b, km, lc), jnp.int32),
        ],
    )(jnp.asarray(pos, jnp.int32).reshape(1), q, k_new, v_new, anc, k, v)


def main():
    rng = np.random.RandomState(0)
    b, h, km, lc, dk = 2, 3, 4, 16, 64
    k = jnp.asarray(rng.randn(b, h, km, lc, dk), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, km, lc, dk), jnp.float32)
    q = jnp.asarray(rng.randn(b, h, km, dk), jnp.float32)
    kn = jnp.asarray(rng.randn(b, h, km, dk), jnp.float32)
    vn = jnp.asarray(rng.randn(b, h, km, dk), jnp.float32)
    anc = jnp.asarray(rng.randint(0, km, (b, km, lc)), jnp.int32)
    ko, vo, qo, ao = run(k, v, q, kn, vn, anc, 9)
    for name, got, want in [("k", ko, k), ("v", vo, v), ("q", qo, q),
                            ("anc", ao, anc)]:
        same = np.array_equal(np.asarray(got), np.asarray(want))
        print(f"{name} block round-trip exact: {same}")
        if not same:
            d = np.argwhere(np.asarray(got) != np.asarray(want))
            print(f"  mismatch count {len(d)}, first idx {d[0]}")


if __name__ == "__main__":
    main()
