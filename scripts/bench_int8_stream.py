#!/usr/bin/env python
"""Does an int8 KV-cache actually halve HBM bytes/traffic on TPU?

The group cache's minor dim is dk=64; TPU tiles int8 at (32, 128) lanes, so a
(.., 64)-minor int8 array MIGHT be lane-padded 2x — erasing the byte savings
that motivate cache quantization. Measures (a) physical allocation via
device memory_stats, (b) streaming time of a Pallas reduction kernel over the
same logical shape in bf16 / int8 / int8-with-dk128."""

import _pathfix  # noqa: F401

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    dev = jax.devices()[0]

    def alloc_bytes(shape, dtype):
        before = dev.memory_stats()["bytes_in_use"]
        x = jax.device_put(np.zeros(shape, dtype))
        x.block_until_ready()
        after = dev.memory_stats()["bytes_in_use"]
        del x
        return after - before

    def stream_kernel(x_ref, o_ref):
        o_ref[0, 0] = jnp.sum(jnp.abs(x_ref[...].astype(jnp.float32)))

    def stream_time(shape, dtype, iters=20):
        x = jax.device_put(np.ones(shape, dtype))
        b = shape[0]

        f = pl.pallas_call(
            stream_kernel,
            grid=(b,),
            in_specs=[pl.BlockSpec(
                (1,) + shape[1:], lambda i: (i,) + (0,) * (len(shape) - 1))],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )
        f = jax.jit(f)
        np.asarray(f(x))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(f(x))
            times.append(time.perf_counter() - t0)
        return min(times)

    b, h, k, lc, dk = 96, 8, 10, 104, 64
    logical_bf16 = b * h * k * lc * dk * 2
    for name, shape, dtype in [
        ("bf16_dk64", (b, h, k, lc, dk), jnp.bfloat16),
        ("int8_dk64", (b, h, k, lc, dk), jnp.int8),
        ("int8_dk128", (b, h, k, lc // 2, dk * 2), jnp.int8),
        ("int8_flat", (b, h, k, lc * dk), jnp.int8),
    ]:
        ab = alloc_bytes(shape, np.dtype(str(dtype.dtype) if hasattr(dtype, "dtype") else dtype))
        dt = stream_time(shape, dtype)
        print(json.dumps({
            "case": name, "alloc_mb": round(ab / 2**20, 1),
            "logical_vs_bf16": round(ab / logical_bf16, 2),
            "stream_ms": round(dt * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
