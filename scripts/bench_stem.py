#!/usr/bin/env python
"""Visual-stem roofline bench (VERDICT r2 item 7: a number, not an adjective).

Times the Conv3D(1->64, k=(5,7,7), s=(1,2,2)) + BN + swish + maxpool stem of
the visual frontend — the measured wall of the greedy graph (~52 ms of the
~137 ms frontend at batch 128, round 2) — in its three formulations, plus the
ResNet trunk for contrast, and prints the roofline floor the parked Pallas
stem would have to beat:

  floor = max(MXU time at peak with the C_out=64 lane padding,
              HBM time for input read + pooled output write)

Usage: PYTHONPATH=/root/.axon_site python scripts/bench_stem.py [--batch 128]
"""

from __future__ import annotations

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import argparse
import json
import time

import numpy as np


def timeit(fn, *args, iters=5):
    """Device-time only: block on completion without fetching the result.

    Fetching outputs (np.asarray) would ship hundreds of MB over the build
    tunnel and swamp the compute time by orders of magnitude.
    """
    import jax

    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as benchmod
    from tailored_avsr_tpu.models.frontends import Conv3dResNet18

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    peak = benchmod.peak_for(dev) or 0.0
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    b, t = args.batch, args.frames
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(b, t, 88, 88), dtype)
    lengths = jnp.full((b,), t, np.int32)

    results = {}
    for name, s2d in (("stem_s2d_full_frontend", True),
                      ("stem_plain_full_frontend", False)):
        fe = Conv3dResNet18(stem_s2d=s2d)
        variables = fe.init(jax.random.PRNGKey(0), video[:2], lengths[:2])
        if on_tpu:
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                variables,
            )
        fn = jax.jit(lambda v, l, vs=variables, m=fe: m.apply(vs, v, l))
        dt = timeit(fn, video, lengths)
        flops = benchmod.graph_flops(fn, video, lengths)
        results[name] = {
            "ms": round(dt * 1e3, 1),
            "tf_per_sec": round((flops or 0) / dt / 1e12, 1),
        }

    # stem-only (conv+BN+swish+pool), random weights — the isolated wall
    w = jnp.asarray(rng.randn(5, 7, 7, 1, 64) * 0.05, dtype)
    gamma = jnp.ones((64,), dtype)
    beta = jnp.zeros((64,), dtype)

    def stem_only(v):
        x = jax.lax.conv_general_dilated(
            v[..., None], w, window_strides=(1, 2, 2),
            padding=((2, 2), (3, 3), (3, 3)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        x = jax.nn.silu(x * gamma + beta)
        import flax.linen as nn

        return nn.max_pool(x, window_shape=(1, 3, 3), strides=(1, 2, 2),
                           padding=((0, 0), (1, 1), (1, 1)))

    fn = jax.jit(stem_only)
    dt = timeit(fn, video)
    flops = benchmod.graph_flops(fn, video)
    results["stem_only_plain"] = {
        "ms": round(dt * 1e3, 1),
        "tf_per_sec": round((flops or 0) / dt / 1e12, 1),
    }

    # roofline floor for any stem formulation at this shape
    n_img = b * t
    conv_flops = n_img * 44 * 44 * (5 * 7 * 7) * 64 * 2
    itemsize = jnp.dtype(dtype).itemsize
    bytes_in = n_img * 88 * 88 * itemsize
    bytes_out = n_img * 22 * 22 * 64 * itemsize
    hbm_gbps = 819.0 if on_tpu else 50.0  # v5e HBM
    mxu_ms = conv_flops / ((peak or 50.0) * 1e12) * (128 / 64) * 1e3
    hbm_ms = (bytes_in + bytes_out) / (hbm_gbps * 1e9) * 1e3
    results["roofline_floor"] = {
        "conv_gflops": round(conv_flops / 1e9, 1),
        "mxu_ms_at_cout64_padding": round(mxu_ms, 1),
        "hbm_ms": round(hbm_ms, 2),
        "floor_ms": round(max(mxu_ms, hbm_ms), 1),
    }
    print(json.dumps({"batch": b, "frames": t,
                      "dtype": jnp.dtype(dtype).name, **results}), flush=True)


if __name__ == "__main__":
    main()
