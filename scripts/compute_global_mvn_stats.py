#!/usr/bin/env python
"""Corpus-level log-mel feature statistics for GlobalMVN.

espnet computes these in its collect-stats stage; the reference registers
GlobalMVN as a normalize choice (src/tasks/avsr.py:12-14). This streams a CSV
split through the log-mel frontend and writes {mean, std} arrays loadable into
the GlobalMVN 'stats' collection."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--output", required=True, help=".npz with mean/std")
    p.add_argument("--n-mels", type=int, default=80)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from tailored_avsr_tpu.data.dataset import load_wav
    from tailored_avsr_tpu.ops.frontend_audio import LogMelFrontend

    fe = LogMelFrontend(n_mels=args.n_mels)
    variables = fe.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1600)), jnp.array([1600])
    )
    extract = jax.jit(lambda w, l: fe.apply(variables, w, l))

    df = pd.read_csv(args.dataset)
    n, s, ss = 0, 0.0, 0.0
    for path in df["wav_path"]:
        wav = load_wav(path)
        feats, lens = extract(jnp.asarray(wav)[None], jnp.array([len(wav)]))
        f = np.asarray(feats[0, : int(lens[0])], np.float64)
        n += f.shape[0]
        s = s + f.sum(axis=0)
        ss = ss + np.square(f).sum(axis=0)
    mean = s / n
    std = np.sqrt(np.maximum(ss / n - mean ** 2, 1e-20))
    np.savez(args.output, mean=mean.astype(np.float32), std=std.astype(np.float32))
    print(f"wrote {args.output}: mean[:3]={mean[:3]}, std[:3]={std[:3]}, frames={n}")


if __name__ == "__main__":
    main()
