#!/usr/bin/env python
"""Incremental mean/std of lip-ROI pixel values over a split.

Working replacement for /root/reference/src/scripts/compute_mean_std_rois.py:
streams every .npz in a CSV split, accumulating count/sum/sum-of-squares
(single pass, no full-corpus load). These statistics feed the second
Normalise(mean, std) video transform (avsr_main.py: (0.421, 0.165))."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import pandas as pd


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, help="CSV split path")
    p.add_argument("--scale", type=float, default=250.0,
                   help="pre-divide pixels (reference normalises /250 first)")
    args = p.parse_args(argv)

    df = pd.read_csv(args.dataset)
    n, s, ss = 0, 0.0, 0.0
    for path in df["lips_path"]:
        roi = np.load(path)["data"].astype(np.float64) / args.scale
        n += roi.size
        s += roi.sum()
        ss += np.square(roi).sum()
    mean = s / n
    std = np.sqrt(ss / n - mean ** 2)
    print(f"(mean, std) = ({mean:.3f}, {std:.3f}) over {n} pixels")
    return mean, std


if __name__ == "__main__":
    main()
