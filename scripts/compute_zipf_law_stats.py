#!/usr/bin/env python
"""Corpus word-frequency (Zipf) statistics + rank-frequency export.

Working replacement for /root/reference/src/scripts/compute_zipf_law_stats.py:
reads the transcriptions of a CSV split, reports vocabulary size, token count,
coverage quantiles, and the fitted Zipf exponent (log-log linear fit)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import csv
import os

import numpy as np
import pandas as pd


def zipf_stats(texts):
    counter = collections.Counter()
    for t in texts:
        counter.update(t.upper().split())
    freqs = np.asarray(sorted(counter.values(), reverse=True), np.float64)
    total = freqs.sum()
    ranks = np.arange(1, len(freqs) + 1, dtype=np.float64)
    slope, intercept = np.polyfit(np.log(ranks), np.log(freqs), 1)
    coverage50 = np.searchsorted(np.cumsum(freqs) / total, 0.5) + 1
    return {
        "vocab_size": len(freqs),
        "total_tokens": int(total),
        "zipf_exponent": float(-slope),
        "types_for_50pct_coverage": int(coverage50),
        "hapax_fraction": float(np.mean(freqs == 1)),
    }, counter


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--output-dir", default="")
    args = p.parse_args(argv)

    df = pd.read_csv(args.dataset)
    texts = []
    for path in df["transcription_path"]:
        with open(path, "r", encoding="utf-8") as f:
            texts.append(f.readline().strip())
    stats, counter = zipf_stats(texts)
    for k, v in stats.items():
        print(f"{k}: {v}")
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        out = os.path.join(args.output_dir, "word_freqs.csv")
        with open(out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["word", "count"])
            for word, c in counter.most_common():
                w.writerow([word, c])
        print(f"wrote {out}")
    return stats


if __name__ == "__main__":
    main()
