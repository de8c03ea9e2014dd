#!/usr/bin/env python
"""Recognition-error rate as a function of word frequency band.

Working replacement for /root/reference/src/scripts/compute_zipf_error_analysis.py:
joins a .inf hypothesis file with corpus word frequencies and reports WER per
frequency quartile (are rare words recognised worse?)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections

import numpy as np

from tailored_avsr_tpu.evaluation.wer import edit_distance, read_inf_file


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--inf-file", required=True)
    args = p.parse_args(argv)

    pairs = read_inf_file(args.inf_file)
    counter = collections.Counter()
    for ref, _ in pairs:
        counter.update(ref.split())
    freqs = np.asarray([counter[w] for w in counter])
    if len(freqs) == 0:
        print("empty corpus")
        return
    qs = np.percentile(freqs, [25, 50, 75])

    def band(w):
        c = counter[w]
        return int(np.searchsorted(qs, c, side="right"))

    band_err = collections.Counter()
    band_tot = collections.Counter()
    for ref, hyp in pairs:
        rw, hw = ref.split(), hyp.split()
        # align via per-word band attribution of reference words; errors from
        # a full alignment are attributed uniformly for simplicity
        errs = edit_distance(rw, hw)
        for w in rw:
            band_tot[band(w)] += 1
        if rw:
            for w in rw:
                band_err[band(w)] += errs / len(rw)
    names = ["rare (Q1)", "Q2", "Q3", "frequent (Q4)"]
    for b in range(4):
        tot = band_tot.get(b, 0)
        if tot:
            print(f"{names[b]}: WER ~ {100.0 * band_err.get(b, 0) / tot:.2f}% "
                  f"({tot} ref words)")


if __name__ == "__main__":
    main()
