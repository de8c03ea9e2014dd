#!/usr/bin/env python
"""Train a SentencePiece BPE tokenizer from a CSV split's transcriptions.

CLI mirror of /root/reference/src/tokenizers/spm/train_spm_model.py (same SPM
settings: user symbols <blank>,<sos/eos>, unk_id=1, no bos/eos/pad). Requires
the sentencepiece package (gated; char tokenizers need nothing)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

import pandas as pd

from tailored_avsr_tpu.data.tokenizer import train_spm_model


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--split-path", required=True)
    p.add_argument("--dst-spm-dir", required=True)
    p.add_argument("--spm-name", required=True)
    p.add_argument("--vocab-size", type=int, default=256)
    args = p.parse_args(argv)

    df = pd.read_csv(args.split_path)
    texts = []
    for path in df["transcription_path"]:
        with open(path, "r", encoding="utf-8") as f:
            texts.append(f.read())
    os.makedirs(args.dst_spm_dir, exist_ok=True)
    token_path = train_spm_model(
        texts, os.path.join(args.dst_spm_dir, args.spm_name), args.vocab_size
    )
    print(f"wrote {token_path}")


if __name__ == "__main__":
    main()
