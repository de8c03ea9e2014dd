"""Greedy CTC decoding: best path -> collapse repeats -> drop blanks.

Host-side (numpy) — the argmax itself runs on-device in the model
(CTCHead.argmax); the collapse is O(T) string work.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def ctc_greedy_collapse(
    ids: np.ndarray, lengths: np.ndarray, blank_id: int = 0
) -> List[List[int]]:
    """(B, T) argmax ids + (B,) lengths -> list of collapsed token id lists."""
    ids = np.asarray(ids)
    lengths = np.asarray(lengths)
    out = []
    for b in range(ids.shape[0]):
        seq = ids[b, : int(lengths[b])]
        prev = -1
        toks = []
        for t in seq:
            t = int(t)
            if t != prev and t != blank_id:
                toks.append(t)
            prev = t
        out.append(toks)
    return out
