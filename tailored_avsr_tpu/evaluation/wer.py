"""WER/CER evaluation: edit distance, bootstrap CIs, .inf file protocol.

Capability parity with /root/reference/src/evaluation/bootstrap_wer.py and the
C tools it shells out to (tasas/tasasIntervalo): "ref#hyp" lines; '-s " "'
(word split) -> WER, no symbol separator -> CER; bootstrap mean ± 95% CI over
1000 resamples. The heavy lifting binds to the C++ twin (native/libtasas.so)
via ctypes when built; a pure-Python fallback keeps tests hermetic. Unlike the
reference's srand(time(0)), the bootstrap RNG is seedable.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libtasas.so",
)
_lib = None


def _native():
    global _lib
    if _lib is None and os.path.exists(_NATIVE_PATH):
        lib = ctypes.CDLL(_NATIVE_PATH)
        lib.tasas_error_rate.restype = ctypes.c_double
        lib.tasas_error_rate.argtypes = [ctypes.c_char_p] * 3
        lib.tasas_bootstrap.restype = ctypes.c_int
        lib.tasas_bootstrap.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    return _lib


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    n, m = len(ref), len(hyp)
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cur[j] = min(
                prev[j - 1] + (ref[i - 1] != hyp[j - 1]),
                prev[j] + 1,
                cur[j - 1] + 1,
            )
        prev = cur
    return prev[m]


def _split(s: str, words: bool) -> List:
    """Tokenization matching the reference C tools exactly (tasas.c): WER
    splits on the literal space character only; CER treats every BYTE of the
    UTF-8 encoding as a symbol (the reference binary is byte-oriented, so its
    published CERs on accented Spanish text count 2 edits for a wrong 'ñ' —
    the fallback must agree with the native twin, not improve on it)."""
    if words:
        return [w for w in s.split(" ") if w]
    return list(s.encode("utf-8"))


def error_rate(pairs: Sequence[Tuple[str, str]], words: bool = True) -> float:
    """Corpus error rate (%) over (ref, hyp) string pairs."""
    edits = total = 0
    for ref, hyp in pairs:
        r, h = _split(ref, words), _split(hyp, words)
        edits += edit_distance(r, h)
        total += len(r)
    return 100.0 * edits / total if total else 0.0


def bootstrap_error_rate(
    pairs: Sequence[Tuple[str, str]],
    words: bool = True,
    resamples: int = 1000,
    seed: int = 0,
) -> Tuple[float, float]:
    """Bootstrap mean ± 95% CI half-width (the tasasIntervalo protocol)."""
    if not pairs:
        raise ValueError(
            "no 'ref#hyp' pairs to score (empty or malformed .inf file)"
        )
    per_sent = []
    for ref, hyp in pairs:
        r, h = _split(ref, words), _split(hyp, words)
        per_sent.append((edit_distance(r, h), len(r)))
    per_sent = np.asarray(per_sent, np.int64)
    rng = np.random.RandomState(seed)
    n = len(per_sent)
    idx = rng.randint(0, n, size=(resamples, n))
    edits = per_sent[idx, 0].sum(axis=1)
    lens = np.maximum(per_sent[idx, 1].sum(axis=1), 1)
    rates = 100.0 * edits / lens
    lo, hi = np.percentile(rates, [2.5, 97.5])
    return float(rates.mean()), float((hi - lo) / 2.0)


def write_inf_file(path: str, pairs: Sequence[Tuple[str, str]]) -> None:
    """Write the reference's 'ref#hyp' .inf protocol."""
    with open(path, "w", encoding="utf-8") as f:
        for ref, hyp in pairs:
            f.write(f"{ref}#{hyp}\n")


def read_inf_file(path: str) -> List[Tuple[str, str]]:
    pairs = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if "#" in line:
                ref, hyp = line.split("#", 1)
                pairs.append((ref, hyp))
    return pairs


def compute_bootstrap_wer(
    path: str, resamples: int = 1000, seed: int = 0
) -> Tuple[float, float, float, float]:
    """(wer, cer, ci_wer, ci_cer) of a .inf file — the reference's
    bootstrap_wer.py contract. Uses the native C++ library when built."""
    lib = _native()
    if lib is not None:
        out = []
        for sep in (b" ", b""):
            mean = ctypes.c_double()
            ci = ctypes.c_double()
            rc = lib.tasas_bootstrap(
                path.encode(), b"#", sep, resamples, seed,
                ctypes.byref(mean), ctypes.byref(ci),
            )
            if rc != 0:
                raise ValueError(
                    f"tasas_bootstrap failed (rc={rc}) on {path!r} — "
                    "missing, empty, or malformed .inf file"
                )
            out.append((mean.value, ci.value))
        (wer, ci_wer), (cer, ci_cer) = out
        return wer, cer, ci_wer, ci_cer
    pairs = read_inf_file(path)
    wer, ci_wer = bootstrap_error_rate(pairs, words=True, resamples=resamples, seed=seed)
    cer, ci_cer = bootstrap_error_rate(pairs, words=False, resamples=resamples, seed=seed)
    return wer, cer, ci_wer, ci_cer


def cer_from_ids(
    refs: Sequence[Sequence[int]], hyps: Sequence[Sequence[int]]
) -> float:
    """Token-level error rate used for the train-time cer_ctc stat
    (ref espnet ErrorCalculator behavior on greedy CTC output)."""
    edits = total = 0
    for r, h in zip(refs, hyps):
        edits += edit_distance(list(r), list(h))
        total += len(r)
    return 100.0 * edits / total if total else 0.0
