"""Synthetic dataset fixture: random lip ROIs + tone-spelled audio + short
transcripts (the end-to-end CPU test substrate called for in SURVEY.md §4).

The audio "spells" the transcript: each character is a fixed-frequency tone
segment, segments laid out uniformly over the utterance. This makes the
corpus a REAL toy ASR task — time-local features align monotonically to the
output characters, so both CTC and decoder cross-attention have learnable
structure. (The original fixture used one constant tone per utterance; a
time-constant spectrum is annihilated by utterance MVN (norm_means subtracts
the per-bin time mean), which left the encoder memory carrying ~nothing —
found by scripts/diag_decoder_conditioning.py on the r5 flagship overfit,
where the decoder trained into an unconditional char LM.)"""

import os

import numpy as np
import pandas as pd


TOKENS = ["<blank>", "<unk>", "<space>"] + list("ABCDEFGHIJ") + ["<sos/eos>"]
WORDS = ["ABA", "CAD", "BIG", "DIG", "FACE", "HID"]

# per-character tone table: distinct, well-separated mel bins, all < 2 kHz
_CHAR_HZ = {c: 220.0 * (2.0 ** (k / 4.0))
            for k, c in enumerate(" ABCDEFGHIJ")}


def spell_tones(text, samples, sr=16000, rng=None):
    """Audio that spells ``text``: one equal-duration tone segment per char
    (10 ms cosine ramps between segments to avoid spectral splatter)."""
    chars = list(text)
    bounds = np.linspace(0, samples, len(chars) + 1).astype(int)
    wave = np.zeros(samples, np.float64)
    ramp = max(1, sr // 100)
    for c, lo, hi in zip(chars, bounds[:-1], bounds[1:]):
        t = np.arange(lo, hi) / sr
        seg = np.sin(2 * np.pi * _CHAR_HZ[c] * t)
        env = np.ones(hi - lo)
        k = min(ramp, len(env) // 2)
        if k > 0:
            edge = 0.5 - 0.5 * np.cos(np.pi * np.arange(k) / k)
            env[:k] *= edge
            env[-k:] *= edge[::-1]
        wave[lo:hi] = seg * env
    if rng is not None:  # a touch of noise so features aren't exactly banded
        wave = wave + 0.01 * rng.randn(samples)
    return wave


def make_synthetic_corpus(root, n=6, seed=0, fps=25, sr=16000, nframes=12):
    """Create WAVs, NPZ ROIs, transcriptions, a CSV split, and a token list."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    os.makedirs(os.path.join(root, "roi"), exist_ok=True)
    os.makedirs(os.path.join(root, "txt"), exist_ok=True)
    from scipy.io import wavfile

    rows = []
    for i in range(n):
        frames = nframes + rng.randint(-3, 4)
        samples = frames * (sr // fps)
        text = " ".join(rng.choice(WORDS, size=rng.randint(1, 3)))
        tone = spell_tones(text, samples, sr, rng)
        wav = (tone * 0.3 * 32767).astype(np.int16)
        wav_path = os.path.join(root, "wav", f"s{i}.wav")
        wavfile.write(wav_path, sr, wav)
        roi = (rng.rand(frames, 96, 96) * 250).astype(np.float32)
        roi_path = os.path.join(root, "roi", f"s{i}.npz")
        np.savez(roi_path, data=roi)
        txt_path = os.path.join(root, "txt", f"s{i}.txt")
        with open(txt_path, "w") as f:
            f.write(text + "\n")
        rows.append(
            dict(
                database="synthetic",
                sampleID=f"s{i}",
                nframes=frames,
                wav_path=wav_path,
                lips_path=roi_path,
                transcription_path=txt_path,
                delimiter=",",
                text_enc="utf-8",
            )
        )
    csv_path = os.path.join(root, "split.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    token_path = os.path.join(root, "tokens.txt")
    with open(token_path, "w") as f:
        f.write("\n".join(TOKENS) + "\n")
    return csv_path, token_path
