"""Synthetic dataset fixture: random lip ROIs + sine audio + short transcripts
(the end-to-end CPU test substrate called for in SURVEY.md §4)."""

import os

import numpy as np
import pandas as pd


TOKENS = ["<blank>", "<unk>", "<space>"] + list("ABCDEFGHIJ") + ["<sos/eos>"]
WORDS = ["ABA", "CAD", "BIG", "DIG", "FACE", "HID"]


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
        tone = np.sin(2 * np.pi * (200 + 50 * i) * np.arange(samples) / sr)
        wav = (tone * 0.3 * 32767).astype(np.int16)
        wav_path = os.path.join(root, "wav", f"s{i}.wav")
        wavfile.write(wav_path, sr, wav)
        roi = (rng.rand(frames, 96, 96) * 250).astype(np.float32)
        roi_path = os.path.join(root, "roi", f"s{i}.npz")
        np.savez(roi_path, data=roi)
        text = " ".join(rng.choice(WORDS, size=rng.randint(1, 3)))
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
