#!/usr/bin/env python
"""Synthesize the white/pink noise WAV assets consumed by AddNoise.

The reference ships src/noise/{white,pink}_noise.wav (60 s, 16 kHz mono int16,
RMS ~10900, used by src/transforms/audio_transforms.py:74-139 for noise-robust
training/eval). Zero-egress build: we synthesize spectrally equivalent assets
instead of copying the binaries — white = flat PSD gaussian, pink = 1/f PSD
(log-log slope -1, matching the measured slope of the reference file).

Usage: python scripts/make_noise.py [outdir=assets/noise]
"""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)


import os
import sys
import wave

import numpy as np

SR = 16000
SECONDS = 60
RMS = 10900.0  # measured from the reference assets


def _write_wav(path: str, x: np.ndarray) -> None:
    x = np.clip(x, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(x.tobytes())


def white_noise(n: int, rng: np.random.RandomState) -> np.ndarray:
    x = rng.randn(n)
    return x / np.sqrt((x**2).mean()) * RMS


def pink_noise(n: int, rng: np.random.RandomState) -> np.ndarray:
    """1/f-power noise via rFFT spectral shaping (amplitude ~ f^-0.5)."""
    m = n // 2 + 1
    mag = np.zeros(m)
    f = np.fft.rfftfreq(n, 1.0 / SR)
    mag[1:] = f[1:] ** -0.5
    phase = rng.uniform(0, 2 * np.pi, m)
    spec = mag * np.exp(1j * phase)
    spec[0] = 0.0
    if n % 2 == 0:
        spec[-1] = spec[-1].real
    x = np.fft.irfft(spec, n)
    return x / np.sqrt((x**2).mean()) * RMS


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "assets/noise"
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.RandomState(0)
    n = SR * SECONDS
    _write_wav(os.path.join(outdir, "white_noise.wav"), white_noise(n, rng))
    _write_wav(os.path.join(outdir, "pink_noise.wav"), pink_noise(n, rng))
    print("wrote", outdir, "white/pink", n, "frames @", SR)


if __name__ == "__main__":
    main()
