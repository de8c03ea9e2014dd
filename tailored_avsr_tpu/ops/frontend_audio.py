"""Audio frontend: waveform -> STFT -> power -> log-mel filterbank.

Capability parity with espnet's ``DefaultFrontend`` (Stft + LogMel) as
configured by the reference (/root/reference/configs/AVSR/
tailored_transformer+ctc_spanish.yaml:11-15 — n_fft 512, win 400, hop 160,
80 mels @ 16 kHz; import site src/tasks/avsr.py:17-21).

TPU-first: framing is a single static gather built from iota indices, the rFFT
runs as a batched ``jnp.fft.rfft`` over (B*T', n_fft), and the mel projection is
one (B*T', 257) x (257, 80) matmul on the MXU. The mel matrix (HTK-false,
Slaney-normalized, matching librosa/espnet defaults) is constant-folded.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax.numpy as jnp


def hann_window(win_length: int) -> np.ndarray:
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """(n_fft//2+1, n_mels) Slaney-style mel filterbank (librosa-compatible)."""
    if fmax is None:
        fmax = sr / 2.0

    def hz_to_mel(f):
        # Slaney scale: linear below 1 kHz, log above
        f = np.asarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mel = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        fsafe = np.maximum(f, 1e-10)
        return np.where(
            f >= min_log_hz, min_log_mel + np.log(fsafe / min_log_hz) / logstep, mel
        )

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        f = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)

    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2.0, n_freqs)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    weights = np.zeros((n_mels, n_freqs), dtype=np.float64)
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: each filter integrates to ~equal energy
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_freqs, n_mels)


def stft_frames(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Center-padded framing: (B, S) -> (B, T', n_fft) with reflect padding."""
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    )
    return x[:, idx]  # (B, T', n_fft)


def stft_num_frames(num_samples, hop_length: int):
    """torch.stft center=True frame count: 1 + floor(S / hop)."""
    return num_samples // hop_length + 1


class LogMelFrontend(nn.Module):
    fs: int = 16000
    n_fft: int = 512
    win_length: int = 400
    hop_length: int = 160
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = None
    log_floor: float = 1e-10

    def output_size(self) -> int:
        return self.n_mels

    @nn.compact
    def __call__(self, speech: jnp.ndarray, lengths: jnp.ndarray):
        """(B, S) float waveform, (B,) sample lengths -> (B, T', n_mels), (B,) T' lens."""
        window = hann_window(self.win_length)
        lpad = (self.n_fft - self.win_length) // 2
        window = np.pad(window, (lpad, self.n_fft - self.win_length - lpad))
        frames = stft_frames(speech.astype(jnp.float32), self.n_fft, self.hop_length)
        frames = frames * jnp.asarray(window)[None, None, :]
        spec = jnp.fft.rfft(frames, n=self.n_fft, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (B, T', n_fft//2+1)
        mel_mat = jnp.asarray(
            mel_filterbank(self.fs, self.n_fft, self.n_mels, self.fmin, self.fmax)
        )
        mel = jnp.maximum(power @ mel_mat, self.log_floor)
        logmel = jnp.log(mel)
        out_lens = stft_num_frames(lengths, self.hop_length).astype(jnp.int32)
        # The FFT chain runs f32 regardless of input dtype; hand the compute
        # dtype (= the input dtype) back to the encoder so a bf16 graph stays
        # bf16 downstream of the frontend.
        return logmel.astype(speech.dtype), out_lens


class SlidingWindowFrontend(nn.Module):
    """Raw-waveform sliding-window frontend (espnet ``SlidingWindow`` choice,
    registered by the reference at src/tasks/avsr.py:81-92): frames the raw
    samples into (B, T', win_length) feature vectors with no transform."""

    win_length: int = 400
    hop_length: int = 160

    def output_size(self) -> int:
        return self.win_length

    @nn.compact
    def __call__(self, speech: jnp.ndarray, lengths: jnp.ndarray):
        n_frames = 1 + (speech.shape[-1] - self.win_length) // self.hop_length
        idx = (
            jnp.arange(n_frames, dtype=jnp.int32)[:, None] * self.hop_length
            + jnp.arange(self.win_length, dtype=jnp.int32)[None, :]
        )
        frames = speech[:, idx]  # pure gather: keeps the input compute dtype
        out_lens = jnp.maximum(
            1 + (lengths - self.win_length) // self.hop_length, 0
        ).astype(jnp.int32)
        return frames, out_lens


class FusedFrontend(nn.Module):
    """Multiple audio frontends fused on the feature axis (espnet
    ``FusedFrontends``, registered by the reference at src/tasks/asr.py:55,99
    and src/tasks/avsr.py — ``frontend: fused``).

    Each entry of ``frontends`` is that sub-frontend's config with a
    ``frontend_type`` key (``default`` | ``sliding_window``; the external-
    pretrained types s3prl/whisper stay gated — zero-egress build). Alignment
    follows espnet's ``linear_projection`` method: with g = gcd of the hop
    lengths and factor_i = hop_i // g, each sub-frontend's (B, T_i, D_i)
    features project through a learned Dense to factor_i * proj_dim and
    reshape to the common frame rate (B, T_i * factor_i, proj_dim); all
    streams truncate to the shortest and concatenate, so
    ``output_size() == len(frontends) * proj_dim``.
    """

    frontends: tuple = ()
    align_method: str = "linear_projection"
    proj_dim: int = 100

    def setup(self):
        if self.align_method != "linear_projection":
            raise NotImplementedError(
                f"fused frontend align_method={self.align_method!r}: espnet "
                "and this port implement only 'linear_projection'"
            )
        if not self.frontends:
            raise ValueError("fused frontend needs at least one sub-frontend")
        subs = []
        for conf in self.frontends:
            conf = dict(conf)
            kind = conf.pop("frontend_type", "default")
            if kind == "default":
                keep = ("fs", "n_fft", "win_length", "hop_length", "n_mels",
                        "fmin", "fmax")
                subs.append(LogMelFrontend(
                    **{k: v for k, v in conf.items() if k in keep}))
            elif kind == "sliding_window":
                keep = ("win_length", "hop_length")
                subs.append(SlidingWindowFrontend(
                    **{k: v for k, v in conf.items() if k in keep}))
            else:
                raise NotImplementedError(
                    f"fused sub-frontend '{kind}' needs external pretrained "
                    "weights, unavailable in this zero-egress build; use "
                    "'default' or 'sliding_window'"
                )
        self.subs = subs
        g = np.gcd.reduce([f.hop_length for f in subs])
        self.factors = tuple(int(f.hop_length // g) for f in subs)
        self.projections = [
            nn.Dense(self.factors[i] * self.proj_dim, name=f"proj{i}")
            for i in range(len(subs))
        ]

    def output_size(self) -> int:
        return len(self.frontends) * self.proj_dim

    def __call__(self, speech: jnp.ndarray, lengths: jnp.ndarray):
        feats, lens = [], []
        for sub, factor, proj in zip(self.subs, self.factors,
                                     self.projections):
            x, xl = sub(speech, lengths)  # (B, T_i, D_i)
            x = proj(x)  # (B, T_i, factor * proj_dim)
            b, t, _ = x.shape
            x = x.reshape(b, t * factor, self.proj_dim)
            feats.append(x)
            lens.append(xl * factor)
        m = min(x.shape[1] for x in feats)
        out = jnp.concatenate([x[:, :m, :] for x in feats], axis=-1)
        out_lens = jnp.minimum(
            jnp.stack([jnp.minimum(l, m) for l in lens], 0).min(0), m
        ).astype(jnp.int32)
        return out, out_lens
