"""SpecAugment: time warp + frequency masking + time masking.

Capability parity with espnet's ``SpecAug`` as configured by the reference
(/root/reference/configs/AVSR/tailored_transformer+ctc_spanish.yaml:18-32:
time_warp window 5, 2 freq masks width <=27, 5 time masks ratio <=0.05).

TPU-first: everything is static-shape. Masks are built from broadcasted iota
comparisons (no scatter); the time warp is a per-utterance piecewise-linear
index remap followed by linear interpolation (a static gather), rather than the
reference's dynamic-size bicubic `torch.nn.functional.interpolate` — the warp
distribution is the same (a random anchor in the warp window moves to a random
target), only the interpolation kernel differs, which is irrelevant for an
augmentation.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _rand_int(key, minval, maxval):
    """Uniform int in [minval, maxval); supports traced bounds via float trick."""
    u = jax.random.uniform(key)
    return (minval + u * (maxval - minval)).astype(jnp.int32)


def time_warp(x: jnp.ndarray, length: jnp.ndarray, window: int, key) -> jnp.ndarray:
    """Warp one utterance (T, F) along time within [0, length)."""
    t = x.shape[0]
    k1, k2 = jax.random.split(key)
    # anchor strictly inside (window, length - window); degenerate -> identity
    safe = length > 2 * window + 1
    center = _rand_int(k1, window + 1, jnp.maximum(length - window, window + 2))
    shift = jax.random.randint(k2, (), -window, window + 1)
    warped = jnp.clip(center + shift, 1, jnp.maximum(length - 1, 1))
    center = jnp.where(safe, center, 1)
    warped = jnp.where(safe, warped, 1)

    pos = jnp.arange(t, dtype=jnp.float32)
    lengthf = length.astype(jnp.float32)
    cf, wf = center.astype(jnp.float32), warped.astype(jnp.float32)
    # piecewise-linear map: [0, warped] -> [0, center], [warped, len) -> [center, len)
    src = jnp.where(
        pos < wf,
        pos * cf / jnp.maximum(wf, 1.0),
        cf + (pos - wf) * (lengthf - cf) / jnp.maximum(lengthf - wf, 1.0),
    )
    src = jnp.where(pos < lengthf, src, pos)  # leave padding untouched
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo + 1, 0, t - 1)
    frac = (src - lo.astype(jnp.float32))[:, None]
    return x[lo] * (1.0 - frac) + x[hi] * frac


def _iota_mask(t: int, start: jnp.ndarray, width: jnp.ndarray) -> jnp.ndarray:
    """(T,) bool — True inside [start, start+width)."""
    pos = jnp.arange(t)
    return (pos >= start) & (pos < start + width)


class SpecAug(nn.Module):
    apply_time_warp: bool = True
    time_warp_window: int = 5
    apply_freq_mask: bool = True
    freq_mask_width_range: tuple = (0, 27)
    num_freq_mask: int = 2
    apply_time_mask: bool = True
    time_mask_width_ratio_range: tuple = (0.0, 0.05)
    num_time_mask: int = 5
    mask_value: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray, *, deterministic: bool = False):
        """(B, T, F), (B,) -> same shapes, augmented. Needs 'specaug' rng."""
        if deterministic:
            return x, lengths
        b, t, f = x.shape
        key = self.make_rng("specaug")

        def augment_one(xi, li, ki):
            keys = jax.random.split(ki, 1 + self.num_freq_mask + 2 * self.num_time_mask)
            if self.apply_time_warp:
                xi = time_warp(xi, li, self.time_warp_window, keys[0])
            drop = jnp.zeros((t, f), dtype=bool)
            kidx = 1
            if self.apply_freq_mask:
                lo, hi = self.freq_mask_width_range
                for _ in range(self.num_freq_mask):
                    kw, ks = jax.random.split(keys[kidx])
                    kidx += 1
                    # espnet mask_along_axis draws widths from [lo, hi)
                    width = jax.random.randint(kw, (), lo, max(hi, lo + 1))
                    start = jax.random.randint(ks, (), 0, jnp.maximum(f - width, 1))
                    drop = drop | _iota_mask(f, start, width)[None, :]
            if self.apply_time_mask:
                rlo, rhi = self.time_mask_width_ratio_range
                for _ in range(self.num_time_mask):
                    kw, ks = keys[kidx], keys[kidx + 1]
                    kidx += 2
                    max_w = jnp.maximum((rhi * li.astype(jnp.float32)).astype(jnp.int32), 1)
                    min_w = (rlo * li.astype(jnp.float32)).astype(jnp.int32)
                    # [min_w, max_w) like espnet's variable-max-width mask
                    width = _rand_int(kw, min_w, jnp.maximum(max_w, min_w + 1))
                    start = _rand_int(ks, 0, jnp.maximum(li - width, 1))
                    drop = drop | _iota_mask(t, start, width)[:, None]
            return jnp.where(drop, self.mask_value, xi)

        keys = jax.random.split(key, b)
        x = jax.vmap(augment_one)(x, lengths, keys)
        return x, lengths
