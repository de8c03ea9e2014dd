"""AVSR embedding layers with the split embed / pos-enc API.

Capability parity with /root/reference/src/embedding_for_avsr/default.py:
audio uses Conv2dSubsampling without pos-enc (k=[3,3] s=[2,2]; x4 time
reduction so 100 Hz fbank frames land on the 25 fps video rate), video uses
Linear(512 -> d) + LayerNorm + Dropout. The API is split into
``apply_embed_layer`` (pre temporal alignment) and ``apply_pos_enc`` (post
alignment) so both streams share one positional index space
(ref default.py:140-162; enforced parity at src/tasks/avsr.py:613-615).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tailored_avsr_tpu.ops.posenc import (
    AbsolutePositionalEncoding,
    LegacyRelPositionalEncoding,
    RelPositionalEncoding,
    ScaledPositionalEncoding,
)
from tailored_avsr_tpu.ops.subsampling import Conv2dSubsampling, subsampled_length


class DefaultEmbeddingLayerForAVSR(nn.Module):
    output_size: int = 256
    input_layer: str = "conv2d"  # 'conv2d' (audio) | 'linear' (video)
    pos_enc_layer_type: str = "rel_pos"
    rel_pos_type: str = "latest"
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1

    def setup(self):
        if self.input_layer == "conv2d":
            self.embed_conv = Conv2dSubsampling(self.output_size, 4, name="embed_conv")
        elif self.input_layer == "linear":
            self.embed_linear = nn.Dense(self.output_size, name="embed_linear")
            self.embed_norm = nn.LayerNorm(name="embed_norm")
            self.embed_dropout = nn.Dropout(self.dropout_rate)
        else:
            raise ValueError(f"unknown input_layer: {self.input_layer}")
        pos_type = self.pos_enc_layer_type
        if self.rel_pos_type == "legacy" and pos_type == "rel_pos":
            pos_type = "legacy_rel_pos"
        self._pos_type = pos_type
        if pos_type == "rel_pos":
            self.pos_enc = RelPositionalEncoding(self.positional_dropout_rate)
        elif pos_type == "legacy_rel_pos":
            self.pos_enc = LegacyRelPositionalEncoding(self.positional_dropout_rate)
        elif pos_type == "abs_pos":
            self.pos_enc = AbsolutePositionalEncoding(self.positional_dropout_rate)
        elif pos_type == "scaled_abs_pos":
            self.pos_enc = ScaledPositionalEncoding(self.positional_dropout_rate)
        else:
            raise ValueError(self.pos_enc_layer_type)

    def apply_embed_layer(
        self, x: jnp.ndarray, lengths: jnp.ndarray, *, deterministic: bool = True
    ):
        """Project a stream to d_model BEFORE temporal alignment."""
        if self.input_layer == "conv2d":
            x = self.embed_conv(x)
            lengths = subsampled_length(lengths, 4)
        else:
            x = self.embed_norm(self.embed_linear(x))
            x = self.embed_dropout(x, deterministic=deterministic)
        return x, lengths

    def apply_pos_enc(self, x: jnp.ndarray, *, deterministic: bool = True):
        """Apply positional encoding AFTER alignment. Returns (x, pos_emb|None)."""
        if self._pos_type in ("rel_pos", "legacy_rel_pos"):
            return self.pos_enc(x, deterministic=deterministic)
        return self.pos_enc(x, deterministic=deterministic), None

    def __call__(self, x, lengths, *, deterministic: bool = True):
        # convenience: embed then pos-enc (used for param init)
        x, lengths = self.apply_embed_layer(x, lengths, deterministic=deterministic)
        x, pos = self.apply_pos_enc(x, deterministic=deterministic)
        return x, lengths, pos
