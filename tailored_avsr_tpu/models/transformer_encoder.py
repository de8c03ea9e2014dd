"""Plain Transformer encoder + Longformer (local-window attention) variant.

Capability parity with the espnet encoder choices 'transformer' and
'longformer' registered by the reference's ASR task
(/root/reference/src/tasks/asr.py:145-166). The Transformer layer is the
standard pre-norm block (x += MHA(LN(x)); x += FFN(LN(x))); the Longformer
variant restricts self-attention to a per-layer local window (Longformer's
sliding-window attention) expressed as a banded (Tq, Tk) mask — at this
framework's sequence envelope (T <= 500 after subsampling, SURVEY.md §5.7)
the banded-mask formulation is both exact and MXU-friendly (one dense
attention per layer, no gather/scatter of chunks).

Both reuse the BranchformerEncoder scaffold (embeds, pos-enc, masking,
interCTC taps/conditioning).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from tailored_avsr_tpu.models.branchformer import BranchformerEncoder, _coin
from tailored_avsr_tpu.ops.attention import (
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)
from tailored_avsr_tpu.ops.feedforward import PositionwiseFeedForward


class TransformerEncoderLayer(nn.Module):
    size: int
    attention_heads: int = 4
    attention_layer_type: str = "selfattn"
    attention_dropout_rate: float = 0.0
    linear_units: int = 2048
    ffn_activation: str = "relu"
    dropout_rate: float = 0.1
    stochastic_depth_rate: float = 0.0
    attention_window: int = 0  # >0: Longformer local window (total width)
    use_flash: bool = False

    def setup(self):
        if self.attention_layer_type in ("rel_selfattn", "legacy_rel_selfattn"):
            self.self_attn = RelPositionMultiHeadedAttention(
                self.attention_heads, self.attention_dropout_rate,
                False, self.use_flash,
                legacy=self.attention_layer_type == "legacy_rel_selfattn",
                name="self_attn",
            )
        else:
            self.self_attn = MultiHeadedAttention(
                self.attention_heads, self.attention_dropout_rate, self.size,
                name="self_attn",
            )
        self.norm_mha = nn.LayerNorm()
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, self.ffn_activation,
            name="feed_forward",
        )
        self.norm_ff = nn.LayerNorm()
        self.dropout = nn.Dropout(self.dropout_rate)

    def _window_mask(self, mask: Optional[jnp.ndarray], t: int):
        """Intersect the validity mask with a banded local window."""
        if self.attention_window <= 0:
            return mask
        half = max(1, self.attention_window // 2)
        idx = jnp.arange(t)
        band = jnp.abs(idx[:, None] - idx[None, :]) <= half  # (Tq, Tk)
        if mask is None:
            return jnp.broadcast_to(band[None], (1, t, t))
        m = mask[:, None, :] if mask.ndim == 2 else mask
        return m & band[None]

    def __call__(
        self,
        x: jnp.ndarray,
        pos_emb: Optional[jnp.ndarray],
        mask: Optional[jnp.ndarray],
        *,
        deterministic: bool = True,
    ):
        skip = _coin(self, self.stochastic_depth_rate, deterministic)
        coeff = 1.0 if deterministic or self.stochastic_depth_rate == 0 else 1.0 / (
            1.0 - self.stochastic_depth_rate
        )
        x_in = x
        attn_mask = self._window_mask(mask, x.shape[1])
        h = self.norm_mha(x)
        if pos_emb is not None and self.attention_layer_type.endswith("rel_selfattn"):
            att = self.self_attn(
                h, h, h, pos_emb, attn_mask, deterministic=deterministic
            )
        else:
            att = self.self_attn(h, h, h, attn_mask, deterministic=deterministic)
        x = x + coeff * self.dropout(att, deterministic=deterministic)
        x = x + coeff * self.dropout(
            self.feed_forward(self.norm_ff(x), deterministic=deterministic),
            deterministic=deterministic,
        )
        x = jnp.where(skip, x_in, x)
        return x, {}


class TransformerEncoder(BranchformerEncoder):
    """espnet-style Transformer encoder on the Branchformer scaffold.

    Defaults mirror espnet's TransformerEncoder: absolute positional encoding
    + vanilla self-attention + ReLU FFN (the scaffold's rel_pos defaults are
    overridden by the task registry when this encoder is selected).
    """

    def _make_layer(self, i, cgmlp_weight, attn_branch_drop_rate, sdr):
        return TransformerEncoderLayer(
            size=self.output_size,
            attention_heads=self.attention_heads,
            attention_layer_type=self._att_type,
            attention_dropout_rate=self.attention_dropout_rate,
            linear_units=self.linear_units,
            ffn_activation=self.ffn_activation_type,
            dropout_rate=self.dropout_rate,
            stochastic_depth_rate=sdr,
            use_flash=self.use_flash,
            name=f"layer_{i}",
        )


class MultiSpeakerTransformerEncoder(TransformerEncoder):
    """Multi-speaker Transformer encoder (espnet 'transformer_multispkr'
    choice, /root/reference/src/tasks/asr.py:47-49): ``num_blocks`` shared
    recognition layers followed by ``num_inf`` speaker-dependent stacks of
    ``num_blocks_sd`` layers. Returns (B, num_inf, T, D) — one encoding per
    separated speaker, consumed by the PIT model.

    TPU-first note: the speaker stacks are independent, so they run as
    ``num_inf`` sequential layer chains within one jitted graph; XLA overlaps
    their matmuls freely (no host loop, no dynamic shapes).
    """

    num_inf: int = 2
    num_blocks_sd: int = 2

    def setup(self):
        super().setup()
        self.layers_sd = [
            [
                TransformerEncoderLayer(
                    size=self.output_size,
                    attention_heads=self.attention_heads,
                    attention_layer_type=self._att_type,
                    attention_dropout_rate=self.attention_dropout_rate,
                    linear_units=self.linear_units,
                    ffn_activation=self.ffn_activation_type,
                    dropout_rate=self.dropout_rate,
                    use_flash=self.use_flash,
                    name=f"sd{s}_layer_{i}",
                )
                for i in range(self.num_blocks_sd)
            ]
            for s in range(self.num_inf)
        ]

    def __call__(
        self,
        xs: jnp.ndarray,
        ilens: jnp.ndarray,
        *,
        deterministic: bool = True,
        ctc=None,
        max_layer=None,
    ):
        from tailored_avsr_tpu.ops.masking import make_valid_mask

        xs, ilens, pos_emb = self.embed_frames(xs, ilens, deterministic=deterministic)
        mask = make_valid_mask(ilens, xs.shape[1])
        for layer in self.layers:
            xs, _ = layer(xs, pos_emb, mask, deterministic=deterministic)
        outs = []
        for stack in self.layers_sd:
            h = xs
            for layer in stack:
                h, _ = layer(h, pos_emb, mask, deterministic=deterministic)
            if self.normalize_before:
                h = self.after_norm(h)
            outs.append(h)
        return jnp.stack(outs, axis=1), ilens, {
            "intermediate_outs": [],
            "branch_weights": [],
        }


class LongformerEncoder(TransformerEncoder):
    """Transformer encoder with per-layer sliding-window self-attention."""

    attention_windows: Union[int, Sequence[int]] = 100

    def _window(self, i: int) -> int:
        w = self.attention_windows
        if isinstance(w, int):
            return w
        assert len(w) == self.num_blocks, (len(w), self.num_blocks)
        return int(w[i])

    def _make_layer(self, i, cgmlp_weight, attn_branch_drop_rate, sdr):
        return TransformerEncoderLayer(
            size=self.output_size,
            attention_heads=self.attention_heads,
            attention_layer_type=self._att_type,
            attention_dropout_rate=self.attention_dropout_rate,
            linear_units=self.linear_units,
            ffn_activation=self.ffn_activation_type,
            dropout_rate=self.dropout_rate,
            stochastic_depth_rate=sdr,
            attention_window=self._window(i),
            use_flash=False,  # banded mask path; flash kernel has no band arg
            name=f"layer_{i}",
        )
