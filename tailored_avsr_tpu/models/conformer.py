"""Conformer encoder: macaron FFN + rel-pos MHA + convolution module + FFN.

Capability parity with espnet's ``ConformerEncoder`` as registered by the
reference (/root/reference/src/tasks/asr.py:145-166 encoder choice
'conformer'; /root/reference/src/encoder/audiovisual/conventional/
encoder.py:218-225 as the conventional AV sub-encoder alternative).

Layer flow (pre-norm, macaron): x += 1/2 FFN(LN(x)); x += MHA(LN(x));
x += Conv(LN(x)); x += 1/2 FFN(LN(x)); x = LN(x). The conv module is
pointwise(d->2d) + GLU + depthwise(k) + BatchNorm + Swish + pointwise(d->d).
The interface matches BranchformerEncoderLayer so Conformer layers slot into
the same encoder/conventional-AV scaffolding.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.models.branchformer import BranchformerEncoder, _coin
from tailored_avsr_tpu.ops.attention import (
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)
from tailored_avsr_tpu.ops.feedforward import PositionwiseFeedForward


class ConformerConvModule(nn.Module):
    kernel_size: int = 31
    activation: str = "swish"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        d = x.shape[-1]
        h = nn.Dense(2 * d, name="pointwise_conv1")(x)
        a, b = h[..., :d], h[..., d:]
        h = a * nn.sigmoid(b)  # GLU
        h = nn.Conv(
            d,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            feature_group_count=d,
            name="depthwise_conv",
        )(h)
        h = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5, name="norm"
        )(h)
        h = nn.silu(h)
        return nn.Dense(d, name="pointwise_conv2")(h)


class ConformerEncoderLayer(nn.Module):
    size: int
    attention_heads: int = 4
    attention_layer_type: str = "rel_selfattn"
    attention_dropout_rate: float = 0.0
    cnn_module_kernel: int = 31
    linear_units: int = 2048
    ffn_activation: str = "swish"
    macaron: bool = True
    dropout_rate: float = 0.1
    stochastic_depth_rate: float = 0.0
    use_flash: bool = False

    def setup(self):
        if self.macaron:
            self.feed_forward_macaron = PositionwiseFeedForward(
                self.linear_units, self.dropout_rate, self.ffn_activation,
                name="feed_forward_macaron",
            )
            self.norm_ff_macaron = nn.LayerNorm()
        self.ff_scale = 0.5 if self.macaron else 1.0
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
        self.conv_module = ConformerConvModule(
            self.cnn_module_kernel, name="conv_module"
        )
        self.norm_conv = nn.LayerNorm()
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, self.ffn_activation,
            name="feed_forward",
        )
        self.norm_ff = nn.LayerNorm()
        self.norm_final = nn.LayerNorm()
        self.dropout = nn.Dropout(self.dropout_rate)

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
        if self.macaron:
            # espnet's Conformer scales ALL four residuals by the
            # stochastic-depth coefficient (unlike Branchformer, which scales
            # only the merge residual — both match their references)
            x = x + coeff * self.ff_scale * self.dropout(
                self.feed_forward_macaron(
                    self.norm_ff_macaron(x), deterministic=deterministic
                ),
                deterministic=deterministic,
            )
        h = self.norm_mha(x)
        if pos_emb is not None and self.attention_layer_type.endswith("rel_selfattn"):
            att = self.self_attn(h, h, h, pos_emb, mask, deterministic=deterministic)
        else:
            att = self.self_attn(h, h, h, mask, deterministic=deterministic)
        x = x + coeff * self.dropout(att, deterministic=deterministic)
        h = self.conv_module(self.norm_conv(x), deterministic=deterministic)
        x = x + coeff * self.dropout(h, deterministic=deterministic)
        x = x + coeff * self.ff_scale * self.dropout(
            self.feed_forward(self.norm_ff(x), deterministic=deterministic),
            deterministic=deterministic,
        )
        x = self.norm_final(x)
        x = jnp.where(skip, x_in, x)
        return x, {}


class ConformerEncoder(BranchformerEncoder):
    """Full Conformer encoder reusing the Branchformer scaffold (embeds,
    pos-enc, interCTC, masking) with Conformer layers."""

    cnn_module_kernel: int = 31

    def _make_layer(self, i, cgmlp_weight, attn_branch_drop_rate, sdr):
        return ConformerEncoderLayer(
            size=self.output_size,
            attention_heads=self.attention_heads,
            attention_layer_type=self._att_type,
            attention_dropout_rate=self.attention_dropout_rate,
            cnn_module_kernel=self.cnn_module_kernel,
            linear_units=self.linear_units,
            ffn_activation=self.ffn_activation_type,
            macaron=True,
            dropout_rate=self.dropout_rate,
            stochastic_depth_rate=sdr,
            use_flash=self.use_flash,
            name=f"layer_{i}",
        )
