"""Branchformer encoder: parallel attention + cgMLP branches with learned merge.

Capability parity with the reference's ``MyBranchformerEncoderLayer`` /
``MyBranchformerEncoder`` (/root/reference/src/encoder/branchformer/
encoder_layer.py:49-321, encoder.py:53-412): macaron FFN (half-scale) ->
parallel MHA + cgMLP -> merge (concat | learned_ave with per-utterance
attention-pooled weights | fixed_ave) -> FFN -> final LayerNorm; per-layer
cgmlp_weight / attn-branch-drop / stochastic-depth lists; input embeds
(linear / conv1d,2d subsampling / conv3dresnet18 passthrough); interCTC taps
with optional self-conditioning.

TPU-first notes:
- stochastic depth / branch drop are per-batch scalar coin flips drawn from an
  explicit 'skip' RNG collection and applied with ``jnp.where`` select — both
  paths are computed (XLA-friendly; the reference flips on host and skips
  compute, same math in expectation).
- the learned-merge branch weights are returned functionally in an aux dict
  (the reference stashes them on module attributes for the interpretability
  scripts, SURVEY.md §5.1).
- layers run as a Python loop over ``num_blocks`` (traced once; XLA sees a
  flat graph and pipelines HBM<->VMEM transfers per layer).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from tailored_avsr_tpu.ops.attention import (
    FastSelfAttention,
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)
from tailored_avsr_tpu.ops.cgmlp import ConvolutionalGatingMLP
from tailored_avsr_tpu.ops.feedforward import PositionwiseFeedForward
from tailored_avsr_tpu.ops.masking import MASK_MIN, make_valid_mask
from tailored_avsr_tpu.ops.posenc import (
    AbsolutePositionalEncoding,
    LegacyRelPositionalEncoding,
    RelPositionalEncoding,
    ScaledPositionalEncoding,
)
from tailored_avsr_tpu.ops.subsampling import (
    Conv1dSubsampling,
    Conv2dSubsampling,
    subsampled_length,
)


def attention_pooled_weight(
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    pooling_proj: nn.Dense,
    weight_proj: nn.Dense,
    size: int,
) -> jnp.ndarray:
    """Attention-pool a branch over time, project to a scalar logit per utterance.

    Mirrors the learned_ave scoring in the reference layer (encoder_layer.py:240-277).
    Returns (B, 1) unnormalized weight logits.
    """
    score = pooling_proj(x).squeeze(-1).astype(jnp.float32) / (size ** 0.5)  # (B, T)
    if mask is not None:
        score = jnp.where(mask, score, MASK_MIN)
        w = jax.nn.softmax(score, axis=-1)
        w = jnp.where(mask, w, 0.0)
    else:
        w = jax.nn.softmax(score, axis=-1)
    pooled = jnp.einsum("bt,btd->bd", w.astype(x.dtype), x)
    return weight_proj(pooled)  # (B, 1)


def _coin(module: nn.Module, rate: float, deterministic: bool) -> jnp.ndarray:
    """Per-batch scalar bernoulli(rate) from the 'skip' rng; False when deterministic."""
    if deterministic or rate <= 0.0:
        return jnp.asarray(False)
    return jax.random.uniform(module.make_rng("skip")) < rate


class BranchformerEncoderLayer(nn.Module):
    size: int
    attention_heads: int = 4
    attention_layer_type: str = "rel_selfattn"
    attention_dropout_rate: float = 0.0
    use_attn: bool = True
    use_cgmlp: bool = True
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"
    linear_units: int = 2048
    ffn_activation: str = "swish"
    macaron: bool = True
    dropout_rate: float = 0.1
    merge_method: str = "learned_ave"
    cgmlp_weight: float = 0.5
    attn_branch_drop_rate: float = 0.0
    stochastic_depth_rate: float = 0.0
    zero_triu: bool = False
    merge_conv_kernel: int = 0  # >0 adds the E-Branchformer depthwise-conv merge
    use_flash: bool = False
    use_fused_csgu: bool = False  # Pallas fused gate: 3.6x faster per layer but
    # ~70s Mosaic compile per call site under remote compilation; enable for
    # long-running serving, not one-shot benchmarks.

    def setup(self):
        use_attn, use_cgmlp = self.use_attn, self.use_cgmlp
        # fixed_ave degenerate weights collapse to a single branch (ref :129-145)
        if self.merge_method == "fixed_ave" and use_attn and use_cgmlp:
            if self.cgmlp_weight == 0.0:
                use_cgmlp = False
            elif self.cgmlp_weight == 1.0:
                use_attn = False
        self._use_attn, self._use_cgmlp = use_attn, use_cgmlp
        self._two_branches = use_attn and use_cgmlp
        assert use_attn or use_cgmlp, "at least one branch required"

        if self.macaron:
            self.feed_forward_macaron = PositionwiseFeedForward(
                self.linear_units, self.dropout_rate, self.ffn_activation,
                name="feed_forward_macaron",
            )
            self.norm_ff_macaron = nn.LayerNorm()
        self.ff_scale = 0.5 if self.macaron else 1.0
        if use_attn:
            if self.attention_layer_type in ("selfattn",):
                self.attn = MultiHeadedAttention(
                    self.attention_heads,
                    self.attention_dropout_rate,
                    self.size,
                    name="attn",
                )
            elif self.attention_layer_type in ("rel_selfattn", "legacy_rel_selfattn"):
                self.attn = RelPositionMultiHeadedAttention(
                    self.attention_heads,
                    self.attention_dropout_rate,
                    self.zero_triu,
                    self.use_flash,
                    legacy=self.attention_layer_type == "legacy_rel_selfattn",
                    name="attn",
                )
            elif self.attention_layer_type == "fast_selfattn":
                self.attn = FastSelfAttention(
                    self.attention_heads, self.attention_dropout_rate, name="attn"
                )
            else:
                raise ValueError(self.attention_layer_type)
            self.norm_mha = nn.LayerNorm()
        if use_cgmlp:
            self.cgmlp = ConvolutionalGatingMLP(
                self.cgmlp_linear_units,
                self.cgmlp_conv_kernel,
                self.dropout_rate,
                self.use_linear_after_conv,
                self.gate_activation,
                use_fused=self.use_fused_csgu,
                name="cgmlp",
            )
            self.norm_mlp = nn.LayerNorm()
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, self.ffn_activation,
            name="feed_forward",
        )
        self.norm_ff = nn.LayerNorm()
        self.norm_final = nn.LayerNorm()
        self.dropout = nn.Dropout(self.dropout_rate)

        if self._two_branches:
            if self.merge_method == "concat":
                self.merge_proj = nn.Dense(self.size, name="merge_proj")
                if self.merge_conv_kernel > 0:
                    # E-Branchformer: depthwise conv over the concatenated
                    # branches before the merge projection (arXiv:2210.00077)
                    self.depthwise_conv_fusion = nn.Conv(
                        features=2 * self.size,
                        kernel_size=(self.merge_conv_kernel,),
                        padding="SAME",
                        feature_group_count=2 * self.size,
                        name="depthwise_conv_fusion",
                    )
            elif self.merge_method == "learned_ave":
                self.pooling_proj1 = nn.Dense(1, name="pooling_proj1")
                self.pooling_proj2 = nn.Dense(1, name="pooling_proj2")
                self.weight_proj1 = nn.Dense(1, name="weight_proj1")
                self.weight_proj2 = nn.Dense(1, name="weight_proj2")
                self.merge_proj = nn.Dense(self.size, name="merge_proj")
            elif self.merge_method == "fixed_ave":
                self.merge_proj = nn.Dense(self.size, name="merge_proj")
            else:
                raise ValueError(self.merge_method)
        elif self.merge_method == "fixed_ave" and (self.use_attn and self.use_cgmlp):
            # degenerate fixed_ave keeps its merge projection (ref :144-145)
            self.merge_proj = nn.Dense(self.size, name="merge_proj")
        else:
            self.merge_proj = None

    def __call__(
        self,
        x: jnp.ndarray,
        pos_emb: Optional[jnp.ndarray],
        mask: Optional[jnp.ndarray],
        *,
        deterministic: bool = True,
    ):
        """Returns (x, aux) where aux holds the learned merge weights (B,) each."""
        skip = _coin(self, self.stochastic_depth_rate, deterministic)
        coeff = 1.0 if deterministic or self.stochastic_depth_rate == 0 else 1.0 / (
            1.0 - self.stochastic_depth_rate
        )
        aux = {}
        x_in = x

        if self.macaron:
            x = x + self.ff_scale * self.dropout(
                self.feed_forward_macaron(
                    self.norm_ff_macaron(x), deterministic=deterministic
                ),
                deterministic=deterministic,
            )

        x1 = x2 = x
        if self._use_attn:
            h = self.norm_mha(x1)
            if self.attention_layer_type == "fast_selfattn":
                att = self.attn(h, mask, deterministic=deterministic)
            elif pos_emb is not None and self.attention_layer_type.endswith("rel_selfattn"):
                att = self.attn(h, h, h, pos_emb, mask, deterministic=deterministic)
            else:
                att = self.attn(h, h, h, mask, deterministic=deterministic)
            x1 = self.dropout(att, deterministic=deterministic)
        if self._use_cgmlp:
            h = self.norm_mlp(x2)
            h = self.cgmlp(h, mask, deterministic=deterministic)
            x2 = self.dropout(h, deterministic=deterministic)

        if self._two_branches:
            if self.merge_method == "concat":
                x_concat = jnp.concatenate([x1, x2], axis=-1)
                if self.merge_conv_kernel > 0:
                    x_concat = x_concat + self.depthwise_conv_fusion(x_concat)
                merged = self.merge_proj(x_concat)
            elif self.merge_method == "learned_ave":
                w1l = attention_pooled_weight(
                    x1, mask, self.pooling_proj1, self.weight_proj1, self.size
                )
                w2l = attention_pooled_weight(
                    x2, mask, self.pooling_proj2, self.weight_proj2, self.size
                )
                w = jax.nn.softmax(
                    jnp.concatenate([w1l, w2l], axis=-1).astype(jnp.float32), axis=-1
                ).astype(x.dtype)  # (B, 2)
                drop_attn = _coin(self, self.attn_branch_drop_rate, deterministic)
                w1 = jnp.where(drop_attn, 0.0, w[:, 0])
                w2 = jnp.where(drop_attn, 1.0, w[:, 1])
                aux["weight_global"] = w1  # attention-branch weight (ref :288)
                aux["weight_local"] = w2  # cgmlp-branch weight (ref :289)
                merged = self.merge_proj(w1[:, None, None] * x1 + w2[:, None, None] * x2)
            else:  # fixed_ave
                merged = self.merge_proj(
                    (1.0 - self.cgmlp_weight) * x1 + self.cgmlp_weight * x2
                )
        else:
            only = x1 if self._use_attn else x2
            merged = self.merge_proj(only) if self.merge_proj is not None else only
        x = x + coeff * self.dropout(merged, deterministic=deterministic)

        x = x + self.ff_scale * self.dropout(
            self.feed_forward(self.norm_ff(x), deterministic=deterministic),
            deterministic=deterministic,
        )
        x = self.norm_final(x)
        x = jnp.where(skip, x_in, x)
        return x, aux


class BranchformerEncoder(nn.Module):
    """Config-compatible with the reference encoder (SURVEY.md §2.1)."""

    output_size: int = 256
    input_size: Optional[int] = None  # feature dim before the embed layer
    attention_heads: int = 4
    attention_layer_type: str = "rel_selfattn"
    pos_enc_layer_type: str = "rel_pos"
    rel_pos_type: str = "latest"
    ffn_activation_type: str = "swish"
    linear_units: int = 2048
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"
    num_blocks: int = 12
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: Optional[str] = "conv2d"
    merge_method: str = "learned_ave"
    use_attn_branch: bool = True
    use_cgmlp_branch: bool = True
    cgmlp_weight: Union[float, Sequence[float]] = 0.5
    attn_branch_drop_rate: Union[float, Sequence[float]] = 0.0
    stochastic_depth_rate: Union[float, Sequence[float]] = 0.0
    zero_triu: bool = False
    normalize_before: bool = True
    interctc_layer_idx: Sequence[int] = ()
    interctc_use_conditioning: bool = False
    vocab_size: Optional[int] = None  # needed when interctc_use_conditioning
    use_flash: bool = False  # Pallas fused attention on the TPU path
    use_fused_csgu: bool = False
    merge_conv_kernel: int = 0  # >0 = E-Branchformer merge

    def _per_layer(self, v):
        if isinstance(v, (int, float)):
            return [float(v)] * self.num_blocks
        assert len(v) == self.num_blocks
        return list(v)

    def setup(self):
        # resolve effective attention/pos-enc types exactly like the reference
        # (:95-104): rel_pos_type 'legacy' downgrades the 'latest' choices
        att_type = self.attention_layer_type
        pos_type = self.pos_enc_layer_type
        if self.rel_pos_type == "legacy":
            if att_type == "rel_selfattn":
                att_type = "legacy_rel_selfattn"
            if pos_type == "rel_pos":
                pos_type = "legacy_rel_pos"
        # pairing validation (reference encoder.py:110-114 asserts the same):
        # a rel attention with an abs table would receive the boolean mask as
        # its pos_emb argument and fail with an opaque shape error deep inside
        pairs = {
            "rel_selfattn": ("rel_pos",),
            "legacy_rel_selfattn": ("legacy_rel_pos",),
            "selfattn": ("abs_pos", "scaled_abs_pos"),
            "fast_selfattn": ("abs_pos", "scaled_abs_pos"),
        }
        if self.use_attn_branch and pos_type not in pairs.get(att_type, (pos_type,)):
            raise ValueError(
                f"attention_layer_type {att_type!r} requires "
                f"pos_enc_layer_type in {pairs[att_type]} (got {pos_type!r})"
            )
        self._att_type = att_type

        if pos_type == "rel_pos":
            self.pos_enc = RelPositionalEncoding(self.positional_dropout_rate)
        elif pos_type == "legacy_rel_pos":
            self.pos_enc = LegacyRelPositionalEncoding(self.positional_dropout_rate)
        elif self.pos_enc_layer_type == "abs_pos":
            self.pos_enc = AbsolutePositionalEncoding(self.positional_dropout_rate)
        elif self.pos_enc_layer_type == "scaled_abs_pos":
            self.pos_enc = ScaledPositionalEncoding(self.positional_dropout_rate)
        else:
            raise ValueError(self.pos_enc_layer_type)

        self.embed_dropout = nn.Dropout(self.dropout_rate)
        il = self.input_layer
        if il == "linear":
            self.embed_linear = nn.Dense(self.output_size, name="embed_linear")
            self.embed_norm = nn.LayerNorm(name="embed_norm")
        elif il in ("conv1d", "conv3dresnet18"):
            # 512-dim frontend features -> d (ref encoder.py:130-134)
            self.embed_linear = nn.Dense(self.output_size, name="embed_linear")
        elif il in ("conv2d", "conv2d1", "conv2d2", "conv2d6", "conv2d8"):
            factor = {"conv2d": 4, "conv2d1": 1, "conv2d2": 2, "conv2d6": 6, "conv2d8": 8}[il]
            self.embed_conv = Conv2dSubsampling(self.output_size, factor, name="embed_conv")
            self._subsample_factor = factor
        elif il in ("conv1d2", "conv1d3"):
            factor = {"conv1d2": 2, "conv1d3": 3}[il]
            self.embed_conv = Conv1dSubsampling(self.output_size, factor, name="embed_conv")
            self._subsample_factor = factor
        elif il == "embed":
            assert self.input_size is not None
            self.embed_tok = nn.Embed(self.input_size, self.output_size, name="embed_tok")
        elif il is None:
            pass
        else:
            raise ValueError(f"unknown input_layer: {il}")

        cgw = self._per_layer(self.cgmlp_weight)
        abd = self._per_layer(self.attn_branch_drop_rate)
        sdr = self._per_layer(self.stochastic_depth_rate)
        self.layers = [
            self._make_layer(i, cgw[i], abd[i], sdr[i])
            for i in range(self.num_blocks)
        ]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(name="after_norm")
        if self.interctc_use_conditioning:
            assert self.vocab_size is not None
            self.conditioning_layer = nn.Dense(self.output_size, name="conditioning_layer")

    def _make_layer(self, i, cgmlp_weight, attn_branch_drop_rate, sdr):
        """Layer-construction hook (overridden by ConformerEncoder)."""
        return BranchformerEncoderLayer(
            size=self.output_size,
            attention_heads=self.attention_heads,
            attention_layer_type=self._att_type,
            attention_dropout_rate=self.attention_dropout_rate,
            use_attn=self.use_attn_branch,
            use_cgmlp=self.use_cgmlp_branch,
            cgmlp_linear_units=self.cgmlp_linear_units,
            cgmlp_conv_kernel=self.cgmlp_conv_kernel,
            use_linear_after_conv=self.use_linear_after_conv,
            gate_activation=self.gate_activation,
            linear_units=self.linear_units,
            ffn_activation=self.ffn_activation_type,
            macaron=True,
            dropout_rate=self.dropout_rate,
            merge_method=self.merge_method,
            cgmlp_weight=cgmlp_weight,
            attn_branch_drop_rate=attn_branch_drop_rate,
            stochastic_depth_rate=sdr,
            zero_triu=self.zero_triu,
            merge_conv_kernel=self.merge_conv_kernel,
            use_flash=self.use_flash,
            use_fused_csgu=self.use_fused_csgu,
            name=f"layer_{i}",
        )

    def embed_frames(self, xs, ilens, *, deterministic=True):
        """Apply the input embed; returns (x, lengths, pos_emb)."""
        il = self.input_layer
        if il == "linear":
            xs = self.embed_norm(self.embed_linear(xs))
            xs = self.embed_dropout(xs, deterministic=deterministic)
        elif il in ("conv1d", "conv3dresnet18"):
            xs = self.embed_linear(xs)
        elif il in ("conv2d", "conv2d1", "conv2d2", "conv2d6", "conv2d8"):
            xs = self.embed_conv(xs)
            ilens = subsampled_length(ilens, self._subsample_factor)
        elif il in ("conv1d2", "conv1d3"):
            xs = self.embed_conv(xs)
            ilens = subsampled_length(ilens, self._subsample_factor, conv1d=True)
        elif il == "embed":
            xs = self.embed_tok(xs)
        pos_emb = None
        if self.pos_enc_layer_type in ("rel_pos", "legacy_rel_pos"):
            xs, pos_emb = self.pos_enc(xs, deterministic=deterministic)
        else:
            xs = self.pos_enc(xs, deterministic=deterministic)
        return xs, ilens, pos_emb

    def __call__(
        self,
        xs: jnp.ndarray,
        ilens: jnp.ndarray,
        *,
        deterministic: bool = True,
        ctc: Optional[CTCModuleRef] = None,
        max_layer: Optional[int] = None,
    ):
        """Returns (xs, olens, aux) — aux holds 'intermediate_outs' [(idx, out)]
        and 'branch_weights' [(layer_idx, {weight_global, weight_local})]."""
        xs, ilens, pos_emb = self.embed_frames(xs, ilens, deterministic=deterministic)
        mask = make_valid_mask(ilens, xs.shape[1])

        intermediate_outs = []
        branch_weights = []
        for i, layer in enumerate(self.layers):
            if max_layer is not None and i > max_layer:
                break
            xs, aux = layer(xs, pos_emb, mask, deterministic=deterministic)
            if aux:
                branch_weights.append((i + 1, aux))
            if (i + 1) in tuple(self.interctc_layer_idx):
                out = self.after_norm(xs) if self.normalize_before else xs
                intermediate_outs.append((i + 1, out))
                if self.interctc_use_conditioning and ctc is not None:
                    xs = xs + self.conditioning_layer(ctc.softmax(out))

        if self.normalize_before:
            xs = self.after_norm(xs)
        olens = ilens
        return xs, olens, {
            "intermediate_outs": intermediate_outs,
            "branch_weights": branch_weights,
        }


# typing alias to avoid importing the CTC head here (any object with .softmax)
CTCModuleRef = object
