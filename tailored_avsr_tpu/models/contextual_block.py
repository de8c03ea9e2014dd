"""Contextual-block streaming encoder (transformer / conformer layers).

Capability parity with espnet's ``ContextualBlockTransformerEncoder`` and
``ContextualBlockConformerEncoder`` choices registered by the reference's ASR
task (/root/reference/src/tasks/asr.py:32-44,151-159; exposed but unused by
shipped configs — SURVEY.md §5.7). Block processing with a carried context
embedding enables streaming recognition with bounded per-block latency.

Mechanics (following the espnet design, TPU-mapped):
- the (embedded, pos-encoded) sequence is unfolded into overlapping blocks of
  ``block_size`` frames with stride ``hop_size`` (the tail ``block_size -
  hop_size`` frames of each block are look-ahead context);
- each block carries a context-embedding token, initialized as the block's
  average frame (``init_average``);
- every layer attends within [prev-block context token; block frames; own
  context token] — ALL blocks in parallel (one batched attention of shape
  (B·nblocks, block+2, D)); between layers each block receives the context
  token its left neighbour produced (a roll along the block axis), which is
  exactly how information flows left-to-right across block boundaries without
  any sequential scan;
- the output for frames [i·hop, (i+1)·hop) is read from block i's first
  ``hop_size`` positions; a final LayerNorm follows.

The per-layer compute is dense attention over (block+2)-token windows —
static shapes, MXU-friendly, no gather/scatter beyond one unfold and one
fold.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tailored_avsr_tpu.models.branchformer import BranchformerEncoder


class ContextualBlockEncoder(BranchformerEncoder):
    """Streaming block encoder on the Branchformer scaffold.

    ``block_layer`` selects the per-block layer type: 'transformer' (MHA+FFN)
    or 'conformer' (macaron + MHA + conv + FFN).
    """

    block_size: int = 40
    hop_size: int = 16
    look_ahead: int = 16  # informational; tail of each block beyond hop_size
    init_average: bool = True
    block_layer: str = "transformer"
    cnn_module_kernel: int = 31

    def _make_layer(self, i, cgmlp_weight, attn_branch_drop_rate, sdr):
        # abs-pos attention within blocks: the block unfold breaks the global
        # rel-pos index space, so layers run plain self-attention. A rel-pos
        # config would be SILENTLY position-free here (RelPositionalEncoding
        # only scales x; the returned table is discarded) — reject it.
        if self.pos_enc_layer_type not in ("abs_pos", "scaled_abs_pos"):
            raise ValueError(
                "contextual_block encoders require pos_enc_layer_type "
                "'abs_pos' or 'scaled_abs_pos' (block processing discards "
                f"relative tables); got {self.pos_enc_layer_type!r}"
            )
        if self.attention_layer_type not in ("selfattn",):
            raise ValueError(
                "contextual_block encoders run plain self-attention within "
                f"blocks; got attention_layer_type "
                f"{self.attention_layer_type!r}"
            )
        if self.block_layer == "conformer":
            from tailored_avsr_tpu.models.conformer import ConformerEncoderLayer

            return ConformerEncoderLayer(
                size=self.output_size,
                attention_heads=self.attention_heads,
                attention_layer_type="selfattn",
                attention_dropout_rate=self.attention_dropout_rate,
                cnn_module_kernel=self.cnn_module_kernel,
                linear_units=self.linear_units,
                ffn_activation=self.ffn_activation_type,
                macaron=True,
                dropout_rate=self.dropout_rate,
                stochastic_depth_rate=sdr,
                name=f"layer_{i}",
            )
        from tailored_avsr_tpu.models.transformer_encoder import (
            TransformerEncoderLayer,
        )

        return TransformerEncoderLayer(
            size=self.output_size,
            attention_heads=self.attention_heads,
            attention_layer_type="selfattn",
            attention_dropout_rate=self.attention_dropout_rate,
            linear_units=self.linear_units,
            ffn_activation=self.ffn_activation_type,
            dropout_rate=self.dropout_rate,
            stochastic_depth_rate=sdr,
            name=f"layer_{i}",
        )

    def __call__(
        self,
        xs: jnp.ndarray,
        ilens: jnp.ndarray,
        *,
        deterministic: bool = True,
        ctc=None,
        max_layer: Optional[int] = None,
    ):
        del ctc, max_layer
        xs, ilens, _ = self.embed_frames(xs, ilens, deterministic=deterministic)
        b, t, d = xs.shape
        hop, blk = self.hop_size, self.block_size
        nblocks = max(1, -(-t // hop))  # ceil: every frame is in some hop region
        t_pad = (nblocks - 1) * hop + blk
        xs_pad = jnp.pad(xs, ((0, 0), (0, t_pad - t), (0, 0)))
        valid = jnp.arange(t_pad)[None, :] < ilens[:, None]  # (B, Tp)

        # unfold: (B, nblocks, blk, D) — block i = frames [i*hop, i*hop+blk)
        starts = jnp.arange(nblocks) * hop  # (n,)
        gather_idx = starts[:, None] + jnp.arange(blk)[None, :]  # (n, blk)
        blocks = xs_pad[:, gather_idx]  # (B, n, blk, D)
        bmask = valid[:, gather_idx]  # (B, n, blk)

        # context token init: masked average (or first frame) of each block
        if self.init_average:
            denom = jnp.maximum(bmask.sum(-1, keepdims=True), 1)
            ctx = (blocks * bmask[..., None]).sum(2) / denom  # (B, n, D)
        else:
            ctx = blocks[:, :, 0]

        nb = b * nblocks
        # loop-invariant: the attention mask depends only on bmask/block idx
        has_prev = jnp.arange(nblocks) > 0  # (n,)
        smask = jnp.concatenate(
            [
                jnp.broadcast_to(has_prev[None, :, None], (b, nblocks, 1)),
                bmask,
                jnp.ones((b, nblocks, 1), bool),
            ],
            axis=2,
        )  # (B, n, blk+2)
        for layer in self.layers:
            # prev-block context: block i attends over block i-1's ctx token
            prev_ctx = jnp.pad(ctx, ((0, 0), (1, 0), (0, 0)))[:, :-1]  # (B,n,D)
            seq = jnp.concatenate(
                [prev_ctx[:, :, None], blocks, ctx[:, :, None]], axis=2
            )  # (B, n, blk+2, D)
            out, _ = layer(
                seq.reshape(nb, blk + 2, d),
                None,
                smask.reshape(nb, blk + 2),
                deterministic=deterministic,
            )
            out = out.reshape(b, nblocks, blk + 2, d)
            blocks, ctx = out[:, :, 1:-1], out[:, :, -1]

        # fold: output frame j comes from block j//hop, local offset j%hop
        y = blocks[:, :, :hop].reshape(b, nblocks * hop, d)[:, :t]
        if self.normalize_before:
            y = self.after_norm(y)
        y = jnp.where(valid[:, :t, None], y, 0.0)
        return y, ilens, {"intermediate_outs": [], "branch_weights": []}
