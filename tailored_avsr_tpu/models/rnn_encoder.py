"""RNN (Bi)LSTM encoder — the espnet 'rnn' encoder choice.

Capability parity with espnet's ``RNNEncoder`` as registered by the
reference's ASR task (/root/reference/src/tasks/asr.py:145-166, choice
'rnn'): stacked (bi)directional LSTM layers with optional per-layer linear
projection, returning (B, T, output_size) and the unchanged lengths.

TPU note: LSTMs are inherently sequential over time (lax.scan under
flax.linen.RNN); this encoder exists for registry parity and small-model
experiments — the Branchformer/Conformer family is the performance path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tailored_avsr_tpu.ops.masking import make_valid_mask


class RNNEncoder(nn.Module):
    output_size: int = 320
    hidden_size: int = 320
    num_layers: int = 4
    bidirectional: bool = True
    use_projection: bool = True
    dropout_rate: float = 0.0
    use_vgg: bool = False  # VGG2L conv stack before the RNN (espnet 'vgg_rnn')
    input_size: Optional[int] = None  # unused; scaffold-compat

    # scaffold-compat fields consumed by the tasks (ignored here)
    interctc_layer_idx: Sequence[int] = ()
    interctc_use_conditioning: bool = False

    @nn.compact
    def __call__(
        self,
        xs: jnp.ndarray,  # (B, T, F)
        ilens: jnp.ndarray,  # (B,)
        *,
        deterministic: bool = True,
        ctc=None,
        max_layer: Optional[int] = None,
    ):
        del ctc, max_layer
        h = xs
        if self.use_vgg:
            # VGG2L: two [conv3x3, conv3x3, maxpool2x2] blocks over a
            # (B, T, F, 1) image -> time/4, freq/4, 128 channels flattened
            v = h[..., None]
            for j, ch in enumerate((64, 128)):
                v = nn.relu(nn.Conv(ch, (3, 3), name=f"vgg_conv{j}a")(v))
                v = nn.relu(nn.Conv(ch, (3, 3), name=f"vgg_conv{j}b")(v))
                v = nn.max_pool(v, (2, 2), strides=(2, 2))
            bt, tt, ff, cc = v.shape
            h = v.reshape(bt, tt, ff * cc)
            ilens = jnp.maximum(ilens // 4, 1)
        for i in range(self.num_layers):
            fwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size), name=f"lstm_fwd_{i}"
            )(h, seq_lengths=ilens)
            if self.bidirectional:
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(self.hidden_size),
                    reverse=True,
                    keep_order=True,
                    name=f"lstm_bwd_{i}",
                )(h, seq_lengths=ilens)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd
            if self.use_projection or i == self.num_layers - 1:
                h = nn.Dense(
                    self.output_size if i == self.num_layers - 1 else self.hidden_size,
                    name=f"proj_{i}",
                )(h)
                h = nn.tanh(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        mask = make_valid_mask(ilens, h.shape[1])
        h = jnp.where(mask[..., None], h, 0.0)
        return h, ilens, {"intermediate_outs": [], "branch_weights": []}
