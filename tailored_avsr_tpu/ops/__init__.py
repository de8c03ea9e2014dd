from tailored_avsr_tpu.ops.masking import (
    make_valid_mask,
    mask_lengths,
    MASK_MIN,
)
from tailored_avsr_tpu.ops.feedforward import PositionwiseFeedForward, get_activation
from tailored_avsr_tpu.ops.posenc import (
    AbsolutePositionalEncoding,
    ScaledPositionalEncoding,
    RelPositionalEncoding,
    sinusoidal_table,
)
from tailored_avsr_tpu.ops.attention import (
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
    FastSelfAttention,
)
from tailored_avsr_tpu.ops.cgmlp import ConvolutionalGatingMLP
from tailored_avsr_tpu.ops.subsampling import (
    Conv2dSubsampling,
    Conv1dSubsampling,
    subsampled_length,
)
from tailored_avsr_tpu.ops.frontend_audio import LogMelFrontend
from tailored_avsr_tpu.ops.specaug import SpecAug
from tailored_avsr_tpu.ops.normalize import UtteranceMVN, GlobalMVN
from tailored_avsr_tpu.ops.losses import (
    label_smoothing_loss,
    token_accuracy,
    add_sos_eos,
    ctc_loss,
)
