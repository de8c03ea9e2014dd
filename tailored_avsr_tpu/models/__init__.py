from tailored_avsr_tpu.models.ctc import CTCHead
from tailored_avsr_tpu.models.branchformer import (
    BranchformerEncoder,
    BranchformerEncoderLayer,
)
from tailored_avsr_tpu.models.frontends import Conv3dResNet18
from tailored_avsr_tpu.models.fusion import AdaptiveAudioVisualFusion
from tailored_avsr_tpu.models.embedding import DefaultEmbeddingLayerForAVSR
from tailored_avsr_tpu.models.tailored import TailoredEncoder
from tailored_avsr_tpu.models.conventional import ConventionalEncoder
from tailored_avsr_tpu.models.decoder import TransformerDecoder, MLMDecoder, SimTDecoder
from tailored_avsr_tpu.models.asr_model import ASRModel
from tailored_avsr_tpu.models.avsr_model import AVSRModel
from tailored_avsr_tpu.models.maskctc import MaskCTCModel, AVSRMaskCTCModel
from tailored_avsr_tpu.models.lm import TransformerLM
