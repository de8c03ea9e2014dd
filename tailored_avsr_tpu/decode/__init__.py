from tailored_avsr_tpu.decode.greedy import ctc_greedy_collapse
from tailored_avsr_tpu.decode.ctc_prefix import (
    ctc_prefix_init_state,
    ctc_prefix_score_step,
)
from tailored_avsr_tpu.decode.beam_search import BeamSearchConfig, beam_search
from tailored_avsr_tpu.decode.maskctc import maskctc_decode
