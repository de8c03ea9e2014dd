from tailored_avsr_tpu.tasks.asr import ASRTask
from tailored_avsr_tpu.tasks.avsr import AVSRTask
from tailored_avsr_tpu.tasks.lm import LMTask
