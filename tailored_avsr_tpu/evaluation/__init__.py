from tailored_avsr_tpu.evaluation.wer import (
    edit_distance,
    error_rate,
    bootstrap_error_rate,
    compute_bootstrap_wer,
    write_inf_file,
)
