from tailored_avsr_tpu.train.optim import (
    noam_schedule,
    onecycle_schedule,
    set_optimizer,
)
from tailored_avsr_tpu.train.checkpoint import (
    save_model,
    load_model,
    average_models,
    load_e2e,
    freeze_mask,
    save_val_stats,
)
from tailored_avsr_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
