from tailored_avsr_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_jit,
)
from tailored_avsr_tpu.parallel.host_data import (
    global_batch_from_local,
    process_batch_slice,
)
