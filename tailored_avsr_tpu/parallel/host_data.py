"""Host-sharded input: per-process batch shards -> global device arrays.

Multi-host TPU pods run one Python process per host; each host's input
pipeline should load only its slice of the global batch
(SURVEY.md §2.4 "host-sharded input pipeline"). These helpers wrap
``jax.make_array_from_process_local_data`` so the training loop sees one
global array regardless of process count. In a single process (tests, the
build environment) they degrade to a plain device_put over the mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_batch_slice(n_utts: int) -> slice:
    """The slice of the GLOBAL dataset batch this process should load.

    The remainder ``n_utts % process_count`` is spread one-per-process over
    the first processes, so every utterance is covered (a floor-only split
    would silently drop the tail from training AND evaluation WER).
    """
    n = jax.process_count()
    i = jax.process_index()
    per, rem = divmod(n_utts, n)
    start = i * per + min(i, rem)
    return slice(start, start + per + (1 if i < rem else 0))


def global_batch_from_local(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Assemble per-process local arrays into batch-sharded global arrays.

    Every array leaf gets its leading axis sharded over the mesh's 'data'
    axis; non-array values (sample ids, refs) pass through untouched.
    """
    sharding = NamedSharding(mesh, P("data"))

    def place(x):
        if isinstance(x, np.ndarray):
            return jax.make_array_from_process_local_data(sharding, x)
        return x

    return {k: place(v) for k, v in batch.items()}
