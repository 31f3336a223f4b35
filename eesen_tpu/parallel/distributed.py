"""Multi-host (multi-process) initialization and data sharding helpers.

The reference scales across machines with independent processes polling a
shared filesystem (reference: src/net/communicator.h; launchers
utils/run.pl / queue.pl / slurm.pl).  The TPU-native equivalent is one
SPMD program over all hosts:

- `init_distributed()` wraps jax.distributed.initialize (TPU pods
  auto-discover; other platforms take coordinator/num_processes/id),
- the global mesh from parallel.make_mesh then spans every host's devices
  (data axis over DCN, model axis within hosts),
- `host_shard` splits a dataset by process so each host feeds its slice —
  replacing utils/distribute_scp.pl,
- `global_batch` forms jax.Arrays from per-host shards via
  jax.make_array_from_process_local_data.

On a single host everything degrades to no-ops, so the same training
script runs everywhere.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, TypeVar

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eesen_tpu.utils.logging import get_logger

log = get_logger("parallel.distributed")

T = TypeVar("T")


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-process JAX. On TPU pods, args auto-discover."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
        log.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except Exception as e:
        log.info("single-process mode (%s)", e)


def host_shard(items: Sequence[T]) -> List[T]:
    """This process's share of a dataset (round-robin by process index,
    replacing utils/distribute_scp.pl)."""
    return list(items[jax.process_index():: jax.process_count()])


def global_batch(
    local_batch: Dict[str, np.ndarray], mesh: Mesh
) -> Dict[str, jax.Array]:
    """Assemble a global batch from per-process local shards.

    Each host contributes its local rows along the leading axis; the
    result is one jax.Array sharded over the mesh's `data` axis."""
    from eesen_tpu.parallel.sharding import batch_pspec

    specs = batch_pspec()
    out = {}
    for k, v in local_batch.items():
        if k not in specs:
            continue
        sharding = NamedSharding(mesh, specs[k])
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out


def is_coordinator() -> bool:
    return jax.process_index() == 0
