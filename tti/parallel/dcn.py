"""Multi-host (DCN) distributed runtime.

The reference is strictly single-machine (SURVEY §5 "Distributed comm
backend": none — four host threads on one box). This module is the tti
framework's multi-host story for the day a production line runs more than one
inspection host: initialize JAX's distributed runtime, build ONE global mesh
whose 'data' axis spans every chip on every host, and convert each host's
locally-captured frame batch into a global array. All cross-host traffic is
then XLA collectives over DCN (gradient psums in training); inference remains
embarrassingly parallel, so the only DCN cost is control-plane.

Design notes (jax-native, not an MPI/NCCL translation):
  * `jax.distributed.initialize` wires the coordinator; afterwards
    `jax.devices()` is GLOBAL and the existing mesh/sharding helpers
    (tti.parallel.mesh) and the jitted train/infer steps work unchanged —
    multi-host is a deployment configuration, not a code path.
  * Each process feeds only its local shard
    (`jax.make_array_from_process_local_data`); XLA never moves raw frames
    across hosts, only gradients/metrics ride DCN.

Smoke-tested without real multi-host hardware by launching N coordinated CPU
processes (tests/test_dcn.py), exactly like the driver's virtual-device
single-process dryrun.
"""

from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger("tti.parallel.dcn")

_ENV_COORD = "TTI_COORDINATOR"  # host:port of process 0
_ENV_NPROC = "TTI_NUM_PROCESSES"
_ENV_PID = "TTI_PROCESS_ID"


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join the multi-host job described by args or TTI_* env vars.

    Returns True when distributed mode was initialized, False for the normal
    single-host deployment (no coordinator configured) — callers never branch;
    they just build their mesh from `jax.devices()` either way.
    """
    coordinator = coordinator or os.environ.get(_ENV_COORD)
    if not coordinator:
        return False
    num_processes = int(num_processes or os.environ.get(_ENV_NPROC, "1"))
    process_id = int(process_id if process_id is not None
                     else os.environ.get(_ENV_PID, "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed runtime up: process %d/%d, %d/%d local/global devices",
        process_id, num_processes, jax.local_device_count(), jax.device_count(),
    )
    return True


def global_batch(mesh, host_local_tree):
    """Each host's local batch (dim 0) -> ONE global array sharded over the
    mesh's 'data' axis. The local shard stays on local chips; nothing host-
    crossing is materialized."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        host_local_tree,
    )


def process_local_slice(global_array) -> "jax.Array":
    """The rows of a 'data'-sharded global output that live on THIS host
    (fully-addressable concatenation of the local shards), as numpy."""
    import numpy as np

    shards = sorted(
        (s for s in global_array.addressable_shards),
        key=lambda s: s.index[0].start or 0,
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
