"""Multi-host execution support.

Reference parity: cluster mode (SURVEY.md L7/P6) upgraded from
shared-filesystem job splitting to a real distributed runtime:
`jax.distributed.initialize` + a (host, z) mesh, with timepoints (or
z-ranges) sharded across hosts over DCN and halo exchange riding ICI
within each host's chips. Single-host sessions (this container) exercise
the same code with num_processes=1; the driver's `dryrun_multichip`
validates the sharded programs on a virtual device mesh.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

from spim_registration_tpu.parallel.mesh import make_mesh
from spim_registration_tpu.utils.log import get_logger

logger = get_logger("multihost")


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID); no-op when single
    process and nothing is configured."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", "0"))
    if num_processes <= 1 or coordinator_address is None:
        logger.info("single-process run (no jax.distributed)")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    logger.info("jax.distributed initialized: process %d/%d, %d local / "
                "%d global devices", process_id, num_processes,
                jax.local_device_count(), jax.device_count())


def host_z_mesh(z_per_host: Optional[int] = None):
    """Mesh ("host", "z"): hosts x local chips. Volume z-sharding spans
    the full mesh (host-major), so halo exchange crosses DCN only at the
    host boundary slices."""
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    return make_mesh(("host", "z"), (n_proc, n_local), jax.devices())


def shard_timepoints(timepoints: Sequence[int]) -> list:
    """Static per-host split of timepoints (the cluster-mode analog):
    host p processes timepoints[p::P]."""
    p = jax.process_index()
    P = jax.process_count()
    return list(timepoints)[p::P]
