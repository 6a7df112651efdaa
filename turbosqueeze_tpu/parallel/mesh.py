"""Device mesh construction for the block-parallel engine.

The framework's one first-class parallelism strategy is block-level data
parallelism (SURVEY.md §2 checklist): independent 4 MiB blocks shard over a
1-D mesh axis ``blocks`` spanning every chip (ICI within a slice, DCN across
hosts). The upstream equivalent is the round-robin block->thread assignment
at tsq_threads.cpp:71.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blocks"


def block_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (BLOCK_AXIS,))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding: one shard of blocks per device."""
    return NamedSharding(mesh, P(BLOCK_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch(n: int, n_devices: int) -> int:
    """Blocks must divide evenly over the mesh; pad with no-op blocks."""
    return -(-n // n_devices) * n_devices


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (jax.distributed over DCN).

    No-op when running single-process. Mirrors the upstream single-process
    limitation being lifted: the reference never crosses a process boundary
    (SURVEY.md §2 'Distributed communication backend').
    """
    if coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
