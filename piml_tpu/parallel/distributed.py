"""Multi-host runtime initialization.

The reference is strictly single-node (SURVEY §5: nn.DataParallel only); this
is the TPU-native extension point for multi-host pods.  Single-host multi-chip
needs none of this — ``jax.devices()`` already sees all local chips; call
:func:`init_distributed` once per process before any JAX computation when
running one process per host on a pod slice (DCN-coordinated, ICI within
each slice).

Tested end-to-end (tests/test_distributed.py): two local processes of 4
virtual CPU devices each form the global 8-device mesh and run the SAME
DP finetune step as the single-host path (parallel/sharding.py, unmodified
— jax.device_put with a global NamedSharding populates each process's
addressable shards), with the gradient all-reduce crossing processes;
the loss matches the single-process mesh bit-for-bit.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["init_distributed", "is_multi_host"]

_initialized = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; TPU pod
    environments autodetect all three).  Returns True if a multi-process
    runtime was set up, False for the single-process no-op path."""
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator_address and not num_processes:
        return False  # single process — nothing to do

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def is_multi_host() -> bool:
    import jax

    return jax.process_count() > 1
