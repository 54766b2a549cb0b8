"""Multi-host bootstrap.

The reference launches with `accelerate launch --num_machines=1
--main_process_port 29500` (train_omgsr_s_512.sh:2-7) and its vendored tree
carries a torch.distributed/SLURM stack. The TPU-native equivalent is
jax.distributed: on Cloud TPU pods the runtime provides coordinator
discovery automatically; elsewhere pass coordinator_address/num_processes/
process_id explicitly.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger("omgsr_tpu.distributed")

_initialized = False


def initialize(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """Idempotent jax.distributed.initialize. Safe to call on single-host
    (no-ops if the runtime reports one process and no coordinator is given)."""
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and num_processes in (None, 1):
        # single-process run (the common dev case); nothing to do
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local devices",
        jax.process_index(), jax.process_count(), jax.local_device_count(),
    )


def is_main_process() -> bool:
    return jax.process_index() == 0
