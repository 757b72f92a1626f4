"""Multi-host / multi-chip runtime helpers.

TPU-native counterpart of the reference's NCCL plumbing
(``lavis/common/dist_utils.py:57-92``): instead of
``torch.distributed.init_process_group`` + DDP objects, the entire
distributed story is `jax.distributed.initialize()` (multi-host only) plus
SPMD sharding — gradient reduction happens inside the jitted step as a mesh
`psum`, so there is nothing like DDP to wrap.  What remains host-side is
rank bookkeeping (`is_main_process`, `@main_process`) used for logging and
result merging, which this module provides with identical semantics.
"""

from __future__ import annotations

import functools
import os

import jax
import numpy as np

_initialized = False


def init_distributed_mode(run_cfg=None) -> None:
    """Initialise multi-host JAX if coordinator env vars are present.

    Single-host (the common case in tests and on one chip/slice) needs no
    initialisation at all; this function is then a no-op, mirroring the
    reference's ``distributed=False`` branch (dist_utils.py:62-66).

    Rendezvous env vars, in precedence order:
      * ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES`` /
        ``JAX_PROCESS_ID``) — native names;
      * ``MASTER_ADDR``/``MASTER_PORT`` + ``RANK``/``WORLD_SIZE`` — the
        reference's ``env://`` names (dist_utils.py:57-76), so its
        launch scripts keep working verbatim;
      * any cluster auto-detection jax.distributed supports (SLURM, …).
    """
    global _initialized
    if _initialized:
        return
    if run_cfg is not None and not run_cfg.get("distributed", True):
        _initialized = True
        return
    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if addr is None and os.environ.get("MASTER_ADDR") \
            and os.environ.get("RANK") is not None:
        addr = (os.environ["MASTER_ADDR"] + ":"
                + os.environ.get("MASTER_PORT", "29500"))
    if addr:
        num = (os.environ.get("JAX_NUM_PROCESSES")
               or os.environ.get("WORLD_SIZE"))
        pid = os.environ.get("JAX_PROCESS_ID") or os.environ.get("RANK")
        if num is not None and pid is not None:
            jax.distributed.initialize(coordinator_address=addr,
                                       num_processes=int(num),
                                       process_id=int(pid))
        else:
            jax.distributed.initialize()
    _initialized = True


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_dist_avail_and_initialized() -> bool:
    return jax.process_count() > 1


def is_main_process() -> bool:
    return get_rank() == 0


def main_process(func):
    """Run only on process 0 (reference ``@main_process`` dist_utils.py:109-116)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return func(*args, **kwargs)
        return None

    return wrapper


def barrier() -> None:
    """Cross-host sync point.

    Implemented as a tiny global psum so it works on any backend without a
    separate coordination service (replaces ``dist.barrier()`` call sites,
    reference runner_base.py:423, base_task.py:104-106).
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("vlmc_barrier")


def all_reduce_scalar(value: float, op: str = "sum") -> float:
    """Reduce a host scalar across processes (metric sync, logger.py:43-48)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(value, np.float64))
    if op == "sum":
        return float(np.sum(arr))
    if op == "mean":
        return float(np.mean(arr))
    if op == "max":
        return float(np.max(arr))
    raise ValueError(op)
