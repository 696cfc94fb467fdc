"""Multi-process (multi-host / multi-slice) initialization.

The reference is single-process with a hardcoded device id (train.py:23).
On TPU pods, JAX runs one process per host; `maybe_initialize()` wires
jax.distributed from the standard environment (TPU metadata or explicit
coordinator variables) so `jax.devices()` spans the whole slice and the
mesh in parallel/mesh.py covers every chip.  Collectives then ride ICI
within a slice and DCN across slices — all inserted by GSPMD, no user
communication code.

No-op when the environment is single-process (the common dev case), so
every entry point can call it unconditionally.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed when a multi-process env is detected.

    Detection: JAX_COORDINATOR_ADDRESS (explicit), or standard TPU pod
    env vars.  Returns True if distributed mode is active.
    """
    global _initialized
    if _initialized:
        return True
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_procs = os.environ.get("JAX_NUM_PROCESSES")
    proc_id = os.environ.get("JAX_PROCESS_ID")
    try:
        if coord and num_procs and proc_id:
            jax.distributed.initialize(coordinator_address=coord,
                                       num_processes=int(num_procs),
                                       process_id=int(proc_id))
            _initialized = True
            log.info("jax.distributed: process %s/%s via %s",
                     proc_id, num_procs, coord)
            return True
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if "," in hosts or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            # only when the TPU metadata names MULTIPLE workers
            jax.distributed.initialize()  # TPU metadata autodetection
            _initialized = True
            log.info("jax.distributed: auto-initialized, %d processes",
                     jax.process_count())
            return True
    except (RuntimeError, ValueError) as e:
        # backend already up (tests, notebooks), re-init, or incomplete
        # pod metadata: stay single-process
        log.warning("jax.distributed not initialized: %s", e)
    return False


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax
    return jax.process_index() == 0
