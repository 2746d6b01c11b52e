"""Multi-process (multi-host) initialization.

The reference is strictly single-process (SURVEY.md section 2.7); the
TPU-native scale-out path is `jax.distributed` + GSPMD over the global
device mesh: every process calls :func:`maybe_init_distributed` before any
jax usage, then builds a :func:`global_device_mesh` spanning all processes
— the SAME sharded pipeline code (parallel/sharding.py, FlowProblem with
``device_mesh=``) then runs with XLA collectives riding ICI within a slice
and DCN across slices.

Configuration follows JAX's standard environment contract: on Cloud TPU
pods `jax.distributed.initialize()` autodetects everything; elsewhere set

    MESHFLOW_COORDINATOR=host:port   (or JAX_COORDINATOR_ADDRESS)
    MESHFLOW_NUM_PROCESSES=N         (or JAX_NUM_PROCESSES)
    MESHFLOW_PROCESS_ID=i            (or JAX_PROCESS_ID)

With none of these present this is a no-op, so single-process runs (tests,
the CLI on one chip) never pay for it.
"""

from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False


def _env(*names: str) -> Optional[str]:
    for n in names:
        v = os.environ.get(n)
        if v:
            return v
    return None


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when a coordinator is configured.

    Returns True iff running distributed (after this call). Idempotent;
    a no-op without coordinator configuration.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coord = _env("MESHFLOW_COORDINATOR", "JAX_COORDINATOR_ADDRESS")
    auto_tpu_pod = os.environ.get("MESHFLOW_DIST_AUTO", "") == "1"
    if not coord and not auto_tpu_pod:
        return False
    import jax

    if coord:
        nproc = int(_env("MESHFLOW_NUM_PROCESSES", "JAX_NUM_PROCESSES") or "1")
        pid = int(_env("MESHFLOW_PROCESS_ID", "JAX_PROCESS_ID") or "0")
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=nproc, process_id=pid)
    else:
        jax.distributed.initialize()  # TPU pod autodetection
    _INITIALIZED = True
    return True


def global_device_mesh(axis: str = "dp"):
    """A 1-D mesh over ALL processes' devices (jax.devices() is global
    after jax.distributed.initialize)."""
    import numpy as np

    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))
