"""Multi-host (multi-slice / DCN) runtime setup.

The reference is strictly single-process (SURVEY.md section 2). On TPU pods,
JAX runs one controller per host; this helper wraps
``jax.distributed.initialize`` so the CLIs work unchanged on a pod slice:

- every host constructs the same global mesh over ``jax.devices()``;
- the ``Loader`` slices each global batch by ``jax.process_index()``
  (see ``data/loader.py``), so hosts feed only their local shard;
- eval reductions and gradient all-reduces are XLA collectives over
  ICI within a slice and DCN across slices — nothing else changes.

Call :func:`ensure_distributed` once at program start. It is a no-op in
single-process settings (including tests and CPU smoke runs), and reads the
standard TPU environment (coordinator address etc.) when launched by the TPU
runtime.
"""

from __future__ import annotations

import os

import jax

_INITIALIZED = False


def ensure_distributed() -> None:
    """Initialize the JAX distributed runtime when running multi-host.

    Safe to call unconditionally: skips when already initialized or when no
    multi-host environment is detected (no coordinator configured and no TPU
    pod metadata available).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    multi_host_hint = (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    )
    if not multi_host_hint:
        _INITIALIZED = True
        return
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError) as e:
        # Tolerate ONLY the already-initialized case (launcher did it for
        # us); a genuine failure must not silently degrade the pod into N
        # independent single-host trainings that each see the full dataset
        # and write the same checkpoint directory.
        already = "already initialized" in str(e).lower()
        if not already and jax.process_count() == 1:
            raise RuntimeError(
                "multi-host environment detected (coordinator address set) "
                f"but jax.distributed.initialize failed: {e}"
            ) from e
        print(f"jax.distributed.initialize skipped: {e}")
    _INITIALIZED = True


def sync_any_flag(flag: bool) -> bool:
    """Cross-host OR of a host-local boolean (single-process: identity).

    Used to agree on loop-control decisions that originate host-locally —
    e.g. a SIGTERM preemption flag, which lands at slightly different times
    on different hosts. Breaking a training loop on an unsynchronized flag
    deadlocks the pod: the early host leaves the collective program while
    the others dispatch another step's all-reduce. Every host must call
    this at the same loop points (it is a collective).
    """
    if jax.process_count() == 1:
        return bool(flag)
    import numpy as np
    from jax.experimental import multihost_utils

    return bool(multihost_utils.process_allgather(np.asarray(flag)).any())
