"""Multi-host bring-up.

SURVEY.md §2.5: the reference has no communication backend; the
TPU-native equivalent is `jax.distributed.initialize()` (one process per
host, devices discovered via the TPU runtime) followed by a global mesh.
This module wraps the bootstrap so solver code stays identical between
single-host and pod-slice runs.
"""

from __future__ import annotations

import jax

__all__ = ["initialize_distributed"]

_initialized = False


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize JAX's multi-host runtime (idempotent).

    With no arguments, relies on the TPU environment's auto-discovery
    (the standard pod-slice path).  Returns (process_index,
    process_count, device_count).
    """
    global _initialized
    if not _initialized and jax.process_count() == 1:
        try:
            kwargs = {}
            if coordinator_address is not None:
                kwargs["coordinator_address"] = coordinator_address
            if num_processes is not None:
                kwargs["num_processes"] = num_processes
            if process_id is not None:
                kwargs["process_id"] = process_id
            jax.distributed.initialize(**kwargs)
            _initialized = True
        except (RuntimeError, ValueError):
            # single-process environment (tests, one host): fine
            _initialized = True
    return jax.process_index(), jax.process_count(), jax.device_count()
