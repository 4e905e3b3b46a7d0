"""Multi-host process-group setup (SURVEY.md §5.8).

The reference has no distributed backend at all (§2.5).  TPU-native design:

  * ``jax.distributed.initialize()`` forms the process group (one process per
    host); afterwards ``jax.devices()`` spans the full slice/pod and the SAME
    mesh + sharding code from ``parallel/mesh.py`` runs unchanged — XLA's
    collectives ride ICI within a slice and DCN across slices.
  * Each host feeds its local shard of utterances
    (``jax.make_array_from_process_local_data``); the model pack and graph
    are loaded (replicated) on every host — HCLG at this scale fits easily.

This module is a thin, testable wrapper: on a single host it is a no-op, so
the whole framework works identically from laptop CPU to pod.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host process group; no-op for single-process runs.

    With no arguments, relies on the environment (TPU metadata / JAX
    auto-detection), matching ``jax.distributed.initialize()`` semantics.
    """
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and num_processes is None \
            and jax.process_count() == 1:
        # Single-process already initialized implicitly.
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_batch_to_global(mesh, batch: np.ndarray):
    """Assemble a globally-sharded array from per-host local batches.

    Each host passes its local utterance shard (local_B, ...); the result is
    a global jax.Array sharded over the mesh's ``data`` axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .mesh import DATA_AXIS
    sharding = NamedSharding(
        mesh, P(DATA_AXIS, *([None] * (batch.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, batch)
