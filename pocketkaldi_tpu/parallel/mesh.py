"""Device-mesh helpers.

The reference has no distributed/parallel machinery at all (SURVEY.md §2.5);
this module is the net-new TPU-native design: a ``jax.sharding.Mesh`` with a
``data`` axis over utterances (the throughput axis) and an optional ``model``
axis for tensor-sharding the acoustic model.  Collectives are inserted by XLA
from sharding annotations (GSPMD) — never hand-written NCCL-style calls.

Multi-host use: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts; ``data`` shards ride ICI within a slice and DCN
across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None,
              model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch/utterance) axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_shards(batch: np.ndarray, mesh: Mesh) -> Tuple[np.ndarray, int]:
    """Right-pad the batch dim to a multiple of the data-axis size."""
    d = mesh.shape[DATA_AXIS]
    b = batch.shape[0]
    padded = (b + d - 1) // d * d
    if padded != b:
        pad = [(0, padded - b)] + [(0, 0)] * (batch.ndim - 1)
        batch = np.pad(batch, pad)
    return batch, padded - b
