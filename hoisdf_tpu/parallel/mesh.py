"""Device mesh + sharding helpers.

The reference's only parallelism is single-process DataParallel
(``common/base.py:103``).  The TPU-native equivalent (SURVEY.md §5, §7) is
single-controller SPMD: a 1-D ``data`` mesh, batch sharded over it, params
replicated; XLA inserts the gradient all-reduce over ICI.  The helpers keep a
seam for richer meshes (a ``model`` axis is accepted and threaded through) so
tensor-parallel sharding can be layered on without API changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_axis: str = "data",
    model_axis_size: int = 1,
    model_axis: str = "model",
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_axis_size == 0, (n, model_axis_size)
    arr = np.asarray(devices).reshape(n // model_axis_size, model_axis_size)
    return Mesh(arr, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place every array in the batch pytree with its batch dim sharded.

    Multi-host aware: on a pod slice (``jax.process_count() > 1``) each
    process holds only its DataLoader shard's slice of the global batch
    (docs/SCALING.md), so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — each host contributes its
    local rows, XLA sees one global array sharded over ``data``.  Single
    process falls back to a plain ``device_put`` (identical result).
    """
    sh = batch_sharding(mesh, data_axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
