"""Device mesh + sharding helpers.

The reference scales with single-node DDP over NCCL
(``handler/train/handler.py:419-432,487-498``). The TPU-native equivalent is
SPMD: one jitted train step over a ``jax.sharding.Mesh`` with the batch sharded
on a ``data`` axis and params replicated. Gradient averaging is implicit —
the loss is a global mean, so XLA emits the ``psum`` over ICI. For multi-host
(DCN) the same program runs after ``jax.distributed.initialize()``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    model_parallel: int = 1,
    model_axis_name: str = "model",
) -> Mesh:
    """1-D data mesh, or a 2-D (data, model) mesh when ``model_parallel > 1``.

    The model axis is the MINOR (fastest-varying) dimension so tensor-parallel
    collectives ride adjacent devices (ICI) while the data axis spans the rest.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if model_parallel <= 1:
        return Mesh(np.asarray(devices), (axis_name,))
    n = len(devices)
    assert n % model_parallel == 0, (
        f"{n} devices not divisible by model_parallel={model_parallel}"
    )
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (axis_name, model_axis_name))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Place a host batch onto the mesh, sharded over the data axis.

    Every array's leading dim must be divisible by the mesh size — the batch
    padding buckets guarantee that.

    Single-process: a plain ``device_put`` with the batch sharding. Multi-host
    (``jax.distributed.initialize()`` ran, so the mesh spans devices this
    process cannot address): every process holds the same host-global batch
    (the iterators are seeded identically on every host), and
    ``jax.make_array_from_callback`` materialises only the rows belonging to
    this process's addressable devices. This is the SPMD analogue of the
    reference's per-rank batch slicing ``batches[rank::world]``
    (``component/train_task/base_task.py:123-126``) — there each rank loads
    its own sub-batch for NCCL DDP; here each host contributes its shard of
    one global array and the gradient allreduce is XLA's psum over ICI/DCN.
    """
    sharding = batch_sharding(mesh, axis_name)
    multiprocess = jax.process_count() > 1

    def _put(x):
        if not isinstance(x, np.ndarray):
            return x
        if not multiprocess:
            return jax.device_put(x, sharding)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(_put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
