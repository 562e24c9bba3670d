"""Device mesh + GSPMD sharding helpers.

The TPU-native replacement for the reference's NCCL DDP process-per-GPU
launch (reference: train_net.py:66-73, trainer.py:60-63). One process, one
jitted program: batches are sharded over the `data` mesh axis, parameters
are replicated, and gradient/normalizer reductions become XLA collectives
inserted by GSPMD (the reference's explicit reduce_sum at
utils/comm.py:7-13 disappears into the compiled step).

Multi-host: call jax.distributed.initialize() before get_mesh() and the
same code spans slices (DCN between hosts, ICI within).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_ACTIVE_MESH: Mesh | None = None


def set_active_mesh(mesh: Mesh | None) -> None:
    """Register the mesh the train/eval steps are sharded over.

    Pallas kernels are opaque to GSPMD: under a sharded jit, XLA silently
    REPLICATES them (all-gathers the inputs, computes the full batch on
    every device — verified on an 8-device mesh). Ops that dispatch to
    Pallas consult this to wrap the kernel in shard_map over the `data`
    axis instead, keeping per-device work at batch/n."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


def get_mesh(num_devices: int = -1) -> Mesh:
    """1-D data-parallel mesh over all (or the first N) visible devices."""
    devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over `data`."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host pytree, sharding each leaf's leading dim over
    `data` when divisible; other leaves (PRNG keys, scalars) replicate."""
    n = mesh.shape["data"]
    sh = batch_sharding(mesh)
    rep = replicate(mesh)

    def put(x):
        shaped = hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0
        return jax.device_put(x, sh if shaped else rep)

    return jax.tree.map(put, batch)
