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


def distributed_init(**kwargs) -> None:
    """jax.distributed.initialize + an immediate warmup collective.

    The coordination-service handshake synchronizes processes, but the
    backend's collective context (Gloo on CPU hosts) is established only
    at the FIRST collective, whose peer-address KV lookup has a fixed
    ~30s window. If processes first meet at a collective sitting behind
    minutes of per-process compile skew (1-CPU CI container serializing
    two ~2-min mutual-step compiles), startup races with
    "Gloo context initialization failed: DEADLINE_EXCEEDED" (observed
    r5). Running one trivial global sync right after initialize — while
    processes are still handshake-synced — pins context establishment
    to a synchronized point; the big program's collectives reuse it.
    (The reference's NCCL analog is DDP's eager process-group init at
    construction time, trainer.py:60-63 — same idea.)"""
    jax.distributed.initialize(**kwargs)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ubt_distributed_init")


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


def shard_over_data(call, batch_size: int, n_in: int):
    """Wrap a Pallas-calling function in shard_map over the active mesh's
    batch axis (see set_active_mesh). `call` takes `n_in` arrays whose
    leading dim is the batch; returns `call` unchanged when no mesh is
    active, it is trivial, or the batch doesn't divide it. The canonical
    pattern shared by ops.roi_align / modeling.matcher /
    ops.pallas.row_gather_pallas."""
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.size <= 1 or batch_size % mesh.size != 0:
        return call
    spec = P(tuple(mesh.axis_names))
    return jax.shard_map(
        call,
        mesh=mesh,
        in_specs=(spec,) * n_in,
        out_specs=spec,
        # pallas_call out_shapes carry no varying-axes info
        check_vma=False,
    )


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
    `data` when divisible; other leaves (PRNG keys, scalars) replicate.

    Multi-host (jax.process_count() > 1): every host builds the SAME
    global batch (loaders are seeded identically from cfg.SEED), and each
    host ships only the rows owned by its addressable devices — get_mesh
    lays devices out in process order, so host p owns rows
    [p*B/P, (p+1)*B/P). This is the GSPMD analog of the reference's
    per-rank loader split (build.py:227-241).
    """
    n = mesh.shape["data"]
    sh = batch_sharding(mesh)
    rep = replicate(mesh)
    pc = jax.process_count()

    def put(x):
        shaped = hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0
        if pc == 1:
            return jax.device_put(x, sh if shaped else rep)
        x = np.asarray(x)
        if not shaped:
            return jax.make_array_from_process_local_data(rep, x)
        chunk = x.shape[0] // pc
        pid = jax.process_index()
        local = np.ascontiguousarray(x[pid * chunk : (pid + 1) * chunk])
        return jax.make_array_from_process_local_data(
            sh, local, global_shape=x.shape
        )

    return jax.tree.map(put, batch)


def shard_local_batch(batch: dict, mesh: Mesh) -> Any:
    """shard_batch for multi-host loaders that prepare ONLY their own rows.

    Every batch-dim leaf holds this process's chunk (leading dim B/P, in
    process order — TwoStreamDataLoader._owned); the global array is
    assembled without any host ever materializing rows it doesn't own,
    which is what keeps host-side decode/augment work constant as hosts
    are added (the reference's per-rank loader split, build.py:227-241).
    The 'rng' key must be identical on every host and replicates.
    """
    pc = jax.process_count()
    if pc == 1:
        return shard_batch(batch, mesh)
    sh = batch_sharding(mesh)
    rep = replicate(mesh)

    def put_rows(x):
        x = np.ascontiguousarray(np.asarray(x))
        return jax.make_array_from_process_local_data(
            sh, x, global_shape=(x.shape[0] * pc,) + x.shape[1:]
        )

    out = {}
    for k, v in batch.items():
        if k == "rng":
            out[k] = jax.make_array_from_process_local_data(rep, np.asarray(v))
        else:
            out[k] = jax.tree.map(put_rows, v)
    return out


def allgather_host_rows(rows: np.ndarray) -> np.ndarray:
    """Concatenate per-process host (n_p, d) row arrays across processes.

    The multi-host eval gather: each process evaluates its InferenceSampler
    shard of the test set and the fixed-width detection rows are
    all-gathered so every host computes identical metrics (the reference
    gathers predictions via comm.gather in DatasetEvaluator.evaluate).
    Row counts may differ per process — rows are padded to the max count,
    gathered through a jitted allgather, and un-padded. No-op single-host.
    """
    rows = np.asarray(rows)
    if rows.ndim == 1:
        rows = rows.reshape(0, 1) if rows.size == 0 else rows[:, None]
    if jax.process_count() == 1:
        return rows
    from jax.experimental import multihost_utils

    counts = multihost_utils.process_allgather(
        np.asarray(rows.shape[0], np.int64)
    )  # (P,)
    mx = int(counts.max())
    if mx == 0:
        return rows
    pad = np.zeros((mx, rows.shape[1]), rows.dtype)
    pad[: rows.shape[0]] = rows
    gathered = np.asarray(multihost_utils.process_allgather(pad))  # (P, mx, d)
    return np.concatenate(
        [gathered[p, : int(counts[p])] for p in range(gathered.shape[0])]
    )
