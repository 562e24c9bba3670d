"""P=4 multi-host coverage (VERDICT r3 next #6).

Two layers:
  * hermetic (one process, injected process_count/index=4): the loader's
    `_owned` row math and local-rows-concat-to-global-batch equivalence at
    four processes;
  * a real 4-process jax.distributed CPU run (no training — cheap) that
    exercises `shard_local_batch` assembly from per-process rows and
    `allgather_host_rows` including one process contributing ZERO rows.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_multihost_data import _collect, _make_dataset, _train_cfg
from ubteacher_tpu.data.loader import TwoStreamDataLoader


def test_owned_rows_p4():
    """Host p owns rows [p*n/P, (p+1)*n/P) — the loader side of the layout
    contract with shard_local_batch/shard_batch (process-ordered mesh)."""
    cfg = _train_cfg()
    images, dicts = _make_dataset(8)
    spans = []
    for pi in range(4):
        dl = TwoStreamDataLoader(
            cfg, dicts, dicts, seed=0, image_loader=lambda n: images[n],
            process_count=4, process_index=pi,
        )
        spans.append(dl._owned(8))
    assert spans == [(0, 2), (2, 4), (4, 6), (6, 8)]


def test_local_rows_concat_to_global_batch_p4():
    """Four injected-process loaders concat (in process order) to the
    global loader's batches bit-identically; each decodes a quarter."""
    cfg = _train_cfg()
    images, dicts = _make_dataset(8)
    for d in dicts:  # single orientation -> one canvas bucket
        if d["height"] > d["width"]:
            d["height"], d["width"] = d["width"], d["height"]
            images[d["file_name"]] = np.ascontiguousarray(
                images[d["file_name"]].transpose(1, 0, 2)
            )
    loader = lambda name: images[name]

    def make(pc, pi):
        return TwoStreamDataLoader(
            cfg, dicts, dicts, seed=0, image_loader=loader,
            process_count=pc, process_index=pi,
        )

    n = 2
    gbatches, gdec = _collect(make(1, 0), n)
    parts, decs = [], []
    for pi in range(4):
        b, dec = _collect(make(4, pi), n)
        parts.append(b)
        decs.append(dec)
    assert gdec == n * 8
    assert decs == [n * 2] * 4  # each host decodes exactly its quarter

    for i, g in enumerate(gbatches):
        merged = jax.tree.map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs]),
            *[parts[pi][i] for pi in range(4)],
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            g, merged,
        )


_DRIVER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp

from ubteacher_tpu.parallel.mesh import distributed_init
distributed_init(
    coordinator_address=os.environ["UBT_COORDINATOR"],
    num_processes=4,
    process_id=int(os.environ["UBT_PROCESS_ID"]),
)
pid = jax.process_index()
assert jax.process_count() == 4 and jax.device_count() == 4

from ubteacher_tpu.parallel import (
    allgather_host_rows, get_mesh, replicate, shard_local_batch,
)

mesh = get_mesh()

# --- shard_local_batch: assemble a global batch from per-process rows ---
B, H, W = 8, 4, 6
rng = np.random.default_rng(7)
g_img = rng.normal(size=(B, H, W, 3)).astype(np.float32)
g_cls = rng.integers(0, 9, size=(B, 5)).astype(np.int32)
chunk = B // 4
local = {{
    "images_label_k": g_img[pid * chunk:(pid + 1) * chunk],
    "gt_classes": g_cls[pid * chunk:(pid + 1) * chunk],
    "rng": jax.random.PRNGKey(3),
}}
batch = shard_local_batch(local, mesh)
assert batch["images_label_k"].shape == (B, H, W, 3)

fetch = jax.jit(lambda b: (b["images_label_k"], b["gt_classes"]),
                out_shardings=replicate(mesh))
img, cls = jax.device_get(fetch(batch))
np.testing.assert_array_equal(np.asarray(img), g_img)
np.testing.assert_array_equal(np.asarray(cls), g_cls)
print("ASSEMBLE_OK", pid, flush=True)

# --- allgather_host_rows with one EMPTY shard (process 2) ---
counts = [3, 1, 0, 2]
rows = (np.arange(counts[pid], dtype=np.float32)[:, None]
        + 100.0 * pid + np.zeros((1, 5), np.float32))
if counts[pid] == 0:
    rows = np.zeros((0, 5), np.float32)
gathered = allgather_host_rows(rows)
expect = np.concatenate([
    np.arange(c, dtype=np.float32)[:, None] + 100.0 * p
    + np.zeros((1, 5), np.float32)
    if c else np.zeros((0, 5), np.float32)
    for p, c in enumerate(counts)
])
np.testing.assert_array_equal(gathered, expect)
print("GATHER_OK", pid, gathered.shape[0], flush=True)

# --- all-empty gather degenerates to a local no-op ---
empty = allgather_host_rows(np.zeros((0, 7), np.float32))
assert empty.shape == (0, 7)
print("P4_OK", pid, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_four_process_shard_and_gather():
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    script = _DRIVER.format(repo=repo)

    def launch():
        port = _free_port()
        procs = []
        for pid in range(4):
            env = dict(os.environ)
            env.update({
                "UBT_COORDINATOR": f"localhost:{port}",
                "UBT_PROCESS_ID": str(pid),
                "JAX_PLATFORMS": "cpu",
            })
            procs.append(subprocess.Popen(
                [sys.executable, "-c", script],
                env=env, cwd=repo,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append((p.returncode, out, err))
        return outs

    outs = launch()
    if any(rc != 0 for rc, _, _ in outs) and any(
        "Gloo context initialization failed" in err for _, _, err in outs
    ):
        # startup race under load (see test_multihost.py) — retry once
        outs = launch()

    for rc, out, err in outs:
        assert rc == 0, f"rc={rc}\nstdout:{out[-2000:]}\nstderr:{err[-4000:]}"
    for pid, (rc, out, err) in enumerate(outs):
        assert f"ASSEMBLE_OK {pid}" in out
        assert f"GATHER_OK {pid} 6" in out  # 3+1+0+2 rows on every host
        assert f"P4_OK {pid}" in out
