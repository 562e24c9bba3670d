"""Greedy NMS as a Pallas TPU kernel.

Replaces the O(K^2)-memory XLA path in ops/nms.py (which materializes the
full IoU matrix) with a streaming kernel: boxes live in VMEM as a (8, K)
lane-major tile (x1, y1, x2, y2, area, valid in separate sublanes); the
sequential greedy pass keeps a (1, K) suppression row in scratch and
computes each row's IoU vector on the fly on the VPU — no K x K
materialization. Exact same kept set as ops.nms.nms_keep
(torchvision semantics: suppress IoU > threshold).

The caller pre-sorts by score descending (XLA sort) and pads K to a
multiple of 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, out_ref, sup_ref, *, k: int, iou_threshold: float):
    """boxes_ref: (8, K) f32 rows = [x1, y1, x2, y2, area, valid, 0, 0]
    out_ref: (1, K) f32 keep mask; sup_ref: (1, K) f32 scratch.

    Scalar extraction of row i uses one-hot reductions (col == i) instead of
    dynamic slicing — Mosaic has no dynamic_slice on values, and masked
    reductions map directly onto the VPU.
    """
    sup_ref[...] = jnp.zeros((1, k), jnp.float32)
    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    area = boxes_ref[4:5, :]
    valid = boxes_ref[5:6, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        onehot = (col == i).astype(jnp.float32)

        def pick(row):
            return jnp.sum(row * onehot)

        keep_i = (pick(valid) > 0.0) & (pick(sup_ref[...]) == 0.0)

        @pl.when(keep_i)
        def _():
            bx1 = pick(x1)
            by1 = pick(y1)
            bx2 = pick(x2)
            by2 = pick(y2)
            barea = pick(area)
            ix1 = jnp.maximum(x1, bx1)
            iy1 = jnp.maximum(y1, by1)
            ix2 = jnp.minimum(x2, bx2)
            iy2 = jnp.minimum(y2, by2)
            inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
            union = area + barea - inter
            iou = jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-12), 0.0)
            newly = (iou > iou_threshold) & (col > i)
            sup_ref[...] = jnp.maximum(
                sup_ref[...], newly.astype(jnp.float32)
            )

        return 0

    jax.lax.fori_loop(0, k, body, 0)
    out_ref[...] = jnp.where(
        (valid > 0.0) & (sup_ref[...] == 0.0), 1.0, 0.0
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_keep_pallas(
    boxes: jnp.ndarray,    # (K, 4) xyxy
    scores: jnp.ndarray,   # (K,)
    valid: jnp.ndarray,    # (K,) bool
    iou_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in equivalent of ops.nms.nms_keep. Returns keep mask (K,).

    Non-differentiable by construction (the output is a boolean mask);
    inputs are stop_gradient'ed so autodiff tracing never descends into the
    pallas_call.
    """
    boxes = jax.lax.stop_gradient(boxes)
    scores = jax.lax.stop_gradient(scores)
    k_in = boxes.shape[0]
    k = _round_up(k_in, 128)

    masked = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-masked)
    sboxes = boxes[order]
    svalid = valid[order]

    x1, y1, x2, y2 = (sboxes[:, i] for i in range(4))
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    packed = jnp.zeros((8, k), jnp.float32)
    packed = packed.at[0, :k_in].set(x1)
    packed = packed.at[1, :k_in].set(y1)
    packed = packed.at[2, :k_in].set(x2)
    packed = packed.at[3, :k_in].set(y2)
    packed = packed.at[4, :k_in].set(area)
    packed = packed.at[5, :k_in].set(svalid.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_nms_kernel, k=k, iou_threshold=iou_threshold),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32)],
        interpret=interpret,
    )(packed)

    keep_sorted = out[0, :k_in] > 0.5
    return jnp.zeros((k_in,), bool).at[order].set(keep_sorted)
