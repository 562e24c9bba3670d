"""Anchor-gt IoU matcher as Pallas TPU kernels (D2 Matcher semantics).

The XLA formulation (modeling/matcher.py: pairwise_iou -> where -> max /
argmax / per-gt max / promote) materializes the (M, A) quality matrix in
HBM and re-reads it for every reduction — ~11 ms/step at RCNN shapes
(M=100 padded gt x A=258k anchors x 8 images), almost all of it memory
traffic and padded-gt compute. Here quality never leaves VMEM and the gt
dimension is processed in chunks of 8 rows bounded by the REAL max valid
gt index (scalar-prefetched per image), so cost scales with actual
annotations (~12/image) instead of the MAX_GT pad.

Two kernels, both gridded (B, anchor-blocks) with the anchor dim in
2048-lane tiles:
  * _gm_kernel: per-gt best IoU (the allow_low_quality reference point),
    accumulated across anchor blocks in a resident output block;
  * _match_kernel: recomputes the IoU chunk (cheap VPU math beats an HBM
    round-trip), tracks running max / first-argmax / threshold labels and
    promotes each gt's best anchors.

Arithmetic is ordered exactly like ops.boxes.pairwise_iou +
modeling.matcher.match (same sub/max/mul/div sequence), so results are
bitwise identical to the XLA path — asserted by tests/test_matcher_pallas
fuzz and tools/validate_tpu.py on hardware.

Reference behavior: detectron2 Matcher with allow_low_quality_matches as
consumed by PseudoLabRPN (reference: ubteacher/modeling/proposal_generator/
rpn.py:117-134).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 2048   # anchors per block
_GT_SUB = 8     # gt rows per chunk (one sublane group)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _iou_chunk(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """(8, 8) gt chunk [x1 y1 x2 y2 area valid 0 0] x (8, W) anchor rows
    [x1 y1 x2 y2 area 0 0 0] -> forced quality (8, W).

    Same arithmetic ordering as ops.boxes.pairwise_iou followed by
    modeling.matcher.match_quality's invalid-row forcing. The division is
    Newton-refined: Mosaic lowers f32 `a / b` via the hardware approximate
    reciprocal (~2.4e-4 relative error — enough to flip labels for anchors
    with IoU that close to the 0.3/0.7 thresholds, where XLA's ~1-ulp
    division would not), and one refinement step squares the error to
    ~6e-8, below f32 ulp scale. The kept-set/label outputs then match the
    XLA path except on exact-ulp boundary ties (none observed across the
    fuzz seeds or the hardware check)."""
    gx1, gy1, gx2, gy2 = (g[:, i : i + 1] for i in range(4))
    garea = g[:, 4:5]
    gvalid = g[:, 5:6]
    ax1, ay1, ax2, ay2, aarea = (a[i : i + 1] for i in range(5))
    wx = jnp.maximum(jnp.minimum(gx2, ax2) - jnp.maximum(gx1, ax1), 0.0)
    wy = jnp.maximum(jnp.minimum(gy2, ay2) - jnp.maximum(gy1, ay1), 0.0)
    inter = wx * wy
    union = (garea + aarea) - inter
    u = jnp.maximum(union, 1e-12)
    r = 1.0 / u
    r = r * (2.0 - u * r)  # Newton step: approx-reciprocal error squared
    iou = jnp.where(union > 0, inter * r, 0.0)
    return jnp.where(gvalid > 0, iou, -1.0)


def _gm_kernel(nc_ref, gt_ref, anch_ref, gm_ref):
    blk = pl.program_id(1)

    @pl.when(blk == 0)
    def _():
        gm_ref[...] = jnp.full_like(gm_ref, -1.0)

    a = anch_ref[0]                                   # (8, W)

    def chunk(c, _):
        q = _iou_chunk(gt_ref[0, c], a)               # (8, W)
        gm_ref[0, c] = jnp.maximum(
            gm_ref[0, c], q.max(axis=1, keepdims=True)
        )
        return 0

    jax.lax.fori_loop(0, nc_ref[pl.program_id(0)], chunk, 0)


def _match_kernel(
    nc_ref, gt_ref, anch_ref, gm_ref, mi_ref, lab_ref,
    *,
    thresholds: Tuple[float, ...],
    labels: Tuple[int, ...],
    allow_low_quality: bool,
):
    b = pl.program_id(0)
    blk = pl.program_id(1)
    a = anch_ref[0]                                   # (8, W)
    w = a.shape[-1]

    def chunk(c, carry):
        mv, mi, pr = carry
        q = _iou_chunk(gt_ref[0, c], a)               # (8, W)
        cmax = q.max(axis=0, keepdims=True)           # (1, W)
        rows = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0) + c * _GT_SUB
        cargm = jnp.min(
            jnp.where(q == cmax, rows, jnp.int32(2**30)),
            axis=0, keepdims=True,
        )
        # strict > keeps the EARLIER chunk on ties — matches argmax's
        # first-occurrence semantics; within a chunk the iota-min above
        # picks the first row
        better = cmax > mv
        mv = jnp.where(better, cmax, mv)
        mi = jnp.where(better, cargm, mi)
        if allow_low_quality:
            gm = gm_ref[0, c]                         # (8, 1)
            hit = jnp.where((q == gm) & (gm > 0), 1.0, 0.0)
            pr = jnp.maximum(pr, hit.max(axis=0, keepdims=True))
        return mv, mi, pr

    mv, mi, pr = jax.lax.fori_loop(
        0,
        nc_ref[b],
        chunk,
        (
            jnp.full((1, w), -jnp.inf, jnp.float32),
            jnp.zeros((1, w), jnp.int32),
            jnp.zeros((1, w), jnp.float32),
        ),
    )
    lab = jnp.full((1, w), labels[0], jnp.int32)
    for lo, lv in zip(thresholds, labels[1:]):
        lab = jnp.where(mv >= lo, lv, lab)
    if allow_low_quality:
        lab = jnp.where(pr > 0, 1, lab)
    # the (1, NBA, W) output block stays resident across the anchor-block
    # grid dim; store this block's row by dynamic sublane slice (Mosaic
    # requires block dims divisible by (8, 128) or equal to the array's,
    # so a (1, 1, W) block spec is not lowerable)
    mi_ref[0, pl.ds(blk, 1), :] = mi
    lab_ref[0, pl.ds(blk, 1), :] = lab


def _pack_anchors(anchors: jnp.ndarray, w: int) -> jnp.ndarray:
    """(A, 4) -> (NBA, 8, w) rows [x1 y1 x2 y2 area 0 0 0]; padding
    anchors are zero boxes (area 0, IoU 0) and are sliced off after."""
    a = anchors.shape[0]
    ap = _round_up(a, w)
    x1, y1, x2, y2 = (anchors[:, i] for i in range(4))
    ar = (x2 - x1) * (y2 - y1)                 # same order as ops.boxes.area
    packed = jnp.zeros((8, ap), jnp.float32)
    for i, v in enumerate((x1, y1, x2, y2, ar)):
        packed = packed.at[i, :a].set(v)
    return packed.reshape(8, ap // w, w).transpose(1, 0, 2)


def _pack_gt(gt_boxes: jnp.ndarray, gt_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, M, 4) + (B, M) -> (B, MC, 8, 8) cols [x1 y1 x2 y2 area valid 0 0]."""
    b, m, _ = gt_boxes.shape
    mp = _round_up(m, _GT_SUB)
    x1, y1, x2, y2 = (gt_boxes[..., i] for i in range(4))
    ar = (x2 - x1) * (y2 - y1)
    cols = [x1, y1, x2, y2, ar, gt_mask.astype(jnp.float32)] + [
        jnp.zeros((b, m), jnp.float32)
    ] * 2
    packed = jnp.stack(cols, axis=-1)                    # (B, M, 8)
    packed = jnp.pad(packed, ((0, 0), (0, mp - m), (0, 0)))
    return packed.reshape(b, mp // _GT_SUB, _GT_SUB, 8)


@functools.partial(
    jax.jit,
    static_argnames=("thresholds", "labels", "allow_low_quality", "interpret"),
)
def match_anchors_pallas(
    anchors: jnp.ndarray,    # (A, 4) xyxy, shared across the batch
    gt_boxes: jnp.ndarray,   # (B, M, 4)
    gt_mask: jnp.ndarray,    # (B, M) bool
    thresholds: Tuple[float, ...] = (0.3, 0.7),
    labels: Tuple[int, ...] = (0, -1, 1),
    allow_low_quality: bool = True,
    interpret=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched D2 matcher; returns (matched_idxs, labels), each (B, A) i32.

    Bitwise-equal to vmapping modeling.matcher.match_quality + match over
    the batch. Non-differentiable (integer outputs). interpret=None
    resolves by backend (compiled on TPU, interpreted elsewhere)."""
    if interpret is None:
        from jax.extend import backend as _jax_backend

        interpret = _jax_backend.get_backend().platform != "tpu"
    anchors = jax.lax.stop_gradient(anchors)
    gt_boxes = jax.lax.stop_gradient(gt_boxes)
    b, m, _ = gt_boxes.shape
    a = anchors.shape[0]
    w = min(_LANES, _round_up(a, 128))
    anch = _pack_anchors(anchors, w)                     # (NBA, 8, w)
    nba = anch.shape[0]
    gt = _pack_gt(gt_boxes, gt_mask)                     # (B, MC, 8, 8)
    mc = gt.shape[1]
    # chunks to process = ceil((last valid gt index + 1) / 8); padded rows
    # beyond it contribute exactly the -1 the XLA path forces, via init
    last = jnp.max(
        gt_mask * (jnp.arange(1, m + 1, dtype=jnp.int32)[None]), axis=1
    )
    nc = (last + _GT_SUB - 1) // _GT_SUB                 # (B,) i32

    gm = pl.pallas_call(
        _gm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nba),
            in_specs=[
                pl.BlockSpec(
                    (1, mc, _GT_SUB, 8), lambda bi, ki, nc_: (bi, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 8, w), lambda bi, ki, nc_: (ki, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, mc, _GT_SUB, 1), lambda bi, ki, nc_: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, mc, _GT_SUB, 1), jnp.float32),
        interpret=interpret,
    )(nc, gt, anch)

    mi, lab = pl.pallas_call(
        functools.partial(
            _match_kernel,
            thresholds=tuple(thresholds),
            labels=tuple(labels),
            allow_low_quality=allow_low_quality,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nba),
            in_specs=[
                pl.BlockSpec(
                    (1, mc, _GT_SUB, 8), lambda bi, ki, nc_: (bi, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 8, w), lambda bi, ki, nc_: (ki, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, mc, _GT_SUB, 1), lambda bi, ki, nc_: (bi, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, nba, w), lambda bi, ki, nc_: (bi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, nba, w), lambda bi, ki, nc_: (bi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, nba, w), jnp.int32),
            jax.ShapeDtypeStruct((b, nba, w), jnp.int32),
        ],
        interpret=interpret,
    )(nc, gt, anch, gm)

    return mi.reshape(b, -1)[:, :a], lab.reshape(b, -1)[:, :a]
