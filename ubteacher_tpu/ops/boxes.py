"""Box geometry ops, fully vectorized / fixed-shape.

Equivalents of detectron2's Boxes ops and the reference's ltrb handling
(reference: ubteacher/utils/comm.py:54-93, fcos_outputs.py:91-129).
All functions broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; (..., 4) -> (...)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return w * h


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU between all pairs; (N, 4) x (M, 4) -> (N, M). xyxy format.

    Matches detectron2.structures.pairwise_iou (used by the reference's
    anchor/proposal matchers, rpn.py:117, roi_heads.py:156).
    """
    a1 = area(boxes1)  # (N,)
    a2 = area(boxes2)  # (M,)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # (N, M, 2)
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # (N, M, 2)
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def matched_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Element-wise IoU of aligned box arrays; (..., 4) x (..., 4) -> (...).

    Matches the reference's matched_boxlist_iou (fast_rcnn.py helpers).
    """
    a1 = area(boxes1)
    a2 = area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def ltrb_iou(pred: jnp.ndarray, target: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """IoU for aligned (l, t, r, b) distance boxes sharing a center location.

    Replicates compute_iou_targets (reference: fcos_outputs.py:91-129),
    including its +1 smoothing: iou = (I + 1) / (U + 1).
    """
    tl, tt, tr, tb = target[..., 0], target[..., 1], target[..., 2], target[..., 3]
    pl, pt, pr, pb = pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3]
    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)
    w_inter = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    h_inter = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    inter = w_inter * h_inter
    union = target_area + pred_area - inter
    return (inter + smooth) / (union + smooth)


def decode_ltrb(locations: jnp.ndarray, ltrb: jnp.ndarray) -> jnp.ndarray:
    """(x, y) locations + (l, t, r, b) distances -> xyxy boxes.

    Reference: distance2bbox (utils/comm.py:54) / detection stacking
    (fcos_outputs.py:1258-1266).
    """
    x, y = locations[..., 0], locations[..., 1]
    return jnp.stack(
        [
            x - ltrb[..., 0],
            y - ltrb[..., 1],
            x + ltrb[..., 2],
            y + ltrb[..., 3],
        ],
        axis=-1,
    )


def encode_ltrb(locations: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """(x, y) locations + xyxy boxes -> (l, t, r, b) distances.

    Reference: bbox2distance (utils/comm.py:73) / target construction
    (fcos_outputs.py:818-822). Broadcasts (L, 2) x (M, 4) -> (L, M, 4) when
    given locations[:, None, :] style inputs.
    """
    x, y = locations[..., 0], locations[..., 1]
    return jnp.stack(
        [
            x - boxes[..., 0],
            y - boxes[..., 1],
            boxes[..., 2] - x,
            boxes[..., 3] - y,
        ],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clamp xyxy boxes into [0, w] x [0, h]."""
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def mask_canvas_padding(x: jnp.ndarray, hw: jnp.ndarray) -> jnp.ndarray:
    """Zero a (B, H, W, C) canvas beyond each image's true (h, w).

    Applied to NORMALIZED images: the reference normalizes then zero-pads
    (D2 ImageList.from_tensors via one_stage_detector.py:88-90 /
    GeneralizedRCNN.preprocess_image), so its padding is exactly 0 in
    normalized space; a raw zero-pixel canvas would instead feed -mean/std
    into the backbone. This restores the reference's padding semantics on
    the fixed canvas and makes features inside the image independent of
    canvas size (zero padding == conv boundary padding).
    """
    b = x.shape[0]
    hwf = hw.astype(x.dtype)
    rows = jnp.arange(x.shape[1], dtype=x.dtype)
    cols = jnp.arange(x.shape[2], dtype=x.dtype)
    valid = (
        (rows[None, :, None] < hwf[:, 0].reshape(b, 1, 1))
        & (cols[None, None, :] < hwf[:, 1].reshape(b, 1, 1))
    )
    return x * valid[..., None].astype(x.dtype)
