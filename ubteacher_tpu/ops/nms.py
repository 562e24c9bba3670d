"""Fixed-shape non-maximum suppression.

TPU-native replacement for torchvision's CUDA batched_nms (used by the
reference via detectron2.layers.batched_nms <- ubteacher/layers/ml_nms.py:8-31
and D2 fast_rcnn_inference / RPN proposal selection).

Strategy: all candidates live in padded (K,) arrays with a validity mask.
We compute the full (K, K) pairwise IoU matrix once, then run the exact
greedy suppression as a lax.fori_loop over score-sorted rows (each step is a
K-vector op, so total work is O(K^2) vector ops that XLA maps onto the VPU).
Class-awareness uses the coordinate-offset trick. Outputs keep static shape:
a boolean keep mask aligned with the inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

NEG_INF = -1e10


def nms_keep(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Exact greedy NMS. (K,4), (K,), (K,) -> keep mask (K,) bool.

    Equivalent (same kept set) to torchvision.ops.nms over the valid subset.
    On TPU this dispatches to the streaming Pallas kernel
    (ops/pallas/nms_pallas.py) which avoids materializing the (K, K) IoU
    matrix; elsewhere (CPU tests) it runs the XLA fori_loop version below.
    """
    import jax.extend.backend

    if jax.extend.backend.get_backend().platform == "tpu":
        from .pallas.nms_pallas import nms_keep_pallas

        return nms_keep_pallas(boxes, scores, valid, iou_threshold)
    k = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)  # high -> low
    sboxes = boxes[order]
    svalid = valid[order]
    iou = pairwise_iou(sboxes, sboxes)  # (K, K)
    overlap = iou > iou_threshold

    def body(i, state):
        suppressed = state
        keep_i = jnp.logical_and(svalid[i], jnp.logical_not(suppressed[i]))
        # suppress strictly-later rows overlapping row i
        later = jnp.arange(k) > i
        newly = jnp.logical_and(jnp.logical_and(keep_i, later), overlap[i])
        return jnp.logical_or(suppressed, newly)

    suppressed = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    keep_sorted = jnp.logical_and(svalid, jnp.logical_not(suppressed))
    # scatter back to input order
    keep = jnp.zeros((k,), bool).at[order].set(keep_sorted)
    return keep


def batched_nms_keep(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Class-aware NMS via the coordinate-offset trick (same semantics as
    detectron2.layers.batched_nms used by ml_nms, reference:
    layers/ml_nms.py:8-31)."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_keep(shifted, scores, valid, iou_threshold)


def top_k_detections(
    keep: jnp.ndarray, scores: jnp.ndarray, post_nms_topk: int
):
    """Select indices of the top `post_nms_topk` kept candidates by score.

    Returns (indices (post_nms_topk,), mask (post_nms_topk,)). Matches the
    reference's select_over_all_levels cap (fcos_outputs.py:1300-1319).
    """
    masked = jnp.where(keep, scores, NEG_INF)
    top_scores, idx = jax.lax.top_k(masked, post_nms_topk)
    return idx, top_scores > NEG_INF / 2
