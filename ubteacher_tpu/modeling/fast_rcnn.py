"""Fast R-CNN box head: conv-fc head, BoundaryVar output layers, losses,
proposal sampling, and padded inference.

TPU-native rewrite of the reference's ROI-head stack:
  * FastRCNNConvFCHead (D2) -> flax 2-FC head;
  * FastRCNNFocaltLossBoundaryVarOutputLayers (reference:
    fast_rcnn.py:715-1225): third `bbox_pred_std` linear, focal CE
    (gamma=1.5) cls loss, `nlloss` supervised regression (L1 + 0.05 * NLL),
    `tsbetter` uncertainty-gated pseudo regression (fast_rcnn.py:1055-1075);
  * label_and_sample_proposals[_pseudo] (reference: roi_heads.py:141-270)
    as masked fixed-512 sampling that carries gt_confid / gt_loc_std;
  * fast_rcnn_inference as padded flatten + class-NMS + top-k.

Everything is masked/fixed-shape; positives are never gathered, only
weighted.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import losses as L
from ..ops.boxes import clip_boxes, matched_iou
from ..ops.nms import batched_nms_keep, top_k_detections
from ..structures import Detections, PaddedInstances
from .box_regression import Box2BoxXYXYTransform
from .matcher import NEG_INF, match, match_quality


class FastRCNNConvFCHead(nn.Module):
    """Flatten -> fc1 -> relu -> fc2 -> relu (D2 FastRCNNConvFCHead with
    NUM_FC=2, FC_DIM=1024)."""

    fc_dim: int = 1024
    num_fc: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (..., P, P, C)
        x = x.reshape(x.shape[:-3] + (-1,)).astype(self.dtype)
        for i in range(self.num_fc):
            # c2_xavier_fill: kaiming_uniform fan_in a=1 ~ xavier-ish;
            # use variance_scaling fan_in uniform
            x = nn.Dense(
                self.fc_dim,
                kernel_init=nn.initializers.variance_scaling(
                    1.0 / 3.0, "fan_in", "uniform"
                ),
                dtype=self.dtype,
                name=f"fc{i + 1}",
            )(x)
            x = nn.relu(x)
        return x


class BoundaryVarOutputLayers(nn.Module):
    """cls_score (K+1), bbox_pred (4 if cls-agnostic else K*4),
    bbox_pred_std (4) (reference: fast_rcnn.py:759-789)."""

    num_classes: int = 80
    cls_agnostic: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        scores = nn.Dense(
            self.num_classes + 1,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="cls_score",
        )(x).astype(jnp.float32)
        reg_dim = 4 if self.cls_agnostic else 4 * self.num_classes
        deltas = nn.Dense(
            reg_dim, kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="bbox_pred",
        )(x).astype(jnp.float32)
        deltas_std = nn.Dense(
            reg_dim, kernel_init=nn.initializers.normal(0.0001),
            dtype=self.dtype, name="bbox_pred_std",
        )(x).astype(jnp.float32)
        return scores, deltas, deltas_std


# --------------------------------------------------------------------------
# proposal sampling
# --------------------------------------------------------------------------


def sample_proposals(
    prop_boxes: jnp.ndarray,    # (P, 4) one image
    prop_mask: jnp.ndarray,     # (P,)
    gt: PaddedInstances,        # unbatched (M, ...)
    num_samples: int,
    positive_fraction: float,
    num_classes: int,
    rng: jnp.ndarray,
    append_gt: bool = True,
) -> Dict[str, jnp.ndarray]:
    """label_and_sample_proposals[_pseudo] for one image (reference:
    roi_heads.py:141-270): append gt to proposals, IoU>=0.5 matching,
    25%-positive 512-sample; propagates matched gt class/box/score/std."""
    if append_gt:
        boxes = jnp.concatenate([prop_boxes, gt.boxes], axis=0)
        mask = jnp.concatenate([prop_mask, gt.mask], axis=0)
    else:
        boxes, mask = prop_boxes, prop_mask

    quality = match_quality(gt.boxes, gt.mask, boxes)  # (M, P+)
    matched_idxs, matched_labels = match(
        quality, thresholds=(0.5,), labels=(0, 1), allow_low_quality=False
    )
    any_gt = gt.mask.any()
    gt_classes = jnp.where(
        matched_labels == 1, gt.classes[matched_idxs], num_classes
    )
    gt_classes = jnp.where(any_gt, gt_classes, num_classes)

    # balanced sampling: top num_pos positives by random priority, negatives
    # fill the rest (priority composition keeps shapes static)
    kp, kn = jax.random.split(rng)
    n = boxes.shape[0]
    is_pos = (gt_classes != num_classes) & mask
    is_neg = (gt_classes == num_classes) & mask
    num_pos_desired = int(num_samples * positive_fraction)
    pos_pri = jnp.where(is_pos, jax.random.uniform(kp, (n,)), NEG_INF)
    _, pidx = jax.lax.top_k(pos_pri, min(num_pos_desired, n))
    chosen_pos = jnp.zeros((n,), bool).at[pidx].set(True) & is_pos
    pri = jnp.where(
        chosen_pos, 3.0,
        jnp.where(is_neg, 1.0 + jax.random.uniform(kn, (n,)), NEG_INF),
    )
    vals, idx = jax.lax.top_k(pri, num_samples)  # (S,)
    valid = vals > NEG_INF / 2

    matched = matched_idxs[idx]
    sampled_classes = jnp.where(valid, gt_classes[idx], num_classes)
    is_fg = (sampled_classes != num_classes) & valid
    gt_boxes = jnp.where(any_gt, gt.boxes[matched], 0.0)
    return {
        "boxes": boxes[idx],
        "valid": valid,
        "gt_classes": sampled_classes,
        "gt_boxes": gt_boxes,
        "gt_confid": jnp.where(any_gt, gt.scores[matched], 0.0),
        "gt_loc_std": jnp.where(any_gt, gt.box_std[matched], 0.0),
        "is_fg": is_fg,
    }


def sample_proposals_batch(prop_boxes, prop_mask, gt, num_samples,
                           positive_fraction, num_classes, rng,
                           append_gt=True):
    keys = jax.random.split(rng, prop_boxes.shape[0])
    return jax.vmap(
        lambda b, m, g, k: sample_proposals(
            b, m, g, num_samples, positive_fraction, num_classes, k, append_gt
        )
    )(prop_boxes, prop_mask, gt, keys)


# --------------------------------------------------------------------------
# losses
# --------------------------------------------------------------------------


def focal_ce_loss(
    scores: jnp.ndarray,      # (N, K+1)
    gt_classes: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,       # (N,)
    gamma: float = 1.5,
    confid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """FocalLoss on softmax CE (reference: fast_rcnn.py:1405-1429).

    Normalization: the reference divides by gt_classes.shape[0]
    (fast_rcnn.py:934) — the number of proposals D2's subsampler actually
    RETURNED, which is min(512, candidates) per image. `valid.sum()` is
    exactly that count in padded form (invalid rows are empty sampler
    slots, not reference rows), so dividing by it matches the reference on
    proposal-starved images too; dividing by the padded row count would
    under-weight them."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, gt_classes[:, None], axis=-1)[:, 0]
    # XLA's fused log_softmax can round logp a few ulp POSITIVE for a
    # confidently-correct row; ce < 0 makes p > 1 and the fractional
    # power below sees a negative base -> NaN (observed on v5e at bf16
    # model dtype: ce = -3e-6 at step 0 poisoned the whole run). Clamp.
    ce = jnp.maximum(ce, 0.0)
    p = jnp.exp(-ce)
    loss = (1.0 - p) ** gamma * ce
    if confid is not None:
        loss = loss * confid
    loss = loss * valid
    return loss.sum() / jnp.maximum(valid.sum(), 1.0)


def cross_entropy_loss(
    scores: jnp.ndarray,      # (N, K+1)
    gt_classes: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,       # (N,)
) -> jnp.ndarray:
    """Softmax cross entropy, mean over samples (D2
    FastRCNNOutputLayers default; MODEL.ROI_HEADS.LOSS='CrossEntropy')."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, gt_classes[:, None], axis=-1)[:, 0]
    return (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def box_reg_loss_smooth_l1(
    prop_boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    pred_deltas: jnp.ndarray,
    is_fg: jnp.ndarray,
    valid: jnp.ndarray,
    box2box,
    smooth_l1_beta: float = 0.0,
) -> jnp.ndarray:
    """'smooth_l1' supervised regression, sum over fg / total samples
    (reference: fast_rcnn.py:961-968, 1016)."""
    fg = is_fg.astype(jnp.float32)
    gt_deltas = box2box.get_deltas(prop_boxes, gt_boxes)
    l1 = (L.smooth_l1(pred_deltas, gt_deltas, smooth_l1_beta).sum(-1) * fg).sum()
    return l1 / jnp.maximum(valid.sum(), 1.0)


def box_reg_loss_nll(
    prop_boxes: jnp.ndarray,      # (N, 4)
    gt_boxes: jnp.ndarray,        # (N, 4)
    pred_deltas: jnp.ndarray,     # (N, 4) cls-agnostic
    pred_deltas_std: jnp.ndarray, # (N, 4)
    is_fg: jnp.ndarray,           # (N,)
    valid: jnp.ndarray,           # (N,)
    box2box: Box2BoxXYXYTransform,
    smooth_l1_beta: float = 0.0,
    nll_weight: float = 0.05,
) -> jnp.ndarray:
    """'nlloss' supervised regression: smooth-L1(sum over fg) +
    0.05 * IoU-weighted Gaussian NLL(sum), / total samples
    (reference: fast_rcnn.py:969-1016)."""
    fg = is_fg.astype(jnp.float32)
    gt_deltas = box2box.get_deltas(prop_boxes, gt_boxes)
    l1 = (L.smooth_l1(pred_deltas, gt_deltas, smooth_l1_beta).sum(-1) * fg).sum()

    pred_boxes = box2box.apply_deltas(pred_deltas, prop_boxes)
    iou_w = matched_iou(gt_boxes, pred_boxes)
    sigma = jax.nn.sigmoid(pred_deltas_std)
    sigma_sq = jnp.clip(sigma * sigma, 1e-12)
    first = (gt_deltas - pred_deltas) ** 2 / (2.0 * sigma_sq)
    second = 0.5 * jnp.log(sigma_sq)
    per = (first + second).sum(-1) + 2.0 * jnp.log(2.0 * jnp.pi)
    nll = (per * iou_w * fg).sum()

    total = jnp.maximum(valid.sum(), 1.0)
    return (l1 + nll_weight * nll) / total


def box_reg_pseudo_loss_tsbetter(
    prop_boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    pred_deltas: jnp.ndarray,
    pred_deltas_std: jnp.ndarray,
    gt_loc_std: jnp.ndarray,
    is_fg: jnp.ndarray,
    valid: jnp.ndarray,
    box2box: Box2BoxXYXYTransform,
    ts_better: float,
    t_cert: float,
) -> jnp.ndarray:
    """'tsbetter' pseudo regression: L1 only where the teacher's boundary
    confidence beats the student's by TS_BETTER and exceeds T_CERT
    (reference: fast_rcnn.py:1055-1092)."""
    gt_deltas = box2box.get_deltas(prop_boxes, gt_boxes)
    gt_conf = 1.0 - jax.nn.sigmoid(gt_loc_std)
    pred_conf = 1.0 - jax.nn.sigmoid(pred_deltas_std)
    select = (
        (gt_conf > pred_conf + ts_better) & (gt_conf > t_cert)
        & is_fg[:, None]
    ).astype(jnp.float32)
    l1 = (jnp.abs(pred_deltas - gt_deltas) * select).sum()
    return l1 / jnp.maximum(valid.sum(), 1.0)


# --------------------------------------------------------------------------
# inference
# --------------------------------------------------------------------------


def fast_rcnn_inference(
    prop_boxes: jnp.ndarray,     # (B, P, 4)
    prop_mask: jnp.ndarray,      # (B, P)
    scores: jnp.ndarray,         # (B, P, K+1)
    deltas: jnp.ndarray,         # (B, P, 4) cls-agnostic
    deltas_std: jnp.ndarray,     # (B, P, 4)
    image_hw: jnp.ndarray,       # (B, 2)
    box2box: Box2BoxXYXYTransform,
    score_thresh: float,
    nms_thresh: float,
    topk_per_image: int,
    total_candidates: int = 1000,
) -> Detections:
    """D2 fast_rcnn_inference with padded shapes; attaches pred_boxes_std
    like the reference (fast_rcnn.py:1094-1125)."""
    num_classes = scores.shape[-1] - 1

    def per_image(boxes_p, mask_p, scores_p, deltas_p, std_p, hw):
        probs = jax.nn.softmax(scores_p, axis=-1)[:, :num_classes]  # (P, K)
        pred_boxes = box2box.apply_deltas(deltas_p, boxes_p)  # (P, 4)
        pred_boxes = clip_boxes(pred_boxes, hw[0], hw[1])
        cand = (probs > score_thresh) & mask_p[:, None]
        flat = jnp.where(cand, probs, -1.0).reshape(-1)  # (P*K,)
        cap = min(total_candidates, flat.shape[0])
        top, idx = jax.lax.top_k(flat, cap)
        pidx = idx // num_classes
        cidx = idx % num_classes
        cboxes = pred_boxes[pidx]
        cstd = std_p[pidx]
        cvalid = top > 0.0
        keep = batched_nms_keep(cboxes, top, cidx, cvalid, nms_thresh)
        k_post = min(topk_per_image, cap)
        idx2, mask = top_k_detections(keep, top, k_post)
        return Detections(
            boxes=cboxes[idx2],
            scores=jnp.where(mask, top[idx2], 0.0),
            classes=cidx[idx2],
            cls_confid=jnp.where(mask, top[idx2], 0.0),
            centerness=jnp.zeros_like(top[idx2]),
            box_std=cstd[idx2],
            mask=mask,
        )

    return jax.vmap(per_image)(
        prop_boxes, prop_mask, scores, deltas, deltas_std, image_hw
    )
