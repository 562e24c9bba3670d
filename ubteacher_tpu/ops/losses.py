"""Loss functions, fixed-shape + masked.

TPU-native equivalents of the reference's loss layers:
  * sigmoid focal loss   (reference: fvcore sigmoid_focal_loss_jit, used at
                          fcos_outputs.py:329, 619; fast_rcnn FocalLoss)
  * IoU-family loss      (reference: ubteacher/layers/iou_loss.py:9-76)
  * KL loss              (reference: ubteacher/layers/kl_loss.py:11-66)
  * Gaussian NLL loss    (reference: ubteacher/layers/kl_loss.py:69-105,
                          fast_rcnn.py nl_loss)
  * smooth L1 / Huber    (reference: fvcore smooth_l1_loss)

Everywhere the reference gathers positive indices we use masks: every loss
takes full-size inputs plus a weight/mask array and computes masked sums, so
shapes stay static under jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .boxes import ltrb_iou


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Per-element sigmoid focal loss, no reduction.

    Matches fvcore's sigmoid_focal_loss (RetinaNet form): targets are
    {0, 1} (possibly soft) per class.
    """
    p = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy with logits, elementwise."""
    # max(x, 0) - x * t + log(1 + exp(-|x|))
    return (
        jnp.clip(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return _bce_with_logits(logits, targets)


def iou_loss(
    pred_ltrb: jnp.ndarray,
    target_ltrb: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    loss_type: str = "giou",
) -> jnp.ndarray:
    """IoU-family loss on aligned ltrb distances; returns the weighted SUM.

    Replicates IOULoss (reference: layers/iou_loss.py:23-76) including the
    (I+1)/(U+1) smoothing of ious used by both `iou` and `giou` variants.
    Invalid rows must carry weight 0.
    """
    tl, tt, tr, tb = (target_ltrb[..., i] for i in range(4))
    pl, pt, pr, pb = (pred_ltrb[..., i] for i in range(4))
    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)
    w_inter = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    h_inter = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    g_w = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
    g_h = jnp.maximum(pb, tb) + jnp.maximum(pt, tt)
    ac_union = g_w * g_h
    inter = w_inter * h_inter
    union = target_area + pred_area - inter
    ious = (inter + 1.0) / (union + 1.0)
    if loss_type == "iou":
        losses = -jnp.log(jnp.clip(ious, 1e-12))
    elif loss_type == "linear_iou":
        losses = 1.0 - ious
    elif loss_type == "giou":
        gious = ious - (ac_union - union) / jnp.where(ac_union == 0, 1.0, ac_union)
        losses = 1.0 - gious
    else:
        raise NotImplementedError(loss_type)
    if weight is not None:
        return (losses * weight).sum()
    return losses.sum()


def smooth_l1(
    pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0
) -> jnp.ndarray:
    """Per-element smooth-L1 (Huber); beta<=1e-5 degrades to pure L1
    (matching fvcore / reference kl_loss.py:38-48)."""
    n = jnp.abs(pred - target)
    if beta < 1e-5:
        return n
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def kl_loss(
    pred: jnp.ndarray,
    pred_std: jnp.ndarray,
    target: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    beta: float = 1.0,
    loss_denorm: jnp.ndarray | float | None = None,
    method: str = "weight_ctr_sum",
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """KL-Loss-style uncertainty regression loss.

    Replicates KLLoss (reference: layers/kl_loss.py:17-66):
      loss = exp(-std) * smooth_l1(pred, target) + 0.5 * std, summed over the
      4 box edges, then reduced per `method`. `valid` is the positives mask
      (the reference gathers positives instead).
    """
    l1s = smooth_l1(pred, target, beta)
    loss = jnp.exp(-pred_std) * l1s + 0.5 * pred_std
    loss = loss.sum(axis=-1)
    if valid is not None:
        loss = loss * valid
    if method == "weight_ctr_sum":
        assert weight is not None
        return (loss * weight).sum()
    if method == "weight_ctr_mean":
        assert weight is not None and loss_denorm is not None
        return (loss * weight).sum() / loss_denorm
    if method == "sum":
        return loss.sum()
    if method == "mean":
        if valid is None:
            return loss.mean()
        return loss.sum() / jnp.maximum(valid.sum(), 1.0)
    raise ValueError(f"No defined regression loss method: {method}")


_TWO_LOG_2PI = 2.0 * math.log(2.0 * math.pi)


def nl_loss(
    pred: jnp.ndarray,
    pred_std: jnp.ndarray,
    target: jnp.ndarray,
    iou_weight: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    **_: object,
) -> jnp.ndarray:
    """Gaussian negative log-likelihood with sigma = sigmoid(pred_std),
    IoU-weighted mean over (valid) instances.

    Replicates NLLoss (reference: layers/kl_loss.py:75-105): per instance
    sum over 4 edges of (t-mu)^2/(2 s^2) + 0.5 log s^2, plus 2 log(2 pi),
    times iou_weight, then MEAN over instances.
    """
    sigma = jax.nn.sigmoid(pred_std)
    sigma_sq = jnp.clip(sigma * sigma, 1e-12)
    first = (target - pred) ** 2 / (2.0 * sigma_sq)
    second = 0.5 * jnp.log(sigma_sq)
    per_inst = (first + second).sum(axis=-1) + _TWO_LOG_2PI
    per_inst = per_inst * iou_weight
    if valid is None:
        return per_inst.mean()
    return (per_inst * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def compute_ctrness_targets(reg_targets: jnp.ndarray) -> jnp.ndarray:
    """sqrt((min_lr / max_lr) * (min_tb / max_tb)); (..., 4) -> (...).

    Reference: compute_ctrness_targets (fcos_outputs.py:80-88).
    """
    lr = reg_targets[..., (0, 2)]
    tb = reg_targets[..., (1, 3)]
    ctr = (lr.min(-1) / jnp.clip(lr.max(-1), 1e-12)) * (
        tb.min(-1) / jnp.clip(tb.max(-1), 1e-12)
    )
    return jnp.sqrt(jnp.clip(ctr, 0.0))


def compute_iou_targets(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Aligned ltrb IoU with +1 smoothing (fcos_outputs.py:91-129)."""
    return ltrb_iou(pred, target)
