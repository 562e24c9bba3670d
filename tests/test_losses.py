import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ubteacher_tpu.ops import losses as L


def _torch_sigmoid_focal(logits, targets, alpha=0.25, gamma=2.0):
    """fvcore's sigmoid_focal_loss, reimplemented in torch for golden values."""
    p = torch.sigmoid(logits)
    ce = F.binary_cross_entropy_with_logits(logits, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return alpha_t * loss


def test_sigmoid_focal_matches_torch_reference():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(64, 80)).astype(np.float32)
    targets = (rng.random(size=(64, 80)) < 0.05).astype(np.float32)
    ours = L.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets))
    theirs = _torch_sigmoid_focal(torch.tensor(logits), torch.tensor(targets))
    # XLA-CPU and torch disagree slightly in f32 exp/log; 1e-3 rel is ample
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-5)


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(128,)).astype(np.float32) * 5
    t = rng.random(size=(128,)).astype(np.float32)
    ours = L.bce_with_logits(jnp.asarray(x), jnp.asarray(t))
    theirs = F.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.tensor(t), reduction="none"
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-5)


def _ref_giou_ltrb(pred, target, weight):
    """Direct numpy transcription of the IOULoss giou formulas
    (reference: layers/iou_loss.py:23-76)."""
    pl, pt, pr, pb = pred.T
    tl, tt, tr, tb = target.T
    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)
    w_i = np.minimum(pl, tl) + np.minimum(pr, tr)
    h_i = np.minimum(pb, tb) + np.minimum(pt, tt)
    g_w = np.maximum(pl, tl) + np.maximum(pr, tr)
    g_h = np.maximum(pb, tb) + np.maximum(pt, tt)
    ac = g_w * g_h
    inter = w_i * h_i
    union = target_area + pred_area - inter
    ious = (inter + 1.0) / (union + 1.0)
    gious = ious - (ac - union) / ac
    return ((1 - gious) * weight).sum()


def test_giou_loss_golden():
    rng = np.random.default_rng(2)
    pred = rng.random(size=(32, 4)).astype(np.float32) * 10 + 0.5
    target = rng.random(size=(32, 4)).astype(np.float32) * 10 + 0.5
    w = rng.random(size=(32,)).astype(np.float32)
    ours = L.iou_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(w), "giou")
    ref = _ref_giou_ltrb(pred, target, w)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_smooth_l1_matches_torch():
    rng = np.random.default_rng(3)
    p = rng.normal(size=(40,)).astype(np.float32)
    t = rng.normal(size=(40,)).astype(np.float32)
    ours = L.smooth_l1(jnp.asarray(p), jnp.asarray(t), beta=1.0)
    theirs = F.smooth_l1_loss(
        torch.tensor(p), torch.tensor(t), beta=1.0, reduction="none"
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5, atol=1e-6)
    # beta=0 -> L1 (used by the tsbetter pseudo reg loss, fcos_outputs.py:565)
    ours0 = L.smooth_l1(jnp.asarray(p), jnp.asarray(t), beta=0.0)
    np.testing.assert_allclose(np.asarray(ours0), np.abs(p - t), rtol=1e-6)


def test_nl_loss_golden():
    """Golden transcription of NLLoss (reference: layers/kl_loss.py:75-105)."""
    rng = np.random.default_rng(4)
    pred = rng.normal(size=(16, 4)).astype(np.float32)
    std = rng.normal(size=(16, 4)).astype(np.float32)
    target = rng.normal(size=(16, 4)).astype(np.float32)
    iou_w = rng.random(size=(16,)).astype(np.float32)

    sigma = 1 / (1 + np.exp(-std))
    sigma_sq = sigma**2
    first = (target - pred) ** 2 / (2 * sigma_sq)
    second = 0.5 * np.log(sigma_sq)
    per = (first + second).sum(1) + 2 * math.log(2 * math.pi)
    ref = (per * iou_w).mean()

    ours = L.nl_loss(
        jnp.asarray(pred), jnp.asarray(std), jnp.asarray(target), jnp.asarray(iou_w)
    )
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_nl_loss_masked_equals_dense_subset():
    rng = np.random.default_rng(5)
    pred = rng.normal(size=(16, 4)).astype(np.float32)
    std = rng.normal(size=(16, 4)).astype(np.float32)
    target = rng.normal(size=(16, 4)).astype(np.float32)
    iou_w = rng.random(size=(16,)).astype(np.float32)
    valid = np.zeros((16,), np.float32)
    valid[:7] = 1
    dense = L.nl_loss(
        jnp.asarray(pred[:7]),
        jnp.asarray(std[:7]),
        jnp.asarray(target[:7]),
        jnp.asarray(iou_w[:7]),
    )
    masked = L.nl_loss(
        jnp.asarray(pred),
        jnp.asarray(std),
        jnp.asarray(target),
        jnp.asarray(iou_w),
        valid=jnp.asarray(valid),
    )
    np.testing.assert_allclose(float(dense), float(masked), rtol=1e-5)


def test_kl_loss_golden():
    """Golden transcription of KLLoss weight_ctr_sum
    (reference: layers/kl_loss.py:44-55)."""
    rng = np.random.default_rng(6)
    pred = rng.normal(size=(12, 4)).astype(np.float32)
    std = rng.normal(size=(12, 4)).astype(np.float32)
    target = rng.normal(size=(12, 4)).astype(np.float32)
    w = rng.random(size=(12,)).astype(np.float32)
    n = np.abs(pred - target)
    l1s = np.where(n < 1.0, 0.5 * n * n, n - 0.5)
    loss = np.exp(-std) * l1s + 0.5 * std
    ref = (loss.sum(1) * w).sum()
    ours = L.kl_loss(
        jnp.asarray(pred), jnp.asarray(std), jnp.asarray(target), jnp.asarray(w)
    )
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_ctrness_targets():
    reg = jnp.array([[1.0, 2.0, 4.0, 8.0]])
    # sqrt((1/4) * (2/8)) = sqrt(1/16) = 0.25
    np.testing.assert_allclose(L.compute_ctrness_targets(reg), [0.25], rtol=1e-6)
