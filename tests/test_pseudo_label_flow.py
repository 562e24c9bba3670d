"""End-to-end pseudo-label numerics: detections -> threshold -> assignment
-> Listen2Student gated regression, verified against hand computation
(SURVEY §7 hard parts 1 and 7)."""

import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.modeling.fcos_outputs import (
    FCOSDense,
    compute_locations,
    fcos_assign_targets,
    fcos_pseudo_losses,
    threshold_pseudo_labels,
)
from ubteacher_tpu.structures import Detections

STRIDES = [8, 16, 32, 64, 128]


def _cfg(kl=True):
    return {
        "num_classes": 4,
        "loss_alpha": 0.25,
        "loss_gamma": 2.0,
        "loc_loss_type": "giou",
        "quality_est": "centerness",
        "reg_discrete": False,
        "reg_max": 16,
        "kl_loss": kl,
        "kl_loss_type": "nlloss",
        "kl_loss_weight": 0.05,
        "loc_fun_all": "mean",
        "center_sample": False,
        "pos_radius": 1.5,
    }


def _detections(score, std_logit, k=5):
    boxes = np.zeros((1, k, 4), np.float32)
    boxes[0, 0] = [8, 8, 40, 40]
    scores = np.zeros((1, k), np.float32)
    scores[0, 0] = score
    classes = np.zeros((1, k), np.int32)
    classes[0, 0] = 2
    std = np.zeros((1, k, 4), np.float32)
    std[0, 0] = std_logit
    mask = np.zeros((1, k), bool)
    mask[0, 0] = True
    return Detections(
        boxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
        classes=jnp.asarray(classes), cls_confid=jnp.asarray(scores),
        centerness=jnp.asarray(scores), box_std=jnp.asarray(std),
        mask=jnp.asarray(mask),
    )


def _dense(L, reg_val=2.0, std_logit=0.0, C=4):
    return FCOSDense(
        logits=jnp.full((1, L, C), -4.0, jnp.float32),
        reg=jnp.full((1, L, 4), reg_val, jnp.float32),
        ctrness=jnp.zeros((1, L), jnp.float32),
        reg_std=jnp.full((1, L, 4), std_logit, jnp.float32),
    )


def test_threshold_gates_on_score():
    dets = _detections(score=0.8, std_logit=-10.0)
    kept = threshold_pseudo_labels(dets, 0.5, 5)
    assert int(kept.mask.sum()) == 1
    dropped = threshold_pseudo_labels(dets, 0.9, 5)
    assert int(dropped.mask.sum()) == 0


def test_tsbetter_gated_regression_hand_computed():
    grid = compute_locations((64, 64), STRIDES)
    L = int(grid["locations"].shape[0])
    cfg = _cfg()

    # teacher certain (std logit -10 -> conf ~1), student uncertain
    # (std logit 0 -> conf 0.5): select everywhere on positives
    pseudo = threshold_pseudo_labels(_detections(0.8, -10.0), 0.5, 5)
    targets = fcos_assign_targets(grid, pseudo, 4, False, 1.5)
    dense = _dense(L, reg_val=2.0, std_logit=0.0)
    losses = fcos_pseudo_losses(
        dense, targets, targets, cfg, ts_better=0.1, ts_better_cert=0.8
    )

    pos = np.asarray(targets.pos[0])
    assert pos.sum() > 0
    reg_t = np.asarray(targets.reg_targets[0])[pos]
    expected = np.abs(2.0 - reg_t).mean()
    np.testing.assert_allclose(float(losses["loss_fcos_loc"]), expected,
                               rtol=1e-5)
    assert int(losses["teacher_better_student"]) == pos.sum() * 4

    # teacher UNcertain (std logit +10 -> conf ~0): nothing selected
    pseudo_u = threshold_pseudo_labels(_detections(0.8, 10.0), 0.5, 5)
    targets_u = fcos_assign_targets(grid, pseudo_u, 4, False, 1.5)
    losses_u = fcos_pseudo_losses(
        dense, targets_u, targets_u, cfg, ts_better=0.1, ts_better_cert=0.8
    )
    assert float(losses_u["loss_fcos_loc"]) == 0.0
    assert int(losses_u["teacher_better_student"]) == 0

    # student as certain as teacher (needs teacher > student + 0.1): no sel
    dense_cert = _dense(L, reg_val=2.0, std_logit=-10.0)
    losses_c = fcos_pseudo_losses(
        dense_cert, targets, targets, cfg, ts_better=0.1, ts_better_cert=0.8
    )
    assert float(losses_c["loss_fcos_loc"]) == 0.0


def test_pseudo_cls_loss_scales_with_positives():
    grid = compute_locations((64, 64), STRIDES)
    L = int(grid["locations"].shape[0])
    cfg = _cfg()
    dense = _dense(L)

    pseudo = threshold_pseudo_labels(_detections(0.8, -10.0), 0.5, 5)
    targets = fcos_assign_targets(grid, pseudo, 4, False, 1.5)
    losses = fcos_pseudo_losses(dense, targets, targets, cfg, 0.1, 0.8)

    empty = threshold_pseudo_labels(_detections(0.1, -10.0), 0.5, 5)
    targets_e = fcos_assign_targets(grid, empty, 4, False, 1.5)
    losses_e = fcos_pseudo_losses(dense, targets_e, targets_e, cfg, 0.1, 0.8)

    # positives add true-class focal terms (normalized by num_pos);
    # an empty pseudo set leaves only the tiny background focal sum
    assert float(losses["loss_fcos_cls"]) > float(losses_e["loss_fcos_cls"]) > 0
    assert float(losses_e["loss_fcos_ctr"]) == 0.0
