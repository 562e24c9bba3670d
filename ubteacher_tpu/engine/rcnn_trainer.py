"""Faster R-CNN semi-supervised train steps + host trainer.

TPU-native redesign of UBRCNNTeacherTrainer (reference:
ubteacher/engine/trainer.py:612-1023) and the branch logic of
TwoStagePseudoLabGeneralizedRCNN (reference: meta_arch/rcnn.py:7-72):

  * `unsup_data_weak` (teacher): RPN proposals -> ROI inference -> padded
    Detections with pred_boxes_std -> score > BBOX_THRESHOLD pseudo labels
    (reference: trainer.py:727-769) — all in-graph;
  * `supervised` / `unsup_data_train` (student): RPN losses (confidence-
    weighted objectness BCE on the pseudo branch, rpn.py:205-212), 512-
    proposal sampling, focal CE + nlloss / tsbetter box regression;
  * loss weighting: rpn_loc_pseudo x0, box_reg_pseudo x UNSUP_REG_LOSS_WEIGHT,
    other *_pseudo x UNSUP_LOSS_WEIGHT, supervised x1
    (reference: trainer.py:885-904);
  * EMA teacher update fused in-graph (keep 0.9996 by config).
"""

from __future__ import annotations

import functools

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..data.augment import strong_augment
from ..modeling.anchors import generate_anchors
from ..modeling.box_regression import Box2BoxTransform, Box2BoxXYXYTransform
from ..modeling.fast_rcnn import (
    box_reg_loss_nll,
    box_reg_loss_smooth_l1,
    box_reg_pseudo_loss_tsbetter,
    cross_entropy_loss,
    fast_rcnn_inference,
    focal_ce_loss,
    sample_proposals_batch,
)
from ..modeling.matcher import match_anchors_batched
from ..modeling.rpn import (
    anchor_validity,
    find_top_proposals,
    label_anchors,
    rpn_losses,
)
from ..solver.build import stop_frozen_gradients
from ..structures import PaddedInstances
from .common import float_images, hw_or_canvas, image_hw
from .fcos_trainer import FCOSTrainState, _ema_update

RCNNTrainState = FCOSTrainState  # same pytree layout


def _pseudo_from_detections(dets, thresh, max_boxes):
    from ..modeling.fcos_outputs import threshold_pseudo_labels

    return threshold_pseudo_labels(dets, thresh, max_boxes)


def make_rcnn_train_steps(cfg, model, tx: optax.GradientTransformation
                          ) -> Tuple[Callable, Callable]:
    sem = cfg.SEMISUPNET
    rpn_cfg = cfg.MODEL.RPN
    roi_cfg = cfg.MODEL.ROI_HEADS
    strides = [2 ** int(f[1:]) for f in rpn_cfg.IN_FEATURES]
    num_classes = roi_cfg.NUM_CLASSES
    rpn_box2box = Box2BoxTransform(tuple(rpn_cfg.BBOX_REG_WEIGHTS))
    roi_box2box = Box2BoxXYXYTransform(tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS))
    max_pseudo = cfg.TPU.MAX_PSEUDO
    w_unsup = sem.UNSUP_LOSS_WEIGHT
    w_reg_unsup = sem.UNSUP_REG_LOSS_WEIGHT

    def _anchors_for(hw):
        return generate_anchors(
            hw, strides,
            [list(s) for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES],
            [list(a) for a in cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS],
            cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        )

    _image_hw = image_hw
    _hw_or_canvas = hw_or_canvas

    def _proposals(params, images, train: bool, hw):
        pyramid = model.apply(
            {"params": params}, images, hw, method=model.features
        )
        logits, deltas = model.apply(
            {"params": params}, pyramid, method=model.rpn
        )
        anch = _anchors_for(images.shape[1:3])
        # proposals carry no gradients (reference: fast_rcnn.py:856-858
        # "Proposals should not require gradients!"); the stop_gradient also
        # keeps grad tracing out of the non-differentiable Pallas NMS kernel
        boxes, scores, mask = find_top_proposals(
            anch["anchors"], anch["level_lengths"], anch["level_ids"],
            jax.lax.stop_gradient(logits), jax.lax.stop_gradient(deltas),
            hw, rpn_box2box,
            rpn_cfg.PRE_NMS_TOPK_TRAIN if train else rpn_cfg.PRE_NMS_TOPK_TEST,
            rpn_cfg.POST_NMS_TOPK_TRAIN if train else rpn_cfg.POST_NMS_TOPK_TEST,
            rpn_cfg.NMS_THRESH,
            # per-level NMS pool cap; >= PRE_NMS_TOPK (2000) is
            # reference-exact (per-level top-k, proposal_utils.py)
            total_candidates=cfg.TPU.NMS_CANDIDATES,
            cell_origins=anch["cell_origins"],
            min_size=cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE,
        )
        return pyramid, logits, deltas, anch, boxes, scores, mask

    pseudo_reg_type = cfg.MODEL.ROI_BOX_HEAD.BBOX_PSEUDO_REG_LOSS_TYPE

    def _pseudo_box_reg(boxes, gt_boxes, bdeltas, bstd, gt_loc_std, is_fg,
                        valid):
        """BBOX_PSEUDO_REG_LOSS_TYPE dispatch (reference:
        fast_rcnn.py:534-566): 'tsbetter' = uncertainty-gated L1,
        'smooth_l1' = plain fg smooth-L1 / total rows, else ValueError."""
        if pseudo_reg_type == "tsbetter":
            return box_reg_pseudo_loss_tsbetter(
                boxes, gt_boxes, bdeltas, bstd, gt_loc_std, is_fg, valid,
                roi_box2box, sem.TS_BETTER, sem.T_CERT,
            )
        if pseudo_reg_type == "smooth_l1":
            return box_reg_loss_smooth_l1(
                boxes, gt_boxes, bdeltas, is_fg, valid, roi_box2box,
                cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            )
        raise ValueError(
            f"Invalid bbox pseudo reg loss type '{pseudo_reg_type}'"
        )

    def _supervised_branch(params, images, gt, rng, use_confidence: bool,
                           pseudo: bool, hw=None):
        """RPN + ROI losses for one branch (reference rcnn.py:23-68)."""
        if hw is None:
            hw = _image_hw(images)
        pyramid, logits, deltas, anch, pboxes, pscores, pmask = _proposals(
            params, images, train=True, hw=hw
        )
        k_anchor, k_sample = jax.random.split(rng)
        b = images.shape[0]
        anchor_keys = jax.random.split(k_anchor, b)
        matched = match_anchors_batched(anch["anchors"], gt.boxes, gt.mask)
        labeled = jax.vmap(
            lambda g, k, one_hw, mi, lb: label_anchors(
                anch["anchors"], g, rpn_cfg.BATCH_SIZE_PER_IMAGE,
                rpn_cfg.POSITIVE_FRACTION, k, use_confidence,
                anchor_valid=anchor_validity(anch["cell_origins"], one_hw),
                matched=(mi, lb),
            )
        )(gt, anchor_keys, hw, *matched)
        rpn_l = rpn_losses(
            anch["anchors"], logits, deltas, labeled,
            rpn_box2box, rpn_cfg.BATCH_SIZE_PER_IMAGE,
            rpn_cfg.SMOOTH_L1_BETA,
        )

        sampled = sample_proposals_batch(
            pboxes, pmask, gt, roi_cfg.BATCH_SIZE_PER_IMAGE,
            roi_cfg.POSITIVE_FRACTION, num_classes, k_sample,
            append_gt=roi_cfg.PROPOSAL_APPEND_GT,
        )
        scores, bdeltas, bstd = model.apply(
            {"params": params}, pyramid, sampled["boxes"],
            method=model.roi_box,
        )
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        # MODEL.ROI_HEADS.LOSS dispatch (reference: roi_heads.py:23-70
        # predictor selection); *_BoundaryVar variants share the cls loss
        # with their plain counterparts — EXCEPT that the plain FocalLoss
        # predictor weights the pseudo cls loss by teacher confidence
        # (reference: fast_rcnn.py:1368-1371, 1398 — gt_confid exists only
        # on pseudo-sampled proposals; the BoundaryVar variant never
        # passes confid, fast_rcnn.py:925-936)
        if roi_cfg.LOSS.startswith("FocalLoss"):
            confid = (
                flat(sampled["gt_confid"])
                if pseudo and roi_cfg.LOSS == "FocalLoss" else None
            )
            loss_cls = focal_ce_loss(
                flat(scores), flat(sampled["gt_classes"]),
                flat(sampled["valid"]), confid=confid,
            )
        else:  # CrossEntropy / CrossEntropy_BoundaryVar
            loss_cls = cross_entropy_loss(
                flat(scores), flat(sampled["gt_classes"]), flat(sampled["valid"])
            )
        if pseudo:
            loss_box = _pseudo_box_reg(
                flat(sampled["boxes"]), flat(sampled["gt_boxes"]),
                flat(bdeltas), flat(bstd), flat(sampled["gt_loc_std"]),
                flat(sampled["is_fg"]), flat(sampled["valid"]),
            )
        elif cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE == "nlloss":
            loss_box = box_reg_loss_nll(
                flat(sampled["boxes"]), flat(sampled["gt_boxes"]),
                flat(bdeltas), flat(bstd), flat(sampled["is_fg"]),
                flat(sampled["valid"]), roi_box2box,
                cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            )
        else:  # smooth_l1
            loss_box = box_reg_loss_smooth_l1(
                flat(sampled["boxes"]), flat(sampled["gt_boxes"]),
                flat(bdeltas), flat(sampled["is_fg"]),
                flat(sampled["valid"]), roi_box2box,
                cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            )
        return {
            "loss_rpn_cls": rpn_l["loss_rpn_cls"],
            "loss_rpn_loc": rpn_l["loss_rpn_loc"],
            "loss_cls": loss_cls,
            "loss_box_reg": loss_box,
        }

    def _fused_branches(params, images, gt, rng, hw, nl: int):
        """Supervised + pseudo branches over ONE fused forward of
        nl labeled-view images followed by (B - nl) unlabeled images.
        Branch-specific losses reduce over row slices; every loss already
        normalizes by its own branch's valid count, so the split calls
        match two separate _supervised_branch invocations exactly."""
        pyramid, logits, deltas, anch, pboxes, pscores, pmask = _proposals(
            params, images, train=True, hw=hw
        )
        k_anchor, k_sample = jax.random.split(rng)
        b = images.shape[0]
        anchor_keys = jax.random.split(k_anchor, b)
        matched = match_anchors_batched(anch["anchors"], gt.boxes, gt.mask)
        # labeled rows get NO confidence weighting (reference: standard
        # label_and_sample_anchors; a no-gt labeled image keeps its full
        # all-background BCE), pseudo rows get teacher-score weighting
        use_conf = jnp.arange(b) >= nl
        labeled = jax.vmap(
            lambda g, k, one_hw, mi, lb, uc: label_anchors(
                anch["anchors"], g, rpn_cfg.BATCH_SIZE_PER_IMAGE,
                rpn_cfg.POSITIVE_FRACTION, k, uc,
                anchor_valid=anchor_validity(anch["cell_origins"], one_hw),
                matched=(mi, lb),
            )
        )(gt, anchor_keys, hw, *matched, use_conf)

        def rpn_part(sl):
            return rpn_losses(
                anch["anchors"], logits[sl], deltas[sl],
                jax.tree.map(lambda x: x[sl], labeled),
                rpn_box2box, rpn_cfg.BATCH_SIZE_PER_IMAGE,
                rpn_cfg.SMOOTH_L1_BETA,
            )

        sup_sl, un_sl = slice(0, nl), slice(nl, None)
        rpn_sup = rpn_part(sup_sl)
        rpn_unsup = rpn_part(un_sl)

        sampled = sample_proposals_batch(
            pboxes, pmask, gt, roi_cfg.BATCH_SIZE_PER_IMAGE,
            roi_cfg.POSITIVE_FRACTION, num_classes, k_sample,
            append_gt=roi_cfg.PROPOSAL_APPEND_GT,
        )
        scores, bdeltas, bstd = model.apply(
            {"params": params}, pyramid, sampled["boxes"],
            method=model.roi_box,
        )

        def flat(x, sl):
            y = x[sl]
            return y.reshape((-1,) + y.shape[2:])

        if roi_cfg.LOSS.startswith("FocalLoss"):
            cls_fn = focal_ce_loss
        else:
            cls_fn = cross_entropy_loss

        sup = dict(rpn_sup)
        sup["loss_cls"] = cls_fn(
            flat(scores, sup_sl), flat(sampled["gt_classes"], sup_sl),
            flat(sampled["valid"], sup_sl),
        )
        if cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE == "nlloss":
            sup["loss_box_reg"] = box_reg_loss_nll(
                flat(sampled["boxes"], sup_sl), flat(sampled["gt_boxes"], sup_sl),
                flat(bdeltas, sup_sl), flat(bstd, sup_sl),
                flat(sampled["is_fg"], sup_sl), flat(sampled["valid"], sup_sl),
                roi_box2box, cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            )
        else:
            sup["loss_box_reg"] = box_reg_loss_smooth_l1(
                flat(sampled["boxes"], sup_sl), flat(sampled["gt_boxes"], sup_sl),
                flat(bdeltas, sup_sl), flat(sampled["is_fg"], sup_sl),
                flat(sampled["valid"], sup_sl), roi_box2box,
                cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            )

        unsup = dict(rpn_unsup)
        if roi_cfg.LOSS == "FocalLoss":
            # plain FocalLoss weights pseudo cls by teacher confidence
            # (reference: fast_rcnn.py:1398); BoundaryVar does not
            unsup["loss_cls"] = focal_ce_loss(
                flat(scores, un_sl), flat(sampled["gt_classes"], un_sl),
                flat(sampled["valid"], un_sl),
                confid=flat(sampled["gt_confid"], un_sl),
            )
        else:
            unsup["loss_cls"] = cls_fn(
                flat(scores, un_sl), flat(sampled["gt_classes"], un_sl),
                flat(sampled["valid"], un_sl),
            )
        unsup["loss_box_reg"] = _pseudo_box_reg(
            flat(sampled["boxes"], un_sl), flat(sampled["gt_boxes"], un_sl),
            flat(bdeltas, un_sl), flat(bstd, un_sl),
            flat(sampled["gt_loc_std"], un_sl), flat(sampled["is_fg"], un_sl),
            flat(sampled["valid"], un_sl),
        )
        return sup, unsup

    # SEMISUPNET.USE_SUP_STRONG: "both" trains supervised on strong+weak
    # labeled views; any other value on the weak view only — an RCNN-
    # trainer-only knob (reference: trainer.py:800-803, 861-864)
    sup_strong = sem.USE_SUP_STRONG == "both"

    def _labeled_views(batch, label_q, label_hw):
        if sup_strong:
            images = jnp.concatenate([label_q, batch["images_label_k"]], 0)
            gt = jax.tree.map(
                lambda x: jnp.concatenate([x, x], 0), batch["gt_label"]
            )
            hw = jnp.concatenate([label_hw, label_hw], 0)
        else:
            images, gt, hw = batch["images_label_k"], batch["gt_label"], label_hw
        return images, gt, hw

    @functools.partial(jax.jit, donate_argnums=(0,))
    def burnin_step(state: RCNNTrainState, batch: Dict[str, Any]):
        batch = float_images(batch)
        k_aug, k_branch = jax.random.split(batch["rng"])
        label_q = (
            strong_augment(batch["images_label_k"], k_aug) if sup_strong
            else None
        )
        label_hw = _hw_or_canvas(batch, "label_hw", batch["images_label_k"])

        def loss_fn(params):
            params = stop_frozen_gradients(params, cfg.MODEL.BACKBONE.FREEZE_AT)
            images, gt2, hw2 = _labeled_views(batch, label_q, label_hw)
            losses = _supervised_branch(
                params, images, gt2, k_branch, use_confidence=False,
                pseudo=False, hw=hw2,
            )
            return sum(losses.values()), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.student)
        student = optax.apply_updates(state.student, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return state.replace(step=state.step + 1, student=student,
                             opt_state=opt_state), metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def mutual_step(state: RCNNTrainState, batch: Dict[str, Any]):
        batch = float_images(batch)
        at_boundary = state.step == sem.BURN_UP_STEP
        on_cadence = ((state.step - sem.BURN_UP_STEP)
                      % sem.TEACHER_UPDATE_ITER) == 0
        keep_rate = jnp.where(
            at_boundary, 0.0, jnp.where(on_cadence, sem.EMA_KEEP_RATE, 1.0)
        )
        teacher = _ema_update(state.teacher, state.student, keep_rate)

        # teacher branch: unsup_data_weak (reference rcnn.py:32-55)
        unl_k = batch["images_unlabel_k"]
        unlabel_hw = _hw_or_canvas(batch, "unlabel_hw", unl_k)
        label_hw = _hw_or_canvas(batch, "label_hw", batch["images_label_k"])
        if cfg.TPU.ORACLE_PSEUDO:
            # positive control: perfect pseudo labels from the loader
            # (unlabeled-stream ground truth; confidence 1.0, boundary std
            # ORACLE_BOX_STD) — isolates the pseudo-consumption path
            # (sampling, confidence weighting, tsbetter gate) from teacher
            # quality. The teacher EMA still runs so ap_teacher is tracked.
            pseudo = batch["gt_unlabel"]
        else:
            pyramid_t, _, _, _, pboxes_t, _, pmask_t = _proposals(
                teacher, unl_k, train=False, hw=unlabel_hw
            )
            scores_t, deltas_t, std_t = model.apply(
                {"params": teacher}, pyramid_t, pboxes_t, method=model.roi_box
            )
            dets = fast_rcnn_inference(
                pboxes_t, pmask_t, scores_t, deltas_t, std_t, unlabel_hw,
                roi_box2box, roi_cfg.SCORE_THRESH_TEST, roi_cfg.NMS_THRESH_TEST,
                cfg.TEST.DETECTIONS_PER_IMAGE,
                total_candidates=cfg.TPU.NMS_CANDIDATES,
            )
            pseudo = _pseudo_from_detections(
                dets, sem.BBOX_THRESHOLD, max_pseudo
            )

        k_aug_l, k_aug_u, k_sup, k_unsup = jax.random.split(batch["rng"], 4)
        label_q = (
            strong_augment(batch["images_label_k"], k_aug_l) if sup_strong
            else None
        )
        unl_q = strong_augment(unl_k, k_aug_u)

        def loss_fn(params):
            params = stop_frozen_gradients(params, cfg.MODEL.BACKBONE.FREEZE_AT)
            images_l, gt2, hw_l2 = _labeled_views(batch, label_q, label_hw)
            if unl_q.shape[1:3] == images_l.shape[1:3]:
                # ONE fused forward over labeled strong+weak AND unlabeled
                # strong (single conv dispatch per layer at batch 3B, like
                # the FCOS step); branch-specific losses reduce over row
                # slices.
                nl = images_l.shape[0]
                images_all = jnp.concatenate([images_l, unl_q], 0)
                hw_all = jnp.concatenate([hw_l2, unlabel_hw], 0)
                # MAX_GT and MAX_PSEUDO capacities may differ: pad axis 1
                m_cap = max(gt2.boxes.shape[1], pseudo.boxes.shape[1])

                def cat_gt(a, b):
                    def fit(x):
                        if x.shape[1] == m_cap:
                            return x
                        pad = [(0, 0)] * x.ndim
                        pad[1] = (0, m_cap - x.shape[1])
                        return jnp.pad(x, pad)

                    return jnp.concatenate([fit(a), fit(b)], 0)

                gt_all = jax.tree.map(cat_gt, gt2, pseudo)
                sup, unsup = _fused_branches(
                    params, images_all, gt_all, k_sup, hw_all, nl
                )
            else:
                # mixed canvas buckets (label and unlabel streams jittered
                # onto different canvases): separate programs per canvas,
                # identical math (see _fused_branches docstring)
                sup = _supervised_branch(
                    params, images_l, gt2, k_sup, use_confidence=False,
                    pseudo=False, hw=hw_l2,
                )
                unsup = _supervised_branch(
                    params, unl_q, pseudo, k_unsup, use_confidence=True,
                    pseudo=True, hw=unlabel_hw,
                )
            weighted = {}
            for k, v in sup.items():
                weighted[k] = v
            weighted["loss_rpn_loc_pseudo"] = unsup["loss_rpn_loc"] * 0.0
            weighted["loss_box_reg_pseudo"] = unsup["loss_box_reg"] * w_reg_unsup
            weighted["loss_rpn_cls_pseudo"] = unsup["loss_rpn_cls"] * w_unsup
            weighted["loss_cls_pseudo"] = unsup["loss_cls"] * w_unsup
            total = sum(weighted.values())
            raw = dict(sup)
            raw.update({k + "_pseudo": v for k, v in unsup.items()})
            return total, raw

        (total, raw), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.student)
        student = optax.apply_updates(state.student, updates)
        metrics = dict(raw)
        metrics["total_loss"] = total
        metrics["ema_rate_1000x"] = keep_rate * 1000.0
        metrics["num_pseudo"] = pseudo.mask.sum()
        return state.replace(
            step=state.step + 1, student=student, teacher=teacher,
            opt_state=opt_state,
        ), metrics

    return burnin_step, mutual_step


def make_rcnn_proposal_fn(cfg, model) -> Callable:
    """(params, images, hw) -> (boxes (B,P,4), objectness (B,P), mask),
    jitted — RPN proposals at test settings, for the box-proposal AR path
    (reference: coco_evaluation.py:142-143 captures output['proposals'])."""
    rpn_cfg = cfg.MODEL.RPN
    strides = [2 ** int(f[1:]) for f in rpn_cfg.IN_FEATURES]
    rpn_box2box = Box2BoxTransform(tuple(rpn_cfg.BBOX_REG_WEIGHTS))

    @jax.jit
    def proposals(params, images, hw):
        pyramid = model.apply(
            {"params": params}, images, hw, method=model.features
        )
        logits, deltas = model.apply(
            {"params": params}, pyramid, method=model.rpn
        )
        anch = generate_anchors(
            images.shape[1:3], strides,
            [list(s) for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES],
            [list(a) for a in cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS],
            cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        )
        return find_top_proposals(
            anch["anchors"], anch["level_lengths"], anch["level_ids"],
            logits, deltas, hw, rpn_box2box,
            rpn_cfg.PRE_NMS_TOPK_TEST, rpn_cfg.POST_NMS_TOPK_TEST,
            rpn_cfg.NMS_THRESH,
            total_candidates=cfg.TPU.NMS_CANDIDATES,
            cell_origins=anch["cell_origins"],
            min_size=cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE,
        )

    return proposals


def make_rcnn_inference_fn(cfg, model) -> Callable:
    """(params, images, hw) -> Detections, jitted (eval path; reference
    inherits stock GeneralizedRCNN.inference, SURVEY.md §3 E3)."""
    rpn_cfg = cfg.MODEL.RPN
    roi_cfg = cfg.MODEL.ROI_HEADS
    strides = [2 ** int(f[1:]) for f in rpn_cfg.IN_FEATURES]
    rpn_box2box = Box2BoxTransform(tuple(rpn_cfg.BBOX_REG_WEIGHTS))
    roi_box2box = Box2BoxXYXYTransform(tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS))

    @jax.jit
    def infer(params, images, hw):
        pyramid = model.apply(
            {"params": params}, images, hw, method=model.features
        )
        logits, deltas = model.apply({"params": params}, pyramid, method=model.rpn)
        anch = generate_anchors(
            images.shape[1:3], strides,
            [list(s) for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES],
            [list(a) for a in cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS],
            cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        )
        pboxes, _, pmask = find_top_proposals(
            anch["anchors"], anch["level_lengths"], anch["level_ids"],
            logits, deltas, hw, rpn_box2box,
            rpn_cfg.PRE_NMS_TOPK_TEST, rpn_cfg.POST_NMS_TOPK_TEST,
            rpn_cfg.NMS_THRESH, total_candidates=cfg.TPU.NMS_CANDIDATES,
            cell_origins=anch["cell_origins"],
            min_size=cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE,
        )
        scores, bdeltas, bstd = model.apply(
            {"params": params}, pyramid, pboxes, method=model.roi_box
        )
        return fast_rcnn_inference(
            pboxes, pmask, scores, bdeltas, bstd, hw, roi_box2box,
            roi_cfg.SCORE_THRESH_TEST, roi_cfg.NMS_THRESH_TEST,
            cfg.TEST.DETECTIONS_PER_IMAGE,
            total_candidates=cfg.TPU.NMS_CANDIDATES,
        )

    return infer
