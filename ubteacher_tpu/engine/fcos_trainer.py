"""FCOS semi-supervised train steps — single fused XLA programs.

TPU-native redesign of UBTeacherTrainer.run_step_full_semisup (reference:
ubteacher/engine/trainer.py:181-429). Differences by construction:

  * the whole mutual-learning step — EMA teacher update, teacher forward on
    weak unlabeled, BOTH NMS passes (NMS_CRITERIA_TRAIN for cls pseudo-labels
    and NMS_CRITERIA_REG_TRAIN for reg pseudo-labels, trainer.py:231-241),
    score thresholding, target assignment, student forwards and the SGD
    update — is ONE jitted function with zero host round-trips (the
    reference syncs to host for NMS, thresholding and `.item()` metrics);
  * teacher EMA is a jax.tree_map fused into the step (reference:
    state_dict loop, trainer.py:468-486);
  * burn-in vs mutual branch selection stays host-side on `step`
    (mirroring the reference's python `if`, trainer.py:191/212) via two
    jitted step functions;
  * data parallelism: batches arrive sharded over the mesh `data` axis;
    gradient and loss-normalizer reductions are GSPMD collectives.
"""

from __future__ import annotations

import functools

from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..data.augment import strong_augment
from ..modeling.fcos_outputs import (
    compute_locations,
    fcos_assign_targets,
    fcos_decode,
    fcos_loss_config,
    fcos_pseudo_losses,
    fcos_supervised_losses,
    level_feature_sizes,
    threshold_pseudo_labels,
)
from ..solver.build import stop_frozen_gradients
from ..structures import PaddedInstances
from .common import float_images, hw_or_canvas


@flax.struct.dataclass
class FCOSTrainState:
    step: jnp.ndarray           # () int32
    student: Any                # param pytree
    teacher: Any                # param pytree
    opt_state: Any

    @staticmethod
    def create(params, tx: optax.GradientTransformation) -> "FCOSTrainState":
        return FCOSTrainState(
            step=jnp.zeros((), jnp.int32),
            student=params,
            teacher=jax.tree.map(jnp.copy, params),
            opt_state=tx.init(params),
        )


def _ema_update(teacher, student, keep_rate):
    """teacher <- student * (1 - keep) + teacher * keep
    (reference: trainer.py:477-482)."""
    return jax.tree.map(
        lambda t, s: s * (1.0 - keep_rate) + t * keep_rate, teacher, student
    )


def make_fcos_train_steps(
    cfg, model, tx: optax.GradientTransformation
) -> Tuple[Callable, Callable]:
    """Returns (burnin_step, mutual_step), both jitted.

    batch layout (all leading dims shardable over `data`):
      images_label_k   : (B, H, W, 3) weak-augmented labeled, BGR [0, 255]
      gt_label         : PaddedInstances (B, MAX_GT, ...)
      images_unlabel_k : (Bu, Hu, Wu, 3) weak-augmented unlabeled
      rng              : PRNG key

    Strong (photometric) views are generated IN-GRAPH from the weak images
    (strong aug preserves geometry, so gt/pseudo boxes remain valid) — the
    reference does this on host CPU per image (dataset_mapper.py:145-146);
    fusing it into the step removes the host augmentation bottleneck
    entirely (SURVEY.md §7 hard part 5).
    """
    fcfg = fcos_loss_config(cfg)
    strides = list(cfg.MODEL.FCOS.FPN_STRIDES)
    sem = cfg.SEMISUPNET
    f = cfg.MODEL.FCOS
    burn_up = sem.BURN_UP_STEP
    ema_keep = sem.EMA_KEEP_RATE
    update_iter = sem.TEACHER_UPDATE_ITER
    w_unsup = sem.UNSUP_LOSS_WEIGHT
    w_reg_unsup = sem.UNSUP_REG_LOSS_WEIGHT
    max_pseudo = cfg.TPU.MAX_PSEUDO
    freeze_at = cfg.MODEL.BACKBONE.FREEZE_AT

    _hw_or_canvas = hw_or_canvas

    def _sup_losses_from_dense(dense, hw, gt, image_hw=None):
        grid = compute_locations(hw, strides)
        targets = fcos_assign_targets(
            grid, gt, fcfg["num_classes"], fcfg["center_sample"],
            fcfg["pos_radius"], image_hw=image_hw,
        )
        return fcos_supervised_losses(dense, targets, fcfg)

    def _sup_losses(params, images, gt, image_hw=None):
        dense = model.apply({"params": params}, images, image_hw)
        return _sup_losses_from_dense(
            dense, images.shape[1:3], gt, image_hw=image_hw
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def burnin_step(state: FCOSTrainState, batch: Dict[str, Any]):
        """Supervised-only step on labeled strong+weak
        (reference: trainer.py:191-210)."""
        batch = float_images(batch)
        label_q = strong_augment(batch["images_label_k"], batch["rng"])
        label_hw = _hw_or_canvas(batch, "label_hw", batch["images_label_k"])

        def loss_fn(params):
            params = stop_frozen_gradients(params, freeze_at)
            images = jnp.concatenate([label_q, batch["images_label_k"]], axis=0)
            gt2 = jax.tree.map(
                lambda x: jnp.concatenate([x, x], axis=0), batch["gt_label"]
            )
            hw2 = jnp.concatenate([label_hw, label_hw], axis=0)
            losses = _sup_losses(params, images, gt2, image_hw=hw2)
            return sum(losses.values()), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.student)
        student = optax.apply_updates(state.student, updates)
        new_state = state.replace(
            step=state.step + 1, student=student, opt_state=opt_state
        )
        metrics = dict(losses)
        metrics["total_loss"] = total
        return new_state, metrics

    def _decode_teacher(dense_t, images, nms_method, hw):
        h, w = images.shape[1:3]
        grid = compute_locations((h, w), strides)
        lengths = [fh * fw for fh, fw in level_feature_sizes((h, w), strides)]
        return fcos_decode(
            dense_t,
            grid,
            lengths,
            hw,
            fcfg,
            nms_method=nms_method,
            pre_nms_thresh=f.INFERENCE_TH_TRAIN,
            pre_nms_topk=f.PRE_NMS_TOPK_TRAIN,
            post_nms_topk=f.POST_NMS_TOPK_TRAIN,
            nms_thresh=f.NMS_TH,
            total_candidates=cfg.TPU.NMS_CANDIDATES,
        )

    def _teacher_pseudo_sets(teacher, unl_k, unlabel_hw):
        """Teacher forward + BOTH NMS passes + PSEUDO_BBOX_SAMPLE dispatch
        (reference: trainer.py:231-294) -> (pseudo_cls, pseudo_reg)."""
        from ..modeling.fcos_outputs import threshold_pseudo_labels_cls_ctr

        dense_t = model.apply({"params": teacher}, unl_k, unlabel_hw)
        det_cls = _decode_teacher(
            dense_t, unl_k, f.NMS_CRITERIA_TRAIN, unlabel_hw
        )
        det_reg = _decode_teacher(
            dense_t, unl_k, f.NMS_CRITERIA_REG_TRAIN, unlabel_hw
        )
        if sem.PSEUDO_BBOX_SAMPLE == "thresholding":
            pseudo_cls = threshold_pseudo_labels(
                det_cls, sem.BBOX_THRESHOLD, max_pseudo
            )
        elif sem.PSEUDO_BBOX_SAMPLE == "thresholding_cls_ctr":
            pseudo_cls = threshold_pseudo_labels_cls_ctr(
                det_cls, sem.BBOX_THRESHOLD, sem.BBOX_CTR_THRESHOLD, max_pseudo
            )
        else:
            raise ValueError(sem.PSEUDO_BBOX_SAMPLE)
        if sem.PSEUDO_BBOX_SAMPLE_REG == "thresholding":
            pseudo_reg = threshold_pseudo_labels(
                det_reg, sem.BBOX_THRESHOLD_REG, max_pseudo
            )
        elif sem.PSEUDO_BBOX_SAMPLE_REG == "thresholding_cls_ctr":
            pseudo_reg = threshold_pseudo_labels_cls_ctr(
                det_reg, sem.BBOX_THRESHOLD_REG, sem.BBOX_CTR_THRESHOLD_REG,
                max_pseudo,
            )
        else:
            raise ValueError(sem.PSEUDO_BBOX_SAMPLE_REG)
        return pseudo_cls, pseudo_reg

    @functools.partial(jax.jit, donate_argnums=(0,))
    def mutual_step(state: FCOSTrainState, batch: Dict[str, Any]):
        """Mutual-learning step (reference: trainer.py:212-429)."""
        batch = float_images(batch)
        # EMA cadence (reference: trainer.py:213-222): copy at burn-in
        # boundary (keep 0), EMA every TEACHER_UPDATE_ITER, else hold.
        at_boundary = state.step == burn_up
        on_cadence = ((state.step - burn_up) % update_iter) == 0
        keep_rate = jnp.where(
            at_boundary, 0.0, jnp.where(on_cadence, ema_keep, 1.0)
        )
        teacher = _ema_update(state.teacher, state.student, keep_rate)

        # teacher forward (no grad by construction: outside loss_fn)
        unl_k = batch["images_unlabel_k"]
        unlabel_hw = _hw_or_canvas(batch, "unlabel_hw", unl_k)
        label_hw = _hw_or_canvas(batch, "label_hw", batch["images_label_k"])
        if cfg.TPU.ORACLE_PSEUDO:
            # positive control: both pseudo sets = the unlabeled stream's
            # ground truth (see rcnn_trainer.mutual_step; same diagnostic)
            pseudo_cls = pseudo_reg = batch["gt_unlabel"]
        else:
            pseudo_cls, pseudo_reg = _teacher_pseudo_sets(
                teacher, unl_k, unlabel_hw
            )

        k_label, k_unlabel = jax.random.split(batch["rng"])
        label_q = strong_augment(batch["images_label_k"], k_label)
        unl_q = strong_augment(batch["images_unlabel_k"], k_unlabel)

        def loss_fn(params):
            params = stop_frozen_gradients(params, freeze_at)
            images_l = jnp.concatenate([label_q, batch["images_label_k"]], axis=0)
            gt2 = jax.tree.map(
                lambda x: jnp.concatenate([x, x], axis=0), batch["gt_label"]
            )
            hw_l = jnp.concatenate([label_hw, label_hw], axis=0)
            if unl_q.shape[1:3] == images_l.shape[1:3]:
                # one backbone+head launch over labeled strong+weak AND
                # unlabeled strong (same canvas): one conv dispatch per
                # layer at batch 3B instead of 2B + B
                dense_all = model.apply(
                    {"params": params},
                    jnp.concatenate([images_l, unl_q], axis=0),
                    jnp.concatenate([hw_l, unlabel_hw], axis=0),
                )
                nl = images_l.shape[0]
                dense_l = jax.tree.map(lambda x: x[:nl], dense_all)
                dense_u = jax.tree.map(lambda x: x[nl:], dense_all)
            else:  # mixed aspect buckets: separate programs per canvas
                dense_l = model.apply({"params": params}, images_l, hw_l)
                dense_u = model.apply({"params": params}, unl_q, unlabel_hw)
            sup = _sup_losses_from_dense(
                dense_l, images_l.shape[1:3], gt2, image_hw=hw_l
            )

            grid_u = compute_locations(unl_q.shape[1:3], strides)
            cls_targets = fcos_assign_targets(
                grid_u, pseudo_cls, fcfg["num_classes"],
                fcfg["center_sample"], fcfg["pos_radius"],
                ignore_near=sem.PSEUDO_CLS_IGNORE_NEAR,
                image_hw=unlabel_hw,
            )
            reg_targets = fcos_assign_targets(
                grid_u, pseudo_reg, fcfg["num_classes"],
                fcfg["center_sample"], fcfg["pos_radius"],
                image_hw=unlabel_hw,
            )
            unsup = fcos_pseudo_losses(
                dense_u, cls_targets, reg_targets, fcfg,
                ts_better=sem.TS_BETTER, ts_better_cert=sem.TS_BETTER_CERT,
                consist_reg_loss=sem.CONSIST_REG_LOSS,
            )
            tbs = unsup.pop("teacher_better_student")

            # w/(w+1) weighting scheme (reference: trainer.py:378-410)
            weighted = {
                "loss_fcos_cls": sup["loss_fcos_cls"] / (w_unsup + 1.0),
                "loss_fcos_ctr": sup["loss_fcos_ctr"] / (w_unsup + 1.0),
                "loss_fcos_loc": sup["loss_fcos_loc"] / (w_reg_unsup + 1.0),
                "loss_fcos_cls_pseudo": unsup["loss_fcos_cls"]
                * w_unsup / (w_unsup + 1.0),
                "loss_fcos_ctr_pseudo": unsup["loss_fcos_ctr"]
                * w_unsup / (w_unsup + 1.0),
                "loss_fcos_loc_pseudo": unsup["loss_fcos_loc"]
                * w_reg_unsup / (w_reg_unsup + 1.0),
            }
            total = sum(weighted.values())
            raw = dict(sup)
            raw.update({k + "_pseudo": v for k, v in unsup.items()})
            raw["teacher_better_student"] = tbs
            return total, raw

        (total, raw), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.student
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.student)
        student = optax.apply_updates(state.student, updates)
        new_state = state.replace(
            step=state.step + 1,
            student=student,
            teacher=teacher,
            opt_state=opt_state,
        )
        metrics = dict(raw)
        metrics["total_loss"] = total
        metrics["ema_rate_1000x"] = keep_rate * 1000.0
        metrics["num_pseudo_cls"] = pseudo_cls.mask.sum()
        metrics["num_pseudo_reg"] = pseudo_reg.mask.sum()
        return new_state, metrics

    return burnin_step, mutual_step
