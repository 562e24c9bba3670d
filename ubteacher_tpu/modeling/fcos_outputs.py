"""FCOS target assignment, losses and dense decoding — TPU-native.

Functional, fixed-shape re-design of the reference's FCOSOutputs
(reference: ubteacher/modeling/fcos/fcos_outputs.py:132-1320).

Key differences from the reference (same math, different plumbing):
  * per-location work is vectorized over a static (L, MAX_GT) grid with
    masks instead of per-image python loops + index gathers
    (reference: compute_targets_for_locations, fcos_outputs.py:772-906);
  * losses are masked sums over all L locations instead of gathers of
    positive indices (reference: fcos_losses, fcos_outputs.py:307-444);
  * cross-replica loss normalizers (num_pos_avg, loss_denorm) are plain
    global sums — under pjit the batch is global, so the reference's
    reduce_sum all-reduces (fcos_outputs.py:320, 362) are implicit;
  * NMS decoding emits padded Detections with validity masks
    (reference: dynamic Instances, fcos_outputs.py:1046-1320).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops
from ..ops import losses as L
from ..ops.nms import batched_nms_keep, top_k_detections
from ..structures import Detections, PaddedInstances

INF = 100000000.0


# --------------------------------------------------------------------------
# static geometry
# --------------------------------------------------------------------------


def level_feature_sizes(
    canvas_hw: Tuple[int, int], strides: Sequence[int]
) -> List[Tuple[int, int]]:
    """Feature (H, W) per FPN level for a fixed canvas. The canvas must be
    divisible by the largest stride (the data pipeline pads to it)."""
    h, w = canvas_hw
    return [(-(-h // s), -(-w // s)) for s in strides]


def compute_locations(
    canvas_hw: Tuple[int, int], strides: Sequence[int]
) -> Dict[str, jnp.ndarray]:
    """All-level location grid for a fixed canvas.

    Returns dict with:
      locations      (L, 2) float32 — (x, y) at stride/2 offsets
                     (reference: utils/comm.py:40-52 compute_locations)
      strides        (L,)   float32 — stride of each location's level
      size_ranges    (L, 2) float32 — size-of-interest [lo, hi] per level
                     (reference: fcos_outputs.py:199-206, 649-665)
      level_ids      (L,)   int32
    """
    sizes = level_feature_sizes(canvas_hw, strides)
    soi: List[Tuple[float, float]] = []
    prev = -1.0
    for s in (64.0, 128.0, 256.0, 512.0):
        soi.append((prev, s))
        prev = s
    soi.append((prev, INF))
    locs, strs, ranges, lids = [], [], [], []
    for lvl, ((fh, fw), stride) in enumerate(zip(sizes, strides)):
        ys = (jnp.arange(fh, dtype=jnp.float32) * stride) + stride // 2
        xs = (jnp.arange(fw, dtype=jnp.float32) * stride) + stride // 2
        gx, gy = jnp.meshgrid(xs, ys)  # (fh, fw)
        locs.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        n = fh * fw
        strs.append(jnp.full((n,), float(stride), jnp.float32))
        ranges.append(
            jnp.broadcast_to(jnp.asarray(soi[lvl], jnp.float32), (n, 2))
        )
        lids.append(jnp.full((n,), lvl, jnp.int32))
    return {
        "locations": jnp.concatenate(locs, 0),
        "strides": jnp.concatenate(strs, 0),
        "size_ranges": jnp.concatenate(ranges, 0),
        "level_ids": jnp.concatenate(lids, 0),
    }


def location_validity(
    grid: Dict[str, jnp.ndarray], image_hw: jnp.ndarray
) -> jnp.ndarray:
    """(B, L) bool — locations whose cell origin lies inside the true image.

    In the reference each image's feature maps only cover that image padded
    to size_divisibility (one_stage_detector.py:88-90), so locations beyond
    the image simply don't exist; on a fixed canvas they do, and without
    this mask the (potentially large) zero-padded area would count as real
    background in the cls loss and could emit pseudo boxes. A location at
    level stride s with index i covers pixels [i*s, (i+1)*s); it is valid
    iff i*s < dim, i.e. the cell overlaps the image.
    """
    x0 = grid["locations"][:, 0] - grid["strides"] * 0.5  # == i * stride
    y0 = grid["locations"][:, 1] - grid["strides"] * 0.5
    hw = image_hw.astype(jnp.float32)
    return (x0[None, :] < hw[:, 1:2]) & (y0[None, :] < hw[:, 0:1])


# --------------------------------------------------------------------------
# target assignment
# --------------------------------------------------------------------------


@flax.struct.dataclass
class FCOSTargets:
    """Per-location training targets for one batch. All (B, L, ...)."""

    labels: jnp.ndarray        # (B, L) int32 in [0, C]; C = background
    reg_targets: jnp.ndarray   # (B, L, 4) ltrb / stride
    box_weights: jnp.ndarray   # (B, L)
    boundary_vars: jnp.ndarray # (B, L, 4) teacher reg std carried to locations
    keep: jnp.ndarray          # (B, L) bool — ignore_near keep mask
    pos: jnp.ndarray           # (B, L) bool — foreground


def _assign_single(
    grid: Dict[str, jnp.ndarray],
    gt: PaddedInstances,  # unbatched: (M, ...) leaves
    num_classes: int,
    center_sample: bool,
    radius: float,
    ignore_near: bool,
) -> Tuple[jnp.ndarray, ...]:
    """Assignment for ONE image. Replicates fcos_outputs.py:772-906 with a
    masked (L, M) grid: per-gt area cost, INF-masked by in-box /
    size-of-interest / validity, argmin tie-break on minimal area."""
    locations = grid["locations"]          # (L, 2)
    loc_strides = grid["strides"]          # (L,)
    size_ranges = grid["size_ranges"]      # (L, 2)
    num_loc = locations.shape[0]

    boxes = gt.boxes                       # (M, 4)
    valid = gt.mask                        # (M,)

    ltrb = box_ops.encode_ltrb(locations[:, None, :], boxes[None, :, :])  # (L, M, 4)

    if center_sample:
        # center-sampling region: +- radius * stride around gt center,
        # clamped inside the gt box (reference: get_sample_region,
        # fcos_outputs.py:700-770)
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5  # (M,)
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        r = loc_strides[:, None] * radius       # (L, 1)
        xmin = jnp.maximum(cx[None, :] - r, boxes[None, :, 0])
        ymin = jnp.maximum(cy[None, :] - r, boxes[None, :, 1])
        xmax = jnp.minimum(cx[None, :] + r, boxes[None, :, 2])
        ymax = jnp.minimum(cy[None, :] + r, boxes[None, :, 3])
        xs, ys = locations[:, 0:1], locations[:, 1:2]
        inside = jnp.stack(
            [xs - xmin, ys - ymin, xmax - xs, ymax - ys], axis=-1
        ).min(-1) > 0  # (L, M)
        is_in_boxes = inside
    else:
        is_in_boxes = ltrb.min(-1) > 0  # (L, M)

    max_ltrb = ltrb.max(-1)  # (L, M)
    cared = (max_ltrb >= size_ranges[:, 0:1]) & (max_ltrb <= size_ranges[:, 1:2])

    area = box_ops.area(boxes)  # (M,)
    cost = jnp.broadcast_to(area[None, :], (num_loc, area.shape[0]))
    cost = jnp.where(is_in_boxes & cared & valid[None, :], cost, INF)

    min_area = cost.min(-1)                      # (L,)
    min_idx = jnp.argmin(cost, axis=-1)          # (L,) first-min, as torch .min
    is_bg = min_area >= INF

    # select the argmin gt per location via a one-hot contraction — TPU
    # gathers (take_along_axis / fancy indexing) are the slow path; masked
    # sums over the (L, M) grid stay on the VPU
    m = boxes.shape[0]
    onehot = (
        jnp.arange(m, dtype=jnp.int32)[None, :] == min_idx[:, None]
    ).astype(ltrb.dtype)                         # (L, M)

    labels_sel = (onehot * gt.classes[None, :].astype(ltrb.dtype)).sum(-1)
    labels = jnp.where(is_bg, num_classes, labels_sel.astype(jnp.int32))
    reg_targets = jnp.einsum("lm,lmk->lk", onehot, ltrb)
    reg_targets = reg_targets / loc_strides[:, None]

    # background box weight is 1.0 (fcos_outputs.py:885-887); but if the
    # image has NO valid gt at all, the reference emits zeros
    # (fcos_outputs.py:810)
    any_gt = valid.any()
    box_weights = jnp.where(
        is_bg, 1.0, (onehot * gt.scores[None, :]).sum(-1)
    )
    box_weights = jnp.where(any_gt, box_weights, 0.0)

    boundary_vars = jnp.where(
        is_bg[:, None], 99999.0, jnp.einsum("lm,mk->lk", onehot, gt.box_std)
    )
    boundary_vars = jnp.where(any_gt, boundary_vars, 0.0)

    if ignore_near:
        # drop background locations that fall inside ANY gt box but were not
        # selected as centers (reference: fcos_outputs.py:841-848)
        in_any_box = ((ltrb.min(-1) > 0) & valid[None, :]).any(-1)
        keep_bg = ~in_any_box
        keep_fg = (is_in_boxes & valid[None, :]).any(-1)
        keep = keep_bg | keep_fg
        keep = jnp.where(any_gt, keep, False)
    else:
        keep = jnp.ones((num_loc,), bool)

    return labels.astype(jnp.int32), reg_targets, box_weights, boundary_vars, keep


def fcos_assign_targets(
    grid: Dict[str, jnp.ndarray],
    gt: PaddedInstances,  # batched (B, M, ...)
    num_classes: int,
    center_sample: bool,
    radius: float,
    ignore_near: bool = False,
    image_hw: jnp.ndarray | None = None,
) -> FCOSTargets:
    """image_hw (B, 2) true (h, w): when given, locations outside each
    image's true extent are dropped from `keep` (and hence `pos`), so the
    fixed canvas's padding never contributes loss (see location_validity)."""
    labels, reg_t, bw, bvar, keep = jax.vmap(
        lambda g: _assign_single(
            grid, g, num_classes, center_sample, radius, ignore_near
        )
    )(gt)
    if image_hw is not None:
        keep = keep & location_validity(grid, image_hw)
    pos = (labels != num_classes) & keep
    return FCOSTargets(
        labels=labels,
        reg_targets=reg_t,
        box_weights=bw,
        boundary_vars=bvar,
        keep=keep,
        pos=pos,
    )


# --------------------------------------------------------------------------
# dense head outputs
# --------------------------------------------------------------------------


@flax.struct.dataclass
class FCOSDense:
    """Concatenated-over-levels dense head outputs.

    logits (B, L, C); reg (B, L, 4) continuous stride-units, or
    (B, L, 4*(R+1)) bin logits when reg_discrete; ctrness (B, L);
    reg_std (B, L, 4) (zeros when KL_LOSS off).
    """

    logits: jnp.ndarray
    reg: jnp.ndarray
    ctrness: jnp.ndarray
    reg_std: jnp.ndarray


def integral_project(reg_bins: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """GFL Integral: softmax over (R+1) bins -> expected scalar offset.
    (..., 4*(R+1)) -> (..., 4). Reference: fcos_outputs.py:44-77."""
    shape = reg_bins.shape[:-1] + (4, reg_max + 1)
    p = jax.nn.softmax(reg_bins.reshape(shape), axis=-1)
    proj = jnp.arange(reg_max + 1, dtype=p.dtype)
    return (p * proj).sum(-1)


def dense_reg_scalar(dense: FCOSDense, reg_discrete: bool, reg_max: int) -> jnp.ndarray:
    if reg_discrete:
        return integral_project(dense.reg, reg_max)
    return dense.reg


# --------------------------------------------------------------------------
# losses
# --------------------------------------------------------------------------


def fcos_supervised_losses(
    dense: FCOSDense,
    targets: FCOSTargets,
    cfg_fcos: Dict[str, Any],
) -> Dict[str, jnp.ndarray]:
    """Supervised (labeled-branch) losses.

    Replicates fcos_losses (reference: fcos_outputs.py:307-444), including:
      * focal cls normalized by global avg positives (reduce_sum is implicit
        here: the batch is global under pjit)
      * centerness BCE / num_pos_avg
      * IoU-family reg loss weighted by ctrness targets / loss_denorm
      * optional KL/NLL uncertainty term — NOTE the reference multiplies
        KLLOSS_WEIGHT twice in BOTH branches (fcos_outputs.py:381-397 for
        klloss: `kl_loss = w * func(...)` then `reg_loss = w * kl_loss +
        iou_loss`; fcos_outputs.py:399-416 identically for nlloss); we
        replicate the double application exactly for parity.
    """
    num_classes = cfg_fcos["num_classes"]
    keep_f = targets.keep.astype(jnp.float32)
    pos_f = targets.pos.astype(jnp.float32)

    num_pos = pos_f.sum()
    num_pos_avg = jnp.maximum(num_pos, 1.0)

    # classification over ALL kept locations
    class_target = jax.nn.one_hot(targets.labels, num_classes, dtype=dense.logits.dtype)
    cls_all = L.sigmoid_focal_loss(
        dense.logits,
        class_target,
        alpha=cfg_fcos["loss_alpha"],
        gamma=cfg_fcos["loss_gamma"],
    ).sum(-1)
    class_loss = (cls_all * keep_f).sum() / num_pos_avg

    reg_pred = dense_reg_scalar(dense, cfg_fcos["reg_discrete"], cfg_fcos["reg_max"])

    # background rows carry the argmin gt's ltrb, which can be degenerate
    # (negative extents -> inf/NaN in the iou formulas even under a zero
    # weight, since inf * 0 = NaN). Substitute unit boxes off-positives;
    # every use below is masked by pos anyway.
    safe_reg_targets = jnp.where(
        targets.pos[..., None], targets.reg_targets, 1.0
    )

    if cfg_fcos["quality_est"] == "centerness":
        ctr_targets = L.compute_ctrness_targets(safe_reg_targets)
    else:  # 'iou'
        ctr_targets = L.compute_iou_targets(
            jax.lax.stop_gradient(reg_pred), safe_reg_targets
        )
    ctr_targets = ctr_targets * pos_f
    loss_denorm = jnp.maximum(ctr_targets.sum(), 1e-6)

    iou_targets = L.compute_iou_targets(
        jax.lax.stop_gradient(reg_pred), safe_reg_targets
    )

    ctr_loss = (
        L.bce_with_logits(dense.ctrness, ctr_targets) * pos_f
    ).sum() / num_pos_avg

    iou_reg_loss = (
        L.iou_loss(
            reg_pred,
            safe_reg_targets,
            weight=ctr_targets,  # zero on non-positives
            loss_type=cfg_fcos["loc_loss_type"],
        )
        / loss_denorm
    )

    if cfg_fcos["kl_loss"]:
        w = cfg_fcos["kl_loss_weight"]
        if cfg_fcos["kl_loss_type"] == "nlloss":
            unc = L.nl_loss(
                reg_pred,
                dense.reg_std,
                safe_reg_targets,
                iou_weight=iou_targets,
                valid=pos_f,
            )
        elif cfg_fcos["kl_loss_type"] == "klloss":
            unc = L.kl_loss(
                reg_pred,
                dense.reg_std,
                safe_reg_targets,
                weight=ctr_targets,
                loss_denorm=loss_denorm,
                method=cfg_fcos["loc_fun_all"],
                valid=pos_f,
            )
        else:
            raise ValueError(cfg_fcos["kl_loss_type"])
        # double application of the weight is intentional (see docstring)
        reg_loss = w * (w * unc) + iou_reg_loss
    else:
        reg_loss = iou_reg_loss

    # no-positives guard (reference zeroes reg/ctr when no positives)
    has_pos = num_pos > 0
    reg_loss = jnp.where(has_pos, reg_loss, 0.0)
    ctr_loss = jnp.where(has_pos, ctr_loss, 0.0)

    return {
        "loss_fcos_cls": class_loss,
        "loss_fcos_loc": reg_loss,
        "loss_fcos_ctr": ctr_loss,
    }


def fcos_pseudo_losses(
    dense: FCOSDense,
    cls_targets: FCOSTargets,
    reg_targets: FCOSTargets,
    cfg_fcos: Dict[str, Any],
    ts_better: float,
    ts_better_cert: float,
    consist_reg_loss: str = "ts_locvar_better_nms_nll_l1",
) -> Dict[str, jnp.ndarray]:
    """Unsupervised (unlabeled-branch) losses.

    The cls pseudo-label set drives focal cls + centerness BCE; the reg
    pseudo-label set drives either the Listen2Student uncertainty-gated L1
    (`consist_reg_loss == "ts_locvar_better_nms_nll_l1"`, the shipped
    recipe) or the KL/NLL pseudo regression loss (any other value, incl.
    the reference default "mse_loss_all_raw"). Replicates
    fcos_pseudo_losses (reference: fcos_outputs.py:492-631).
    """
    num_classes = cfg_fcos["num_classes"]

    # ---- classification + centerness from the `cls` pseudo set ----
    pos_f = cls_targets.pos.astype(jnp.float32)
    keep_f = cls_targets.keep.astype(jnp.float32)
    num_pos_avg = jnp.maximum(pos_f.sum(), 1.0)

    class_target = jax.nn.one_hot(cls_targets.labels, num_classes, dtype=dense.logits.dtype)
    cls_all = L.sigmoid_focal_loss(
        dense.logits,
        class_target,
        alpha=cfg_fcos["loss_alpha"],
        gamma=cfg_fcos["loss_gamma"],
    ).sum(-1)
    class_loss = (cls_all * keep_f).sum() / num_pos_avg

    safe_cls_reg = jnp.where(cls_targets.pos[..., None], cls_targets.reg_targets, 1.0)
    ctr_t = L.compute_ctrness_targets(safe_cls_reg) * pos_f
    ctr_loss = (
        L.bce_with_logits(dense.ctrness, ctr_t) * pos_f
    ).sum() / num_pos_avg
    ctr_loss = jnp.where(pos_f.sum() > 0, ctr_loss, 0.0)
    if cfg_fcos.get("unify_ctrcls", False):
        # MODEL.FCOS.UNIFY_CTRCLS zeroes the pseudo ctr loss
        # (reference: fcos_outputs.py:533-535)
        ctr_loss = ctr_loss * 0.0

    # ---- regression from the `reg` pseudo set ----
    reg_pos = reg_targets.pos  # (B, L)
    reg_pos_f = reg_pos.astype(jnp.float32)
    reg_pred = dense_reg_scalar(dense, cfg_fcos["reg_discrete"], cfg_fcos["reg_max"])

    if not cfg_fcos["kl_loss"]:
        # the reference's pseudo reg loss has no non-KL path
        # (fcos_outputs.py:550-587 `else: raise ValueError`)
        raise ValueError(
            "FCOS pseudo regression loss requires MODEL.FCOS.KL_LOSS=True"
        )

    if consist_reg_loss == "ts_locvar_better_nms_nll_l1":
        # Listen2Student uncertainty-gated L1 (reference:
        # fcos_outputs.py:552-569)
        loc_conf_student = 1.0 - jax.nn.sigmoid(dense.reg_std)        # (B, L, 4)
        loc_conf_teacher = 1.0 - jax.nn.sigmoid(reg_targets.boundary_vars)
        select = (
            (loc_conf_teacher > ts_better_cert)
            & (loc_conf_teacher > loc_conf_student + ts_better)
            & reg_pos[..., None]
        )
        select_f = select.astype(jnp.float32)
        n_select = select_f.sum()
        # F.smooth_l1_loss(beta=0) == L1, 'mean' over selected elements
        l1 = jnp.abs(reg_pred - reg_targets.reg_targets) * select_f
        reg_loss = jnp.where(
            n_select > 0, l1.sum() / jnp.maximum(n_select, 1.0), 0.0
        )
    else:
        # every other SEMISUPNET.CONSIST_REG_LOSS value (incl. the default
        # "mse_loss_all_raw") selects the KL/NLL pseudo regression loss with
        # ctrness/loss_denorm computed from the REG pseudo set — weight
        # applied ONCE here, unlike the supervised branch's double
        # application (reference: fcos_outputs.py:571-585)
        w = cfg_fcos["kl_loss_weight"]
        safe_reg = jnp.where(reg_pos[..., None], reg_targets.reg_targets, 1.0)
        ctr_reg = L.compute_ctrness_targets(safe_reg) * reg_pos_f
        loss_denorm = jnp.maximum(ctr_reg.sum(), 1e-6)
        iou_t = L.compute_iou_targets(jax.lax.stop_gradient(reg_pred), safe_reg)
        if cfg_fcos["kl_loss_type"] == "nlloss":
            unc = L.nl_loss(
                reg_pred, dense.reg_std, safe_reg,
                iou_weight=iou_t, valid=reg_pos_f,
            )
        elif cfg_fcos["kl_loss_type"] == "klloss":
            unc = L.kl_loss(
                reg_pred, dense.reg_std, safe_reg,
                weight=ctr_reg, loss_denorm=loss_denorm,
                method=cfg_fcos["loc_fun_all"], valid=reg_pos_f,
            )
        else:
            raise ValueError(cfg_fcos["kl_loss_type"])
        reg_loss = jnp.where(reg_pos_f.sum() > 0, w * unc, 0.0)
        n_select = jnp.zeros((), jnp.float32)

    return {
        "loss_fcos_cls": class_loss,
        "loss_fcos_ctr": ctr_loss,
        "loss_fcos_loc": reg_loss,
        "teacher_better_student": n_select,
    }


# --------------------------------------------------------------------------
# decoding (dense -> padded Detections)
# --------------------------------------------------------------------------


def _method_scores(
    cls_sig: jnp.ndarray,    # (L, C)
    ctr_sig: jnp.ndarray,    # (L,)
    std: jnp.ndarray,        # (L, 4)
    nms_method: str,
) -> jnp.ndarray:
    if nms_method == "cls_n_ctr":
        return cls_sig * ctr_sig[:, None]
    if nms_method == "cls":
        return cls_sig
    if nms_method == "ctr":
        return jnp.broadcast_to(ctr_sig[:, None], cls_sig.shape)
    if nms_method == "cls_n_loc":
        loc_conf = (1.0 - jax.nn.sigmoid(std)).mean(-1)  # (L,)
        return cls_sig * loc_conf[:, None]
    raise ValueError(f"Undefined nms criteria: {nms_method}")


def fcos_decode(
    dense: FCOSDense,
    grid: Dict[str, jnp.ndarray],
    level_lengths: Sequence[int],
    image_hw: jnp.ndarray,  # (B, 2) true (h, w) inside the canvas
    cfg_fcos: Dict[str, Any],
    nms_method: str,
    pre_nms_thresh: float,
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_thresh: float,
    total_candidates: int,
) -> Detections:
    """Dense outputs -> padded per-image Detections via per-level top-k,
    global candidate cap, class-aware NMS and post-NMS top-k.

    Mirrors predict_proposals / forward_for_single_feature_map /
    select_over_all_levels (reference: fcos_outputs.py:1046-1320) with fixed
    shapes: per-level top-k replaces boolean gathering; a global
    `total_candidates` cap replaces dynamic concat.
    """
    reg_scalar = dense_reg_scalar(dense, cfg_fcos["reg_discrete"], cfg_fcos["reg_max"])
    reg_pixels = reg_scalar * grid["strides"][None, :, None]

    cls_sig = jax.nn.sigmoid(dense.logits)   # (B, L, C)
    ctr_sig = jax.nn.sigmoid(dense.ctrness)  # (B, L)
    thresh_with_ctr = bool(cfg_fcos.get("thresh_with_ctr", False))
    # cell origin per location, for per-image validity inside decode_one
    loc_x0 = grid["locations"][:, 0] - grid["strides"] * 0.5
    loc_y0 = grid["locations"][:, 1] - grid["strides"] * 0.5

    def decode_one(cls_s, ctr_s, regp, std, hw):
        num_loc, num_classes = cls_s.shape
        # drop candidates whose location lies beyond the true image extent —
        # those locations don't exist in the reference (it pads only to
        # divisibility, one_stage_detector.py:88-90); on a fixed canvas a
        # confident detection in the zero padding would otherwise survive
        # NMS and be clipped onto the image edge
        loc_valid = (loc_x0 < hw[1]) & (loc_y0 < hw[0])  # (L,)
        if thresh_with_ctr:
            # MODEL.FCOS.THRESH_WITH_CTR: cls scores are multiplied by
            # centerness BEFORE the pre-NMS threshold, the nms_method
            # scoring is skipped, and the carried cls_confid is the product
            # (reference: fcos_outputs.py:1172-1196)
            cls_s = cls_s * ctr_s[:, None]
            scores = cls_s
        else:
            scores = _method_scores(cls_s, ctr_s, std, nms_method)
        cand = (cls_s > pre_nms_thresh) & loc_valid[:, None]
        masked = jnp.where(cand, scores, -1.0)

        # per-level top-k over (len_l * C) candidates, two-stage and exact:
        # any pair in the global top-K implies its location is in the top-K
        # locations by per-location max, so `top-K locations -> top-K pairs`
        # selects the same set while replacing a (len_l * C)-element sort
        # (~1.3M at P3, 800px) with a max-reduce + two small top-ks
        sel_scores, sel_boxes, sel_cls, sel_ctr, sel_conf, sel_std, sel_valid = (
            [], [], [], [], [], [], []
        )
        offset = 0
        for ln in level_lengths:
            k = min(pre_nms_topk, ln * num_classes)
            lvl_scores = jax.lax.dynamic_slice_in_dim(masked, offset, ln, axis=0)
            k_loc = min(pre_nms_topk, ln)
            loc_best = lvl_scores.max(-1)                 # (ln,)
            _, loc_sel = jax.lax.top_k(loc_best, k_loc)   # (k_loc,)
            flat = lvl_scores[loc_sel].reshape(-1)        # (k_loc * C,)
            top, idx = jax.lax.top_k(flat, k)
            loc_idx = loc_sel[idx // num_classes] + offset
            cls_idx = idx % num_classes
            sel_scores.append(top)
            sel_boxes.append(
                box_ops.decode_ltrb(grid["locations"][loc_idx], regp[loc_idx])
            )
            sel_cls.append(cls_idx)
            sel_ctr.append(ctr_s[loc_idx])
            sel_conf.append(cls_s[loc_idx, cls_idx])
            sel_std.append(std[loc_idx])
            sel_valid.append(top > 0.0)
            offset += ln

        scores_c = jnp.concatenate(sel_scores)
        boxes_c = jnp.concatenate(sel_boxes)
        cls_c = jnp.concatenate(sel_cls)
        ctr_c = jnp.concatenate(sel_ctr)
        conf_c = jnp.concatenate(sel_conf)
        std_c = jnp.concatenate(sel_std)
        valid_c = jnp.concatenate(sel_valid)

        # global candidate cap before the O(K^2) NMS
        cap = min(total_candidates, scores_c.shape[0])
        top, idx = jax.lax.top_k(jnp.where(valid_c, scores_c, -1.0), cap)
        boxes_c = boxes_c[idx]
        cls_c = cls_c[idx]
        ctr_c = ctr_c[idx]
        conf_c = conf_c[idx]
        std_c = std_c[idx]
        valid_c = top > 0.0
        scores_c = top

        # sqrt on combined criteria (reference: fcos_outputs.py:1270-1275)
        if nms_method in ("cls_n_ctr", "cls_n_loc"):
            final_scores = jnp.sqrt(jnp.clip(scores_c, 0.0))
        else:
            final_scores = scores_c

        keep = batched_nms_keep(boxes_c, final_scores, cls_c, valid_c, nms_thresh)
        k_post = min(post_nms_topk, final_scores.shape[0])
        idx2, mask = top_k_detections(keep, final_scores, k_post)
        out_boxes = box_ops.clip_boxes(boxes_c[idx2], hw[0], hw[1])
        return Detections(
            boxes=out_boxes,
            scores=jnp.where(mask, final_scores[idx2], 0.0),
            classes=cls_c[idx2],
            cls_confid=jnp.where(mask, conf_c[idx2], 0.0),
            centerness=ctr_c[idx2],
            box_std=std_c[idx2],
            mask=mask,
        )

    return jax.vmap(decode_one)(cls_sig, ctr_sig, reg_pixels, dense.reg_std, image_hw)


def threshold_pseudo_labels(dets: Detections, thresh: float, max_boxes: int) -> PaddedInstances:
    """scores > thresh -> pseudo ground truth (reference:
    pseudo_generator.py:62-105 threshold_bbox). Detections are already
    padded, so thresholding just ands the mask; the box capacity is sliced
    or zero-padded to `max_boxes`."""
    keep = dets.mask & (dets.scores > thresh)
    k = dets.boxes.shape[-2]

    def fit(x, fill=0):
        if k >= max_boxes:
            return x[..., :max_boxes, :] if x.ndim == 3 else x[..., :max_boxes]
        pad = [(0, 0)] * x.ndim
        pad[-2 if x.ndim == 3 else -1] = (0, max_boxes - k)
        return jnp.pad(x, pad, constant_values=fill)

    return PaddedInstances(
        boxes=fit(dets.boxes),
        classes=fit(dets.classes),
        scores=fit(dets.scores),
        box_std=fit(dets.box_std),
        mask=fit(keep, fill=False),
    )


def threshold_pseudo_labels_cls_ctr(
    dets: Detections, cls_thresh: float, ctr_thresh: float, max_boxes: int
) -> PaddedInstances:
    """cls_confid > t0 AND centerness > t1 -> pseudo gt (reference:
    pseudo_generator.py:107-131 threshold_cls_ctr_bbox)."""
    keep = dets.mask & (dets.cls_confid > cls_thresh) & (dets.centerness > ctr_thresh)
    capped = Detections(
        boxes=dets.boxes, scores=dets.scores, classes=dets.classes,
        cls_confid=dets.cls_confid, centerness=dets.centerness,
        box_std=dets.box_std, mask=keep,
    )
    # reuse the slicing/padding of the plain variant with thresh below min
    return threshold_pseudo_labels(capped, -1.0, max_boxes)


def fcos_loss_config(cfg) -> Dict[str, Any]:
    """Extract the static FCOS loss/decode settings from a CfgNode."""
    f = cfg.MODEL.FCOS
    return {
        "num_classes": f.NUM_CLASSES,
        "loss_alpha": f.LOSS_ALPHA,
        "loss_gamma": f.LOSS_GAMMA,
        "loc_loss_type": f.LOC_LOSS_TYPE,
        "quality_est": f.QUALITY_EST,
        "reg_discrete": f.REG_DISCRETE,
        "reg_max": f.REG_MAX,
        "kl_loss": f.KL_LOSS,
        "kl_loss_type": f.KL_LOSS_TYPE,
        "kl_loss_weight": f.KLLOSS_WEIGHT,
        "loc_fun_all": f.LOC_FUN_ALL,
        "center_sample": f.CENTER_SAMPLE,
        "pos_radius": f.POS_RADIUS,
        "thresh_with_ctr": f.THRESH_WITH_CTR,
        "unify_ctrcls": f.UNIFY_CTRCLS,
    }
