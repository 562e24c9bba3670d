"""RCNN path unit + smoke tests: anchors, box transforms, matcher,
sampling, ROIAlign, RPN proposals, full train step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.modeling.anchors import cell_anchors, generate_anchors
from ubteacher_tpu.modeling.box_regression import (
    Box2BoxTransform,
    Box2BoxXYXYTransform,
)
from ubteacher_tpu.modeling.matcher import (
    match,
    match_quality,
    random_priority_topk,
)
from ubteacher_tpu.ops.roi_align import assign_levels, roi_align
from ubteacher_tpu.structures import PaddedInstances

_CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "Faster-RCNN", "coco-standard",
    "faster_rcnn_R_50_FPN_ut2_sup1_run0.yaml",
)


def test_cell_anchors_d2_formula():
    base = cell_anchors([32], [0.5, 1.0, 2.0])
    # ratio 1.0 -> square 32x32 centered at origin
    np.testing.assert_allclose(base[1], [-16, -16, 16, 16], atol=1e-6)
    # ratio 0.5 -> w = sqrt(1024/0.5), h = 0.5w
    w = np.sqrt(1024 / 0.5)
    np.testing.assert_allclose(base[0], [-w / 2, -w / 4, w / 2, w / 4], atol=1e-5)


def test_generate_anchors_counts():
    out = generate_anchors((64, 64), [4, 8], [[32], [64]], [[0.5, 1.0, 2.0]])
    assert out["level_lengths"] == [16 * 16 * 3, 8 * 8 * 3]
    assert out["anchors"].shape[0] == sum(out["level_lengths"])


def test_box2box_xywh_roundtrip():
    t = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))
    src = jnp.asarray([[10.0, 10.0, 50.0, 40.0], [0.0, 0.0, 20.0, 30.0]])
    tgt = jnp.asarray([[12.0, 8.0, 60.0, 44.0], [5.0, 2.0, 15.0, 35.0]])
    deltas = t.get_deltas(src, tgt)
    rec = t.apply_deltas(deltas, src)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(tgt), atol=1e-4)


def test_box2box_xyxy_matches_reference_quirks():
    """get_deltas uses width+1; apply uses width (reference:
    box_regression.py:59-67 vs 88-122). Verify against a direct torch
    transcription."""
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, (8, 4)).astype(np.float32)
    src[:, 2:] = src[:, :2] + rng.uniform(5, 50, (8, 2)).astype(np.float32)
    tgt = src + rng.uniform(-3, 3, (8, 4)).astype(np.float32)

    t = Box2BoxXYXYTransform((10.0, 10.0, 5.0, 5.0))
    ours = np.asarray(t.get_deltas(jnp.asarray(src), jnp.asarray(tgt)))

    sw = src[:, 2] - src[:, 0] + 1.0
    sh = src[:, 3] - src[:, 1] + 1.0
    ref = np.stack(
        [
            10.0 * (tgt[:, 0] - src[:, 0]) / sw,
            10.0 * (tgt[:, 2] - src[:, 2]) / sw,
            10.0 * (tgt[:, 1] - src[:, 1]) / sh,
            10.0 * (tgt[:, 3] - src[:, 3]) / sh,
        ],
        axis=1,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    # apply on deltas reproduces the reference decode (width without +1)
    applied = np.asarray(t.apply_deltas(jnp.asarray(ref), jnp.asarray(src)))
    w = src[:, 2] - src[:, 0]
    h = src[:, 3] - src[:, 1]
    exp = np.stack(
        [
            ref[:, 0] / 10 * w + src[:, 0],
            ref[:, 2] / 10 * h + src[:, 1],
            ref[:, 1] / 10 * w + src[:, 2],
            ref[:, 3] / 10 * h + src[:, 3],
        ],
        axis=1,
    )
    np.testing.assert_allclose(applied, exp, rtol=1e-5)


def test_matcher_rpn_semantics():
    gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    anchors = jnp.asarray(
        [
            [0.0, 0.0, 10.0, 10.0],   # iou 1.0 -> positive
            [0.0, 0.0, 10.0, 6.0],    # iou 0.6 -> ignore (-1)
            [0.0, 0.0, 4.0, 4.0],     # iou 0.16 -> negative
            [50.0, 50.0, 60.0, 60.0], # iou 0 -> negative
        ]
    )
    quality = match_quality(gt, jnp.asarray([True]), anchors)
    idxs, labels = match(quality, (0.3, 0.7), (0, -1, 1), allow_low_quality=True)
    assert labels.tolist() == [1, -1, 0, 0]

    # low-quality promotion: the best-overlapping anchor of an
    # otherwise-unmatched gt is promoted even at tiny IoU (> 0; unlike D2 we
    # deliberately never promote on zero/negative quality so padded gt rows
    # can't mark everything positive)
    gt2 = jnp.asarray([[8.0, 8.0, 18.0, 18.0]])  # IoU ~0.02 with anchor 0
    q2 = match_quality(gt2, jnp.asarray([True]), anchors)
    _, labels2 = match(q2, (0.3, 0.7), (0, -1, 1), allow_low_quality=True)
    assert labels2[0] == 1


def test_random_priority_topk():
    rng = jax.random.PRNGKey(0)
    eligible = jnp.asarray([True] * 10 + [False] * 100)
    idx, ok = random_priority_topk(eligible, 16, rng)
    assert idx.shape == (16,)
    assert int(ok.sum()) == 10            # only 10 eligible exist
    assert bool(eligible[idx[ok]].all())  # every ok row hit an eligible one
    assert len(set(np.asarray(idx[ok]).tolist())) == 10  # no duplicates


def test_random_priority_topk_hierarchical():
    """The RPN-width path (A >= 512k) goes through the per-block
    hierarchical top-k; it must still find every scarce eligible and
    return distinct eligible indices at full k."""
    a = 258048
    rng = np.random.default_rng(0)
    elig = np.zeros((a,), bool)
    elig[rng.choice(a, 5000, replace=False)] = True
    idx, ok = random_priority_topk(jnp.asarray(elig), 256, jax.random.PRNGKey(0))
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok.all()
    assert len(set(idx.tolist())) == 256
    assert elig[idx].all()

    scarce = np.zeros((a,), bool)
    on = rng.choice(a, 37, replace=False)
    scarce[on] = True
    idx2, ok2 = random_priority_topk(
        jnp.asarray(scarce), 128, jax.random.PRNGKey(1)
    )
    idx2, ok2 = np.asarray(idx2), np.asarray(ok2)
    assert ok2.sum() == 37                 # finds ALL eligibles
    assert set(idx2[ok2].tolist()) == set(on.tolist())

    # CLUSTERED eligibles — RPN positives are consecutive flat indices
    # around an object; the strided block layout must still find every
    # one when scarce (a contiguous run maps to distinct blocks)
    clustered = np.zeros((a,), bool)
    clustered[10_000:10_030] = True
    idx3, ok3 = random_priority_topk(
        jnp.asarray(clustered), 128, jax.random.PRNGKey(2)
    )
    idx3, ok3 = np.asarray(idx3), np.asarray(ok3)
    assert ok3.sum() == 30
    assert set(idx3[ok3].tolist()) == set(range(10_000, 10_030))
    # and sample exactly k distinct members from a large contiguous run
    big = np.zeros((a,), bool)
    big[50_000:50_300] = True
    idx4, ok4 = random_priority_topk(
        jnp.asarray(big), 128, jax.random.PRNGKey(3)
    )
    idx4, ok4 = np.asarray(idx4), np.asarray(ok4)
    assert ok4.all()
    sel = set(idx4.tolist())
    assert len(sel) == 128 and sel <= set(range(50_000, 50_300))


def test_roi_align_matches_torchvision_formula():
    """Check against a direct bilinear computation for a single aligned box."""
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(16, 16, 2)).astype(np.float32)
    boxes = np.asarray([[4.0, 4.0, 12.0, 12.0]], np.float32)  # in image pixels
    out = roi_align(jnp.asarray(feat), jnp.asarray(boxes), spatial_scale=1.0,
                    output_size=2, sampling_ratio=2)
    assert out.shape == (1, 2, 2, 2)
    # averaged bilinear samples must lie within the local value range
    region = feat[3:13, 3:13]
    assert float(out.min()) >= region.min() - 1e-4
    assert float(out.max()) <= region.max() + 1e-4


def test_assign_levels():
    boxes = jnp.asarray(
        [
            [0.0, 0.0, 56.0, 56.0],     # ~56 -> level 2
            [0.0, 0.0, 224.0, 224.0],   # 224 -> level 4
            [0.0, 0.0, 896.0, 896.0],   # -> level 5 (clamped)
        ]
    )
    lv = assign_levels(boxes, 2, 5)
    assert lv.tolist() == [2, 4, 5]


def _rcnn_tiny_cfg():
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(_CFG_PATH)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.RESNETS.DEPTH = 18  # small backbone: CPU compile time
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_GT = 8
    cfg.TPU.MAX_PSEUDO = 20
    cfg.TPU.NMS_CANDIDATES = 100
    cfg.SEMISUPNET.BURN_UP_STEP = 1
    cfg.freeze()
    return cfg


def test_rcnn_train_steps_smoke():
    from ubteacher_tpu.engine.rcnn_trainer import (
        make_rcnn_inference_fn,
        make_rcnn_train_steps,
    )
    from ubteacher_tpu.engine import FCOSTrainState
    from ubteacher_tpu.modeling.rcnn import build_two_stage_rcnn
    from ubteacher_tpu.solver import build_optimizer

    cfg = _rcnn_tiny_cfg()
    model = build_two_stage_rcnn(cfg)
    b, h, w = 2, 64, 64
    images = jnp.zeros((b, h, w, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images)["params"]
    tx = build_optimizer(cfg, params)
    state = FCOSTrainState.create(params, tx)
    burnin, mutual = make_rcnn_train_steps(cfg, model, tx)

    m = cfg.TPU.MAX_GT
    boxes = np.zeros((b, m, 4), np.float32)
    classes = np.zeros((b, m), np.int32)
    mask = np.zeros((b, m), bool)
    boxes[:, 0] = [8, 8, 40, 40]
    classes[:, 0] = 1
    mask[:, 0] = True
    gt = PaddedInstances(
        jnp.asarray(boxes), jnp.asarray(classes), jnp.ones((b, m)),
        jnp.zeros((b, m, 4)), jnp.asarray(mask),
    )
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(100, 40, (b, h, w, 3)).clip(0, 255).astype(np.float32))
    batch = {
        "images_label_k": imgs, "gt_label": gt, "images_unlabel_k": imgs,
        "rng": jax.random.PRNGKey(2),
    }
    state, metrics = burnin(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(metrics["loss_cls"]) > 0

    state, metrics = mutual(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert "loss_box_reg_pseudo" in metrics
    assert float(metrics["ema_rate_1000x"]) == 0.0  # copy at burn-up boundary

    infer = make_rcnn_inference_fn(cfg, model)
    dets = infer(state.teacher, imgs,
                 jnp.asarray([[h, w], [h, w]], jnp.float32))
    assert dets.boxes.shape[0] == b
    assert dets.mask.dtype == bool

    # mixed canvas buckets: label and unlabel streams on DIFFERENT shapes
    # must fall back to per-canvas programs instead of crashing the fused
    # concatenate (the loader routinely pairs canvases from different
    # scale/orientation buckets)
    imgs_u = jnp.asarray(
        rng.normal(100, 40, (b, h + 32, w, 3)).clip(0, 255).astype(np.float32)
    )
    batch_mixed = dict(batch, images_unlabel_k=imgs_u)
    state, metrics = mutual(state, batch_mixed)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))

    # labeled images with ZERO gt keep their all-background RPN objectness
    # loss in the mutual phase (reference: confidence weighting applies to
    # pseudo branches only; rpn.py:135-143 zeroes only no-gt PSEUDO images)
    gt_empty = PaddedInstances(
        jnp.zeros((b, m, 4)), jnp.zeros((b, m), jnp.int32),
        jnp.zeros((b, m)), jnp.zeros((b, m, 4)),
        jnp.zeros((b, m), bool),
    )
    batch_empty = dict(batch, gt_label=gt_empty)
    _, metrics = mutual(state, batch_empty)
    assert float(metrics["loss_rpn_cls"]) > 0


def test_label_anchors_sample_first():
    """Sample-first labeling: balanced counts, correct matched boxes, and
    rpn_losses consuming only the sampled rows (modeling/rpn.py)."""
    from ubteacher_tpu.modeling.rpn import label_anchors, rpn_losses

    # 1 gt box; anchors: one perfect match, one partial, rest far away
    anchors = np.full((40, 4), 500.0, np.float32)
    anchors[:, 2:] += 10.0
    anchors[0] = [10, 10, 30, 30]    # IoU 1.0 with gt -> positive
    anchors[1] = [18, 10, 38, 30]    # IoU ~0.43 -> ignore band [0.3, 0.7)
    anchors = jnp.asarray(anchors)
    m = 5
    gtb = np.zeros((m, 4), np.float32)
    gtb[0] = [10, 10, 30, 30]
    gt = PaddedInstances(
        jnp.asarray(gtb), jnp.zeros((m,), jnp.int32),
        jnp.full((m,), 0.9, jnp.float32), jnp.zeros((m, 4)),
        jnp.asarray(np.eye(1, m, 0, dtype=bool)[0]),
    )
    s = label_anchors(anchors, gt, 8, 0.5, jax.random.PRNGKey(0), True)
    assert s["idx"].shape == (4 + 8,)
    assert int(s["ok"].sum()) == 8           # exactly batch_size sampled
    pos = np.asarray((s["labels"] == 1) & s["ok"])
    neg = np.asarray((s["labels"] == 0) & s["ok"])
    idx = np.asarray(s["idx"])
    assert pos.sum() == 1 and idx[pos.argmax()] == 0   # the IoU-1 anchor
    assert neg.sum() == 7
    np.testing.assert_allclose(
        np.asarray(s["boxes"])[pos.argmax()], [10, 10, 30, 30]
    )
    np.testing.assert_allclose(np.asarray(s["confid"])[pos.argmax()], 0.9)

    # losses over the sampled rows only; gradients well-defined
    b2b = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))
    logits = jnp.zeros((1, 40, 1))  # (B, L, A_cell=1)
    deltas = jnp.zeros((1, 40, 1, 4))
    batched = jax.tree.map(lambda x: x[None], s)
    out = rpn_losses(anchors, logits, deltas, batched, b2b, 8)
    # perfect-match positive at zero deltas -> zero loc loss
    np.testing.assert_allclose(float(out["loss_rpn_loc"]), 0.0, atol=1e-6)
    # BCE(0 logit) = ln 2 for each sampled anchor; confid 0.9 everywhere
    np.testing.assert_allclose(
        float(out["loss_rpn_cls"]), 8 * np.log(2.0) * 0.9 / 8, rtol=1e-5
    )

    # no-gt image: all-background sample, zero matched boxes
    gt0 = PaddedInstances(
        jnp.zeros((m, 4)), jnp.zeros((m,), jnp.int32), jnp.zeros((m,)),
        jnp.zeros((m, 4)), jnp.zeros((m,), bool),
    )
    s0 = label_anchors(anchors, gt0, 8, 0.5, jax.random.PRNGKey(1), False)
    assert int(((s0["labels"] == 1) & s0["ok"]).sum()) == 0
    assert int(s0["ok"].sum()) == 8
    np.testing.assert_allclose(np.asarray(s0["confid"]), 1.0)


def test_focal_ce_extreme_logits_finite_grads():
    """Confidently-correct rows (ce ~ 0) must give finite loss AND grads:
    log_softmax rounding can make ce slightly negative under fused XLA,
    and (1 - exp(-ce))**1.5 NaNs on a negative base without the clamp
    (modeling/fast_rcnn.py:focal_ce_loss)."""
    import jax
    import jax.numpy as jnp
    from ubteacher_tpu.modeling.fast_rcnn import focal_ce_loss

    scores = jnp.asarray(
        [[1000.0, 0.0, 0.0, 0.0],   # ce == 0 exactly after log_softmax
         [30.0, 0.0, 0.0, 0.0],
         [0.0, 0.0, 0.0, 30.0],
         [-5.0, 10.0, 3.0, 0.0]]
    )
    cls = jnp.asarray([0, 0, 0, 2])
    valid = jnp.ones((4,), bool)

    val, grad = jax.value_and_grad(
        lambda s: focal_ce_loss(s, cls, valid)
    )(scores)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()

    # the clamp path itself: ce forced negative via a monkeypatched logp is
    # impossible from outside; instead check loss == 0 for the exact-zero-ce
    # row contribution (p == 1 -> focal weight 0)
    one = focal_ce_loss(scores[:1], cls[:1], valid[:1])
    np.testing.assert_allclose(float(one), 0.0, atol=1e-12)


def test_find_top_proposals_matches_d2_semantics():
    """find_top_proposals == a numpy transcription of D2's
    find_top_rpn_proposals (proposal_utils.py): per-level top-k by
    objectness, decode+clip, nonempty(min_size) filter, per-level greedy
    NMS (batched_nms with level id as class never crosses levels), global
    top post_nms_topk by score. The repo runs the per-level NMS as a
    stacked vmapped kernel — the kept set must be identical."""
    from ubteacher_tpu.modeling.rpn import find_top_proposals

    cfg_sizes = [[16.0], [32.0]]
    strides = [8, 16]
    anch = generate_anchors((64, 96), strides, cfg_sizes, [[1.0]], 0.0)
    anchors = np.asarray(anch["anchors"])
    level_lengths = list(anch["level_lengths"])
    A = anchors.shape[0]
    rng = np.random.default_rng(11)
    logits = rng.normal(0, 1, size=(A,)).astype(np.float32)
    hw = np.asarray([60.0, 90.0], np.float32)
    pre_nms_topk, post_nms_topk, nms_thresh = 50, 30, 0.6

    def np_iou(a, b):
        ix1 = np.maximum(a[0], b[:, 0])
        iy1 = np.maximum(a[1], b[:, 1])
        ix2 = np.minimum(a[2], b[:, 2])
        iy2 = np.minimum(a[3], b[:, 3])
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (
            (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        ) - inter
        return np.where(ua > 0, inter / np.maximum(ua, 1e-12), 0.0)

    # --- numpy D2 transcription (zero deltas: proposal == anchor) ---
    survivors = []  # (score, box)
    off = 0
    for ln in level_lengths:
        ls = logits[off : off + ln]
        lb = anchors[off : off + ln].copy()
        order = np.argsort(-ls)[: min(pre_nms_topk, ln)]
        ls, lb = ls[order], lb[order]
        lb[:, 0::2] = lb[:, 0::2].clip(0, hw[1])
        lb[:, 1::2] = lb[:, 1::2].clip(0, hw[0])
        keep = (lb[:, 2] - lb[:, 0] > 0) & (lb[:, 3] - lb[:, 1] > 0)
        ls, lb = ls[keep], lb[keep]
        # greedy NMS within the level
        sup = np.zeros(len(ls), bool)
        for i in np.argsort(-ls):
            if sup[i]:
                continue
            iou = np_iou(lb[i], lb)
            newly = iou > nms_thresh
            newly[i] = False
            sup |= newly
            survivors.append((float(ls[i]), lb[i]))
        off += ln
    survivors.sort(key=lambda t: -t[0])
    ref = survivors[:post_nms_topk]

    boxes, scores, mask = find_top_proposals(
        jnp.asarray(anchors), level_lengths, anch["level_ids"],
        jnp.asarray(logits).reshape(1, -1, 1),
        jnp.zeros((1, A, 1, 4), jnp.float32),
        jnp.asarray(hw)[None], Box2BoxTransform((1.0, 1.0, 1.0, 1.0)),
        pre_nms_topk, post_nms_topk, nms_thresh,
        total_candidates=pre_nms_topk,
    )
    got_scores = np.asarray(scores[0])[np.asarray(mask[0])]
    got_boxes = np.asarray(boxes[0])[np.asarray(mask[0])]
    assert len(got_scores) == len(ref) > 0
    np.testing.assert_allclose(
        got_scores, [s for s, _ in ref], rtol=1e-6
    )
    order = np.argsort(-got_scores)
    np.testing.assert_allclose(
        got_boxes[order], np.stack([b for _, b in ref]), atol=1e-4
    )
