"""Padding / true-image-size semantics (VERDICT r1 item 2).

The reference pads each image only to batch-max + size_divisibility
(one_stage_detector.py:88-90), so canvas padding is tiny and losses /
pseudo labels are effectively functions of the true image. On the fixed
TPU canvas the padding can be large; these tests pin the restored
semantics:

  * the normalized canvas is zeroed beyond each image's (h, w) (the
    reference normalizes THEN pads with 0);
  * locations / anchors whose cell lies beyond (h, w) are excluded from
    losses and decoding;
  * consequence: supervised losses and decoded teacher boxes are
    invariant to the canvas size an image is placed on (NORM=none for
    exactness — GroupNorm over the padded map is canvas-dependent in the
    reference too).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.modeling.fcos_head import build_one_stage_detector
from ubteacher_tpu.modeling.fcos_outputs import (
    compute_locations,
    fcos_assign_targets,
    fcos_decode,
    fcos_loss_config,
    fcos_supervised_losses,
    level_feature_sizes,
    location_validity,
)
from ubteacher_tpu.modeling.rpn import anchor_validity, find_top_proposals
from ubteacher_tpu.modeling.anchors import generate_anchors
from ubteacher_tpu.modeling.box_regression import Box2BoxTransform
from ubteacher_tpu.structures import PaddedInstances

_CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "FCOS", "coco-standard",
    "fcos_R_50_ut2_sup1_run0.yaml",
)

STRIDES = [8, 16, 32, 64, 128]


def _cfg(norm="none"):
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(_CFG_PATH)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.FCOS.NORM = norm
    return cfg


def _gt(boxes, classes, max_gt=8):
    m = len(boxes)
    b = np.zeros((1, max_gt, 4), np.float32)
    c = np.zeros((1, max_gt), np.int32)
    k = np.zeros((1, max_gt), bool)
    b[0, :m] = boxes
    c[0, :m] = classes
    k[0, :m] = True
    return PaddedInstances(
        jnp.asarray(b), jnp.asarray(c), jnp.ones((1, max_gt)),
        jnp.zeros((1, max_gt, 4)), jnp.asarray(k),
    )


def test_location_validity_counts():
    grid = compute_locations((128, 128), STRIDES)
    hw = jnp.asarray([[128.0, 128.0], [64.0, 96.0]])
    lv = location_validity(grid, hw)
    # full image: every location valid
    assert bool(lv[0].all())
    # 64x96: per level ceil(64/s) * ceil(96/s) cells are valid
    expect = sum(-(-64 // s) * (-(-96 // s)) for s in STRIDES)
    assert int(lv[1].sum()) == expect


def test_sup_losses_invariant_to_canvas():
    """Same image content on 128x128 vs 256x256 canvases -> equal losses.

    Exact equality is impossible even in the reference: FrozenBN biases
    propagate non-zero values into the (canvas-size-dependent) padded
    region, and deep-layer receptive fields reach it. Measured at random
    init: with the hw plumbing the deviation is ~5e-4 relative; without
    it ~7e-3 (cls). The test pins both the tight bound and the ordering.
    """
    cfg = _cfg()
    fcfg = fcos_loss_config(cfg)
    model = build_one_stage_detector(cfg)
    rng = np.random.default_rng(0)
    h0, w0 = 80, 96  # margin below the small canvas edge
    content = rng.normal(110, 40, size=(h0, w0, 3)).clip(0, 255)

    gt = _gt([[8, 8, 60, 72], [30, 20, 90, 76]], [3, 7])
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )["params"]

    def run(canvas, use_hw):
        img = np.zeros((1, canvas, canvas, 3), np.float32)
        img[0, :h0, :w0] = content
        hw = jnp.asarray([[h0, w0]], jnp.float32)
        dense = model.apply(
            {"params": params}, jnp.asarray(img), hw if use_hw else None
        )
        grid = compute_locations((canvas, canvas), STRIDES)
        targets = fcos_assign_targets(
            grid, gt, fcfg["num_classes"], fcfg["center_sample"],
            fcfg["pos_radius"], image_hw=hw if use_hw else None,
        )
        return jax.device_get(fcos_supervised_losses(dense, targets, fcfg))

    with_hw = {c: run(c, True) for c in (128, 256)}
    for k in with_hw[128]:
        np.testing.assert_allclose(
            with_hw[128][k], with_hw[256][k], rtol=2e-3, atol=1e-6,
            err_msg=f"{k} not canvas-invariant",
        )
    # and the plumbing must beat the legacy canvas-as-image path
    no_hw = {c: run(c, False) for c in (128, 256)}
    dev_hw = abs(with_hw[128]["loss_fcos_cls"] - with_hw[256]["loss_fcos_cls"])
    dev_no = abs(no_hw[128]["loss_fcos_cls"] - no_hw[256]["loss_fcos_cls"])
    assert dev_hw < dev_no, (dev_hw, dev_no)


def test_decode_invariant_to_canvas_and_clipped():
    """Teacher decode: same boxes from both canvases, none beyond hw, and
    a confident detection in the padding region is suppressed."""
    cfg = _cfg()
    fcfg = fcos_loss_config(cfg)
    f = cfg.MODEL.FCOS
    h0, w0 = 96, 128
    rng = np.random.default_rng(1)

    outs = {}
    for canvas in (128, 256):
        grid = compute_locations((canvas, canvas), STRIDES)
        sizes = level_feature_sizes((canvas, canvas), STRIDES)
        lengths = [fh * fw for fh, fw in sizes]
        L = sum(lengths)
        logits = jnp.asarray(rng.normal(-4.0, 1.0, size=(1, L, 80)), jnp.float32)
        # plant two confident detections inside the image at p3
        locs = np.asarray(grid["locations"])
        inside = np.where(
            (locs[: lengths[0], 0] == 52.0) & (locs[: lengths[0], 1] == 44.0)
        )[0]
        logits = logits.at[0, inside[0], 5].set(4.0)
        # plant a VERY confident detection in the padding area
        pad = np.where(
            (locs[: lengths[0], 0] > w0 + 16) | (locs[: lengths[0], 1] > h0 + 16)
        )[0]
        if len(pad):
            logits = logits.at[0, pad[0], 2].set(9.0)
        reg = jnp.full((1, L, 4), 2.0, jnp.float32)
        ctr = jnp.full((1, L), 2.0, jnp.float32)
        std = jnp.full((1, L, 4), -3.0, jnp.float32)
        from ubteacher_tpu.modeling.fcos_outputs import FCOSDense

        # reuse the same random logits for the shared prefix is impossible
        # across canvases (L differs); instead keep padding logits at the
        # planted value only and baseline low, so the valid-set detections
        # are identical by construction
        logits = jnp.where(logits > 3.0, logits, -4.0)
        dense = FCOSDense(
            logits=logits,
            reg=jnp.zeros((1, L, 4 * (fcfg["reg_max"] + 1)))
            if fcfg["reg_discrete"] else reg,
            ctrness=ctr,
            reg_std=std,
        )
        hw = jnp.asarray([[h0, w0]], jnp.float32)
        dets = fcos_decode(
            dense, grid, lengths, hw, fcfg,
            nms_method="cls", pre_nms_thresh=0.05, pre_nms_topk=100,
            post_nms_topk=20, nms_thresh=0.6, total_candidates=64,
        )
        outs[canvas] = jax.device_get(dets)

    for canvas, d in outs.items():
        n = int(d.mask.sum())
        assert n >= 1, f"no detections on canvas {canvas}"
        kept = d.boxes[0][d.mask[0]]
        # clipped to the true image, and no padding-region detection kept
        assert (kept[:, 2] <= w0 + 1e-3).all(), (canvas, kept)
        assert (kept[:, 3] <= h0 + 1e-3).all(), (canvas, kept)
        assert not (d.classes[0][d.mask[0]] == 2).any(), (
            "padding detection survived on canvas %d" % canvas
        )
    np.testing.assert_allclose(
        outs[128].boxes[0][outs[128].mask[0]],
        outs[256].boxes[0][outs[256].mask[0]],
        atol=1e-4,
    )


def test_rpn_proposals_exclude_padding_anchors():
    cfg_sizes = [[32.0], [64.0]]
    strides = [8, 16]
    anch = generate_anchors((128, 128), strides, cfg_sizes, [[1.0]], 0.0)
    A = anch["anchors"].shape[0]
    hw = jnp.asarray([[64.0, 96.0]], jnp.float32)
    valid = anchor_validity(anch["cell_origins"], hw[0])

    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(0, 1, size=(1, A)), jnp.float32)
    # make the padding anchors the best-scoring ones
    logits = jnp.where(valid[None, :], logits, 10.0)
    # (B, L, A_cell): one cell anchor per location in this fixture
    logits = logits[..., None]
    deltas = jnp.zeros((1, A, 1, 4), jnp.float32)
    b2b = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))

    boxes, scores, mask = find_top_proposals(
        anch["anchors"], anch["level_lengths"], anch["level_ids"],
        logits, deltas, hw, b2b,
        pre_nms_topk=200, post_nms_topk=50, nms_thresh=0.7,
        total_candidates=128, cell_origins=anch["cell_origins"],
    )
    scores = np.asarray(scores[0])[np.asarray(mask[0])]
    assert len(scores) > 0
    assert (scores < 9.0).all(), "padding anchor won a proposal slot"

    # without the mask, padding anchors dominate (sanity that the test bites)
    _, scores_unmasked, mask_u = find_top_proposals(
        anch["anchors"], anch["level_lengths"], anch["level_ids"],
        logits, deltas, hw, b2b,
        pre_nms_topk=200, post_nms_topk=50, nms_thresh=0.7,
        total_candidates=128,
    )
    su = np.asarray(scores_unmasked[0])[np.asarray(mask_u[0])]
    assert (su == 10.0).any()
