import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.modeling.fcos_outputs import (
    FCOSDense,
    compute_locations,
    fcos_assign_targets,
    fcos_supervised_losses,
    integral_project,
)
from ubteacher_tpu.structures import PaddedInstances

INF = 100000000.0
STRIDES = [8, 16, 32, 64, 128]


def _np_reference_assign(locations, strides_per_loc, size_ranges, boxes, classes,
                         num_classes=80, center_sample=False, radius=1.5):
    """Literal numpy transcription of compute_targets_for_locations
    (reference: fcos_outputs.py:772-906), single image, no padding."""
    L = len(locations)
    M = len(boxes)
    if M == 0:
        return (np.full(L, num_classes, np.int64),
                np.zeros((L, 4), np.float32))
    xs, ys = locations[:, 0], locations[:, 1]
    l = xs[:, None] - boxes[None, :, 0]
    t = ys[:, None] - boxes[None, :, 1]
    r = boxes[None, :, 2] - xs[:, None]
    b = boxes[None, :, 3] - ys[:, None]
    reg = np.stack([l, t, r, b], axis=2)  # (L, M, 4)

    if center_sample:
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        rad = strides_per_loc[:, None] * radius
        xmin = np.maximum(cx[None] - rad, boxes[None, :, 0])
        ymin = np.maximum(cy[None] - rad, boxes[None, :, 1])
        xmax = np.minimum(cx[None] + rad, boxes[None, :, 2])
        ymax = np.minimum(cy[None] + rad, boxes[None, :, 3])
        cb = np.stack([xs[:, None] - xmin, ys[:, None] - ymin,
                       xmax - xs[:, None], ymax - ys[:, None]], axis=2)
        in_boxes = cb.min(2) > 0
    else:
        in_boxes = reg.min(2) > 0

    max_reg = reg.max(2)
    cared = (max_reg >= size_ranges[:, [0]]) & (max_reg <= size_ranges[:, [1]])
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    loc2area = np.tile(area[None], (L, 1)).astype(np.float64)
    loc2area[~in_boxes] = INF
    loc2area[~cared] = INF
    min_area = loc2area.min(1)
    min_idx = loc2area.argmin(1)
    labels = classes[min_idx].copy()
    labels[min_area == INF] = num_classes
    reg_t = reg[np.arange(L), min_idx] / strides_per_loc[:, None]
    return labels, reg_t.astype(np.float32)


def _make_grid(canvas=(128, 128)):
    return compute_locations(canvas, STRIDES)


def _pad_instances(boxes, classes, max_gt=10):
    m = len(boxes)
    pb = np.zeros((1, max_gt, 4), np.float32)
    pc = np.zeros((1, max_gt), np.int32)
    mask = np.zeros((1, max_gt), bool)
    pb[0, :m] = boxes
    pc[0, :m] = classes
    mask[0, :m] = True
    return PaddedInstances(
        boxes=jnp.asarray(pb),
        classes=jnp.asarray(pc),
        scores=jnp.ones((1, max_gt), jnp.float32),
        box_std=jnp.zeros((1, max_gt, 4), jnp.float32),
        mask=jnp.asarray(mask),
    )


def test_assignment_matches_reference_transcription():
    grid = _make_grid()
    rng = np.random.default_rng(0)
    for center_sample in [False, True]:
        for trial in range(3):
            m = rng.integers(1, 6)
            xy = rng.random((m, 2)) * 60
            wh = rng.random((m, 2)) * 60 + 4
            boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
            classes = rng.integers(0, 80, m).astype(np.int32)

            gt = _pad_instances(boxes, classes)
            targets = fcos_assign_targets(
                grid, gt, 80, center_sample=center_sample, radius=1.5
            )
            ref_labels, ref_reg = _np_reference_assign(
                np.asarray(grid["locations"]),
                np.asarray(grid["strides"]),
                np.asarray(grid["size_ranges"]),
                boxes, classes, center_sample=center_sample,
            )
            np.testing.assert_array_equal(
                np.asarray(targets.labels[0]), ref_labels,
                err_msg=f"labels mismatch cs={center_sample} trial={trial}",
            )
            pos = ref_labels != 80
            np.testing.assert_allclose(
                np.asarray(targets.reg_targets[0])[pos], ref_reg[pos],
                rtol=1e-5, atol=1e-5,
            )


def test_assignment_empty_gt_all_background():
    grid = _make_grid()
    gt = PaddedInstances.empty(1, 10)
    targets = fcos_assign_targets(grid, gt, 80, False, 1.5)
    assert (np.asarray(targets.labels) == 80).all()
    assert not np.asarray(targets.pos).any()
    # reference emits zero box_weights for empty-gt images (fcos_outputs.py:810)
    assert (np.asarray(targets.box_weights) == 0).all()


def test_integral_project():
    # peaked distribution at bin 3 -> scalar ~3
    logits = np.full((1, 4 * 17), -10.0, np.float32)
    for e in range(4):
        logits[0, e * 17 + 3] = 10.0
    out = integral_project(jnp.asarray(logits), 16)
    np.testing.assert_allclose(np.asarray(out), np.full((1, 4), 3.0), atol=1e-3)


def _loss_cfg(reg_discrete=False, kl=False):
    return {
        "num_classes": 80,
        "loss_alpha": 0.25,
        "loss_gamma": 2.0,
        "loc_loss_type": "giou",
        "quality_est": "centerness",
        "reg_discrete": reg_discrete,
        "reg_max": 16,
        "kl_loss": kl,
        "kl_loss_type": "nlloss",
        "kl_loss_weight": 0.05,
        "loc_fun_all": "mean",
        "center_sample": False,
        "pos_radius": 1.5,
    }


def _random_dense(rng, L, C=80, reg_bins=None):
    reg_dim = 4 if reg_bins is None else 4 * (reg_bins + 1)
    return FCOSDense(
        logits=jnp.asarray(rng.normal(size=(1, L, C)).astype(np.float32) - 4.0),
        reg=jnp.asarray(np.abs(rng.normal(size=(1, L, reg_dim))).astype(np.float32)),
        ctrness=jnp.asarray(rng.normal(size=(1, L)).astype(np.float32)),
        reg_std=jnp.asarray(rng.normal(size=(1, L, 4)).astype(np.float32) * 0.01),
    )


def test_supervised_losses_finite_and_positive():
    grid = _make_grid()
    L = int(grid["locations"].shape[0])
    rng = np.random.default_rng(1)
    boxes = np.array([[10, 10, 50, 60], [30, 20, 100, 90]], np.float32)
    classes = np.array([3, 7], np.int32)
    gt = _pad_instances(boxes, classes)
    targets = fcos_assign_targets(grid, gt, 80, False, 1.5)
    for kl in [False, True]:
        dense = _random_dense(rng, L)
        losses = fcos_supervised_losses(dense, targets, _loss_cfg(kl=kl))
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, float(v), kl)
        assert float(losses["loss_fcos_cls"]) > 0
        assert float(losses["loss_fcos_ctr"]) > 0


def test_supervised_losses_no_positives():
    grid = _make_grid()
    L = int(grid["locations"].shape[0])
    rng = np.random.default_rng(2)
    gt = PaddedInstances.empty(1, 10)
    targets = fcos_assign_targets(grid, gt, 80, False, 1.5)
    dense = _random_dense(rng, L)
    losses = fcos_supervised_losses(dense, targets, _loss_cfg())
    assert float(losses["loss_fcos_loc"]) == 0.0
    assert float(losses["loss_fcos_ctr"]) == 0.0
    assert np.isfinite(float(losses["loss_fcos_cls"]))
