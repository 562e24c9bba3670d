"""Pallas matcher kernel vs the XLA matcher: bitwise equality.

The kernel recomputes IoU with the exact op ordering of
ops.boxes.pairwise_iou, so matched indices and labels must be IDENTICAL
(integer outputs, no tolerance) across random boxes, ties, empty gt,
all-invalid gt, and degenerate boxes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubteacher_tpu.modeling.matcher import match, match_quality
from ubteacher_tpu.ops.pallas.matcher_pallas import match_anchors_pallas


def xla_match(anchors, gt_boxes, gt_mask, thresholds, labels, allow_low):
    def one(gb, gm):
        q = match_quality(gb, gm, anchors)
        return match(q, thresholds, labels, allow_low_quality=allow_low)

    return jax.vmap(one)(gt_boxes, gt_mask)


def random_case(rng, b, m, a, n_valid):
    gt = np.zeros((b, m, 4), np.float32)
    gt[..., 0] = rng.uniform(0, 500, (b, m))
    gt[..., 1] = rng.uniform(0, 300, (b, m))
    gt[..., 2] = gt[..., 0] + rng.uniform(1, 200, (b, m))
    gt[..., 3] = gt[..., 1] + rng.uniform(1, 200, (b, m))
    mask = np.zeros((b, m), bool)
    for i in range(b):
        mask[i, : n_valid[i]] = True
    anchors = np.zeros((a, 4), np.float32)
    anchors[:, 0] = rng.uniform(0, 500, a)
    anchors[:, 1] = rng.uniform(0, 300, a)
    anchors[:, 2] = anchors[:, 0] + rng.uniform(1, 150, a)
    anchors[:, 3] = anchors[:, 1] + rng.uniform(1, 150, a)
    return jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(mask)


@pytest.mark.parametrize("seed", range(4))
def test_matcher_matches_xla(seed):
    rng = np.random.default_rng(seed)
    b, m, a = 3, 20, 700
    n_valid = rng.integers(0, m + 1, b)
    anchors, gt, mask = random_case(rng, b, m, a, n_valid)
    mi_ref, lab_ref = xla_match(
        anchors, gt, mask, (0.3, 0.7), (0, -1, 1), True
    )
    mi, lab = match_anchors_pallas(
        anchors, gt, mask, (0.3, 0.7), (0, -1, 1), True, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(mi_ref))
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab_ref))


def test_matcher_ties_and_duplicates():
    # duplicated gt boxes -> exact IoU ties across gt; duplicated anchors ->
    # per-gt best achieved by several anchors (low-quality promote ties)
    anchors = jnp.asarray(
        np.tile(np.array([[10, 10, 50, 50], [200, 200, 230, 240]], np.float32), (70, 1))
    )
    gt = jnp.asarray(
        np.array([[[10, 10, 50, 50], [10, 10, 50, 50], [300, 300, 310, 310]]], np.float32)
    )
    mask = jnp.asarray([[True, True, True]])
    mi_ref, lab_ref = xla_match(anchors, gt, mask, (0.3, 0.7), (0, -1, 1), True)
    mi, lab = match_anchors_pallas(anchors, gt, mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(mi_ref))
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab_ref))


def test_matcher_no_valid_gt_and_degenerate():
    anchors = jnp.asarray(
        np.array([[0, 0, 10, 10], [5, 5, 5, 5], [0, 0, 600, 600]], np.float32)
    )
    gt = jnp.zeros((2, 4, 4), jnp.float32)
    gt = gt.at[1, 0].set(jnp.asarray([0, 0, 10, 10]))
    mask = jnp.asarray([[False] * 4, [True, False, False, False]])
    mi_ref, lab_ref = xla_match(anchors, gt, mask, (0.3, 0.7), (0, -1, 1), True)
    mi, lab = match_anchors_pallas(anchors, gt, mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(mi_ref))
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab_ref))


def test_matcher_single_threshold_no_promote():
    rng = np.random.default_rng(7)
    anchors, gt, mask = random_case(rng, 2, 10, 300, [10, 3])
    mi_ref, lab_ref = xla_match(anchors, gt, mask, (0.5,), (0, 1), False)
    mi, lab = match_anchors_pallas(
        anchors, gt, mask, (0.5,), (0, 1), False, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(mi_ref))
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab_ref))
