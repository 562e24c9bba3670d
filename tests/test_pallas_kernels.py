"""Pallas kernels vs their jnp reference implementations (interpret mode on
CPU; the same kernels compile for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.ops import losses as L
from ubteacher_tpu.ops.nms import nms_keep
from ubteacher_tpu.ops.pallas import (
    giou_loss_pallas,
    nms_keep_pallas,
    sigmoid_focal_loss_pallas,
)


def _random_boxes(rng, n, size=200.0):
    xy = rng.random(size=(n, 2)) * size
    wh = rng.random(size=(n, 2)) * 50 + 1
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_nms_pallas_matches_jnp():
    rng = np.random.default_rng(0)
    for n in (64, 130):
        boxes = _random_boxes(rng, n)
        scores = rng.random(n).astype(np.float32)
        valid = rng.random(n) > 0.2
        ref = nms_keep(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.asarray(valid), 0.5)
        got = nms_keep_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(valid), 0.5, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_nms_pallas_valid_count_gating():
    """The kernel bounds its block loops by the valid-candidate count
    (score-sorted prefix). The kept set must stay exact when valid rows are
    a small fraction of a large pool — the reference-parity decode pools
    (TPU.NMS_CANDIDATES=5000) rely on tail blocks being skipped."""
    rng = np.random.default_rng(7)
    n = 1024
    boxes = _random_boxes(rng, n)
    scores = rng.random(n).astype(np.float32)
    for n_valid in (0, 1, 37, 130, 1024):
        valid = np.zeros(n, bool)
        valid[rng.choice(n, n_valid, replace=False)] = True
        ref = nms_keep(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.asarray(valid), 0.5)
        got = nms_keep_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(valid), 0.5, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref),
                                      err_msg=f"n_valid={n_valid}")


def test_nms_pallas_staircase_chain():
    """Adversarial worst case for the in-block fixpoint: a staircase where
    every box overlaps only its neighbors, so greedy keeps alternate boxes
    and the suppression-chain depth equals the block size (the fixpoint
    must run its full 128 iterations instead of the typical <= 8)."""
    n = 256
    x = np.arange(n, dtype=np.float32) * 12.0
    boxes = np.stack(
        [x, np.zeros(n, np.float32), x + 100.0, np.full(n, 100.0, np.float32)],
        axis=1,
    )
    scores = np.linspace(1.0, 0.01, n).astype(np.float32)
    valid = np.ones(n, bool)
    ref = nms_keep(jnp.asarray(boxes), jnp.asarray(scores),
                   jnp.asarray(valid), 0.7)
    got = nms_keep_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(valid), 0.7, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert int(np.asarray(got).sum()) == n // 2  # alternate boxes kept


def test_nms_pallas_vmap_per_image_counts():
    """vmapped kernel (the decode's per-image layout): each image carries
    its own valid count through the in-band nvalid sublane."""
    rng = np.random.default_rng(8)
    b, n = 3, 256
    boxes = np.stack([_random_boxes(rng, n) for _ in range(b)])
    scores = rng.random((b, n)).astype(np.float32)
    valid = np.zeros((b, n), bool)
    valid[0, :5] = True            # tiny
    valid[1] = rng.random(n) > 0.5  # half
    # image 2: nothing valid
    got = jax.vmap(
        lambda bx, s, v: nms_keep_pallas(bx, s, v, 0.5, interpret=True)
    )(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    for i in range(b):
        ref = nms_keep(jnp.asarray(boxes[i]), jnp.asarray(scores[i]),
                       jnp.asarray(valid[i]), 0.5)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref),
                                      err_msg=f"image {i}")


def test_focal_pallas_matches_jnp_fwd_and_grad():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(256, 80)).astype(np.float32)
    t = (rng.random((256, 80)) < 0.05).astype(np.float32)
    ref = L.sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t))
    got = sigmoid_focal_loss_pallas(
        jnp.asarray(x), jnp.asarray(t), 0.25, 2.0, True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)

    def ref_sum(xx):
        return L.sigmoid_focal_loss(xx, jnp.asarray(t)).sum()

    def got_sum(xx):
        return sigmoid_focal_loss_pallas(xx, jnp.asarray(t), 0.25, 2.0, True).sum()

    gref = jax.grad(ref_sum)(jnp.asarray(x))
    ggot = jax.grad(got_sum)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gref), rtol=1e-4,
                               atol=1e-6)


def test_giou_pallas_matches_jnp_fwd_and_grad():
    rng = np.random.default_rng(2)
    p = (rng.random((100, 4)) * 10 + 0.5).astype(np.float32)
    t = (rng.random((100, 4)) * 10 + 0.5).astype(np.float32)
    w = rng.random(100).astype(np.float32)
    ref = L.iou_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w), "giou")
    got = giou_loss_pallas(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w), True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    gref = jax.grad(
        lambda pp: L.iou_loss(pp, jnp.asarray(t), jnp.asarray(w), "giou")
    )(jnp.asarray(p))
    ggot = jax.grad(
        lambda pp: giou_loss_pallas(pp, jnp.asarray(t), jnp.asarray(w), True)
    )(jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gref), rtol=1e-4,
                               atol=1e-6)
