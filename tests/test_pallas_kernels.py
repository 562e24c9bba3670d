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
