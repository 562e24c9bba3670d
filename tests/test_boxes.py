import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.ops import boxes as B


def test_area_and_pairwise_iou():
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])
    b2 = jnp.array([[0.0, 0.0, 10.0, 10.0], [100.0, 100.0, 110.0, 110.0]])
    np.testing.assert_allclose(B.area(b1), [100.0, 100.0])
    iou = B.pairwise_iou(b1, b2)
    assert iou.shape == (2, 2)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 0.0)
    # 5x5 overlap / (200 - 25)
    np.testing.assert_allclose(iou[1, 0], 25.0 / 175.0, rtol=1e-6)


def test_matched_iou():
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b2 = jnp.array([[0.0, 0.0, 5.0, 10.0]])
    np.testing.assert_allclose(B.matched_iou(b1, b2), [0.5])


def test_encode_decode_roundtrip():
    locs = jnp.array([[8.0, 8.0], [16.0, 24.0]])
    boxes = jnp.array([[2.0, 3.0, 20.0, 30.0], [0.0, 0.0, 40.0, 40.0]])
    ltrb = B.encode_ltrb(locs, boxes)
    np.testing.assert_allclose(ltrb[0], [6.0, 5.0, 12.0, 22.0])
    rec = B.decode_ltrb(locs, ltrb)
    np.testing.assert_allclose(rec, boxes, atol=1e-6)


def test_ltrb_iou_matches_xyxy_for_shared_center():
    # same location, two ltrb boxes -> should equal standard IoU (up to +1 smoothing)
    loc = jnp.array([50.0, 50.0])
    t = jnp.array([10.0, 10.0, 10.0, 10.0])  # 20x20 box
    p = jnp.array([10.0, 10.0, 10.0, 10.0])
    np.testing.assert_allclose(B.ltrb_iou(p, t), 1.0)
    p2 = jnp.array([5.0, 10.0, 10.0, 10.0])  # shrunk left side
    xy_t = B.decode_ltrb(loc, t)
    xy_p = B.decode_ltrb(loc, p2)
    raw = B.matched_iou(xy_t[None], xy_p[None])[0]
    smoothed = B.ltrb_iou(p2, t)
    # +1 smoothing keeps them close for moderately-sized boxes
    assert abs(float(raw) - float(smoothed)) < 0.01
