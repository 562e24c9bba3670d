"""Adaptive-grid ROIAlign (sampling_ratio=0, D2 ROIAlignV2 semantics).

The reference pools with POOLER_SAMPLING_RATIO=0 (D2 default read at
ubteacher/modeling/roi_heads/roi_heads.py:31): the per-bin sample grid is
ceil(roi_extent / output_size) per axis, per roi. All three of our
implementations (gather, full-map matmul, Pallas kernel in interpret mode)
must agree with a literal numpy transcription of the CUDA kernel's loops.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.ops.roi_align import (
    ADAPTIVE_MAX_S,
    multilevel_roi_align,
    roi_align,
    roi_align_matmul,
)
from ubteacher_tpu.ops.pallas.roi_align_pallas import multilevel_roi_align_pallas

LEVELS = (2, 3, 4, 5)
IN_FEATURES = ("p2", "p3", "p4", "p5")


def _bilinear(feat, y, x):
    """D2 ROIAlign bilinear_interpolate: skip outside [-1, dim], clamp."""
    h, w, _ = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return 0.0
    y = min(max(y, 0.0), h - 1.0)
    x = min(max(x, 0.0), w - 1.0)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (
        feat[y0, x0] * (1 - ly) * (1 - lx)
        + feat[y0, x1] * (1 - ly) * lx
        + feat[y1, x0] * ly * (1 - lx)
        + feat[y1, x1] * ly * lx
    )


def _oracle(feat, boxes, scale, p, ratio):
    """Literal transcription of ROIAlignV2 (aligned=True) forward loops."""
    r = len(boxes)
    c = feat.shape[-1]
    out = np.zeros((r, p, p, c), np.float64)
    for ri in range(r):
        x1 = boxes[ri, 0] * scale - 0.5
        y1 = boxes[ri, 1] * scale - 0.5
        x2 = boxes[ri, 2] * scale - 0.5
        y2 = boxes[ri, 3] * scale - 0.5
        rw = max(x2 - x1, 1e-6)
        rh = max(y2 - y1, 1e-6)
        bw, bh = rw / p, rh / p
        gh = ratio if ratio > 0 else int(np.ceil(rh / p))
        gw = ratio if ratio > 0 else int(np.ceil(rw / p))
        gh, gw = max(gh, 1), max(gw, 1)
        for ph in range(p):
            for pw in range(p):
                acc = np.zeros(c, np.float64)
                for iy in range(gh):
                    y = y1 + ph * bh + (iy + 0.5) * bh / gh
                    for ix in range(gw):
                        x = x1 + pw * bw + (ix + 0.5) * bw / gw
                        acc += _bilinear(feat, y, x)
                out[ri, ph, pw] = acc / (gh * gw)
    return out


def _boxes_for_grids(rng, img_h, img_w, lvl_scale, p=7):
    """Boxes whose adaptive grids span 1..ADAPTIVE_MAX_S on this level."""
    boxes = []
    for g in range(1, ADAPTIVE_MAX_S + 1):
        span = (g - 0.3) * p / lvl_scale          # extent -> grid g
        x1 = rng.uniform(0, img_w - span)
        y1 = rng.uniform(0, img_h - span)
        boxes.append([x1, y1, x1 + span, y1 + span])
    return np.asarray(boxes, np.float32)


def test_single_level_adaptive_matches_oracle():
    rng = np.random.RandomState(0)
    feat = rng.randn(64, 80, 16).astype(np.float32)
    scale = 0.25
    boxes = _boxes_for_grids(rng, 64 / scale, 80 / scale, scale)
    want = _oracle(feat, boxes, scale, 7, 0)
    got_gather = roi_align(jnp.asarray(feat), jnp.asarray(boxes), scale, 7, 0)
    got_matmul = roi_align_matmul(
        jnp.asarray(feat), jnp.asarray(boxes), scale, 7, 0
    )
    np.testing.assert_allclose(np.asarray(got_gather), want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_matmul), want, atol=1e-4)


def test_single_level_static_still_matches_oracle():
    rng = np.random.RandomState(1)
    feat = rng.randn(48, 56, 8).astype(np.float32)
    scale = 0.125
    boxes = _boxes_for_grids(rng, 48 / scale, 56 / scale, scale)[:4]
    want = _oracle(feat, boxes, scale, 7, 2)
    got = roi_align_matmul(jnp.asarray(feat), jnp.asarray(boxes), scale, 7, 2)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_multilevel_pallas_adaptive_matches_matmul():
    rng = np.random.RandomState(2)
    B, C, H, W = 2, 64, 96, 160
    feats, pyr = [], {}
    for l in LEVELS:
        f = rng.randn(B, H >> (l - 2), W >> (l - 2), C).astype(np.float32)
        pyr[f"p{l}"] = jnp.asarray(f)
        feats.append(jnp.asarray(f))
    img_h, img_w = H * 4, W * 4
    cx = rng.uniform(30, img_w - 30, (B, 16))
    cy = rng.uniform(30, img_h - 30, (B, 16))
    sz = rng.uniform(12, 380, (B, 16))
    ar = rng.uniform(0.5, 2.0, (B, 16))
    w = np.minimum(sz * np.sqrt(ar), 2 * np.minimum(cx, img_w - cx))
    h = np.minimum(sz / np.sqrt(ar), 2 * np.minimum(cy, img_h - cy))
    boxes = jnp.asarray(
        np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1),
        jnp.float32,
    )
    exact = multilevel_roi_align(pyr, boxes, IN_FEATURES, 7, 0, method="matmul")
    got = multilevel_roi_align_pallas(
        feats, boxes, LEVELS, 7, 0, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(exact), rtol=1e-5, atol=1e-5
    )


def test_adaptive_gradients_match():
    rng = np.random.RandomState(3)
    feats = tuple(
        jnp.asarray(rng.randn(1, 48 >> (l - 2), 64 >> (l - 2), 32).astype(np.float32))
        for l in LEVELS
    )
    boxes = jnp.asarray(
        [[[10.0, 12.0, 90.0, 70.0], [30.0, 20.0, 150.0, 170.0],
          [5.0, 5.0, 180.0, 120.0]]]
    )

    def loss_pallas(fs):
        return jnp.sum(
            multilevel_roi_align_pallas(fs, boxes, LEVELS, 7, 0, interpret=True)
            ** 2
        )

    def loss_matmul(fs):
        p = {f"p{l}": f for l, f in zip(LEVELS, fs)}
        return jnp.sum(
            multilevel_roi_align(p, boxes, IN_FEATURES, 7, 0, method="matmul")
            ** 2
        )

    gp = jax.grad(loss_pallas)(feats)
    gx = jax.grad(loss_matmul)(feats)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
