"""Box-to-box transforms.

Box2BoxTransform: standard Fast R-CNN (dx, dy, dw, dh) parameterization
(detectron2 semantics; used by the RPN).

Box2BoxXYXYTransform: the KL-Loss per-edge parameterization used by the
BoundaryVar box heads (reference: ubteacher/modeling/box_regression.py:12-129)
— note its quirks are replicated exactly: get_deltas normalizes by
width + 1 while apply_deltas normalizes by width (no +1), and l/r share the
wx weight while top/bottom share wy.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)
_XYXY_SCALE_CLAMP = 1000.0 / 16


class Box2BoxTransform:
    """(dx, dy, dw, dh) deltas, detectron2-compatible."""

    def __init__(self, weights: Tuple[float, float, float, float],
                 scale_clamp: float = _DEFAULT_SCALE_CLAMP):
        self.weights = weights
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        sw = src_boxes[..., 2] - src_boxes[..., 0]
        sh = src_boxes[..., 3] - src_boxes[..., 1]
        scx = src_boxes[..., 0] + 0.5 * sw
        scy = src_boxes[..., 1] + 0.5 * sh
        tw = target_boxes[..., 2] - target_boxes[..., 0]
        th = target_boxes[..., 3] - target_boxes[..., 1]
        tcx = target_boxes[..., 0] + 0.5 * tw
        tcy = target_boxes[..., 1] + 0.5 * th
        wx, wy, ww, wh = self.weights
        sw = jnp.maximum(sw, 1e-6)
        sh = jnp.maximum(sh, 1e-6)
        dx = wx * (tcx - scx) / sw
        dy = wy * (tcy - scy) / sh
        dw = ww * jnp.log(jnp.maximum(tw, 1e-6) / sw)
        dh = wh * jnp.log(jnp.maximum(th, 1e-6) / sh)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """deltas (..., k*4), boxes (..., 4) -> (..., k*4)."""
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        cx = boxes[..., 0] + 0.5 * w
        cy = boxes[..., 1] + 0.5 * h
        wx, wy, ww, wh = self.weights
        dx = deltas[..., 0::4] / wx
        dy = deltas[..., 1::4] / wy
        dw = jnp.clip(deltas[..., 2::4] / ww, max=self.scale_clamp)
        dh = jnp.clip(deltas[..., 3::4] / wh, max=self.scale_clamp)
        pcx = dx * w[..., None] + cx[..., None]
        pcy = dy * h[..., None] + cy[..., None]
        pw = jnp.exp(dw) * w[..., None]
        ph = jnp.exp(dh) * h[..., None]
        out = jnp.stack(
            [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph],
            axis=-1,
        )  # (..., k, 4)
        return out.reshape(deltas.shape)


class Box2BoxXYXYTransform:
    """KL-Loss per-edge deltas (dl, dr, dd, du)."""

    def __init__(self, weights: Tuple[float, float, float, float],
                 scale_clamp: float = _XYXY_SCALE_CLAMP):
        self.weights = weights
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        src_w = src_boxes[..., 2] - src_boxes[..., 0] + 1.0
        src_h = src_boxes[..., 3] - src_boxes[..., 1] + 1.0
        wx, wy, _, _ = self.weights
        dl = wx * (target_boxes[..., 0] - src_boxes[..., 0]) / src_w
        dr = wx * (target_boxes[..., 2] - src_boxes[..., 2]) / src_w
        dd = wy * (target_boxes[..., 1] - src_boxes[..., 1]) / src_h
        du = wy * (target_boxes[..., 3] - src_boxes[..., 3]) / src_h
        return jnp.stack([dl, dr, dd, du], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """deltas (..., k*4) in (dl, dr, dd, du) order -> xyxy (..., k*4)."""
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        wx, wy, _, _ = self.weights
        dl = jnp.clip(deltas[..., 0::4] / wx, -self.scale_clamp, self.scale_clamp)
        dr = jnp.clip(deltas[..., 1::4] / wx, -self.scale_clamp, self.scale_clamp)
        dd = jnp.clip(deltas[..., 2::4] / wy, -self.scale_clamp, self.scale_clamp)
        du = jnp.clip(deltas[..., 3::4] / wy, -self.scale_clamp, self.scale_clamp)
        pl = dl * w[..., None] + boxes[..., 0:1]
        pr = dr * w[..., None] + boxes[..., 2:3]
        pd = dd * h[..., None] + boxes[..., 1:2]
        pu = du * h[..., None] + boxes[..., 3:4]
        out = jnp.stack([pl, pd, pr, pu], axis=-1)
        return out.reshape(deltas.shape)
