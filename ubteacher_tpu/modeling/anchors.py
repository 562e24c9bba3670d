"""Anchor generation — detectron2 DefaultAnchorGenerator semantics, static.

(Reference consumes D2 anchors through PseudoLabRPN, rpn.py:30.) For a fixed
canvas, anchors are a compile-time constant (A_total, 4) array: XLA folds
them into the program; nothing is recomputed per step.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]) -> np.ndarray:
    """Base anchors centered at (0, 0), (len(sizes)*len(ratios), 4) xyxy.

    D2 formula: area = size^2; w = sqrt(area / ratio); h = ratio * w.
    """
    out = []
    for size in sizes:
        area = size**2
        for ratio in aspect_ratios:
            w = math.sqrt(area / ratio)
            h = ratio * w
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, np.float64)


def generate_anchors(
    canvas_hw: Tuple[int, int],
    strides: Sequence[int],
    sizes: Sequence[Sequence[float]],
    aspect_ratios: Sequence[Sequence[float]],
    offset: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    """All-level anchors for a fixed canvas.

    Returns {"anchors": (A, 4) f32, "level_lengths": python list,
    "level_ids": (A,) i32, "cell_origins": (A, 2) f32 — the (x, y) origin
    of each anchor's feature-map cell in canvas pixels, used to mask off
    anchors whose cell lies beyond an image's true extent (those anchors
    don't exist in the reference, which pads only to divisibility)}.
    sizes/aspect_ratios broadcast over levels like D2 (a single entry is
    shared by all levels).
    """
    h, w = canvas_hw
    n_lvl = len(strides)
    if len(sizes) == 1:
        sizes = list(sizes) * n_lvl
    if len(aspect_ratios) == 1:
        aspect_ratios = list(aspect_ratios) * n_lvl
    all_anchors: List[np.ndarray] = []
    lengths: List[int] = []
    lids: List[np.ndarray] = []
    origins: List[np.ndarray] = []
    for lvl, stride in enumerate(strides):
        fh, fw = -(-h // stride), -(-w // stride)
        base = cell_anchors(sizes[lvl], aspect_ratios[lvl])  # (A_cell, 4)
        sx = (np.arange(fw) + offset) * stride
        sy = (np.arange(fh) + offset) * stride
        gx, gy = np.meshgrid(sx, sy)
        shifts = np.stack(
            [gx.ravel(), gy.ravel(), gx.ravel(), gy.ravel()], axis=1
        )  # (fh*fw, 4)
        anchors = (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)
        ox, oy = np.meshgrid(np.arange(fw) * stride, np.arange(fh) * stride)
        cell_org = np.stack([ox.ravel(), oy.ravel()], axis=1)  # (fh*fw, 2)
        a_cell = base.shape[0]
        origins.append(np.repeat(cell_org, a_cell, axis=0))
        all_anchors.append(anchors)
        lengths.append(anchors.shape[0])
        lids.append(np.full(anchors.shape[0], lvl, np.int32))
    return {
        "anchors": jnp.asarray(np.concatenate(all_anchors), jnp.float32),
        "level_lengths": lengths,
        "level_ids": jnp.asarray(np.concatenate(lids)),
        "cell_origins": jnp.asarray(np.concatenate(origins), jnp.float32),
    }
