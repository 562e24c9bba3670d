"""Training visualization: draw gt/pseudo/predicted boxes on images.

Equivalent of the reference's visualize_training
(reference: ubteacher/modeling/one_stage_detector.py:242-321), host-side:
writes annotated PNGs under OUTPUT_DIR/vis every VIS_PERIOD iterations.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

_COLORS = [
    (66, 133, 244), (219, 68, 55), (244, 180, 0), (15, 157, 88),
    (171, 71, 188), (0, 172, 193), (255, 112, 67), (158, 157, 36),
]


def draw_boxes(
    image_bgr: np.ndarray,       # (H, W, 3) float or uint8, BGR
    boxes: np.ndarray,           # (N, 4) xyxy
    classes: Optional[Sequence[int]] = None,
    scores: Optional[Sequence[float]] = None,
    mask: Optional[np.ndarray] = None,
    thickness: int = 1,
) -> np.ndarray:
    import cv2

    img = np.ascontiguousarray(np.clip(image_bgr, 0, 255).astype(np.uint8))
    n = len(boxes)
    for i in range(n):
        if mask is not None and not mask[i]:
            continue
        x1, y1, x2, y2 = (int(round(float(v))) for v in boxes[i])
        cls = int(classes[i]) if classes is not None else 0
        color = _COLORS[cls % len(_COLORS)]
        cv2.rectangle(img, (x1, y1), (x2, y2), color, thickness)
        label = str(cls)
        if scores is not None:
            label += f":{float(scores[i]):.2f}"
        cv2.putText(img, label, (x1, max(y1 - 3, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1)
    return img


def save_training_visualization(
    output_dir: str,
    iteration: int,
    image_bgr: np.ndarray,
    gt_boxes: np.ndarray,
    gt_mask: np.ndarray,
    pseudo_boxes: Optional[np.ndarray] = None,
    pseudo_mask: Optional[np.ndarray] = None,
) -> str:
    import cv2

    vis_dir = os.path.join(output_dir, "vis")
    os.makedirs(vis_dir, exist_ok=True)
    img = draw_boxes(image_bgr, gt_boxes, mask=gt_mask)
    if pseudo_boxes is not None:
        img = draw_boxes(img, pseudo_boxes, mask=pseudo_mask, thickness=2)
    path = os.path.join(vis_dir, f"iter_{iteration:07d}.png")
    cv2.imwrite(path, img)
    return path


def save_training_panels(
    output_dir: str,
    iteration: int,
    name: str,
    panels: Sequence[dict],
) -> str:
    """Side-by-side panels like the reference's visualize_training
    (one_stage_detector.py:242-321: labeled = gt | predictions; unlabeled =
    pseudo-cls | pseudo-reg | predictions).

    Each panel dict: {"title", "image" (H, W, 3) BGR, "boxes" (N, 4) xyxy,
    optional "mask", "classes", "scores"}. Returns the written path.
    """
    import cv2

    vis_dir = os.path.join(output_dir, "vis")
    os.makedirs(vis_dir, exist_ok=True)
    imgs = []
    for p in panels:
        img = draw_boxes(
            p["image"], p["boxes"],
            classes=p.get("classes"), scores=p.get("scores"),
            mask=p.get("mask"), thickness=2,
        )
        cv2.putText(img, p.get("title", ""), (4, 14),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
        imgs.append(img)
    vis = np.concatenate(imgs, axis=1)
    path = os.path.join(vis_dir, f"iter_{iteration:07d}_{name}.png")
    cv2.imwrite(path, vis)
    return path
