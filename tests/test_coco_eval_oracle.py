"""Fuzz COCOBboxEvaluator against the transcribed pycocotools oracle
(VERDICT r1 item 3): hundreds of randomized scenarios covering crowds,
area-range edges, tied scores, empty images, >100-det images, gt-only and
det-only images. All 9 standard metrics + per-category AP must match the
canonical protocol to float64 tolerance.
"""

import numpy as np
import pytest

from coco_oracle import coco_eval_oracle
from ubteacher_tpu.evaluation.coco_eval import COCOBboxEvaluator


def _random_scenario(rng, num_classes):
    """Random gt+dt annotation lists (xywh)."""
    n_imgs = rng.integers(2, 12)
    gt_anns, dt_anns = [], []
    for img_id in range(n_imgs):
        kind = rng.integers(0, 10)
        if kind == 0:
            continue  # empty image: no gt, no det
        n_gt = int(rng.integers(0, 8)) if kind != 1 else 0
        for _ in range(n_gt):
            # areas spanning small/medium/large around the 32^2 / 96^2 edges
            w = float(rng.choice([4, 8, 31, 32, 33, 64, 95, 96, 97, 200]))
            h = float(rng.choice([4, 8, 31, 32, 33, 64, 95, 96, 97, 200]))
            x = float(rng.uniform(0, 400))
            y = float(rng.uniform(0, 400))
            crowd = int(rng.random() < 0.15)
            # segmentation area differs from bbox area sometimes
            area = w * h * float(rng.choice([1.0, 1.0, 0.7]))
            gt_anns.append({
                "image_id": img_id,
                "category_id": int(rng.integers(0, num_classes)),
                "bbox": [x, y, w, h],
                "area": area,
                "iscrowd": crowd,
            })
        n_dt = int(rng.integers(0, 12)) if kind != 2 else 0
        if kind == 3:
            n_dt = 120  # exceed maxDets=100 in one image
        for _ in range(n_dt):
            if gt_anns and rng.random() < 0.5:
                # perturb a gt box (often of another image/category)
                g = gt_anns[rng.integers(0, len(gt_anns))]
                bx = [
                    g["bbox"][0] + float(rng.normal(0, 4)),
                    g["bbox"][1] + float(rng.normal(0, 4)),
                    max(1.0, g["bbox"][2] * float(rng.uniform(0.8, 1.2))),
                    max(1.0, g["bbox"][3] * float(rng.uniform(0.8, 1.2))),
                ]
                cat = g["category_id"] if rng.random() < 0.8 else int(
                    rng.integers(0, num_classes)
                )
            else:
                bx = [
                    float(rng.uniform(0, 400)), float(rng.uniform(0, 400)),
                    float(rng.uniform(2, 150)), float(rng.uniform(2, 150)),
                ]
                cat = int(rng.integers(0, num_classes))
            # quantized scores -> plenty of exact ties
            score = float(np.round(rng.uniform(0.05, 1.0), 1))
            dt_anns.append({
                "image_id": img_id,
                "category_id": cat,
                "bbox": bx,
                "score": score,
            })
    img_ids = list(range(n_imgs))
    return gt_anns, dt_anns, img_ids


def _run_ours(gt_anns, dt_anns, img_ids, num_classes):
    ev = COCOBboxEvaluator(num_classes)
    for img_id in img_ids:
        g = [a for a in gt_anns if a["image_id"] == img_id]
        d = [a for a in dt_anns if a["image_id"] == img_id]
        ev.add_ground_truth(
            img_id,
            np.asarray([a["bbox"] for a in g]).reshape(-1, 4),
            [a["category_id"] for a in g],
            iscrowd=[a["iscrowd"] for a in g],
            areas=[a["area"] for a in g],
        )
        if d:
            ev.add_detections(
                img_id,
                np.asarray([a["bbox"] for a in d]).reshape(-1, 4),
                [a["score"] for a in d],
                [a["category_id"] for a in d],
            )
    return ev.evaluate()


@pytest.mark.parametrize("seed", range(40))
def test_fuzz_matches_pycocotools_oracle(seed):
    rng = np.random.default_rng(seed)
    num_classes = int(rng.integers(1, 5))
    gt_anns, dt_anns, img_ids = _random_scenario(rng, num_classes)
    ours = _run_ours(gt_anns, dt_anns, img_ids, num_classes)
    oracle = coco_eval_oracle(
        gt_anns, dt_anns, list(range(num_classes)), img_ids
    )
    for k in oracle:
        np.testing.assert_allclose(
            ours[k], oracle[k], rtol=1e-9, atol=1e-9, equal_nan=True,
            err_msg=f"seed={seed} metric={k}: ours={ours[k]} oracle={oracle[k]}",
        )


def test_crowd_matching_vs_oracle():
    """Directed case: crowd gt absorbs multiple detections without FPs."""
    gt = [
        {"image_id": 0, "category_id": 0, "bbox": [0, 0, 100, 100],
         "area": 10000.0, "iscrowd": 1},
        {"image_id": 0, "category_id": 0, "bbox": [200, 200, 50, 50],
         "area": 2500.0, "iscrowd": 0},
    ]
    dt = [
        {"image_id": 0, "category_id": 0, "bbox": [10, 10, 30, 30], "score": 0.9},
        {"image_id": 0, "category_id": 0, "bbox": [50, 50, 40, 40], "score": 0.8},
        {"image_id": 0, "category_id": 0, "bbox": [201, 201, 49, 49], "score": 0.7},
    ]
    ours = _run_ours(gt, dt, [0], 1)
    oracle = coco_eval_oracle(gt, dt, [0], [0])
    for k in oracle:
        np.testing.assert_allclose(ours[k], oracle[k], atol=1e-9, equal_nan=True)


def test_tied_scores_ordering_vs_oracle():
    """All scores identical: ordering is decided purely by stable-sort
    insertion order — the classic protocol trap."""
    rng = np.random.default_rng(123)
    gt, dt = [], []
    for img in range(4):
        for _ in range(3):
            w, h = float(rng.uniform(10, 80)), float(rng.uniform(10, 80))
            x, y = float(rng.uniform(0, 300)), float(rng.uniform(0, 300))
            gt.append({"image_id": img, "category_id": 0,
                       "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0})
            dt.append({"image_id": img, "category_id": 0,
                       "bbox": [x + 2, y - 1, w, h], "score": 0.5})
            dt.append({"image_id": img, "category_id": 0,
                       "bbox": [x + 30, y + 30, w, h], "score": 0.5})
    ours = _run_ours(gt, dt, list(range(4)), 1)
    oracle = coco_eval_oracle(gt, dt, [0], list(range(4)))
    for k in oracle:
        np.testing.assert_allclose(ours[k], oracle[k], atol=1e-9, equal_nan=True)
