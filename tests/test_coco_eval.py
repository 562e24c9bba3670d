import numpy as np

from ubteacher_tpu.evaluation.coco_eval import COCOBboxEvaluator


def _add_img(ev, img_id, rng, n=4, detect="perfect"):
    boxes = []
    for _ in range(n):
        x, y = rng.uniform(0, 150, 2)
        w, h = rng.uniform(20, 60, 2)
        boxes.append([x, y, w, h])
    boxes = np.asarray(boxes)
    classes = rng.integers(0, 3, n)
    ev.add_ground_truth(img_id, boxes, classes)
    if detect == "perfect":
        ev.add_detections(img_id, boxes, np.linspace(0.9, 0.5, n), classes)
    elif detect == "half":
        k = n // 2
        ev.add_detections(img_id, boxes[:k], np.linspace(0.9, 0.5, k), classes[:k])
    elif detect == "shifted":
        shifted = boxes.copy()
        shifted[:, 0] += boxes[:, 2] * 0.25  # IoU = 0.75/1.25 = 0.6
        ev.add_detections(img_id, shifted, np.linspace(0.9, 0.5, n), classes)
    return boxes, classes


def test_perfect_detections_ap100():
    rng = np.random.default_rng(0)
    ev = COCOBboxEvaluator(3)
    for i in range(4):
        _add_img(ev, i, rng, detect="perfect")
    res = ev.evaluate()
    assert abs(res["AP"] - 100.0) < 1e-6, res
    assert abs(res["AP50"] - 100.0) < 1e-6
    assert abs(res["AR100"] - 100.0) < 1e-6


def test_half_detections_lower_ap():
    rng = np.random.default_rng(1)
    ev = COCOBboxEvaluator(3)
    for i in range(4):
        _add_img(ev, i, rng, detect="half")
    res = ev.evaluate()
    assert 20.0 < res["AP"] < 80.0, res


def test_shifted_boxes_pass_only_low_iou():
    rng = np.random.default_rng(2)
    ev = COCOBboxEvaluator(3)
    for i in range(4):
        _add_img(ev, i, rng, detect="shifted")
    res = ev.evaluate()
    # matches at IoU 0.5-ish but not 0.75
    assert res["AP50"] > 50.0
    assert res["AP75"] < 10.0


def test_false_positives_reduce_precision():
    rng = np.random.default_rng(3)
    ev = COCOBboxEvaluator(3)
    for i in range(4):
        boxes, classes = _add_img(ev, i, rng, detect="perfect")
        # add confident junk detections far away
        junk = np.asarray([[400.0, 400.0, 30.0, 30.0]])
        ev.add_detections(i, junk, [0.95], [int(classes[0])])
    res = ev.evaluate()
    assert res["AP"] < 95.0
    assert res["AP"] > 30.0


def test_crowd_gt_is_ignored():
    ev = COCOBboxEvaluator(1)
    gt = np.asarray([[10.0, 10.0, 50.0, 50.0], [100.0, 100.0, 40.0, 40.0]])
    ev.add_ground_truth(0, gt, [0, 0], iscrowd=[0, 1])
    # only detect the non-crowd box; detection on the crowd is neither TP nor FP
    ev.add_detections(
        0, np.asarray([[10.0, 10.0, 50.0, 50.0], [100.0, 100.0, 40.0, 40.0]]),
        [0.9, 0.8], [0, 0],
    )
    res = ev.evaluate()
    assert abs(res["AP"] - 100.0) < 1e-6, res


def test_hand_computed_exact_ap_values():
    """Golden values derived BY HAND from the published COCO protocol —
    independent of both this evaluator and tests/coco_oracle.py (which is
    a transcription of pycocotools and could in principle share a
    misreading with the evaluator; a human-computed anchor cannot).

    Setup: 1 category, 1 image, 2 gt (both 100x100 = area 10000 > 96^2,
    i.e. "large"), 3 detections sorted by score:
      A (0.9) = gt1 exactly            -> IoU 1.0
      B (0.8) far from everything      -> FP at every threshold
      C (0.7) = gt2 shifted +28px in x -> IoU 72/128 = 0.5625 exactly

    Per IoU threshold t (COCO: 0.50:0.05:0.95):
      t in {0.50, 0.55}: matches A, C. Cumulative (precision, recall)
        after each det: (1, 1/2), (1/2, 1/2), (2/3, 1).
        Right-to-left monotone precision: (1, 2/3, 2/3).
        101-pt interpolation (searchsorted of recThrs 0.00:0.01:1.00 into
        recall [.5, .5, 1], side='left'): 51 points (r <= 0.50) read
        precision 1; 50 points (0.51..1.00) read 2/3.
        AP_t = (51 + 100/3) / 101.
      t in {0.60..0.95} (8 thresholds): only A matches; recall never
        exceeds 1/2, so 51 points read precision 1 and 50 read 0
        (recall beyond max recall -> precision 0). AP_t = 51 / 101.

    AP   = (2*(51 + 100/3) + 8*51) / (10*101) = 173/303    = 57.0957...%
    AP50 = (51 + 100/3) / 101                 = 253/303    = 83.4983...%
    AP75 = 51/101                                          = 50.4950...%
    AR100 = mean recall = (2*1 + 8*0.5)/10                 = 60%
    AR1  (maxDets=1: only A counts)                        = 50%
    All gt and dets are "large", so APl == AP and APs/APm are NaN (no gt
    in range; pycocotools summarize() returns -1 there but D2's
    _derive_coco_results maps it to NaN — this evaluator follows D2).
    """
    ev = COCOBboxEvaluator(1)
    ev.add_ground_truth(
        0,
        np.asarray([[0.0, 0.0, 100.0, 100.0], [300.0, 0.0, 100.0, 100.0]]),
        [0, 0],
    )
    ev.add_detections(
        0,
        np.asarray(
            [
                [0.0, 0.0, 100.0, 100.0],      # A: exact match of gt1
                [600.0, 600.0, 100.0, 100.0],  # B: false positive
                [328.0, 0.0, 100.0, 100.0],    # C: IoU 0.5625 with gt2
            ]
        ),
        [0.9, 0.8, 0.7],
        [0, 0, 0],
    )
    res = ev.evaluate()
    assert abs(res["AP"] - 100.0 * 173.0 / 303.0) < 1e-9, res
    assert abs(res["AP50"] - 100.0 * 253.0 / 303.0) < 1e-9, res
    assert abs(res["AP75"] - 100.0 * 51.0 / 101.0) < 1e-9, res
    assert abs(res["AR100"] - 60.0) < 1e-9, res
    assert abs(res["AR1"] - 50.0) < 1e-9, res
    assert abs(res["APl"] - res["AP"]) < 1e-9, res
    assert np.isnan(res["APs"]) and np.isnan(res["APm"]), res
