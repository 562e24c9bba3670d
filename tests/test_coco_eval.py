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
