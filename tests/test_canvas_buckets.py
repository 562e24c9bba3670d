"""Scale-bucketed train canvases + orientation-grouped eval loader
(recipe parity: the coco-standard configs' effective MIN_SIZE_TRAIN is
(400, 1200) "range" — the reference yaml's (800,) INPUT block is shadowed
by a duplicate INPUT key at the end of the file, last-key-wins)."""

import numpy as np

from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.data.augment import apply_weak_augment
from ubteacher_tpu.data.loader import TestDataLoader, TwoStreamDataLoader


def _cfg(extra=()):
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.TPU.CANVAS_LANDSCAPE = (64, 96)
    cfg.TPU.CANVAS_PORTRAIT = (96, 64)
    cfg.TPU.EXTRA_TRAIN_CANVASES = [list(c) for c in extra]
    cfg.TPU.MAX_GT = 4
    cfg.TPU.DATA_THREADS = 0
    cfg.SOLVER.IMG_PER_BATCH_LABEL = 2
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 2
    cfg.INPUT.MAX_SIZE_TRAIN = 200
    return cfg


def test_weak_augment_picks_smallest_fitting_canvas():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (50, 80, 3), dtype=np.uint8)
    canvases = [(64, 96), (128, 192)]
    # jitter to shortest edge 100 -> 100x160: needs the big canvas
    rec = apply_weak_augment(
        img, np.zeros((0, 4), np.float32), canvases, (100,), 200,
        "choice", rng, flip=False,
    )
    assert rec["canvas"] == (128, 192)
    assert rec["image"].shape == (128, 192, 3)
    np.testing.assert_allclose(rec["hw"], [100, 160])
    # jitter to 40 -> fits the small canvas
    rec = apply_weak_augment(
        img, np.zeros((0, 4), np.float32), canvases, (40,), 200,
        "choice", rng, flip=False,
    )
    assert rec["canvas"] == (64, 96)
    np.testing.assert_allclose(rec["hw"], [40, 64])
    # exceeds every bucket -> downscaled into the largest
    rec = apply_weak_augment(
        img, np.zeros((0, 4), np.float32), canvases, (190,), 400,
        "choice", rng, flip=False,
    )
    assert rec["canvas"] == (128, 192)
    assert rec["hw"][0] <= 128 and rec["hw"][1] <= 192


def test_two_stream_loader_scale_buckets():
    cfg = _cfg(extra=[(128, 192), (192, 128)])
    cfg.INPUT.MIN_SIZE_TRAIN = (40, 120)
    cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING = "range"

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
    dicts = [
        {"file_name": f"f{i}", "height": 60, "width": 90,
         "annotations": [
             {"bbox": [5, 5, 40, 30], "category_id": 0},
         ]}
        for i in range(8)
    ]
    dl = TwoStreamDataLoader(
        cfg, dicts, dicts, seed=0, image_loader=lambda name: img
    )
    it = iter(dl)
    shapes = set()
    for _ in range(12):
        b = next(it)
        shapes.add(b["images_label_k"].shape[1:3])
        # hw never exceeds its canvas
        assert (b["label_hw"][:, 0] <= b["images_label_k"].shape[1]).all()
        assert (b["label_hw"][:, 1] <= b["images_label_k"].shape[2]).all()
    # with range (40, 120) both landscape buckets must appear
    assert (64, 96) in shapes and (128, 192) in shapes


def test_eval_loader_groups_by_orientation():
    cfg = _cfg()
    cfg.TPU.TEST_CANVAS = (64, 96)
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 96

    imgs = {
        "l": np.zeros((50, 75, 3), np.uint8),   # landscape
        "p": np.zeros((75, 50, 3), np.uint8),   # portrait
    }
    dicts = []
    for i in range(3):
        dicts.append({"file_name": "l", "image_id": i,
                      "height": 50, "width": 75})
    for i in range(3, 5):
        dicts.append({"file_name": "p", "image_id": i,
                      "height": 75, "width": 50})
    dl = TestDataLoader(
        cfg, dicts, batch_size=2, image_loader=lambda name: imgs[name]
    )
    batches = list(dl)
    assert len(dl) == len(batches) == 3  # 2 landscape + 1 portrait batches
    seen = {}
    for b in batches:
        for i in range(b["num_valid"]):
            seen[b["image_ids"][i]] = (
                b["images"].shape[1:3], tuple(b["hw"][i])
            )
    # landscape images on the (64, 96) canvas at full shortest edge 48
    for i in range(3):
        assert seen[i][0] == (64, 96)
        assert seen[i][1] == (48.0, 72.0)
    # portrait images on the transposed canvas — NOT downscaled
    for i in range(3, 5):
        assert seen[i][0] == (96, 64)
        assert seen[i][1] == (72.0, 48.0)


def test_input_crop_weak_augment():
    """INPUT.CROP: D2 RandomCrop before resize (dataset_mapper.py:38-44) —
    boxes shift/clip to the crop, empties dropped."""
    from ubteacher_tpu.data.augment import random_crop_params

    rng = np.random.default_rng(3)
    # deterministic: "relative" crop of exactly half the image
    y0, x0, ch_, cw_ = random_crop_params(100, 200, "relative", (0.5, 0.5), rng)
    assert (ch_, cw_) == (50, 100)
    assert 0 <= y0 <= 50 and 0 <= x0 <= 100

    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.asarray(
        [[0, 0, 200, 100],      # full image: survives any crop
         [0, 0, 3, 3]],         # top-left corner: dropped unless crop hits it
        np.float32,
    )
    rng2 = np.random.default_rng(0)
    rec = apply_weak_augment(
        img, boxes, (128, 256), (50,), 256, "choice", rng2, flip=False,
        crop=("absolute", (50, 100)),
    )
    assert rec["keep"][0]
    # box 0 clipped to the crop then resized to shortest-edge 50
    assert rec["hw"][0] == 50 and rec["hw"][1] == 100
    b0 = rec["boxes"][0]
    np.testing.assert_allclose([b0[0], b0[1]], [0, 0], atol=1e-5)
    np.testing.assert_allclose([b0[2], b0[3]], [100, 50], atol=1e-5)


def test_loader_drops_cropped_out_boxes():
    cfg = _cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (48,)
    cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    cfg.INPUT.CROP.ENABLED = True
    cfg.INPUT.CROP.TYPE = "relative"
    cfg.INPUT.CROP.SIZE = [0.5, 0.5]

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
    dicts = [
        {"file_name": f"f{i}", "height": 60, "width": 90,
         "annotations": [
             {"bbox": [0, 0, 90, 60], "category_id": 0},   # always survives
             {"bbox": [0, 0, 2, 2], "category_id": 1},     # usually cropped out
         ]}
        for i in range(4)
    ]
    dl = TwoStreamDataLoader(
        cfg, dicts, dicts, seed=0, image_loader=lambda name: img
    )
    batch = next(iter(dl))
    # every image keeps >= 1 gt (the full-image box) and masks are coherent
    assert (batch["gt_label"].mask.sum(axis=1) >= 1).all()
    n = batch["gt_label"].mask.sum()
    # boxes lie within each image's true extent
    hw = batch["label_hw"]
    for b in range(len(hw)):
        m = batch["gt_label"].mask[b]
        bx = batch["gt_label"].boxes[b][m]
        assert (bx[:, 2] <= hw[b][1] + 1e-3).all()
        assert (bx[:, 3] <= hw[b][0] + 1e-3).all()
