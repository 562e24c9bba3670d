import numpy as np

from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.engine.trainer import auto_scale_workers, verify_results


def test_auto_scale_workers():
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 8
    cfg.SOLVER.IMG_PER_BATCH_LABEL = 32
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 32
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.MAX_ITER = 180000
    cfg.SOLVER.STEPS = (179990,)
    cfg.freeze()
    out = auto_scale_workers(cfg, 4)
    assert out.SOLVER.IMG_PER_BATCH_LABEL == 16
    assert abs(out.SOLVER.BASE_LR - 0.005) < 1e-9
    assert out.SOLVER.MAX_ITER == 360000
    assert out.SOLVER.REFERENCE_WORLD_SIZE == 4
    # original untouched; no-op when REFERENCE_WORLD_SIZE == 0
    assert cfg.SOLVER.IMG_PER_BATCH_LABEL == 32
    cfg2 = get_cfg()
    add_ubteacher_config(cfg2)
    assert auto_scale_workers(cfg2, 4) is cfg2


def test_verify_results():
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.TEST.EXPECTED_RESULTS = [["AP", 30.0, 1.0]]
    assert verify_results(cfg, {"AP": 30.5})
    assert not verify_results(cfg, {"AP": 28.0})
    assert not verify_results(cfg, {})


def test_loader_corrupt_sample_retry():
    from ubteacher_tpu.data.loader import TwoStreamDataLoader

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.TPU.CANVAS_LANDSCAPE = (64, 64)
    cfg.TPU.CANVAS_PORTRAIT = (64, 64)
    cfg.TPU.MAX_GT = 4
    cfg.TPU.DATA_THREADS = 0
    cfg.INPUT.MIN_SIZE_TRAIN = (48,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.SOLVER.IMG_PER_BATCH_LABEL = 2
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 2

    rng = np.random.default_rng(0)
    good = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)

    def loader_fn(name):
        if "bad" in name:
            raise FileNotFoundError(name)
        return good

    dicts = [
        {"file_name": f, "height": 48, "width": 48, "image_id": i,
         "annotations": [{"bbox": [4, 4, 20, 20], "category_id": 0}]}
        for i, f in enumerate(["a.png", "bad1.png", "b.png", "c.png", "d.png"])
    ]
    dl = TwoStreamDataLoader(cfg, dicts, dicts, seed=0, image_loader=loader_fn)
    batch = next(iter(dl))
    assert batch["images_label_k"].shape == (2, 64, 64, 3)


def test_loader_drops_crowd_annotations():
    """iscrowd != 0 objects must never become training gt (reference drops
    them in the mapper, dataset_mapper.py:129) — but stay in dataset_dicts
    so eval still sees them."""
    from ubteacher_tpu.data.loader import TwoStreamDataLoader

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.TPU.CANVAS_LANDSCAPE = (64, 64)
    cfg.TPU.CANVAS_PORTRAIT = (64, 64)
    cfg.TPU.MAX_GT = 4
    cfg.TPU.DATA_THREADS = 0
    cfg.INPUT.MIN_SIZE_TRAIN = (48,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.SOLVER.IMG_PER_BATCH_LABEL = 2
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 2

    img = np.random.default_rng(0).integers(0, 255, (48, 48, 3), dtype=np.uint8)
    dicts = [
        {"file_name": "x.png", "height": 48, "width": 48, "image_id": i,
         "annotations": [
             {"bbox": [4, 4, 20, 20], "category_id": 3, "iscrowd": 0},
             {"bbox": [0, 0, 47, 47], "category_id": 7, "iscrowd": 1},
         ]}
        for i in range(4)
    ]
    dl = TwoStreamDataLoader(cfg, dicts, dicts, seed=0,
                             image_loader=lambda _: img)
    batch = next(iter(dl))
    gt = batch["gt_label"]
    # exactly one gt per image: the non-crowd box with its class
    assert gt.mask.sum(axis=1).tolist() == [1, 1]
    assert all(gt.classes[i, 0] == 3 for i in range(2))

    # an image whose annotations are ALL crowd counts as empty for
    # FILTER_EMPTY_ANNOTATIONS (D2 filter_images_with_only_crowd_annotations)
    only_crowd = [
        {"file_name": "x.png", "height": 48, "width": 48, "image_id": 9,
         "annotations": [{"bbox": [0, 0, 47, 47], "category_id": 7,
                          "iscrowd": 1}]}
    ]
    assert cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS
    dl2 = TwoStreamDataLoader(cfg, dicts + only_crowd, dicts, seed=0,
                              image_loader=lambda _: img)
    assert len(dl2.label_dicts) == 4


def test_setup_logger_adds_file_handler_on_later_call(tmp_path):
    """A process that initialized the logger earlier (another trainer run,
    an unrelated import) must still get a log.txt FileHandler for a NEW
    output dir — regression: an `if lg.handlers: return` guard skipped
    file logging for every run after the first, so full-suite CLI runs
    produced no out/log.txt (reference analog: d2 setup_logger is cached
    PER output location, not globally)."""
    import logging

    from ubteacher_tpu.utils.events import setup_logger

    lg = logging.getLogger("ubteacher_tpu")
    old = list(lg.handlers)
    try:
        lg.handlers.clear()
        setup_logger()  # console-only init, as an earlier run would do
        d1 = tmp_path / "run1"
        setup_logger(str(d1))
        lg.info("hello run1")
        assert (d1 / "log.txt").exists()
        assert "hello run1" in (d1 / "log.txt").read_text()
        # idempotent: same dir again adds no duplicate handlers
        n = len(lg.handlers)
        setup_logger(str(d1))
        assert len(lg.handlers) == n
        # exactly one console StreamHandler survives repeated calls
        assert sum(type(h) is logging.StreamHandler for h in lg.handlers) == 1
    finally:
        for h in lg.handlers:
            if h not in old:
                h.close()
        lg.handlers[:] = old
