"""Multi-host data-pipeline dedup + sharded-eval row equivalence
(VERDICT r2 item 6).

The multi-host TwoStreamDataLoader replays the SAME sample-selection and
augmentation-geometry draws on every process from COCO metadata alone, but
decodes/augments pixels only for the global-batch rows the process owns
(reference analog: per-rank loader split, build.py:227-241). These tests
inject process_index/process_count directly, so the dedup math is verified
hermetically on one process; tests/test_multihost.py exercises the same
path under a real 2-process jax.distributed run.

The eval refactor (collect_detections -> gather -> evaluate_detection_rows)
must make metrics invariant to how the test set is sharded across
processes (InferenceSampler semantics, reference build.py:114).
"""

import numpy as np
import jax

from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.data.loader import (
    DECODE_STATS,
    TestDataLoader,
    TwoStreamDataLoader,
)


def _train_cfg():
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.TPU.CANVAS_LANDSCAPE = (64, 96)
    cfg.TPU.CANVAS_PORTRAIT = (96, 64)
    cfg.TPU.MAX_GT = 4
    cfg.TPU.DATA_THREADS = 0
    cfg.SOLVER.IMG_PER_BATCH_LABEL = 4
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 4
    cfg.INPUT.MIN_SIZE_TRAIN = (48,)
    cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    return cfg


def _make_dataset(n, seed=0):
    rng = np.random.default_rng(seed)
    images, dicts = {}, []
    for i in range(n):
        h, w = int(rng.integers(40, 70)), int(rng.integers(50, 90))
        name = f"img{i}"
        images[name] = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        dicts.append({
            "file_name": name, "image_id": i, "height": h, "width": w,
            "annotations": [
                {"bbox": [5.0, 5.0, w - 10.0, h - 10.0], "category_id": 0},
                {"bbox": [2.0, 2.0, 20.0, 15.0], "category_id": 0,
                 "iscrowd": int(i % 3 == 0)},
            ],
        })
    return images, dicts


def _collect(loader, n_batches):
    before = DECODE_STATS["train"]
    it = iter(loader)
    batches = [next(it) for _ in range(n_batches)]
    return batches, DECODE_STATS["train"] - before


def test_local_rows_concat_to_global_batch():
    """Two process-local loaders (pc=2) produce exactly the global loader's
    batches when their owned rows are concatenated — bit-identical pixels,
    hw, and gt — while each decodes only HALF the images."""
    cfg = _train_cfg()
    images, dicts = _make_dataset(8)
    # force one orientation so every batch lands in one canvas bucket
    for d in dicts:
        if d["height"] > d["width"]:
            d["height"], d["width"] = d["width"], d["height"]
            images[d["file_name"]] = np.ascontiguousarray(
                images[d["file_name"]].transpose(1, 0, 2)
            )
    loader = lambda name: images[name]

    def make(pc, pi):
        return TwoStreamDataLoader(
            cfg, dicts, dicts, seed=0, image_loader=loader,
            process_count=pc, process_index=pi,
        )

    n = 3
    gbatches, gdec = _collect(make(1, 0), n)
    b0, dec0 = _collect(make(2, 0), n)
    b1, dec1 = _collect(make(2, 1), n)

    # decode dedup: global decodes 8 rows/batch; each host only its 4
    assert gdec == n * 8
    assert dec0 == n * 4 and dec1 == n * 4

    for g, x, y in zip(gbatches, b0, b1):
        merged = jax.tree.map(
            lambda a, b: np.concatenate([np.asarray(a), np.asarray(b)]), x, y
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            g, merged,
        )


def test_batch_not_divisible_by_processes_raises():
    cfg = _train_cfg()
    cfg.SOLVER.IMG_PER_BATCH_LABEL = 3
    images, dicts = _make_dataset(4)
    try:
        TwoStreamDataLoader(
            cfg, dicts, dicts, seed=0, image_loader=lambda n: images[n],
            process_count=2, process_index=0,
        )
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_corrupt_owned_row_zeroes_image_and_gt():
    """Multi-host sample selection happens on metadata before decode, so a
    corrupt file cannot be re-drawn without desyncing the shared rng
    streams — the owner feeds a zero image/gt row instead."""
    cfg = _train_cfg()
    images, dicts = _make_dataset(8)
    for d in dicts:  # single orientation
        if d["height"] > d["width"]:
            d["height"], d["width"] = d["width"], d["height"]
            images[d["file_name"]] = np.ascontiguousarray(
                images[d["file_name"]].transpose(1, 0, 2)
            )
    bad = dicts[0]["file_name"]

    def loader(name):
        if name == bad:
            raise IOError("corrupt")
        return images[name]

    dl = TwoStreamDataLoader(
        cfg, dicts, dicts, seed=0, image_loader=loader,
        process_count=2, process_index=0,
    )
    corrupt_before = DECODE_STATS["corrupt"]
    it = iter(dl)
    n_zero_label = 0
    for _ in range(6):  # enough batches that the bad file hits owned rows
        batch = next(it)
        # the stream itself keeps running (no exception, full batch shape)
        assert batch["images_label_k"].shape[0] == 2  # owned half of 4
        # any zeroed labeled row must have fully masked gt
        flat = batch["images_label_k"].reshape(
            batch["images_label_k"].shape[0], -1
        )
        zero_rows = np.flatnonzero((flat == 0).all(axis=1))
        for r in zero_rows:
            assert not batch["gt_label"].mask[r].any()
        n_zero_label += len(zero_rows)
    # every zero-row substitution is counted (surfaced per-iteration as
    # the corrupt_rows_total metric — VERDICT r3 weak #6). The counter
    # covers both streams, so it is >= the labeled-stream zero rows.
    n_corrupt = DECODE_STATS["corrupt"] - corrupt_before
    assert n_zero_label >= 1
    assert n_corrupt >= n_zero_label


def test_corrupt_single_host_redraw_bumps_counter():
    """Single-host corrupt files are re-drawn (reference 3-retry,
    data/common.py:22-43) AND counted in DECODE_STATS['corrupt'], so the
    corrupt_rows_total metric observes both replacement policies."""
    cfg = _train_cfg()
    images, dicts = _make_dataset(8)
    bad = dicts[0]["file_name"]

    def loader(name):
        if name == bad:
            raise IOError("corrupt")
        return images[name]

    dl = TwoStreamDataLoader(cfg, dicts, dicts, seed=0, image_loader=loader)
    before = DECODE_STATS["corrupt"]
    it = iter(dl)
    # draw enough batches that the bad sample is hit at least once
    for _ in range(4):
        batch = next(it)
        # re-draw policy: no zeroed rows ever reach the batch
        flat = batch["images_label_k"].reshape(
            batch["images_label_k"].shape[0], -1
        )
        assert not (flat == 0).all(axis=1).any()
    assert DECODE_STATS["corrupt"] > before


def test_eval_rows_shard_invariant():
    """collect_detections on two dataset shards + evaluate_detection_rows
    over the concatenated rows == inference_on_dataset over the full set
    (what the multi-host allgather path computes)."""
    from ubteacher_tpu.evaluation.evaluator import (
        collect_detections,
        evaluate_detection_rows,
        inference_on_dataset,
        make_fcos_inference_fn,
    )
    from ubteacher_tpu.modeling.fcos_head import build_one_stage_detector

    import os

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(os.path.join(
        os.path.dirname(__file__), "..", "configs", "FCOS", "coco-standard",
        "fcos_R_50_ut2_sup1_run0.yaml",
    ))
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.FCOS.NUM_CLASSES = 3
    cfg.MODEL.FCOS.INFERENCE_TH_TEST = 0.0  # random init: let dets through
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.NMS_CANDIDATES = 64
    cfg.TPU.TEST_CANVAS = (64, 96)
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 96

    rng = np.random.default_rng(1)
    images, dicts = _make_dataset(6, seed=1)
    for d in dicts:  # landscape only: a single compiled canvas
        if d["height"] > d["width"]:
            d["height"], d["width"] = d["width"], d["height"]
            images[d["file_name"]] = np.ascontiguousarray(
                images[d["file_name"]].transpose(1, 0, 2)
            )
    for d in dicts:  # categories within NUM_CLASSES
        for o in d["annotations"]:
            o["category_id"] = int(rng.integers(0, 3))
    loader = lambda name: images[name]

    model = build_one_stage_detector(cfg)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 96, 3), np.float32)
    )["params"]
    infer = make_fcos_inference_fn(cfg, model)

    full = inference_on_dataset(
        cfg, params, model,
        TestDataLoader(cfg, dicts, batch_size=2, image_loader=loader),
        dicts, num_classes=3, infer_fn=infer,
    )
    full.pop("inference_sec_per_image", None)

    by_id = {d["image_id"]: d for d in dicts}
    rows = []
    for shard in (dicts[:3], dicts[3:]):
        det, _, _, _ = collect_detections(
            cfg, params,
            TestDataLoader(cfg, shard, batch_size=2, image_loader=loader),
            by_id, infer,
        )
        rows.append(det)
    assert sum(len(r) for r in rows) > 0
    sharded = evaluate_detection_rows(
        np.concatenate(rows), dicts, num_classes=3
    )
    assert set(full) == set(sharded)
    for k in full:
        np.testing.assert_allclose(sharded[k], full[k], rtol=0, atol=0,
                                   err_msg=k)


def test_allgather_host_rows_single_process_noop():
    from ubteacher_tpu.parallel import allgather_host_rows

    r = np.arange(12, dtype=np.float64).reshape(3, 4)
    np.testing.assert_array_equal(allgather_host_rows(r), r)
    empty = np.zeros((0, 7))
    assert allgather_host_rows(empty).shape == (0, 7)
