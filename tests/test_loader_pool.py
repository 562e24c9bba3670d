"""Pooled decode/materialize path of TwoStreamDataLoader (VERDICT r3
next #3): TPU.DATA_THREADS now materializes pixels on a thread pool while
the geometry/sample draws stay sequential — batches must be bit-identical
to the synchronous path, and the corrupt-replacement policy must survive
pooling. Throughput itself is measured by tools/bench_loader.py."""

import jax
import numpy as np

from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.data.loader import DECODE_STATS, TwoStreamDataLoader


def _cfg(threads):
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.TPU.CANVAS_LANDSCAPE = (64, 96)
    cfg.TPU.CANVAS_PORTRAIT = (96, 64)
    cfg.TPU.MAX_GT = 4
    cfg.TPU.DATA_THREADS = threads
    cfg.SOLVER.IMG_PER_BATCH_LABEL = 4
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = 4
    cfg.INPUT.MIN_SIZE_TRAIN = (48,)
    cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    cfg.INPUT.MAX_SIZE_TRAIN = 96
    return cfg


def _dataset(n, seed=3):
    rng = np.random.default_rng(seed)
    images, dicts = {}, []
    for i in range(n):
        h, w = int(rng.integers(40, 70)), int(rng.integers(50, 90))
        h, w = min(h, w), max(h, w)  # one orientation: a single bucket
        name = f"img{i}"
        images[name] = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        dicts.append({
            "file_name": name, "image_id": i, "height": h, "width": w,
            "annotations": [
                {"bbox": [5.0, 5.0, w - 10.0, h - 10.0], "category_id": 0},
            ],
        })
    return images, dicts


def _batches(loader, n):
    it = iter(loader)
    out = [next(it) for _ in range(n)]
    # drain the prefetch thread before the generator is GC'd mid-queue-put
    it.close() if hasattr(it, "close") else None
    return out


def test_pooled_batches_bit_identical_to_synchronous():
    """The sliding-window pool preserves sample order, so threads>0 yields
    exactly the synchronous stream's batches."""
    images, dicts = _dataset(10)
    loader = lambda name: images[name]
    sync = TwoStreamDataLoader(
        _cfg(0), dicts, dicts, seed=0, image_loader=loader,
        process_count=1, process_index=0,
    )
    pooled = TwoStreamDataLoader(
        _cfg(4), dicts, dicts, seed=0, image_loader=loader,
        process_count=1, process_index=0,
    )
    for a, b in zip(_batches(sync, 4), _batches(pooled, 4)):
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)
            ),
            a, b,
        )


def test_pooled_corrupt_redraw_policy():
    """Single-host corrupt files under the pooled path: the failed sample
    is dropped, the NEXT drawn sample replaces it (reference 3-retry
    semantics), the counter bumps, and no zero row ever reaches a batch."""
    images, dicts = _dataset(8)
    bad = dicts[0]["file_name"]

    def loader(name):
        if name == bad:
            raise IOError("corrupt")
        return images[name]

    dl = TwoStreamDataLoader(
        _cfg(4), dicts, dicts, seed=0, image_loader=loader,
        process_count=1, process_index=0,
    )
    before = DECODE_STATS["corrupt"]
    for batch in _batches(dl, 4):
        flat = batch["images_label_k"].reshape(
            batch["images_label_k"].shape[0], -1
        )
        assert not (flat == 0).all(axis=1).any()
    assert DECODE_STATS["corrupt"] > before


def test_pooled_all_corrupt_raises():
    images, dicts = _dataset(8)

    def loader(name):
        raise IOError("corrupt")

    dl = TwoStreamDataLoader(
        _cfg(2), dicts, dicts, seed=0, image_loader=loader,
        process_count=1, process_index=0,
    )
    it = iter(dl)
    try:
        next(it)
    except RuntimeError as e:
        assert "corrupt" in str(e)
    else:
        raise AssertionError("expected RuntimeError")


def test_multihost_pooled_matches_synchronous():
    """Owned-row materialization through the pool (pc=2) is bit-identical
    to the synchronous multi-host path."""
    images, dicts = _dataset(8)
    loader = lambda name: images[name]

    def make(threads, pi):
        return TwoStreamDataLoader(
            _cfg(threads), dicts, dicts, seed=0, image_loader=loader,
            process_count=2, process_index=pi,
        )

    for pi in (0, 1):
        for a, b in zip(_batches(make(0, pi), 3), _batches(make(4, pi), 3)):
            jax.tree.map(
                lambda x, y: np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y)
                ),
                a, b,
            )
