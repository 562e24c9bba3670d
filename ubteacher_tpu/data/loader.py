"""Two-stream (labeled + unlabeled) train loader and test loader.

Host-side equivalent of build_detection_semisup_train_loader_two_crops +
AspectRatioGroupedSemiSupDatasetTwoCrop (reference: ubteacher/data/build.py:
144-272, data/common.py:93-167), redesigned for fixed shapes:

  * only the WEAK view is produced on host (geometry: resize jitter + flip +
    pad-to-canvas); the strong view is generated on device inside the train
    step (see data/augment.py), so each step ships 2 image tensors
    host->device instead of the reference's 4;
  * aspect-ratio grouping (w > h vs w <= h) selects one of two fixed
    canvases per stream per batch — every batch is statically shaped;
  * ground truth is padded to (B, MAX_GT) PaddedInstances arrays;
  * batches are assembled by a thread pool and prefetched into a queue.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..structures import PaddedInstances
from .augment import materialize_weak_augment, weak_augment_geometry

# image decodes per stream, for tests/diagnostics of the multi-host
# decode-deduplication path (each process decodes only the rows it owns).
# "corrupt" counts rows that failed to decode and were replaced (multi-host:
# zero image/gt row; single-host: re-drawn sample) — surfaced per-iteration
# as the corrupt_rows_total metric so silent data rot is observable on long
# runs (the reference re-draws silently, data/common.py:22-43).
DECODE_STATS = {"train": 0, "test": 0, "corrupt": 0}
_STATS_LOCK = threading.Lock()

# TPU.ORACLE_PSEUDO: boundary-uncertainty logit attached to oracle (ground
# truth fed as pseudo labels) boxes. Teacher loc-confidence in the tsbetter
# gates is 1 - sigmoid(std) (fast_rcnn.py box_reg_pseudo_loss_tsbetter,
# fcos_outputs.py ts_locvar_better): -6.0 -> confidence 0.9975, above any
# shipped T_CERT/TS_BETTER_CERT, so the oracle set passes the gate wherever
# the student is less certain — the intended positive-control behavior.
ORACLE_BOX_STD = -6.0


def _bump(key: str, n: int = 1) -> None:
    """Thread-safe DECODE_STATS increment: decodes run on a pool."""
    with _STATS_LOCK:
        DECODE_STATS[key] += n


def _pad_gt(objs: List[Dict], max_gt: int) -> Dict[str, np.ndarray]:
    boxes = np.zeros((max_gt, 4), np.float32)
    classes = np.zeros((max_gt,), np.int32)
    mask = np.zeros((max_gt,), bool)
    n = min(len(objs), max_gt)
    for i in range(n):
        boxes[i] = objs[i]["bbox"]
        classes[i] = objs[i]["category_id"]
        mask[i] = True
    return {"boxes": boxes, "classes": classes, "mask": mask}


class _InfiniteSampler:
    """Infinite shuffled index stream (reference: D2 TrainingSampler)."""

    def __init__(self, n: int, seed: int):
        self._n = n
        self._rng = np.random.default_rng(seed)
        self._perm: List[int] = []

    def __next__(self) -> int:
        if not self._perm:
            self._perm = list(self._rng.permutation(self._n))
        return self._perm.pop()


class TwoStreamDataLoader:
    """Yields statically-shaped semi-supervised batches.

    Batch dict:
      images_label_k   (B, H, W, 3) float32 BGR weak view
      gt_label         PaddedInstances (B, MAX_GT, ...)
      label_hw         (B, 2) true (h, w) in canvas
      images_unlabel_k (Bu, Hu, Wu, 3)
      unlabel_hw       (Bu, 2)
    """

    def __init__(
        self,
        cfg,
        label_dicts: List[Dict],
        unlabel_dicts: List[Dict],
        seed: int = 0,
        image_loader=None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.cfg = cfg
        # Multi-host: every process replays the SAME sample selection and
        # augmentation-geometry draw sequence (metadata-only, no image IO),
        # but decodes/augments pixels ONLY for the global batch rows its
        # devices own (the reference's analog is the per-rank loader split,
        # build.py:227-241 — each rank maps only its own samples).
        if process_count is None:
            import jax

            process_count = jax.process_count()
            process_index = jax.process_index()
        self.process_count = process_count
        self.process_index = process_index or 0
        self.local_rows = process_count > 1
        if self.local_rows:
            for b in (cfg.SOLVER.IMG_PER_BATCH_LABEL,
                      cfg.SOLVER.IMG_PER_BATCH_UNLABEL):
                if b % process_count:
                    raise ValueError(
                        f"batch size {b} not divisible by "
                        f"process_count {process_count}"
                    )
        # D2 filter_images_with_only_crowd_annotations semantics: an image
        # counts as empty unless it has at least one NON-crowd annotation
        self.label_dicts = [
            d for d in label_dicts
            if not cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS
            or any(o.get("iscrowd", 0) == 0 for o in d["annotations"])
        ]
        self.unlabel_dicts = unlabel_dicts
        self.batch_label = cfg.SOLVER.IMG_PER_BATCH_LABEL
        self.batch_unlabel = cfg.SOLVER.IMG_PER_BATCH_UNLABEL
        self.max_gt = cfg.TPU.MAX_GT
        # per-orientation canvas candidates (scale buckets): the base canvas
        # plus any TPU.EXTRA_TRAIN_CANVASES of matching orientation. Batches
        # are bucketed per chosen canvas, so the full MIN_SIZE_TRAIN jitter
        # range trains at native scale (one XLA program per canvas) instead
        # of clipping at the base canvas.
        self.canvases = {
            "landscape": [tuple(cfg.TPU.CANVAS_LANDSCAPE)],
            "portrait": [tuple(cfg.TPU.CANVAS_PORTRAIT)],
        }
        for c in cfg.TPU.EXTRA_TRAIN_CANVASES:
            h, w = int(c[0]), int(c[1])
            self.canvases["landscape" if w >= h else "portrait"].append((h, w))
        self.min_size = cfg.INPUT.MIN_SIZE_TRAIN
        self.max_size = cfg.INPUT.MAX_SIZE_TRAIN
        self.sampling = cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING
        # INPUT.CROP weak augmentation (reference: dataset_mapper.py:38-44)
        self.crop = (
            (cfg.INPUT.CROP.TYPE, tuple(cfg.INPUT.CROP.SIZE))
            if cfg.INPUT.CROP.ENABLED else None
        )
        self.seed = seed
        self.num_threads = cfg.TPU.DATA_THREADS
        self.oracle = cfg.TPU.ORACLE_PSEUDO
        self._image_loader = image_loader or self._default_loader

    @staticmethod
    def _default_loader(file_name: str) -> np.ndarray:
        import cv2

        img = cv2.imread(file_name, cv2.IMREAD_COLOR)  # BGR
        if img is None:
            raise FileNotFoundError(file_name)
        return img

    def _orientation(self, d: Dict) -> str:
        return "landscape" if d["width"] >= d["height"] else "portrait"

    def _prepare_geom(self, d: Dict, rng: np.random.Generator) -> Dict:
        """Sample geometry: the rng draw sequence and box/gt math from COCO
        metadata dims alone — no image IO. Pixels are materialized later
        (single-host: a thread pool right after the stream, so cv2 decode
        parallelizes; multi-host: only owned rows, in `_assemble_local`).
        Crowd annotations are never training targets (reference drops
        iscrowd != 0 before building instances, dataset_mapper.py:129);
        eval still sees them — the evaluator reads dataset_dicts directly.
        Trusts the dicts' width/height like the reference (aspect grouping
        at build.py:161; d2's check_image_size makes mismatch an error)."""
        h, w = int(d["height"]), int(d["width"])
        orient = "landscape" if w >= h else "portrait"
        annos = [o for o in d["annotations"] if o.get("iscrowd", 0) == 0]
        boxes = np.asarray(
            [o["bbox"] for o in annos], np.float32
        ).reshape(-1, 4)
        geom = weak_augment_geometry(
            h, w, boxes, self.canvases[orient], self.min_size, self.max_size,
            self.sampling, rng, crop=self.crop,
        )
        objs = [
            {"bbox": geom["boxes"][i], "category_id": o["category_id"]}
            for i, o in enumerate(annos)
            if geom["keep"][i]
        ]
        return {
            "dict": d,
            "geom": geom,
            "hw": geom["hw"],
            "gt": _pad_gt(objs, self.max_gt),
            "bucket": geom["canvas"],
        }

    def _stream(self, dicts: List[Dict], seed: int) -> Iterator[Dict]:
        """Infinite geometry-stub stream (no image IO; decode happens in
        the materialize phase). Bad-metadata fallback: retry with the next
        index (reference: MapDatasetTwoCrop 3-retry, data/common.py:22-43);
        failures here are metadata errors, identical on every process, so
        the retry draw stays aligned across hosts."""
        sampler = _InfiniteSampler(len(dicts), seed)
        rng = np.random.default_rng(seed + 12345)
        warned = 0
        while True:
            for _ in range(3):
                d = dicts[next(sampler)]
                try:
                    yield self._prepare_geom(d, rng)
                    break
                except Exception:
                    _bump("corrupt")
                    if warned < 5:
                        import logging

                        logging.getLogger("ubteacher_tpu").warning(
                            "failed to load %s; retrying with another sample",
                            d.get("file_name", "?"),
                        )
                        warned += 1
            else:
                raise RuntimeError("3 consecutive corrupt samples")

    def _batched_stream(
        self, items: Iterator[Dict], batch_size: int
    ) -> Iterator[List[Dict]]:
        """Aspect-ratio- and scale-bucketed batching: one bucket per chosen
        canvas (reference groups by aspect only, common.py:93-167 — its
        batch-max padding handles scale; fixed shapes need a bucket per
        canvas)."""
        buckets: Dict[tuple, List[Dict]] = {}
        for item in items:
            b = buckets.setdefault(item["bucket"], [])
            b.append(item)
            if len(b) == batch_size:
                yield b[:]
                b.clear()

    def _owned(self, n: int) -> Tuple[int, int]:
        """Global batch rows this process ships: shard_local_batch (and
        shard_batch's slicing twin) lay processes out in order, so host p
        owns rows [p*n/P, (p+1)*n/P)."""
        chunk = n // self.process_count
        return self.process_index * chunk, (self.process_index + 1) * chunk

    @property
    def _pool(self) -> ThreadPoolExecutor:
        """Shared decode/augment pool (cv2 releases the GIL for both
        imdecode and resize, so threads scale). Lazy: the loader object
        stays cheap to construct and the pool is reused across __iter__."""
        if getattr(self, "_pool_obj", None) is None:
            self._pool_obj = ThreadPoolExecutor(
                max_workers=max(1, self.num_threads),
                thread_name_prefix="ubt-decode",
            )
        return self._pool_obj

    def _materialize_strict(self, item: Dict) -> Dict:
        """Decode + pixel-augment a geometry stub; raises on a corrupt
        file (callers choose the replacement policy)."""
        img = self._image_loader(item["dict"]["file_name"])
        _bump("train")
        return dict(item, image=materialize_weak_augment(img, item["geom"]))

    def _materialize(self, item: Dict) -> Dict:
        """Multi-host materialize: a corrupt file zeroes the image AND its
        gt row — sample selection already happened on metadata alone on
        every host, so the owner cannot re-draw without desyncing the
        shared rng streams."""
        try:
            return self._materialize_strict(item)
        except Exception:
            _bump("corrupt")
            import logging

            logging.getLogger("ubteacher_tpu").warning(
                "failed to load %s; feeding a zero image/gt row",
                item["dict"].get("file_name", "?"),
            )
            ch, cw = item["bucket"]
            # uint8 to match the standard decode path's canvas dtype —
            # a float32 zero row would upcast the whole stacked batch
            # and change the jitted step's input signature
            image = np.zeros((ch, cw, 3), np.uint8)
            item = dict(
                item, gt={k: np.zeros_like(v) for k, v in item["gt"].items()}
            )
            return dict(item, image=image)

    def _materialized_stream(
        self, dicts: List[Dict], seed: int
    ) -> Iterator[Dict]:
        """Single-host item stream: sequential geometry draws, pooled pixel
        materialization (a sliding window of in-flight decodes keeps
        TPU.DATA_THREADS cv2 workers busy while preserving sample order).
        A corrupt file is dropped and the NEXT drawn sample takes its place
        — the reference's retry-with-another-index policy (data/common.py:
        22-43), with the same 3-consecutive-failure limit."""
        stubs = self._stream(dicts, seed)
        warned = 0

        def corrupt(consecutive: int) -> int:
            nonlocal warned
            _bump("corrupt")
            if warned < 5:
                import logging

                logging.getLogger("ubteacher_tpu").warning(
                    "failed to decode a sample; replacing with the next "
                    "drawn sample",
                )
                warned += 1
            if consecutive + 1 >= 3:
                raise RuntimeError("3 consecutive corrupt samples")
            return consecutive + 1

        if self.num_threads <= 0:  # synchronous: exact decode accounting
            consecutive = 0
            for stub in stubs:
                try:
                    yield self._materialize_strict(stub)
                    consecutive = 0
                except Exception:
                    consecutive = corrupt(consecutive)
            return
        window = max(2 * self.num_threads, 8)
        futs: collections.deque = collections.deque()
        consecutive = 0
        while True:
            while len(futs) < window:
                futs.append(self._pool.submit(
                    self._materialize_strict, next(stubs)
                ))
            try:
                yield futs.popleft().result()
                consecutive = 0
            except Exception:
                consecutive = corrupt(consecutive)

    def _assemble_local(
        self, label_items: List[Dict], unlabel_items: List[Dict]
    ) -> Dict:
        """Multi-host assembly: materialize and stack ONLY the owned rows
        of each stream; pair with parallel.shard_local_batch, which builds
        the global array from per-process local rows."""
        l0, l1 = self._owned(len(label_items))
        u0, u1 = self._owned(len(unlabel_items))
        owned = label_items[l0:l1] + unlabel_items[u0:u1]
        if self.num_threads > 0:
            done = list(self._pool.map(self._materialize, owned))
        else:
            done = [self._materialize(it) for it in owned]
        nl = l1 - l0
        return self._assemble(done[:nl], done[nl:])

    def _assemble(self, label_items: List[Dict], unlabel_items: List[Dict]) -> Dict:
        def stack_images(items):
            return np.stack([it["image"] for it in items])

        def stack_hw(items):
            return np.stack([it["hw"] for it in items])

        def stack_gt(items, box_std: float = 0.0):
            return PaddedInstances(
                boxes=np.stack([it["gt"]["boxes"] for it in items]),
                classes=np.stack([it["gt"]["classes"] for it in items]),
                scores=np.ones((len(items), self.max_gt), np.float32),
                box_std=np.full(
                    (len(items), self.max_gt, 4), box_std, np.float32
                ),
                mask=np.stack([it["gt"]["mask"] for it in items]),
            )

        out = {
            "images_label_k": stack_images(label_items),
            "gt_label": stack_gt(label_items),
            "label_hw": stack_hw(label_items),
            "images_unlabel_k": stack_images(unlabel_items),
            "unlabel_hw": stack_hw(unlabel_items),
        }
        if self.oracle:
            # positive-control mode (TPU.ORACLE_PSEUDO): ship the unlabeled
            # stream's ground truth so the mutual step can consume it as a
            # perfect pseudo-label set (confidence 1.0, std ORACLE_BOX_STD)
            out["gt_unlabel"] = stack_gt(unlabel_items, ORACLE_BOX_STD)
        return out

    def __iter__(self) -> Iterator[Dict]:
        if self.local_rows:
            # multi-host: bucket geometry stubs; owned rows materialize at
            # assembly (pooled) so non-owned rows never decode
            items = self._stream
            assemble = self._assemble_local
        else:
            # single-host: materialize through the decode pool right after
            # the (sequential) geometry stream, before bucketing
            items = self._materialized_stream
            assemble = self._assemble
        label_batches = self._batched_stream(
            items(self.label_dicts, self.seed), self.batch_label
        )
        unlabel_batches = self._batched_stream(
            items(self.unlabel_dicts, self.seed + 7), self.batch_unlabel
        )
        if self.num_threads <= 0:
            for lb, ub in zip(label_batches, unlabel_batches):
                yield assemble(lb, ub)
            return

        q: "queue.Queue" = queue.Queue(maxsize=4)
        stop = threading.Event()

        def worker():
            try:
                for lb, ub in zip(label_batches, unlabel_batches):
                    if stop.is_set():
                        return
                    q.put(assemble(lb, ub))
            except Exception as e:  # surface errors to the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


class TestDataLoader:
    """Eval loader: deterministic order, resize to MIN_SIZE_TEST shortest
    edge (no jitter, no flip), fixed test canvas, batch of 1..N
    (reference: build_detection_test_loader, build.py:114-142).

    Batches are grouped by orientation so portrait images get the
    transposed canvas — a single landscape canvas would force portrait
    images to ~MIN_SIZE_TEST * cw/ch shortest edge (e.g. 800 -> 600), a
    silent eval deviation from the reference's per-image padding.
    """

    def __init__(self, cfg, dataset_dicts: List[Dict], batch_size: int = 1,
                 image_loader=None):
        self.cfg = cfg
        self.dicts = dataset_dicts
        self.batch_size = batch_size
        ch, cw = cfg.TPU.TEST_CANVAS
        self.canvas = {
            "landscape": (min(ch, cw), max(ch, cw)),
            "portrait": (max(ch, cw), min(ch, cw)),
        }
        self.min_size = cfg.INPUT.MIN_SIZE_TEST
        self.max_size = cfg.INPUT.MAX_SIZE_TEST
        self.num_threads = cfg.TPU.DATA_THREADS
        self._pool_obj: Optional[ThreadPoolExecutor] = None
        self._image_loader = image_loader or TwoStreamDataLoader._default_loader
        self._groups = {"landscape": [], "portrait": []}
        for d in dataset_dicts:
            orient = (
                "landscape" if d.get("width", 1) >= d.get("height", 0)
                else "portrait"
            )
            self._groups[orient].append(d)

    def __len__(self):
        return sum(
            -(-len(g) // self.batch_size) for g in self._groups.values() if g
        )

    def _emit(self, chunk: List[Dict], canvas):
        import cv2

        ch, cw = canvas
        images = np.zeros((self.batch_size, ch, cw, 3), np.float32)
        hw = np.zeros((self.batch_size, 2), np.float32)
        scales = np.ones((self.batch_size,), np.float32)

        def load_one(i_d):
            # decode + resize in a pool thread (cv2 releases the GIL);
            # each row writes a disjoint slice of the shared arrays
            i, d = i_d
            img = self._image_loader(d["file_name"])
            _bump("test")
            h, w = img.shape[:2]
            scale = self.min_size / min(h, w)
            if max(h, w) * scale > self.max_size:
                scale = self.max_size / max(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            if nh > ch or nw > cw:
                s2 = min(ch / nh, cw / nw)
                nh, nw = int(nh * s2), int(nw * s2)
                scale = scale * s2
            resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
            images[i, :nh, :nw] = resized.astype(np.float32)
            hw[i] = (nh, nw)
            scales[i] = scale

        if self.num_threads > 0 and len(chunk) > 1:
            if self._pool_obj is None:
                self._pool_obj = ThreadPoolExecutor(
                    max_workers=max(1, self.num_threads),
                    thread_name_prefix="ubt-eval-decode",
                )
            list(self._pool_obj.map(load_one, enumerate(chunk)))
        else:
            for i_d in enumerate(chunk):
                load_one(i_d)
        return {
            "images": images,
            "hw": hw,
            "scales": scales,
            "image_ids": [d["image_id"] for d in chunk],
            "num_valid": len(chunk),
        }

    def __iter__(self):
        for orient, dicts in self._groups.items():
            canvas = self.canvas[orient]
            for start in range(0, len(dicts), self.batch_size):
                yield self._emit(dicts[start : start + self.batch_size], canvas)
