"""Host-side trainer: wires data, model, steps, checkpoints, eval.

Equivalent of UBTeacherTrainer (reference: ubteacher/engine/trainer.py:38-608)
minus everything that moved on-device (EMA, pseudo-labeling, strong aug,
loss weighting — see engine/fcos_trainer.py). What remains on host is the
loop skeleton: iterate the two-stream loader, dispatch burn-in vs mutual
step on the step counter (reference: trainer.py:191/212), log metrics,
checkpoint periodically, run eval hooks.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoint import TSCheckpointer
from ..checkpoint.torch_weights import load_pretrained_backbone
from ..data.coco import divide_label_unlabel, load_coco_json, load_coco_unlabel_json
from ..data import loader as loader_mod
from ..data.loader import TestDataLoader, TwoStreamDataLoader
from ..evaluation import inference_on_dataset
from ..modeling.fcos_head import build_one_stage_detector
from ..parallel import (
    get_mesh,
    replicate,
    set_active_mesh,
    shard_batch,
    shard_local_batch,
)
from ..solver import build_optimizer
from ..utils.events import EventStorage, setup_logger
from .fcos_trainer import FCOSTrainState, make_fcos_train_steps

logger = logging.getLogger("ubteacher_tpu")


class _NullEventStorage:
    """No-op EventStorage for non-zero hosts (multi-host writes are
    rank-0-only, like the reference's PeriodicCheckpointer/writers)."""

    iter = 0

    def put_scalars(self, **kw):
        pass

    def step(self):
        pass

    def close(self):
        pass


def auto_scale_workers(cfg, num_workers: int):
    """D2 DefaultTrainer.auto_scale_workers semantics (reference:
    trainer.py:46, 620): when SOLVER.REFERENCE_WORLD_SIZE > 0, linearly
    rescale batch sizes / LR / schedule to the actual worker count."""
    old = cfg.SOLVER.REFERENCE_WORLD_SIZE
    if old == 0 or old == num_workers:
        return cfg
    cfg = cfg.clone()
    frozen = cfg.is_frozen()
    cfg.defrost()
    scale = num_workers / old
    cfg.SOLVER.IMS_PER_BATCH = int(round(cfg.SOLVER.IMS_PER_BATCH * scale))
    cfg.SOLVER.IMG_PER_BATCH_LABEL = int(
        round(cfg.SOLVER.IMG_PER_BATCH_LABEL * scale)
    )
    cfg.SOLVER.IMG_PER_BATCH_UNLABEL = int(
        round(cfg.SOLVER.IMG_PER_BATCH_UNLABEL * scale)
    )
    cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR * scale
    cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
    cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
    cfg.SOLVER.STEPS = tuple(int(round(s / scale)) for s in cfg.SOLVER.STEPS)
    cfg.TEST.EVAL_PERIOD = int(round(cfg.TEST.EVAL_PERIOD / scale))
    cfg.SOLVER.CHECKPOINT_PERIOD = int(
        round(cfg.SOLVER.CHECKPOINT_PERIOD / scale)
    )
    cfg.SOLVER.REFERENCE_WORLD_SIZE = num_workers
    if frozen:
        cfg.freeze()
    return cfg


def verify_results(cfg, results: Dict[str, float]) -> bool:
    """Compare eval results against cfg.TEST.EXPECTED_RESULTS entries of the
    form [metric, expected, tolerance] (reference: trainer.py:133-135 via
    D2 verify_results)."""
    ok = True
    for metric, expected, tolerance in cfg.TEST.EXPECTED_RESULTS:
        actual = results.get(metric, float("nan"))
        if not (abs(actual - expected) <= tolerance):
            ok = False
            logger.error(
                "verify_results FAILED: %s = %.4f, expected %.4f +/- %.4f",
                metric, actual, expected, tolerance,
            )
        else:
            logger.info(
                "verify_results ok: %s = %.4f (expected %.4f +/- %.4f)",
                metric, actual, expected, tolerance,
            )
    return ok


class UBTeacherTrainer:
    """FCOS semi-supervised trainer (SEMISUPNET.Trainer == 'ubteacher')."""

    def __init__(self, cfg, datasets: Optional[Dict] = None, image_loader=None):
        """datasets: optional {'train': dicts, 'train_unlabel': dicts,
        'test': dicts, 'meta': meta} to bypass disk COCO loading (tests)."""
        cfg = auto_scale_workers(cfg, jax.device_count())
        self.cfg = cfg
        # multi-host: only process 0 writes log/metrics/checkpoints
        # (reference: rank-0 gating via comm.is_main_process, trainer.py:527)
        self.is_main_process = jax.process_index() == 0
        if self.is_main_process:
            setup_logger(cfg.OUTPUT_DIR)
            self.storage = EventStorage(cfg.OUTPUT_DIR)
        else:
            self.storage = _NullEventStorage()

        if datasets is None:
            datasets = self._load_datasets(cfg)
        self.datasets = datasets

        label_dicts = datasets["train"]
        unlabel_dicts = datasets.get("train_unlabel")
        if unlabel_dicts is None:
            # COCO-standard protocol: split train by the dataseed file
            label_dicts, unlabel_dicts = divide_label_unlabel(
                label_dicts,
                cfg.DATALOADER.SUP_PERCENT,
                cfg.DATALOADER.RANDOM_DATA_SEED,
                cfg.DATALOADER.RANDOM_DATA_SEED_PATH,
            )
        self.loader = TwoStreamDataLoader(
            cfg, label_dicts, unlabel_dicts, seed=max(cfg.SEED, 0),
            image_loader=image_loader,
        )
        self._image_loader = image_loader

        self.model = self._build_model(cfg)
        ch, cw = cfg.TPU.CANVAS_LANDSCAPE
        dummy = jnp.zeros((1, ch, cw, 3), jnp.float32)
        params = self.model.init(jax.random.PRNGKey(max(cfg.SEED, 0)), dummy)[
            "params"
        ]
        is_torch_full = cfg.MODEL.WEIGHTS.endswith((".pth", ".pt"))
        if (cfg.MODEL.WEIGHTS and os.path.isfile(cfg.MODEL.WEIGHTS)
                and not is_torch_full):
            logger.info("loading pretrained backbone from %s", cfg.MODEL.WEIGHTS)
            params = load_pretrained_backbone(
                params, cfg.MODEL.WEIGHTS, cfg.MODEL.RESNETS.DEPTH
            )
        elif cfg.MODEL.WEIGHTS and not is_torch_full:
            logger.warning(
                "MODEL.WEIGHTS=%s not found on disk; training from scratch",
                cfg.MODEL.WEIGHTS,
            )

        self.tx = build_optimizer(cfg, params)
        self.state = FCOSTrainState.create(params, self.tx)
        self.burnin_step, self.mutual_step = self._make_steps(
            cfg, self.model, self.tx
        )
        self.mesh = get_mesh(cfg.TPU.MESH_DATA)
        # Pallas ops consult the active mesh to shard_map over `data`
        # (GSPMD would otherwise replicate them on every device)
        set_active_mesh(self.mesh)
        self.state = jax.device_put(self.state, replicate(self.mesh))
        self.checkpointer = TSCheckpointer(cfg.OUTPUT_DIR)
        self.start_iter = 0
        self.max_iter = cfg.SOLVER.MAX_ITER

    @staticmethod
    def _load_datasets(cfg) -> Dict:
        """Resolve DATASETS.* names to COCO json paths under $COCO_ROOT
        (datasets/coco by default, like detectron2's ./datasets layout)."""
        root = os.environ.get("COCO_ROOT", "datasets/coco")
        train, meta = load_coco_json(
            os.path.join(root, "annotations/instances_train2017.json"),
            os.path.join(root, "train2017"),
        )
        test, _ = load_coco_json(
            os.path.join(root, "annotations/instances_val2017.json"),
            os.path.join(root, "val2017"),
        )
        out = {"train": train, "test": test, "meta": meta}
        if cfg.DATASETS.CROSS_DATASET:
            out["train_unlabel"] = load_coco_unlabel_json(
                os.path.join(root, "annotations/image_info_unlabeled2017.json"),
                os.path.join(root, "unlabeled2017"),
            )
        return out

    def resume_or_load(self, resume: bool = True) -> None:
        self.state = self.checkpointer.resume_or_load(self.state, resume)
        self.start_iter = int(jax.device_get(self.state.step))
        if resume and self.start_iter > 0:
            logger.info("resumed at iteration %d", self.start_iter)
            return
        w = self.cfg.MODEL.WEIGHTS
        if w and w.endswith((".pth", ".pt")):
            if not os.path.isfile(w):
                raise FileNotFoundError(f"MODEL.WEIGHTS not found: {w}")
            self._load_torch_checkpoint(w)

    def _load_torch_checkpoint(self, path: str) -> None:
        """MODEL.WEIGHTS pointing at a torch checkpoint loads through the
        converters: an EnsembleTSModel checkpoint fills BOTH teacher and
        student; a bare detector state dict fills the student only, like
        DetectionTSCheckpointer (reference: train_net.py:37-51,
        checkpoint/detection_checkpoint.py:10-89). This is the CLI surface
        `train_net.py --eval-only MODEL.WEIGHTS x.pth` of the reference."""
        from ..checkpoint.torch_weights import (
            cast_like,
            load_torch_state_dict,
            split_ensemble_state,
        )

        sd = load_torch_state_dict(path)
        parts = split_ensemble_state(sd)
        init = jax.device_get(self.state.student)
        convert = self._torch_converter()
        updates = {}
        if parts["teacher"] or parts["student"]:
            for name in ("teacher", "student"):
                if parts[name]:
                    updates[name] = cast_like(convert(parts[name]), init)
                    logger.info("loaded %s weights from %s", name, path)
                else:
                    logger.warning("checkpoint has no %s weights", name)
        else:
            updates["student"] = cast_like(convert(sd), init)
            logger.info(
                "loaded bare detector state dict into the student from %s",
                path,
            )
        self.state = jax.device_put(
            self.state.replace(**updates), replicate(self.mesh)
        )

    def train(self) -> None:
        import time

        cfg = self.cfg
        burn_up = cfg.SEMISUPNET.BURN_UP_STEP
        rng = jax.random.PRNGKey(max(cfg.SEED, 0) + 17)
        data_iter: Iterator = iter(self.loader)
        logger.info(
            "starting training at iter %d (burn-in until %d, max %d)",
            self.start_iter, burn_up, self.max_iter,
        )
        # profiling hook (SURVEY.md §5: reference only has wall-clock
        # IterationTimer; we add real device traces): set UBT_PROFILE_DIR to
        # capture a jax.profiler trace of steps 10..20
        profile_dir = os.environ.get("UBT_PROFILE_DIR", "")

        # one-batch device prefetch: ship batch i+1 host->device while the
        # device executes step i (device_put is async)
        pending = None
        # multi-host loaders assemble only their own rows; shard_local_batch
        # builds the global array from the per-process chunks
        shard = (
            (lambda b: shard_local_batch(b, self.mesh))
            if getattr(self.loader, "local_rows", False)
            else (lambda b: shard_batch(b, self.mesh))
        )

        def next_device_batch():
            nonlocal rng, pending
            if pending is None:
                b = next(data_iter)
                rng, sub = jax.random.split(rng)
                b["rng"] = sub
                pending = shard(b)
            out = pending
            try:
                b = next(data_iter)
                rng, sub = jax.random.split(rng)
                b["rng"] = sub
                pending = shard(b)
            except StopIteration:
                pending = None
            return out

        for it in range(self.start_iter, self.max_iter):
            if profile_dir and it == self.start_iter + 10:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and it == self.start_iter + 20:
                jax.profiler.stop_trace()
            t_data = time.perf_counter()
            batch = next_device_batch()
            data_time = time.perf_counter() - t_data
            # host-side branch on the step counter, like the reference's
            # python `if` (trainer.py:191/212)
            t_step = time.perf_counter()
            if it < burn_up:
                self.state, metrics = self.burnin_step(self.state, batch)
            else:
                self.state, metrics = self.mutual_step(self.state, batch)
            host_metrics = {
                k: float(v) for k, v in jax.device_get(metrics).items()
            }
            # wall time of dispatch + metric fetch (the fetch is the honest
            # device sync on axon) — the reference's hooks.IterationTimer
            # "time" metric (trainer.py:509); lets long runs surface
            # step-time drift from metrics.json alone
            host_metrics["time"] = time.perf_counter() - t_step
            host_metrics["data_time"] = data_time
            # cumulative corrupt-row count: multi-host corrupt files train
            # on a zero row (loader._materialize) — make that visible
            host_metrics["corrupt_rows_total"] = float(
                loader_mod.DECODE_STATS["corrupt"]
            )
            self.storage.put_scalars(**host_metrics)
            if cfg.VIS_PERIOD and (it + 1) % cfg.VIS_PERIOD == 0:
                self._save_visualization(it + 1, batch, mutual=it >= burn_up)
            # Release the consumed batch's device arrays eagerly (the
            # metrics fetch above is the honest step sync, so they are
            # dead here). Hygiene: keeps at most batch+prefetch alive by
            # construction instead of by GC timing. NOTE the r5 soak's
            # host-RSS growth was measured to be COMPILE-driven (same
            # slope with and without this release; see ROUND5_NOTES) —
            # this bounds steady-state batch memory, it is not the leak
            # fix it was first thought to be.
            for leaf in jax.tree.leaves(batch):
                if isinstance(leaf, jax.Array):
                    leaf.delete()
            self.storage.step()
            nxt = it + 1
            if nxt % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or nxt == self.max_iter:
                # all processes call save: orbax coordinates multi-host
                # writes itself (a rank-gated call deadlocks on its
                # internal sync barrier)
                self.checkpointer.save(nxt, jax.device_get(self.state))
            if cfg.TEST.EVAL_PERIOD and nxt % cfg.TEST.EVAL_PERIOD == 0:
                self._eval_and_log()
        self.checkpointer.wait_until_finished()
        self.storage.close()
        if cfg.TEST.EXPECTED_RESULTS:
            verify_results(cfg, self.test(model="teacher"))

    def _save_visualization(self, iteration: int, batch, mutual: bool) -> None:
        """Training visualization with reference parity
        (one_stage_detector.py:242-321): labeled = gt | student
        predictions; unlabeled (mutual phase) = teacher pseudo-cls |
        pseudo-reg | student predictions. First image of each stream."""
        if not self.is_main_process:
            return
        from ..utils.visualizer import save_training_panels

        def first(x):
            if jax.process_count() > 1:
                # the batch is globally sharded; rank 0's first addressable
                # shard holds global row 0 (process-ordered layout)
                return np.asarray(x.addressable_shards[0].data)[:1]
            return np.asarray(jax.device_get(x))[:1]

        img_l = first(batch["images_label_k"])
        hw_l = (
            first(batch["label_hw"]) if "label_hw" in batch
            else np.asarray([[img_l.shape[1], img_l.shape[2]]], np.float32)
        )
        gt = jax.tree.map(first, batch["gt_label"])
        panels = [{
            "title": "gt",
            "image": img_l[0],
            "boxes": np.asarray(gt.boxes)[0],
            "mask": np.asarray(gt.mask)[0],
            "classes": np.asarray(gt.classes)[0],
        }]
        pred = self._vis_predictions(self.state.student, img_l, hw_l)
        if pred is not None:
            panels.append(dict(pred, title="student pred", image=img_l[0]))
        save_training_panels(self.cfg.OUTPUT_DIR, iteration, "labeled", panels)

        if not mutual:
            return
        img_u = first(batch["images_unlabel_k"])
        hw_u = (
            first(batch["unlabel_hw"]) if "unlabel_hw" in batch
            else np.asarray([[img_u.shape[1], img_u.shape[2]]], np.float32)
        )
        upanels = []
        for title, p in self._vis_pseudo_sets(self.state.teacher, img_u, hw_u):
            upanels.append(dict(p, title=title, image=img_u[0]))
        pred_u = self._vis_predictions(self.state.student, img_u, hw_u)
        if pred_u is not None:
            upanels.append(dict(pred_u, title="student pred", image=img_u[0]))
        if upanels:
            save_training_panels(
                self.cfg.OUTPUT_DIR, iteration, "unlabeled", upanels
            )

    @staticmethod
    def _local_params(params):
        """Multi-host: visualization/eval inference runs process-locally;
        pull a local replica of the globally-replicated params (a global
        jit from one rank alone would hang the other controllers)."""
        if jax.process_count() == 1:
            return params
        return jax.tree.map(
            lambda a: jnp.asarray(np.asarray(jax.device_get(a))), params
        )

    def _vis_predictions(self, params, images, hw):
        """-> panel dict of the model's detections on `images` (B=1)."""
        dets = jax.device_get(self._vis_infer_fn()(
            self._local_params(params), jnp.asarray(images), jnp.asarray(hw)
        ))
        return {
            "boxes": np.asarray(dets.boxes)[0],
            "mask": np.asarray(dets.mask)[0],
            "classes": np.asarray(dets.classes)[0],
            "scores": np.asarray(dets.scores)[0],
        }

    def _vis_pseudo_sets(self, teacher_params, images, hw):
        """-> [(title, panel dict)] of thresholded teacher pseudo boxes."""
        f = self.cfg.MODEL.FCOS
        teacher_params = self._local_params(teacher_params)
        out = []
        for title, method in (
            ("pseudo-cls", f.NMS_CRITERIA_TRAIN),
            ("pseudo-reg", f.NMS_CRITERIA_REG_TRAIN),
        ):
            dets = jax.device_get(self._vis_infer_fn(method)(
                teacher_params, jnp.asarray(images), jnp.asarray(hw)
            ))
            keep = np.asarray(dets.mask)[0] & (
                np.asarray(dets.scores)[0] > self.cfg.SEMISUPNET.BBOX_THRESHOLD
            )
            out.append((title, {
                "boxes": np.asarray(dets.boxes)[0],
                "mask": keep,
                "classes": np.asarray(dets.classes)[0],
                "scores": np.asarray(dets.scores)[0],
            }))
        return out

    def _vis_infer_fn(self, method: str | None = None):
        """Cached jitted decode at train-time thresholds (per nms method)."""
        from ..evaluation.evaluator import make_fcos_inference_fn

        cache = getattr(self, "_vis_fns", None)
        if cache is None:
            cache = self._vis_fns = {}
        key = method or self.cfg.MODEL.FCOS.NMS_CRITERIA_TRAIN
        if key not in cache:
            cache[key] = make_fcos_inference_fn(
                self.cfg, self.model, key, train=True
            )
        return cache[key]

    def _eval_and_log(self) -> None:
        results = self.test(model="teacher")
        self.storage.put_scalars(
            **{f"teacher/{k}": v for k, v in results.items()}
        )
        results_s = self.test(model="student")
        self.storage.put_scalars(
            **{f"student/{k}": v for k, v in results_s.items()}
        )
        logger.info("eval teacher AP=%.2f student AP=%.2f",
                    results.get("AP", float("nan")),
                    results_s.get("AP", float("nan")))

    def test(self, model: str = "teacher") -> Dict[str, float]:
        params = self.state.teacher if model == "teacher" else self.state.student
        test_dicts = self.datasets["test"]
        # multi-host: each process runs inference on a contiguous shard of
        # the test set (InferenceSampler semantics, reference build.py:114);
        # the evaluator allgathers detection rows so every host returns
        # identical full-dataset metrics
        shard = test_dicts
        if jax.process_count() > 1:
            parts = np.array_split(
                np.arange(len(test_dicts)), jax.process_count()
            )
            shard = [test_dicts[i] for i in parts[jax.process_index()]]
        loader = TestDataLoader(
            self.cfg, shard, batch_size=self.cfg.TPU.EVAL_BATCH,
            image_loader=self._image_loader,
        )
        return inference_on_dataset(
            self.cfg, params, self.model, loader, test_dicts,
            nms_method=self.cfg.MODEL.FCOS.NMS_CRITERIA_TEST,
            num_classes=self._num_classes(),
            infer_fn=self._infer_fn(),
            proposal_fn=self._proposal_fn(),
        )

    # -- overridables (FCOS defaults) ---------------------------------------
    def _build_model(self, cfg):
        return build_one_stage_detector(cfg)

    def _torch_converter(self):
        from ..checkpoint.torch_weights import convert_ubt_fcos_model

        depth = self.cfg.MODEL.RESNETS.DEPTH
        return lambda sd: convert_ubt_fcos_model(sd, depth)

    def _make_steps(self, cfg, model, tx):
        return make_fcos_train_steps(cfg, model, tx)

    def _infer_fn(self):
        return None  # evaluator builds the FCOS one

    def _proposal_fn(self):
        return None  # box-proposal AR is an RCNN (RPN) eval feature

    def _num_classes(self):
        return self.cfg.MODEL.FCOS.NUM_CLASSES


class UBRCNNTeacherTrainer(UBTeacherTrainer):
    """Faster R-CNN semi-supervised trainer
    (SEMISUPNET.Trainer == 'ubteacher_rcnn'; reference: trainer.py:612-1023).
    Note: per the reference, nms-criteria selection at eval time is an
    FCOS-only feature — RCNN eval uses the stock inference path
    (SURVEY.md §3 E3)."""

    def _build_model(self, cfg):
        from ..modeling.rcnn import build_two_stage_rcnn

        return build_two_stage_rcnn(cfg)

    def _make_steps(self, cfg, model, tx):
        from .rcnn_trainer import make_rcnn_train_steps

        return make_rcnn_train_steps(cfg, model, tx)

    def _infer_fn(self):
        from .rcnn_trainer import make_rcnn_inference_fn

        return make_rcnn_inference_fn(self.cfg, self.model)

    def _proposal_fn(self):
        if not self.cfg.TEST.EVAL_PROPOSALS:
            return None
        from .rcnn_trainer import make_rcnn_proposal_fn

        return make_rcnn_proposal_fn(self.cfg, self.model)

    def _num_classes(self):
        return self.cfg.MODEL.ROI_HEADS.NUM_CLASSES

    def _torch_converter(self):
        from ..checkpoint.torch_weights import convert_ubt_rcnn_model

        depth = self.cfg.MODEL.RESNETS.DEPTH
        pooler = self.cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
        return lambda sd: convert_ubt_rcnn_model(sd, depth, pooler)

    def _vis_infer_fn(self, method: str | None = None):
        # nms-criteria variants are FCOS-only; RCNN uses stock inference
        if getattr(self, "_vis_fn_rcnn", None) is None:
            from .rcnn_trainer import make_rcnn_inference_fn

            self._vis_fn_rcnn = make_rcnn_inference_fn(self.cfg, self.model)
        return self._vis_fn_rcnn

    def _vis_pseudo_sets(self, teacher_params, images, hw):
        """RCNN pseudo labels are a single score-thresholded set
        (reference: trainer.py:727-769)."""
        dets = jax.device_get(self._vis_infer_fn()(
            self._local_params(teacher_params), jnp.asarray(images),
            jnp.asarray(hw)
        ))
        keep = np.asarray(dets.mask)[0] & (
            np.asarray(dets.scores)[0] > self.cfg.SEMISUPNET.BBOX_THRESHOLD
        )
        return [("pseudo", {
            "boxes": np.asarray(dets.boxes)[0],
            "mask": keep,
            "classes": np.asarray(dets.classes)[0],
            "scores": np.asarray(dets.scores)[0],
        })]
