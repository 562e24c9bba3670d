"""CLI smoke: the real train_net.py path — disk COCO layout under
$COCO_ROOT, dataseed split file, KEY VALUE overrides, train then
--eval-only --resume (reference: train_net.py:15-73 surface)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import train_net
from ubteacher_tpu.data.coco import generate_supervision_seed_file


def _write_coco_root(root, n_images=8, size=96):
    import cv2

    rng = np.random.default_rng(0)
    ann_dir = root / "annotations"
    ann_dir.mkdir(parents=True)
    images, annotations = [], []
    ann_id = 1
    for split in ("train2017", "val2017"):
        (root / split).mkdir()
    for i in range(n_images):
        fname = f"{i:012d}.png"
        img = rng.integers(0, 80, size=(size, size, 3), dtype=np.uint8)
        w = h = 32
        x, y = int(rng.integers(0, size - w)), int(rng.integers(0, size - h))
        img[y : y + h, x : x + w] = (200, 80, 40)
        cv2.imwrite(str(root / "train2017" / fname), img)
        cv2.imwrite(str(root / "val2017" / fname), img)
        images.append(
            {"id": i, "file_name": fname, "height": size, "width": size}
        )
        annotations.append({
            "id": ann_id, "image_id": i, "category_id": 1,
            "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
        })
        ann_id += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "thing"}],
    }
    for name in ("instances_train2017.json", "instances_val2017.json"):
        (ann_dir / name).write_text(json.dumps(coco))


def test_train_net_cli_train_and_eval(tmp_path, monkeypatch):
    root = tmp_path / "coco"
    _write_coco_root(root)
    seed_path = tmp_path / "seed.txt"
    generate_supervision_seed_file(
        str(seed_path), num_images=8, percents=(50.0,), seeds=1
    )
    monkeypatch.setenv("COCO_ROOT", str(root))
    out_dir = tmp_path / "out"

    opts = [
        "MODEL.RESNETS.DEPTH", "18",
        "MODEL.FCOS.NUM_CLASSES", "1",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.CANVAS_LANDSCAPE", "(128, 128)",
        "TPU.CANVAS_PORTRAIT", "(128, 128)",
        "TPU.TEST_CANVAS", "(128, 128)",
        "TPU.MAX_GT", "8",
        "TPU.MAX_PSEUDO", "20",
        "TPU.NMS_CANDIDATES", "100",
        "TPU.DATA_THREADS", "0",
        "INPUT.MIN_SIZE_TRAIN", "(96,)",
        "INPUT.MIN_SIZE_TRAIN_SAMPLING", "choice",
        "INPUT.MAX_SIZE_TRAIN", "128",
        "INPUT.MIN_SIZE_TEST", "96",
        "INPUT.MAX_SIZE_TEST", "128",
        "SOLVER.IMG_PER_BATCH_LABEL", "2",
        "SOLVER.IMG_PER_BATCH_UNLABEL", "2",
        "SOLVER.MAX_ITER", "2",
        "SOLVER.BASE_LR", "0.001",
        "SEMISUPNET.BURN_UP_STEP", "1",
        "TEST.EVAL_PERIOD", "0",
        "DATALOADER.SUP_PERCENT", "50.0",
        "DATALOADER.RANDOM_DATA_SEED", "0",
        "DATALOADER.RANDOM_DATA_SEED_PATH", str(seed_path),
        "MODEL.WEIGHTS", "",
        "OUTPUT_DIR", str(out_dir),
    ]
    parser = train_net.default_argument_parser()
    args = parser.parse_args(
        ["--config", "configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml"]
        + opts
    )
    train_net.main(args)  # 1 burn-in + 1 mutual step, checkpoint at end
    assert (out_dir / "log.txt").exists()
    ckpts = [p for p in out_dir.iterdir()
             if "checkpoint" in p.name.lower()]
    assert ckpts, f"no checkpoint written in {list(out_dir.iterdir())}"

    # --eval-only --resume evaluates the TEACHER from the checkpoint
    args2 = parser.parse_args(
        ["--config",
         "configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml",
         "--eval-only", "--resume"] + opts
    )
    train_net.main(args2)


def test_eval_only_torch_checkpoint(tmp_path, monkeypatch):
    """`--eval-only MODEL.WEIGHTS x.pth` must evaluate the TEACHER of a
    reference-shaped EnsembleTSModel checkpoint through the converters
    (reference: train_net.py:37-51, detection_checkpoint.py:10-89)."""
    import torch

    from tests.test_full_checkpoint_convert import _synthetic_reference_state
    from ubteacher_tpu.checkpoint.torch_weights import convert_ubt_fcos_model

    root = tmp_path / "coco"
    _write_coco_root(root)
    seed_path = tmp_path / "seed.txt"
    generate_supervision_seed_file(
        str(seed_path), num_images=8, percents=(50.0,), seeds=1
    )
    monkeypatch.setenv("COCO_ROOT", str(root))
    out_dir = tmp_path / "out"

    # teacher and student carry DIFFERENT weights so loading is observable
    rng = np.random.default_rng(3)
    sd_t = _synthetic_reference_state(18, 1, 4 * 17, rng)
    sd_s = _synthetic_reference_state(18, 1, 4 * 17, rng)
    ensemble = {}
    for k, v in sd_t.items():
        ensemble[f"modelTeacher.{k}"] = torch.from_numpy(np.asarray(v))
    for k, v in sd_s.items():
        ensemble[f"modelStudent.module.{k}"] = torch.from_numpy(np.asarray(v))
    ckpt = tmp_path / "ensemble.pth"
    torch.save({"model": ensemble, "iteration": 1234}, str(ckpt))

    opts = [
        "MODEL.RESNETS.DEPTH", "18",
        "MODEL.FCOS.NUM_CLASSES", "1",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.CANVAS_LANDSCAPE", "(128, 128)",
        "TPU.CANVAS_PORTRAIT", "(128, 128)",
        "TPU.TEST_CANVAS", "(128, 128)",
        "TPU.MAX_GT", "8",
        "TPU.MAX_PSEUDO", "20",
        "TPU.NMS_CANDIDATES", "100",
        "TPU.DATA_THREADS", "0",
        "INPUT.MIN_SIZE_TRAIN", "(96,)",
        "INPUT.MIN_SIZE_TRAIN_SAMPLING", "choice",
        "INPUT.MAX_SIZE_TRAIN", "128",
        "INPUT.MIN_SIZE_TEST", "96",
        "INPUT.MAX_SIZE_TEST", "128",
        "SOLVER.IMG_PER_BATCH_LABEL", "2",
        "SOLVER.IMG_PER_BATCH_UNLABEL", "2",
        "DATALOADER.SUP_PERCENT", "50.0",
        "DATALOADER.RANDOM_DATA_SEED", "0",
        "DATALOADER.RANDOM_DATA_SEED_PATH", str(seed_path),
        "MODEL.WEIGHTS", str(ckpt),
        "OUTPUT_DIR", str(out_dir),
    ]
    parser = train_net.default_argument_parser()
    args = parser.parse_args(
        ["--config", "configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml",
         "--eval-only"] + opts
    )

    # build the trainer directly to inspect the loaded state, then test()
    cfg = train_net.setup(args)
    from ubteacher_tpu.engine.trainer import UBTeacherTrainer

    trainer = UBTeacherTrainer(cfg)
    trainer.resume_or_load(resume=False)
    import jax

    teacher = jax.device_get(trainer.state.teacher)
    student = jax.device_get(trainer.state.student)
    exp_t = convert_ubt_fcos_model(sd_t, depth=18)
    exp_s = convert_ubt_fcos_model(sd_s, depth=18)
    np.testing.assert_allclose(
        np.asarray(teacher["head"]["cls_logits"]["kernel"], np.float32),
        np.asarray(exp_t["head"]["cls_logits"]["kernel"], np.float32),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(student["head"]["cls_logits"]["kernel"], np.float32),
        np.asarray(exp_s["head"]["cls_logits"]["kernel"], np.float32),
        rtol=1e-6,
    )
    # teacher != student proves both halves were honored
    assert not np.allclose(
        np.asarray(teacher["head"]["cls_logits"]["kernel"]),
        np.asarray(student["head"]["cls_logits"]["kernel"]),
    )
    results = trainer.test(model="teacher")
    assert "AP" in results


def test_vis_period_writes_panel_artifacts(tmp_path, monkeypatch):
    """VIS_PERIOD must write labeled (gt | student pred) and, in the mutual
    phase, unlabeled (pseudo-cls | pseudo-reg | student pred) panel images
    (reference: one_stage_detector.py:242-321)."""
    import cv2

    root = tmp_path / "coco"
    _write_coco_root(root)
    seed_path = tmp_path / "seed.txt"
    generate_supervision_seed_file(
        str(seed_path), num_images=8, percents=(50.0,), seeds=1
    )
    monkeypatch.setenv("COCO_ROOT", str(root))
    out_dir = tmp_path / "out"

    opts = [
        "MODEL.RESNETS.DEPTH", "18",
        "MODEL.FCOS.NUM_CLASSES", "1",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.CANVAS_LANDSCAPE", "(128, 128)",
        "TPU.CANVAS_PORTRAIT", "(128, 128)",
        "TPU.TEST_CANVAS", "(128, 128)",
        "TPU.MAX_GT", "8",
        "TPU.MAX_PSEUDO", "20",
        "TPU.NMS_CANDIDATES", "100",
        "TPU.DATA_THREADS", "0",
        "INPUT.MIN_SIZE_TRAIN", "(96,)",
        "INPUT.MIN_SIZE_TRAIN_SAMPLING", "choice",
        "INPUT.MAX_SIZE_TRAIN", "128",
        "SOLVER.IMG_PER_BATCH_LABEL", "2",
        "SOLVER.IMG_PER_BATCH_UNLABEL", "2",
        "SOLVER.MAX_ITER", "2",
        "SOLVER.BASE_LR", "0.001",
        "SEMISUPNET.BURN_UP_STEP", "1",
        "TEST.EVAL_PERIOD", "0",
        "VIS_PERIOD", "1",
        "DATALOADER.SUP_PERCENT", "50.0",
        "DATALOADER.RANDOM_DATA_SEED", "0",
        "DATALOADER.RANDOM_DATA_SEED_PATH", str(seed_path),
        "MODEL.WEIGHTS", "",
        "OUTPUT_DIR", str(out_dir),
    ]
    parser = train_net.default_argument_parser()
    args = parser.parse_args(
        ["--config", "configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml"]
        + opts
    )
    train_net.main(args)

    vis = out_dir / "vis"
    labeled = sorted(vis.glob("*_labeled.png"))
    unlabeled = sorted(vis.glob("*_unlabeled.png"))
    assert labeled, list(vis.iterdir())
    assert unlabeled, list(vis.iterdir())  # step 2 is mutual
    img_l = cv2.imread(str(labeled[0]))
    assert img_l.shape == (128, 2 * 128, 3)  # gt | student pred
    img_u = cv2.imread(str(unlabeled[0]))
    # pseudo-cls | pseudo-reg | student pred
    assert img_u.shape == (128, 3 * 128, 3)
