"""tools/parity_eval.py smoke: fabricated reference-shaped .pth ->
converter -> eval -> AP table, on synthetic COCO (VERDICT r1 item 9)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from test_cli import _write_coco_root
from test_full_checkpoint_convert import _synthetic_reference_state


@pytest.mark.slow
def test_parity_eval_fcos_ensemble_pth(tmp_path, monkeypatch):
    import torch

    import parity_eval

    root = tmp_path / "coco"
    _write_coco_root(root, n_images=6, size=96)

    # fabricate an EnsembleTSModel checkpoint with reference module names
    rng = np.random.default_rng(0)
    sd = _synthetic_reference_state(18, 1, 4 * 17, rng)
    ensemble = {}
    for k, v in sd.items():
        ensemble[f"modelTeacher.{k}"] = torch.from_numpy(np.asarray(v))
        ensemble[f"modelStudent.module.{k}"] = torch.from_numpy(
            np.asarray(v) * 0.5
        )
    ckpt = tmp_path / "model.pth"
    torch.save({"model": ensemble}, str(ckpt))

    results = parity_eval.main([
        "--checkpoint", str(ckpt),
        "--coco-root", str(root),
        "--model", "teacher",
        "--eval-batch", "2",
        "MODEL.RESNETS.DEPTH", "18",
        "MODEL.FCOS.NUM_CLASSES", "1",
        "TPU.COMPUTE_DTYPE", "float32",
        "TPU.TEST_CANVAS", "(96, 96)",
        "TPU.NMS_CANDIDATES", "64",
        "INPUT.MIN_SIZE_TEST", "96",
        "INPUT.MAX_SIZE_TEST", "96",
    ])
    assert "AP" in results
    # random weights: AP is a number (possibly nan); the full protocol ran
    assert isinstance(results["AP"], float)
    assert any(k.startswith("AP-cat") for k in results)
