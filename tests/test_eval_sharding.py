"""Eval-batch sharding over the data mesh (reference shards the test set
across ranks via InferenceSampler, build.py:114)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.evaluation.evaluator import make_fcos_inference_fn
from ubteacher_tpu.modeling.fcos_head import build_one_stage_detector
from ubteacher_tpu.parallel import (
    active_mesh,
    batch_sharding,
    get_mesh,
    replicate,
    set_active_mesh,
)

_CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "FCOS", "coco-standard",
    "fcos_R_50_ut2_sup1_run0.yaml",
)


def test_sharded_eval_matches_unsharded():
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(_CFG_PATH)
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.NMS_CANDIDATES = 64
    model = build_one_stage_detector(cfg)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(110, 40, size=(8, 128, 128, 3)).clip(0, 255), jnp.float32
    )
    hw = jnp.asarray([[100.0, 120.0]] * 8)
    params = model.init(jax.random.PRNGKey(0), images[:1])["params"]

    infer = make_fcos_inference_fn(cfg, model)
    base = jax.device_get(infer(params, images, hw))

    mesh = get_mesh(8)
    prev = active_mesh()
    try:
        set_active_mesh(mesh)
        params_r = jax.device_put(params, replicate(mesh))
        images_s = jax.device_put(images, batch_sharding(mesh))
        hw_s = jax.device_put(hw, batch_sharding(mesh))
        infer2 = make_fcos_inference_fn(cfg, model)
        sharded = jax.device_get(infer2(params_r, images_s, hw_s))
    finally:
        set_active_mesh(prev)

    np.testing.assert_array_equal(base.mask, sharded.mask)
    np.testing.assert_allclose(base.boxes, sharded.boxes, atol=2e-3)
    np.testing.assert_allclose(base.scores, sharded.scores, atol=1e-4)
    np.testing.assert_array_equal(base.classes, sharded.classes)
