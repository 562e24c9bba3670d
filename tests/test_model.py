import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.modeling.fcos_head import build_one_stage_detector
from ubteacher_tpu.modeling.fcos_outputs import level_feature_sizes


import os

_CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "FCOS", "coco-standard",
    "fcos_R_50_ut2_sup1_run0.yaml",
)


def _tiny_cfg():
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(_CFG_PATH)
    cfg.TPU.COMPUTE_DTYPE = "float32"  # CPU tests
    return cfg


def test_one_stage_detector_shapes():
    cfg = _tiny_cfg()
    model = build_one_stage_detector(cfg)
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(rng, images)
    dense = model.apply(variables, images)
    sizes = level_feature_sizes((128, 128), [8, 16, 32, 64, 128])
    L = sum(h * w for h, w in sizes)
    assert dense.logits.shape == (1, L, 80)
    assert dense.reg.shape == (1, L, 4 * 17)  # REG_DISCRETE, REG_MAX=16
    assert dense.ctrness.shape == (1, L)
    assert dense.reg_std.shape == (1, L, 4)
    # focal-init bias: background prob ~ PRIOR_PROB
    probs = jax.nn.sigmoid(dense.logits)
    assert 0.001 < float(probs.mean()) < 0.1


def test_continuous_reg_head_is_nonnegative():
    cfg = _tiny_cfg()
    cfg.MODEL.FCOS.REG_DISCRETE = False
    cfg.MODEL.FCOS.KL_LOSS = False
    model = build_one_stage_detector(cfg)
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 128, 128, 3)) * 50 + 100,
        jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(1), images)
    dense = model.apply(variables, images)
    assert dense.reg.shape[-1] == 4
    assert float(dense.reg.min()) >= 0.0  # relu'd (fcos.py:364)
    assert (np.asarray(dense.reg_std) == 0).all()  # no KL head


def test_head_params_shared_across_levels():
    cfg = _tiny_cfg()
    model = build_one_stage_detector(cfg)
    images = jnp.zeros((1, 256, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    # exactly one cls_logits kernel (shared head), 5 scale factors
    cls_kernels = [n for n in names if "cls_logits" in n and "kernel" in n]
    assert len(cls_kernels) == 1
    scales = [l for p, l in flat if "scales" in "/".join(str(x) for x in p)]
    assert scales[0].shape == (5,)
