"""jax.export round trip of the FCOS inference path.

The serialized StableHLO artifact must reproduce the live jitted
function's Detections exactly — same compiled math, no retracing — when
deserialized into a process that has only jax and the params.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import export

from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.evaluation.evaluator import make_fcos_inference_fn
from ubteacher_tpu.modeling.fcos_head import build_one_stage_detector


def test_fcos_export_roundtrip(tmp_path):
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file("configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml")
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_DETECTIONS = 16
    cfg.TPU.NMS_CANDIDATES = 64
    cfg.freeze()

    model = build_one_stage_detector(cfg)
    infer = make_fcos_inference_fn(cfg, model)
    b, h, w = 1, 128, 128
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))[
        "params"
    ]
    pshapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    images = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
    hw = jax.ShapeDtypeStruct((b, 2), jnp.float32)

    exp = export.export(infer, platforms=("cpu",))(pshapes, images, hw)
    blob = exp.serialize()
    path = tmp_path / "fcos.stablehlo"
    path.write_bytes(blob)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.normal(110, 40, (b, h, w, 3)).clip(0, 255).astype(np.float32)
    )
    hw_v = jnp.asarray([[h, w]], jnp.float32)

    ref = infer(params, imgs, hw_v)
    back = export.deserialize(path.read_bytes())
    got = back.call(params, imgs, hw_v)

    for a, r in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=1e-5, atol=1e-5
        )
