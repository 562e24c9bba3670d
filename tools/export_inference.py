"""AOT-export the inference path for serving (jax.export / StableHLO).

Serializes the jitted inference function (params, images (B,H,W,3),
hw (B,2)) -> Detections as a self-contained StableHLO artifact, lowered
for the attached backend's platform (the inference graph embeds Pallas
TPU kernels — Mosaic custom calls — so a TPU artifact must be exported
from a TPU-attached process; on CPU the kernels trace in interpret mode
and the artifact is CPU-servable). A serving process deserializes and
calls it with only jax + the checkpoint pytree — none of the
model-building code or config is needed at serve time, and the compiled
program is immutable:

    from jax import export
    fn = export.deserialize(open(path, "rb").read())
    dets = fn.call(params, images, hw)     # Detections pytree

The reference has no export story (eager torch; SURVEY.md L8-L9) — this is
the TPU-native serving analog of torchscript/ONNX export.

Usage:
  python tools/export_inference.py --out fcos_infer.stablehlo [--rcnn]
      [--batch 1] [--canvas 800 1344] [--platforms tpu]
      [--config CFG]
"""

from __future__ import annotations

import argparse
import json
import sys


def build(args):
    import jax
    import jax.numpy as jnp

    from ubteacher_tpu.config import add_ubteacher_config, get_cfg

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    if args.rcnn:
        from ubteacher_tpu.engine.rcnn_trainer import make_rcnn_inference_fn
        from ubteacher_tpu.modeling.rcnn import build_two_stage_rcnn

        model = build_two_stage_rcnn(cfg)
        infer = make_rcnn_inference_fn(cfg, model)
    else:
        from ubteacher_tpu.evaluation.evaluator import make_fcos_inference_fn
        from ubteacher_tpu.modeling.fcos_head import build_one_stage_detector

        model = build_one_stage_detector(cfg)
        infer = make_fcos_inference_fn(cfg, model)

    b = args.batch
    h, w = args.canvas
    images = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
    hw = jax.ShapeDtypeStruct((b, 2), jnp.float32)
    # parameter SHAPES without computing an init (eval_shape traces only)
    pshapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, h, w, 3)))["params"],
        jax.random.PRNGKey(0),
    )
    return infer, pshapes, images, hw


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rcnn", action="store_true")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--canvas", type=int, nargs=2, default=(800, 1344))
    ap.add_argument(
        "--platforms", nargs="*", default=None,
        help="lowering targets (default: the attached backend; Pallas "
        "kernels dispatch by backend at trace time, so cross-platform "
        "lowering of one artifact is not possible)",
    )
    ap.add_argument(
        "--config",
        default="configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml",
    )
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()
    # only swap the UNTOUCHED default config for --rcnn; never override an
    # explicitly supplied one
    if args.rcnn and args.config == ap.get_default("config"):
        args.config = (
            "configs/Faster-RCNN/coco-standard/"
            "faster_rcnn_R_50_FPN_ut2_sup1_run0.yaml"
        )

    import jax
    from jax import export

    if args.platforms is None:
        args.platforms = [jax.default_backend()]
    infer, pshapes, images, hw = build(args)
    exp = export.export(infer, platforms=tuple(args.platforms))(
        pshapes, images, hw
    )
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    meta = {
        "detector": "rcnn" if args.rcnn else "fcos",
        "batch": args.batch,
        "canvas": list(args.canvas),
        "platforms": list(args.platforms),
        "bytes": len(blob),
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
