"""One-command mAP-parity check against a reference checkpoint.

Given a COCO root and a reference unbiased-teacher-v2 .pth (an
EnsembleTSModel state dict, torch-saved), this runs
  convert (teacher by default) -> jitted inference -> COCO AP table
so the "mAP within 0.5 of the reference" check is a single invocation the
moment real data/checkpoints are available (VERDICT r1 item 9).

Reference flow being replicated: train_net.py --eval-only evaluates the
TEACHER of the ensemble checkpoint (reference: train_net.py:37-51,
detection_checkpoint.py:10-89).

Usage:
    python tools/parity_eval.py --checkpoint model.pth \
        [--config configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml] \
        [--coco-root $COCO_ROOT] [--model student|teacher] \
        [--split val2017] [--limit N] [--eval-batch 8] [KEY VALUE ...]

Checkpoint formats accepted:
  * torch .pth/.pt — loaded with torch.load(map_location="cpu")
  * pickle .pkl with a {"model": state_dict} or raw state_dict
Keys may be EnsembleTSModel ("modelTeacher.*"/"modelStudent.*", DDP
"module." stripped) or a bare detector state dict.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_state_dict(path: str):
    """-> dict[str, np.ndarray] with torch tensors materialized."""
    from ubteacher_tpu.checkpoint.torch_weights import load_torch_state_dict

    return load_torch_state_dict(path)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument(
        "--config",
        default="configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml",
    )
    parser.add_argument("--coco-root", default=os.environ.get("COCO_ROOT", ""))
    parser.add_argument("--model", choices=("teacher", "student"),
                        default="teacher")
    parser.add_argument("--split", default="val2017")
    parser.add_argument("--limit", type=int, default=0,
                        help="evaluate only the first N images")
    parser.add_argument("--eval-batch", type=int, default=8)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from ubteacher_tpu.checkpoint.torch_weights import (
        convert_ubt_fcos_model,
        convert_ubt_rcnn_model,
        split_ensemble_state,
    )
    from ubteacher_tpu.config import add_ubteacher_config, get_cfg
    from ubteacher_tpu.data.coco import load_coco_json
    from ubteacher_tpu.data.loader import TestDataLoader
    from ubteacher_tpu.evaluation import inference_on_dataset

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    sd = load_state_dict(args.checkpoint)
    parts = split_ensemble_state(sd)
    if parts["teacher"] or parts["student"]:
        sd = parts[args.model]
        if not sd:
            raise SystemExit(
                f"checkpoint has no {args.model} weights "
                f"(found: {[k for k, v in parts.items() if v]})"
            )
        print(f"using {args.model} weights from the ensemble checkpoint")
    else:
        print("checkpoint is a bare detector state dict")

    is_rcnn = cfg.SEMISUPNET.Trainer == "ubteacher_rcnn"
    depth = cfg.MODEL.RESNETS.DEPTH
    if is_rcnn:
        from ubteacher_tpu.engine.rcnn_trainer import make_rcnn_inference_fn
        from ubteacher_tpu.modeling.rcnn import build_two_stage_rcnn

        model = build_two_stage_rcnn(cfg)
        converted = convert_ubt_rcnn_model(
            sd, depth, cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
        )
        infer_fn = make_rcnn_inference_fn(cfg, model)
        num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    else:
        from ubteacher_tpu.modeling.fcos_head import build_one_stage_detector

        model = build_one_stage_detector(cfg)
        converted = convert_ubt_fcos_model(sd, depth)
        infer_fn = None  # evaluator builds the FCOS one (nms criteria)
        num_classes = cfg.MODEL.FCOS.NUM_CLASSES

    # validate converted tree against a freshly initialized one (shapes)
    import jax.numpy as jnp

    from ubteacher_tpu.checkpoint.torch_weights import cast_like

    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )["params"]
    params = jax.tree.map(jnp.asarray, cast_like(converted, init))

    root = args.coco_root or "datasets/coco"
    ann = os.path.join(root, f"annotations/instances_{args.split}.json")
    dicts, _ = load_coco_json(ann, os.path.join(root, args.split))
    if args.limit:
        dicts = dicts[: args.limit]
    print(f"evaluating {len(dicts)} images from {ann}")

    loader = TestDataLoader(cfg, dicts, batch_size=args.eval_batch)
    results = inference_on_dataset(
        cfg, params, model, loader, dicts,
        nms_method=cfg.MODEL.FCOS.NMS_CRITERIA_TEST,
        num_classes=num_classes,
        infer_fn=infer_fn,
    )
    print("\n== COCO bbox AP ==")
    for k in ("AP", "AP50", "AP75", "APs", "APm", "APl",
              "AR1", "AR10", "AR100"):
        print(f"  {k:6s} {results.get(k, float('nan')):7.3f}")
    if "inference_sec_per_image" in results:
        print(f"  sec/img {results['inference_sec_per_image']:.4f}")
    return results


if __name__ == "__main__":
    main()
