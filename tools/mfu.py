"""Model-FLOPs accounting for the mutual steps -> MFU basis (VERDICT r4 #2).

Counts the FLOPs of ONE compiled mutual-learning step (teacher forward +
dual pseudo-labeling + student fwd/bwd on labeled strong+weak + unlabeled
strong + SGD) by lowering the exact jitted step XLA compiles and running
XLA's HLO cost analysis on it (`lowered.cost_analysis()['flops']` — the
pre-optimization HLO, the standard "model FLOPs" basis: fusion may remove
some of these, never add). Cross-checks the number against an analytic
convolution count scaled from the published ResNet-50 per-image cost, and
writes `tools/flops_mutual.json` for bench.py to turn into MFU:

    mfu = flops_per_step / device_step_seconds / peak_bf16_flops

Runs on the CPU backend: lowering + cost analysis are device-independent
(shapes only), so this never touches the TPU tunnel. The reference has no
FLOPs accounting at all (SURVEY.md §5 — wall-clock IterationTimer only).

Usage:
    python tools/mfu.py [--canvas 768 1344] [--batch 8] [--out tools/flops_mutual.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _force_cpu() -> None:
    # the env pins JAX_PLATFORMS=axon and the axon sitecustomize re-pins it
    # via jax.config; both must be overridden before backend init (CLAUDE.md)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def build_step_and_batch(rcnn: bool, canvas, batch: int):
    """Mutual step + (state, batch) at the bench shapes — the same
    construction as bench.py/profile_step.py."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ubteacher_tpu.config import add_ubteacher_config, get_cfg
    from ubteacher_tpu.solver import build_optimizer
    from ubteacher_tpu.structures import PaddedInstances

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(
        "configs/Faster-RCNN/coco-standard/"
        "faster_rcnn_R_50_FPN_ut2_sup1_run0.yaml"
        if rcnn
        else "configs/FCOS/coco-standard/fcos_R_50_ut2_sup1_run0.yaml"
    )
    cfg.SEMISUPNET.BURN_UP_STEP = 0
    cfg.freeze()

    if rcnn:
        from ubteacher_tpu.engine.rcnn_trainer import (
            RCNNTrainState as State, make_rcnn_train_steps as make_steps,
        )
        from ubteacher_tpu.modeling.rcnn import build_two_stage_rcnn as build
    else:
        from ubteacher_tpu.engine.fcos_trainer import (
            FCOSTrainState as State, make_fcos_train_steps as make_steps,
        )
        from ubteacher_tpu.modeling.fcos_head import (
            build_one_stage_detector as build,
        )

    model = build(cfg)
    h, w = canvas
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3)))[
        "params"
    ]
    tx = build_optimizer(cfg, params)
    state = State.create(params, tx)
    _, mutual_step = make_steps(cfg, model, tx)

    m = cfg.TPU.MAX_GT
    b = batch
    boxes = np.zeros((b, m, 4), np.float32)
    mask = np.zeros((b, m), bool)
    nb = 12
    boxes[:, :nb, 0] = rng.uniform(0, w - 200, (b, nb))
    boxes[:, :nb, 1] = rng.uniform(0, h - 200, (b, nb))
    boxes[:, :nb, 2] = boxes[:, :nb, 0] + rng.uniform(20, 200, (b, nb))
    boxes[:, :nb, 3] = boxes[:, :nb, 1] + rng.uniform(20, 200, (b, nb))
    mask[:, :nb] = True
    gt = PaddedInstances(
        jnp.asarray(boxes), jnp.zeros((b, m), jnp.int32),
        jnp.ones((b, m), jnp.float32), jnp.zeros((b, m, 4), jnp.float32),
        jnp.asarray(mask),
    )
    imgs = jnp.zeros((b, h, w, 3), jnp.float32)
    batch_d = {
        "images_label_k": imgs,
        "gt_label": gt,
        "images_unlabel_k": imgs,
        "rng": jax.random.PRNGKey(2),
    }
    return mutual_step, state, batch_d


def counted_flops(rcnn: bool, canvas, batch: int) -> float:
    step, state, batch_d = build_step_and_batch(rcnn, canvas, batch)
    return float(step.lower(state, batch_d).cost_analysis()["flops"])


def analytic_estimate(canvas, batch: int, rcnn: bool) -> float:
    """Order-of-magnitude cross-check from published per-image conv costs.

    Anchor: ResNet-50 forward is ~4.1 GFLOP at 224x224 (He et al. 2015,
    table 1: 3.8 GMAC class-agnostic convention; the commonly cited conv
    2*MAC count is ~8.2 GFLOP — we use 2*MAC = 8.2e9 to match XLA's flops
    convention, which counts multiply and add separately). Backbone cost
    scales linearly with pixel area. FPN + FCOS head towers at the bench
    config roughly double the backbone cost per image (4 conv+GN towers x
    2 branches x 256ch at strides 8..128 sum to ~backbone-scale); for
    RCNN, FPN + RPN + per-roi heads add ~60%. Backward = 2x forward.

    The estimate deliberately stays coarse (+/-40%): its job is to catch
    an order-of-magnitude cost_analysis bug, not to re-derive the count.
    """
    h, w = canvas
    area_scale = (h * w) / (224.0 * 224.0)
    backbone_fwd = 8.2e9 * area_scale
    head_factor = 2.0 if not rcnn else 1.6
    per_image_fwd = backbone_fwd * head_factor
    # mutual step: student fwd+bwd (3x fwd cost) on 2*batch labeled views +
    # batch unlabeled strong; teacher fwd on batch unlabeled
    student_images = 3 * batch
    teacher_images = batch
    return per_image_fwd * (3.0 * student_images + 1.0 * teacher_images)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--canvas", type=int, nargs=2, default=(768, 1344))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="tools/flops_mutual.json")
    args = ap.parse_args()
    _force_cpu()

    out = {
        "canvas": list(args.canvas),
        "batch_label": args.batch,
        "batch_unlabel": args.batch,
        "note": (
            "flops of ONE mutual step from lowered-HLO cost_analysis "
            "(pre-optimization, 2*MAC convention); analytic = coarse "
            "published-R50 scaling cross-check (tools/mfu.py)"
        ),
    }
    for fam, rcnn in (("fcos", False), ("rcnn", True)):
        flops = counted_flops(rcnn, args.canvas, args.batch)
        est = analytic_estimate(args.canvas, args.batch, rcnn)
        out[fam] = {
            "flops_per_step": flops,
            "analytic_estimate": est,
            "counted_over_analytic": round(flops / est, 3),
        }
        print(
            f"{fam}: counted {flops/1e12:.2f} TFLOP/step, "
            f"analytic ~{est/1e12:.2f}, ratio {flops/est:.2f}"
        )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
