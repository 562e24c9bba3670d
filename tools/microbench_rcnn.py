"""Microbenchmark the non-conv RCNN step components on the current backend.

Times each stage of the RPN/ROI machinery in isolation (matcher+sampling,
proposal selection, ROIAlign fwd / fwd+bwd, NMS) at the 4+4 768x1344 train
shapes, so perf work can target the real hog instead of the profile's
fused-op soup. Each stage runs K iterations chained through a carry inside
one jit (honest device time — the axon runtime returns early from
block_until_ready, so only the final device_get syncs); reported number is
the min over trials (the pooled chip has large contention variance).

Usage: python tools/microbench_rcnn.py [--batch 4] [--iters 10] [--trials 4]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters: int, trials: int) -> float:
    """Min wall ms per iteration of fn chained iters times inside jit."""

    @jax.jit
    def loop(*a):
        def body(_, carry):
            out = fn(*a, carry)
            return out

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    loop(*args).block_until_ready()
    jax.device_get(loop(*args))  # warm compile + honest sync
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.device_get(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--canvas", type=int, nargs=2, default=(768, 1344))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()

    from ubteacher_tpu.modeling.anchors import generate_anchors
    from ubteacher_tpu.modeling.box_regression import Box2BoxTransform
    from ubteacher_tpu.modeling.matcher import match, match_quality
    from ubteacher_tpu.modeling.rpn import (
        anchor_validity, find_top_proposals, label_anchors,
    )
    from ubteacher_tpu.ops.nms import batched_nms_keep
    from ubteacher_tpu.ops.roi_align import multilevel_roi_align
    from ubteacher_tpu.structures import PaddedInstances

    h, w = args.canvas
    # student processes labeled + unlabeled-strong in one fused forward
    b = 2 * args.batch
    m = 100
    rng = np.random.default_rng(0)

    anch = generate_anchors(
        (h, w), (4, 8, 16, 32, 64),
        [[32], [64], [128], [256], [512]], [[0.5, 1.0, 2.0]],
    )
    anchors = anch["anchors"]
    a_total = anchors.shape[0]
    a_cell = 3
    nloc = a_total // a_cell
    print(f"batch {b} (fused student), anchors {a_total}, canvas {h}x{w}")

    gt_boxes = np.zeros((b, m, 4), np.float32)
    nb = 12
    gt_boxes[:, :nb, 0] = rng.uniform(0, w - 200, (b, nb))
    gt_boxes[:, :nb, 1] = rng.uniform(0, h - 200, (b, nb))
    gt_boxes[:, :nb, 2] = gt_boxes[:, :nb, 0] + rng.uniform(20, 200, (b, nb))
    gt_boxes[:, :nb, 3] = gt_boxes[:, :nb, 1] + rng.uniform(20, 200, (b, nb))
    mask = np.zeros((b, m), bool)
    mask[:, :nb] = True
    gt = PaddedInstances(
        jnp.asarray(gt_boxes),
        jnp.zeros((b, m), jnp.int32),
        jnp.ones((b, m), jnp.float32),
        jnp.zeros((b, m, 4), jnp.float32),
        jnp.asarray(mask),
    )
    hw = jnp.tile(jnp.asarray([[h, w]], jnp.float32), (b, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    box2box = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))

    # ---- matcher + sampling (label_anchors, vmapped) ----
    def run_label(gt_, keys_, hw_, carry):
        g = gt_.replace(boxes=gt_.boxes + carry * 1e-30)
        out = jax.vmap(
            lambda gg, k, one_hw: label_anchors(
                anchors, gg, 256, 0.5, k, False,
                anchor_valid=anchor_validity(anch["cell_origins"], one_hw),
            )
        )(g, keys_, hw_)
        return carry + out["boxes"].sum() * 1e-30

    ms = timed(run_label, gt, keys, hw, iters=args.iters, trials=args.trials)
    print(f"label_anchors (matcher+sample)  {ms:8.2f} ms")

    # ---- matcher only (match_quality + match, vmapped) ----
    def run_match(gt_, carry):
        g = gt_.boxes + carry * 1e-30

        def one(gb, gm):
            q = match_quality(gb, gm, anchors)
            mi, lb = match(q, (0.3, 0.7), (0, -1, 1), allow_low_quality=True)
            return mi.sum() + lb.sum()

        s = jax.vmap(one)(g, gt.mask)
        return carry + s.sum().astype(jnp.float32) * 1e-30

    ms = timed(run_match, gt, iters=args.iters, trials=args.trials)
    print(f"  match_quality+match only      {ms:8.2f} ms")

    # ---- matcher via backend dispatch (Pallas kernel on TPU) ----
    from ubteacher_tpu.modeling.matcher import match_anchors_batched

    def run_match_fast(gt_, carry):
        mi, lb = match_anchors_batched(
            anchors, gt_.boxes + carry * 1e-30, gt_.mask
        )
        return carry + (mi.sum() + lb.sum()).astype(jnp.float32) * 1e-30

    ms = timed(run_match_fast, gt, iters=args.iters, trials=args.trials)
    print(f"  match_anchors_batched (auto)  {ms:8.2f} ms")

    # ---- proposal selection ----
    logits = jnp.asarray(
        rng.normal(0, 1, (b, nloc, a_cell)).astype(np.float32)
    )
    deltas = jnp.asarray(
        rng.normal(0, 0.1, (b, nloc, a_cell, 4)).astype(np.float32)
    )

    def run_props(lg, dl, carry):
        boxes, scores, mask_ = find_top_proposals(
            anchors, anch["level_lengths"], anch["level_ids"],
            lg + carry * 1e-30, dl, hw, box2box,
            12000, 2000, 0.7, total_candidates=2000,
            cell_origins=anch["cell_origins"],
        )
        return carry + scores.sum() * 1e-30

    ms = timed(run_props, logits, deltas, iters=args.iters, trials=args.trials)
    print(f"find_top_proposals              {ms:8.2f} ms")

    # ---- ROIAlign ----
    shapes = [(b, h // s, w // s, 256) for s in (4, 8, 16, 32)]
    pyramid = {
        f"p{i+2}": jnp.asarray(
            rng.normal(0, 1, sh).astype(np.float32), jnp.bfloat16
        )
        for i, sh in enumerate(shapes)
    }
    r = 512
    rois = np.zeros((b, r, 4), np.float32)
    rois[..., 0] = rng.uniform(0, w - 64, (b, r))
    rois[..., 1] = rng.uniform(0, h - 64, (b, r))
    rois[..., 2] = rois[..., 0] + rng.uniform(8, 300, (b, r))
    rois[..., 3] = rois[..., 1] + rng.uniform(8, 300, (b, r))
    rois = jnp.asarray(rois)

    def run_pool(pyr, bx, carry):
        out = multilevel_roi_align(
            pyr, bx + carry * 1e-30, ("p2", "p3", "p4", "p5"), 7, 0
        )
        return carry + out.sum().astype(jnp.float32) * 1e-30

    ms = timed(run_pool, pyramid, rois, iters=args.iters, trials=args.trials)
    print(f"roi_align fwd ({b}x{r} rois)      {ms:8.2f} ms")

    def run_pool_grad(pyr, bx, carry):
        def loss(p):
            out = multilevel_roi_align(
                p, bx + carry * 1e-30, ("p2", "p3", "p4", "p5"), 7, 0
            )
            return out.sum().astype(jnp.float32)

        g = jax.grad(loss)(pyr)
        return carry + g["p2"].sum().astype(jnp.float32) * 1e-30

    ms = timed(
        run_pool_grad, pyramid, rois, iters=args.iters, trials=args.trials
    )
    print(f"roi_align fwd+bwd               {ms:8.2f} ms")

    # ---- NMS over the proposal candidates ----
    cboxes = np.zeros((b, 2000, 4), np.float32)
    cboxes[..., 0] = rng.uniform(0, w - 64, (b, 2000))
    cboxes[..., 1] = rng.uniform(0, h - 64, (b, 2000))
    cboxes[..., 2] = cboxes[..., 0] + rng.uniform(8, 300, (b, 2000))
    cboxes[..., 3] = cboxes[..., 1] + rng.uniform(8, 300, (b, 2000))
    cboxes = jnp.asarray(cboxes)
    cscores = jnp.asarray(rng.uniform(0, 1, (b, 2000)).astype(np.float32))
    clvls = jnp.zeros((b, 2000), jnp.int32)
    cvalid = jnp.ones((b, 2000), bool)

    def run_nms(bx, sc, carry):
        keep = jax.vmap(
            lambda b_, s_, l_, v_: batched_nms_keep(b_, s_, l_, v_, 0.7)
        )(bx + carry * 1e-30, sc, clvls, cvalid)
        return carry + keep.sum().astype(jnp.float32) * 1e-30

    ms = timed(run_nms, cboxes, cscores, iters=args.iters, trials=args.trials)
    print(f"batched_nms_keep (2000 cand)    {ms:8.2f} ms")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    main()
