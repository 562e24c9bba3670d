"""Region Proposal Network: head, anchor labeling, losses, proposal selection.

TPU-native rewrite of PseudoLabRPN (reference:
ubteacher/modeling/proposal_generator/rpn.py:15-225) + the D2 RPN machinery
it inherits. Fixed-shape redesign:
  * anchors are a compile-time constant per canvas (modeling/anchors.py);
  * labeling/sampling is masked + random-priority top-k (modeling/matcher.py)
    instead of host-side nonzero/permutation;
  * proposal selection emits padded (B, POST_NMS_TOPK) boxes + mask;
  * the pseudo branch's confidence-weighted objectness BCE
    (reference: rpn.py:205-212) is a weight array, never a gather.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import losses as L
from ..ops.boxes import clip_boxes
from ..ops.nms import nms_keep
from .box_regression import Box2BoxTransform
from .matcher import match, match_quality, random_priority_topk


class _Conv1x1Params(nn.Module):
    """Declares a 1x1 conv's kernel/bias without applying it — same
    names/shapes/inits as the nn.Conv it replaces, so converted reference
    checkpoints (checkpoint/torch_weights.py) load unchanged."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel", nn.initializers.normal(0.01),
            (1, 1, cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class RPNHead(nn.Module):
    """Shared 3x3 conv + 1x1 objectness / deltas (D2 StandardRPNHead).

    The two 1x1 heads are applied as ONE fused matmul over a concatenated
    (conv_dim, A + A*4) kernel, then split: both are badly output-lane-
    starved (3 and 12 of 128 lanes), so their cost is reading the
    (B, H, W, 256) tower activation — fused, it is read once instead of
    twice in the forward AND once instead of twice in each of the weight-
    gradient and input-gradient passes (profiled ~5 ms/step at 768x1344
    batch 8+8). Column-blocked matmuls are exact, so logits/deltas are
    bitwise what the separate convs produce; the parameter tree is
    unchanged (_Conv1x1Params)."""

    num_anchors: int = 3
    conv_dim: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        conv = nn.Conv(
            self.conv_dim, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
            name="conv",
        )
        a = self.num_anchors
        k_obj, b_obj = _Conv1x1Params(a, name="objectness_logits")(
            self.conv_dim
        )
        k_del, b_del = _Conv1x1Params(a * 4, name="anchor_deltas")(
            self.conv_dim
        )
        k_all = jnp.concatenate(
            [k_obj.reshape(self.conv_dim, a), k_del.reshape(self.conv_dim, a * 4)],
            axis=-1,
        ).astype(self.dtype)                                  # (C, A + A*4)
        b_all = jnp.concatenate([b_obj, b_del]).astype(self.dtype)
        logits, out_deltas = [], []
        for f in features:
            t = nn.relu(conv(f))
            b = f.shape[0]
            y = (
                jax.lax.dot_general(
                    t.astype(self.dtype), k_all, (((3,), (0,)), ((), ()))
                )
                + b_all
            ).astype(jnp.float32)                             # (B, H, W, 5A)
            # (B, H, W, A) -> (B, H*W, A) and (B, H, W, A*4) -> (B, H*W, A, 4):
            # ONLY major dims are merged, the tiny cell-anchor dim stays
            # minor. Flattening A into the row dim would be a lane->sublane
            # relayout of a 3-channel (lane-padded 43x) buffer — profiled as
            # ~27 ms/step of pure layout copies at 768x1344 batch 4+4.
            # Anchor order stays grid-major with cell anchor innermost.
            logits.append(y[..., :a].reshape(b, -1, a))
            out_deltas.append(y[..., a:].reshape(b, -1, a, 4))
        return logits, out_deltas


def anchor_validity(
    cell_origins: jnp.ndarray, hw: jnp.ndarray
) -> jnp.ndarray:
    """(A,) bool — anchors whose feature-map cell overlaps the true image.

    On the fixed canvas, anchors beyond an image's extent don't exist in
    the reference (it pads only to divisibility); without this mask the
    canvas padding would be sampled as RPN background and could emit
    proposals. A cell at origin o with stride s covers [o, o+s); valid iff
    o < dim.
    """
    return (cell_origins[:, 0] < hw[1]) & (cell_origins[:, 1] < hw[0])


def label_anchors(
    anchors: jnp.ndarray,          # (A, 4)
    gt,                            # PaddedInstances, unbatched (M, ...)
    batch_size_per_image: int,
    positive_fraction: float,
    rng: jnp.ndarray,
    use_confidence: bool,
    anchor_valid: jnp.ndarray | None = None,  # (A,) bool
    matched: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> Dict[str, jnp.ndarray]:
    """Match + subsample for one image (reference: rpn.py:78-150),
    sample-first: only the <= batch_size_per_image training anchors are
    materialized. The losses never touch full-(A,) tensors, so the
    matched-gt gather is K rows instead of A (A ~ 258k at 768x1344; the
    full-width form cost ~40 ms/step of gathers + argsorts on v5e).

    Returns (K = num_pos_desired + batch_size_per_image rows, of which
    exactly min(batch_size_per_image, available) carry ok=True):
      idx (K,) anchor indices; labels (K,) {1 pos, 0 neg}; ok (K,) sample
      validity; boxes (K, 4) matched gt; confid (K,) teacher scores (ones
      when not use_confidence).

    `matched` optionally supplies precomputed (matched_idxs, labels) —
    e.g. from the batched Pallas matcher (matcher.match_anchors_batched);
    otherwise the XLA matcher runs here.
    """
    if matched is None:
        quality = match_quality(gt.boxes, gt.mask, anchors)  # (M, A)
        matched_idxs, labels = match(
            quality, thresholds=(0.3, 0.7), labels=(0, -1, 1),
            allow_low_quality=True,
        )
    else:
        matched_idxs, labels = matched
    # D2 subsample_labels semantics: up to pf*N random positives, negatives
    # fill the remaining slots. Random-priority top-k keeps it fixed-shape.
    kp, kn = jax.random.split(rng)
    num_pos_desired = int(batch_size_per_image * positive_fraction)
    pos_cand = labels == 1
    neg_cand = labels == 0
    if anchor_valid is not None:
        pos_cand = pos_cand & anchor_valid
        neg_cand = neg_cand & anchor_valid
    pos_idx, pos_ok = random_priority_topk(pos_cand, num_pos_desired, kp)
    n_pos = pos_ok.sum()
    neg_idx, neg_avail = random_priority_topk(
        neg_cand, batch_size_per_image, kn
    )
    neg_ok = (
        jnp.arange(neg_idx.shape[0]) < batch_size_per_image - n_pos
    ) & neg_avail

    idx = jnp.concatenate([pos_idx, neg_idx])
    sel_labels = jnp.concatenate(
        [jnp.ones_like(pos_idx), jnp.zeros_like(neg_idx)]
    )
    ok = jnp.concatenate([pos_ok, neg_ok])
    # images with no (valid) gt have quality == -1 everywhere -> no
    # positives can be sampled; the set is all-background automatically
    any_gt = gt.mask.any()
    mi = matched_idxs[idx]
    boxes = jnp.where(any_gt, gt.boxes[mi], 0.0)
    # use_confidence may be a traced per-image bool (the fused mutual step
    # mixes labeled rows, which must NOT be confidence-weighted — the
    # reference weights only pseudo branches and zeroes the loss of
    # no-gt pseudo images, rpn.py:135-143 — with pseudo rows, which must)
    confid = jnp.where(
        use_confidence,
        jnp.where(any_gt, gt.scores[mi], 0.0),
        jnp.ones(idx.shape, jnp.float32),
    )
    return {
        "idx": idx, "labels": sel_labels, "ok": ok,
        "boxes": boxes, "confid": confid,
    }


def rpn_losses(
    anchors: jnp.ndarray,              # (A_total, 4)
    pred_logits: jnp.ndarray,          # (B, L, A_cell)
    pred_deltas: jnp.ndarray,          # (B, L, A_cell, 4)
    sampled: Dict[str, jnp.ndarray],   # batched label_anchors output (B, K, ...)
    box2box: Box2BoxTransform,
    batch_size_per_image: int,
    smooth_l1_beta: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    """Reference: rpn.py:153-225 (sum BCE + smooth-l1 over sampled anchors,
    normalized by batch_size_per_image * num_images).

    Predictions are gathered at the K sampled anchors — row gather + a
    one-hot lane select, so the (L, A_cell) layout never flattens (see
    RPNHead). The row gather uses take_rows: XLA's forward gather is
    fine, but its transpose is a scatter-add into the f32
    (B, L, A_cell, 4) grid which lowers to a serial while-loop plus
    layout copies on TPU (~7 ms/step at 768x1344); take_rows swaps that
    backward for a Pallas row-scatter kernel."""
    from ..ops.pallas.row_gather_pallas import take_rows

    num_images, l, a_cell = pred_logits.shape
    idx = sampled["idx"]                                       # (B, K) flat
    pos = (sampled["labels"] == 1) & sampled["ok"]
    valid = sampled["ok"]

    rows = idx // a_cell                                       # (B, K)
    lane_onehot = jax.nn.one_hot(
        idx % a_cell, a_cell, dtype=pred_logits.dtype
    )                                                          # (B, K, A)
    logits_rows = take_rows(pred_logits, rows)                 # (B, K, A)
    logits_s = (logits_rows * lane_onehot).sum(-1)             # (B, K)
    deltas_rows = take_rows(
        pred_deltas.reshape(num_images, l, a_cell * 4), rows
    ).reshape(num_images, -1, a_cell, 4)                       # (B, K, A, 4)
    deltas_s = (deltas_rows * lane_onehot[..., None]).sum(-2)  # (B, K, 4)
    anchors_s = anchors[idx]                                   # (B, K, 4)

    target_deltas = box2box.get_deltas(anchors_s, sampled["boxes"])
    loc = L.smooth_l1(deltas_s, target_deltas, smooth_l1_beta).sum(-1)
    localization_loss = (loc * pos).sum()

    obj = L.bce_with_logits(logits_s, pos.astype(jnp.float32))
    obj = obj * sampled["confid"]
    objectness_loss = (obj * valid).sum()

    normalizer = batch_size_per_image * num_images
    return {
        "loss_rpn_cls": objectness_loss / normalizer,
        "loss_rpn_loc": localization_loss / normalizer,
    }


def find_top_proposals(
    anchors: jnp.ndarray,              # (A_total, 4)
    level_lengths: Sequence[int],      # anchors per level (loc * A_cell)
    level_ids: jnp.ndarray,            # (A_total,)
    pred_logits: jnp.ndarray,          # (B, L, A_cell)
    pred_deltas: jnp.ndarray,          # (B, L, A_cell, 4)
    image_hw: jnp.ndarray,             # (B, 2)
    box2box: Box2BoxTransform,
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_thresh: float,
    total_candidates: int = 2000,
    cell_origins: jnp.ndarray | None = None,  # (A_total, 2)
    min_size: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """D2 find_top_rpn_proposals, fixed shape: per-level top-k by
    objectness, decode, clip, PER-LEVEL NMS, global post-NMS top-k. When
    cell_origins is given, anchors beyond each image's true extent are
    excluded (see anchor_validity). Returns (boxes (B,P,4), scores (B,P),
    mask).

    The reference's batched_nms over the concatenated levels (level id as
    NMS class) never suppresses across levels, so it decomposes EXACTLY
    into one independent NMS per level over that level's own
    min(pre_nms_topk, ln) candidates. That is how it runs here: levels are
    stacked into a (num_levels, K_max) pool (short levels padded invalid —
    the NMS kernel's valid-count gating skips padded tail blocks) and a
    single vmapped NMS covers them, replacing the old globally-capped
    merged pool whose truncation at `total_candidates` could differ from
    the reference in dense scenes. `total_candidates` now bounds the
    per-level pool (cost knob; at >= pre_nms_topk the selection is
    reference-exact; D2 semantics: proposal_utils.py find_top_rpn_proposals).

    Logits/deltas keep the cell-anchor dim minor (see RPNHead). The
    per-level top-k is two-stage and exact: any anchor in a level's top-k
    implies its LOCATION is in the top-k locations by per-location max, so
    `top-k locations -> top-k anchors` selects the same set while all
    full-width ops stay in the (L, A_cell) layout (no lane relayouts)."""

    a_cell = pred_logits.shape[-1]
    # anchors at one location share a feature-map cell
    loc_origins = None if cell_origins is None else cell_origins[::a_cell]
    per_level_cap = max(total_candidates, 1)
    k_max = max(
        min(pre_nms_topk, per_level_cap, ln) for ln in level_lengths
    )

    def per_image(logits, deltas, hw):
        if loc_origins is not None:
            loc_valid = anchor_validity(loc_origins, hw)  # (L,)
            logits = jnp.where(loc_valid[:, None], logits, -jnp.inf)
        sel_scores, sel_boxes = [], []
        loc_offset = 0
        for lvl, ln in enumerate(level_lengths):
            nloc = ln // a_cell
            k = min(pre_nms_topk, per_level_cap, ln)
            lvl_scores = jax.lax.dynamic_slice_in_dim(
                logits, loc_offset, nloc
            )                                              # (nloc, A)
            k_loc = min(k, nloc)
            loc_best = lvl_scores.max(-1)                  # (nloc,)
            _, loc_sel = jax.lax.top_k(loc_best, k_loc)    # (k_loc,)
            flat = lvl_scores[loc_sel].reshape(-1)         # (k_loc*A,) small
            top, idx = jax.lax.top_k(flat, k)
            # absolute location row + cell lane of each selected anchor;
            # deltas are gathered ONCE from the full (L, A, 4) tensor at
            # (row, lane) — the former two-stage gather ([loc_sel] then
            # [idx] over the flattened (k_loc*A, 4) intermediate) moved
            # 3x the rows and profiled ~5 ms/step of gather fusions at
            # batch 8+8 (gathers on v5e pay per row, not per byte)
            row_abs = loc_sel[idx // a_cell] + loc_offset  # (k,)
            lane = idx % a_cell
            aidx = row_abs * a_cell + lane
            lvl_deltas = deltas[row_abs, lane]             # (k, 4)
            boxes = box2box.apply_deltas(lvl_deltas, anchors[aidx])
            boxes = clip_boxes(boxes, hw[0], hw[1])
            pad = k_max - k
            sel_scores.append(jnp.pad(top, (0, pad), constant_values=-jnp.inf))
            sel_boxes.append(jnp.pad(boxes, ((0, pad), (0, 0))))
            loc_offset += nloc
        scores = jnp.stack(sel_scores)                     # (NL, K_max)
        boxes = jnp.stack(sel_boxes)                       # (NL, K_max, 4)
        # D2 drops degenerate boxes after clipping (nonempty(min_box_size),
        # proposal_utils.py) — PROPOSAL_GENERATOR.MIN_SIZE, strict >
        nonempty = (
            (boxes[..., 2] - boxes[..., 0] > min_size)
            & (boxes[..., 3] - boxes[..., 1] > min_size)
        )
        scores = jnp.where(nonempty, scores, -jnp.inf)
        valid = jnp.isfinite(scores)
        keep = jax.vmap(nms_keep, in_axes=(0, 0, 0, None))(
            boxes, scores, valid, nms_thresh
        )                                                  # (NL, K_max)
        scores = jnp.where(keep, scores, -jnp.inf).reshape(-1)
        boxes = boxes.reshape(-1, 4)
        k_post = min(post_nms_topk, scores.shape[0])
        top2, idx2 = jax.lax.top_k(scores, k_post)
        mask = jnp.isfinite(top2)
        return boxes[idx2], jnp.where(mask, top2, 0.0), mask

    return jax.vmap(per_image)(pred_logits, pred_deltas, image_hw)
