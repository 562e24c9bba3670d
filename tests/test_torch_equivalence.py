"""Numerical equivalence vs torch: a functional plain-torch interpreter of
the reference's module graph (D2 ResNet stride-in-1x1 + FrozenBN, FPN with
p6p7, ubteacher FCOSHead) runs the SAME synthetic reference-format state
dict that our converter maps into the flax model. Outputs must agree to
float32 conv tolerance — this validates converter correctness AND model
arithmetic (paddings, strides, GN, scales) end-to-end, the core of mAP
parity (reference modules: backbone/fpn.py:11-78, fcos/fcos.py:220-377).

The torch graph here is written from the documented semantics, not copied:
it is a ~60-line functional interpreter, not a module tree.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from test_full_checkpoint_convert import _synthetic_reference_state
from ubteacher_tpu.checkpoint.torch_weights import convert_ubt_fcos_model
from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.modeling.fcos_head import build_one_stage_detector
from ubteacher_tpu.modeling.resnet import RESNET_STAGES

_CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "FCOS", "coco-standard",
    "fcos_R_50_ut2_sup1_run0.yaml",
)


def _randomize_bn(sd, rng):
    """Give FrozenBN nontrivial folded statistics."""
    for k in list(sd):
        if k.endswith(".running_mean"):
            base = k[: -len(".running_mean")]
            c = sd[k].shape[0]
            sd[base + ".weight"] = rng.normal(1.0, 0.1, c).astype(np.float32)
            sd[base + ".bias"] = rng.normal(0.0, 0.1, c).astype(np.float32)
            sd[k] = rng.normal(0.0, 0.3, c).astype(np.float32)
            sd[base + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(
                np.float32
            )


def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k]))


def _bn(x, sd, base, eps=1e-5):
    scale = _t(sd, base + ".weight") / (_t(sd, base + ".running_var") + eps).sqrt()
    bias = _t(sd, base + ".bias") - _t(sd, base + ".running_mean") * scale
    return x * scale[None, :, None, None] + bias[None, :, None, None]


def _conv(x, sd, base, stride=1, padding=0):
    bias = _t(sd, base + ".bias") if base + ".bias" in sd else None
    return F.conv2d(x, _t(sd, base + ".weight"), bias, stride, padding)


def _torch_backbone(x, sd, depth):
    bu = "backbone.bottom_up."
    x = F.relu(_bn(_conv(x, sd, bu + "stem.conv1", 2, 3), sd, bu + "stem.conv1.norm"))
    x = F.max_pool2d(x, 3, 2, 1)
    outs = {}
    for si, n in enumerate(RESNET_STAGES[depth]):
        s = si + 2
        for b in range(n):
            base = f"{bu}res{s}.{b}"
            stride = 2 if (b == 0 and si > 0) else 1
            # caffe stride-in-1x1: stride on conv1
            out = F.relu(_bn(_conv(x, sd, base + ".conv1", stride), sd, base + ".conv1.norm"))
            out = F.relu(_bn(_conv(out, sd, base + ".conv2", 1, 1), sd, base + ".conv2.norm"))
            out = _bn(_conv(out, sd, base + ".conv3"), sd, base + ".conv3.norm")
            if base + ".shortcut.weight" in sd:
                sc = _bn(_conv(x, sd, base + ".shortcut", stride), sd, base + ".shortcut.norm")
            else:
                sc = x
            x = F.relu(out + sc)
        outs[f"res{s}"] = x
    return outs


def _torch_fpn(feats, sd):
    stages = [3, 4, 5]
    laterals = [
        _conv(feats[f"res{s}"], sd, f"backbone.fpn_lateral{s}") for s in stages
    ]
    results = [None] * 3
    prev = laterals[-1]
    results[-1] = prev
    for i in (1, 0):
        prev = laterals[i] + F.interpolate(prev, scale_factor=2, mode="nearest")
        results[i] = prev
    outs = {
        f"p{s}": _conv(results[i], sd, f"backbone.fpn_output{s}", 1, 1)
        for i, s in enumerate(stages)
    }
    outs["p6"] = _conv(outs["p5"], sd, "backbone.top_block.p6", 2, 1)
    outs["p7"] = _conv(F.relu(outs["p6"]), sd, "backbone.top_block.p7", 2, 1)
    return outs


def _torch_fcos_head(pyramid, sd, reg_discrete=True):
    hp = "proposal_generator.fcos_head."
    logits_all, reg_all, ctr_all, std_all = [], [], [], []
    for lvl, name in enumerate(("p3", "p4", "p5", "p6", "p7")):
        x = pyramid[name]
        ct, bt = x, x
        for i in range(4):
            ct = _conv(ct, sd, f"{hp}cls_tower.{3 * i}", 1, 1)
            ct = F.group_norm(
                ct, 32, _t(sd, f"{hp}cls_tower.{3 * i + 1}.weight"),
                _t(sd, f"{hp}cls_tower.{3 * i + 1}.bias"), 1e-5,
            )
            ct = F.relu(ct)
            bt = _conv(bt, sd, f"{hp}bbox_tower.{3 * i}", 1, 1)
            bt = F.group_norm(
                bt, 32, _t(sd, f"{hp}bbox_tower.{3 * i + 1}.weight"),
                _t(sd, f"{hp}bbox_tower.{3 * i + 1}.bias"), 1e-5,
            )
            bt = F.relu(bt)
        logits = _conv(ct, sd, f"{hp}cls_logits", 1, 1)
        reg = _conv(bt, sd, f"{hp}bbox_pred", 1, 1)
        reg = reg * float(np.asarray(sd[f"{hp}scales.{lvl}.scale"]).reshape(()))
        if not reg_discrete:
            reg = F.relu(reg)
        ctr = _conv(bt, sd, f"{hp}ctrness", 1, 1)
        std = _conv(bt, sd, f"{hp}bbox_pred_std", 1, 1)

        def flat(t):  # NCHW -> (B, H*W, C) like our head's NHWC reshape
            b, c, h, w = t.shape
            return t.permute(0, 2, 3, 1).reshape(b, h * w, c)

        logits_all.append(flat(logits))
        reg_all.append(flat(reg))
        ctr_all.append(flat(ctr)[..., 0])
        std_all.append(flat(std))
    return (
        torch.cat(logits_all, 1), torch.cat(reg_all, 1),
        torch.cat(ctr_all, 1), torch.cat(std_all, 1),
    )


def test_fcos_model_matches_torch_interpreter():
    depth = 18
    rng = np.random.default_rng(7)
    sd = _synthetic_reference_state(depth, 80, 4 * 17, rng)
    _randomize_bn(sd, rng)
    # nontrivial head biases too
    for k in list(sd):
        if k.endswith(".bias") and sd[k].ndim == 1 and not sd[k].any():
            sd[k] = rng.normal(0, 0.05, sd[k].shape).astype(np.float32)

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(_CFG_PATH)
    cfg.MODEL.RESNETS.DEPTH = depth
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_one_stage_detector(cfg)
    params = convert_ubt_fcos_model(sd, depth=depth)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float32), params
    )

    images = rng.normal(110, 40, size=(2, 128, 128, 3)).clip(0, 255).astype(
        np.float32
    )
    dense = jax.device_get(model.apply({"params": params}, jnp.asarray(images)))

    # torch path: same normalization, NCHW
    mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
    x = torch.from_numpy(
        ((images - mean) / std).transpose(0, 3, 1, 2)
    ).contiguous()
    with torch.no_grad():
        feats = _torch_backbone(x, sd, depth)
        pyramid = _torch_fpn(feats, sd)
        t_logits, t_reg, t_ctr, t_std = _torch_fcos_head(pyramid, sd)

    np.testing.assert_allclose(
        dense.logits, t_logits.numpy(), rtol=1e-3, atol=5e-3
    )
    np.testing.assert_allclose(dense.reg, t_reg.numpy(), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(
        dense.ctrness, t_ctr.numpy(), rtol=1e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        dense.reg_std, t_std.numpy(), rtol=1e-3, atol=5e-3
    )


def test_rcnn_heads_match_torch_interpreter():
    """RPN head + box head fc1/fc2 + BoundaryVar predictor vs torch, through
    the converter (ROIAlign itself has a documented sampling deviation, so
    heads are fed identical features/pooled tensors directly)."""
    from test_full_checkpoint_convert import _synthetic_rcnn_reference_state
    from ubteacher_tpu.checkpoint.torch_weights import convert_ubt_rcnn_model
    from ubteacher_tpu.modeling.fast_rcnn import (
        BoundaryVarOutputLayers,
        FastRCNNConvFCHead,
    )
    from ubteacher_tpu.modeling.rpn import RPNHead

    rng = np.random.default_rng(11)
    sd = _synthetic_rcnn_reference_state(18, 80, rng)
    for k in list(sd):
        if k.endswith(".bias") and sd[k].ndim == 1 and not sd[k].any():
            sd[k] = rng.normal(0, 0.05, sd[k].shape).astype(np.float32)
    conv = convert_ubt_rcnn_model(sd, depth=18)

    # --- RPN head on one feature level
    feat = rng.normal(0, 1, size=(2, 16, 16, 256)).astype(np.float32)
    rpn = RPNHead(num_anchors=3, dtype=jnp.float32)
    logits, deltas = rpn.apply(
        {"params": jax.tree.map(jnp.asarray, conv["rpn_head"])},
        [jnp.asarray(feat)],
    )
    x = torch.from_numpy(feat.transpose(0, 3, 1, 2)).contiguous()
    rp = "proposal_generator.rpn_head."
    with torch.no_grad():
        t = F.relu(_conv(x, sd, rp + "conv", 1, 1))
        t_logits = _conv(t, sd, rp + "objectness_logits")
        t_deltas = _conv(t, sd, rp + "anchor_deltas")
    # our layout: (B, H*W, A) / (B, H*W, A, 4); torch: (B, A, H, W)
    b, a, h, w = t_logits.shape
    t_logits_flat = t_logits.permute(0, 2, 3, 1).reshape(b, -1, a)
    np.testing.assert_allclose(
        logits[0], t_logits_flat.numpy(), rtol=1e-4, atol=1e-4
    )
    t_deltas_flat = (
        t_deltas.reshape(b, a, 4, h, w).permute(0, 3, 4, 1, 2).reshape(b, -1, a, 4)
    )
    np.testing.assert_allclose(
        deltas[0], t_deltas_flat.numpy(), rtol=1e-4, atol=1e-4
    )

    # --- box head + predictor on pooled ROI features
    pooled = rng.normal(0, 1, size=(2, 5, 7, 7, 256)).astype(np.float32)
    head = FastRCNNConvFCHead(dtype=jnp.float32)
    hidden = head.apply(
        {"params": jax.tree.map(jnp.asarray, conv["box_head"])},
        jnp.asarray(pooled),
    )
    pred = BoundaryVarOutputLayers(
        num_classes=80, cls_agnostic=True, dtype=jnp.float32
    )
    scores, bdeltas, bstd = pred.apply(
        {"params": jax.tree.map(jnp.asarray, conv["box_predictor"])}, hidden
    )
    tp = torch.from_numpy(
        pooled.transpose(0, 1, 4, 2, 3).reshape(10, -1)
    ).contiguous()
    bh = "roi_heads.box_head."
    bp = "roi_heads.box_predictor."
    with torch.no_grad():
        th = F.relu(F.linear(tp, _t(sd, bh + "fc1.weight"), _t(sd, bh + "fc1.bias")))
        th = F.relu(F.linear(th, _t(sd, bh + "fc2.weight"), _t(sd, bh + "fc2.bias")))
        t_scores = F.linear(th, _t(sd, bp + "cls_score.weight"), _t(sd, bp + "cls_score.bias"))
        t_bdeltas = F.linear(th, _t(sd, bp + "bbox_pred.weight"), _t(sd, bp + "bbox_pred.bias"))
        t_bstd = F.linear(th, _t(sd, bp + "bbox_pred_std.weight"), _t(sd, bp + "bbox_pred_std.bias"))
    np.testing.assert_allclose(
        np.asarray(scores).reshape(10, -1), t_scores.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(bdeltas).reshape(10, -1), t_bdeltas.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(bstd).reshape(10, -1), t_bstd.numpy(), rtol=1e-4, atol=1e-4
    )
