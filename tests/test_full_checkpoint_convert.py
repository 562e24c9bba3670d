"""Full-model converter: synthetic reference-format FCOS state dict -> our
OneStageDetector tree, validated by running the converted model."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.checkpoint.torch_weights import convert_ubt_fcos_model
from ubteacher_tpu.config import add_ubteacher_config, get_cfg
from ubteacher_tpu.modeling.fcos_head import build_one_stage_detector
from ubteacher_tpu.modeling.resnet import RESNET_STAGES

_CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "FCOS", "coco-standard",
    "fcos_R_50_ut2_sup1_run0.yaml",
)


def _synthetic_reference_state(depth, num_classes, reg_dim, rng):
    """State dict with the REFERENCE's module names (d2 ResNet+FPN under
    `backbone.`, ubteacher FCOSHead under `proposal_generator.fcos_head.`)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.03
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def frozen_bn(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)
        sd[f"{name}.running_mean"] = np.zeros((c,), np.float32)
        sd[f"{name}.running_var"] = np.ones((c,), np.float32)

    bu = "backbone.bottom_up."
    sd[f"{bu}stem.conv1.weight"] = rng.normal(size=(64, 3, 7, 7)).astype(np.float32) * 0.03
    frozen_bn(f"{bu}stem.conv1.norm", 64)
    in_ch, out_ch = 64, 256
    for si, n in enumerate(RESNET_STAGES[depth]):
        s = si + 2
        bott = out_ch // 4
        for b in range(n):
            ic = in_ch if b == 0 else out_ch
            sd[f"{bu}res{s}.{b}.conv1.weight"] = rng.normal(size=(bott, ic, 1, 1)).astype(np.float32) * 0.03
            frozen_bn(f"{bu}res{s}.{b}.conv1.norm", bott)
            sd[f"{bu}res{s}.{b}.conv2.weight"] = rng.normal(size=(bott, bott, 3, 3)).astype(np.float32) * 0.03
            frozen_bn(f"{bu}res{s}.{b}.conv2.norm", bott)
            sd[f"{bu}res{s}.{b}.conv3.weight"] = rng.normal(size=(out_ch, bott, 1, 1)).astype(np.float32) * 0.03
            frozen_bn(f"{bu}res{s}.{b}.conv3.norm", out_ch)
            if b == 0:
                sd[f"{bu}res{s}.{b}.shortcut.weight"] = rng.normal(size=(out_ch, ic, 1, 1)).astype(np.float32) * 0.03
                frozen_bn(f"{bu}res{s}.{b}.shortcut.norm", out_ch)
        in_ch, out_ch = out_ch, out_ch * 2

    chans = {3: 512, 4: 1024, 5: 2048}
    for s in (3, 4, 5):
        conv(f"backbone.fpn_lateral{s}", 256, chans[s], 1)
        conv(f"backbone.fpn_output{s}", 256, 256, 3)
    conv("backbone.top_block.p6", 256, 256, 3)
    conv("backbone.top_block.p7", 256, 256, 3)

    hp = "proposal_generator.fcos_head."
    for tower, nconv in (("cls_tower", 4), ("bbox_tower", 4)):
        for i in range(nconv):
            conv(f"{hp}{tower}.{3 * i}", 256, 256, 3)
            sd[f"{hp}{tower}.{3 * i + 1}.weight"] = np.ones((256,), np.float32)
            sd[f"{hp}{tower}.{3 * i + 1}.bias"] = np.zeros((256,), np.float32)
    conv(f"{hp}cls_logits", num_classes, 256, 3)
    conv(f"{hp}bbox_pred", reg_dim, 256, 3)
    conv(f"{hp}bbox_pred_std", 4, 256, 3)
    conv(f"{hp}ctrness", 1, 256, 3)
    for lvl in range(5):
        sd[f"{hp}scales.{lvl}.scale"] = np.asarray([1.0 + 0.1 * lvl], np.float32)
    return sd


def test_full_fcos_checkpoint_roundtrip():
    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(_CFG_PATH)
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_one_stage_detector(cfg)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    rng = np.random.default_rng(0)
    sd = _synthetic_reference_state(18, 80, 4 * 17, rng)
    converted = convert_ubt_fcos_model(sd, depth=18)

    # shapes must line up exactly with the initialized tree
    flat_c = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    missing = set(map(str, flat_p)) - set(map(str, flat_c))
    assert not missing, f"converter missed params: {sorted(missing)[:8]}"
    for path, leaf in flat_c.items():
        assert str(path) in {str(p) for p in flat_p}, path
    for path, leaf in flat_p.items():
        got = flat_c[path]
        assert np.asarray(got).shape == leaf.shape, (path, np.asarray(got).shape, leaf.shape)

    merged = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float32),
                          converted)
    dense = model.apply({"params": merged}, x)
    assert np.isfinite(np.asarray(dense.logits)).all()
    # scales made it through in level order
    np.testing.assert_allclose(
        np.asarray(merged["head"]["scales"]), [1.0, 1.1, 1.2, 1.3, 1.4]
    )


def _synthetic_rcnn_reference_state(depth, num_classes, rng, cls_agnostic=True):
    """Reference-format TwoStagePseudoLabGeneralizedRCNN state dict: d2
    ResNet+FPN (maxpool top block -> no p6/p7 convs), StandardRPNHead,
    FastRCNNConvFCHead fc1/fc2, BoundaryVar predictor."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.03
        sd[f"{name}.bias"] = np.zeros((o,), np.float32)

    def linear(name, o, i):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.03
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.01

    def frozen_bn(name, c):
        sd[f"{name}.weight"] = np.ones((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)
        sd[f"{name}.running_mean"] = np.zeros((c,), np.float32)
        sd[f"{name}.running_var"] = np.ones((c,), np.float32)

    bu = "backbone.bottom_up."
    sd[f"{bu}stem.conv1.weight"] = rng.normal(size=(64, 3, 7, 7)).astype(np.float32) * 0.03
    frozen_bn(f"{bu}stem.conv1.norm", 64)
    in_ch, out_ch = 64, 256
    for si, n in enumerate(RESNET_STAGES[depth]):
        s = si + 2
        bott = out_ch // 4
        for b in range(n):
            ic = in_ch if b == 0 else out_ch
            sd[f"{bu}res{s}.{b}.conv1.weight"] = rng.normal(size=(bott, ic, 1, 1)).astype(np.float32) * 0.03
            frozen_bn(f"{bu}res{s}.{b}.conv1.norm", bott)
            sd[f"{bu}res{s}.{b}.conv2.weight"] = rng.normal(size=(bott, bott, 3, 3)).astype(np.float32) * 0.03
            frozen_bn(f"{bu}res{s}.{b}.conv2.norm", bott)
            sd[f"{bu}res{s}.{b}.conv3.weight"] = rng.normal(size=(out_ch, bott, 1, 1)).astype(np.float32) * 0.03
            frozen_bn(f"{bu}res{s}.{b}.conv3.norm", out_ch)
            if b == 0:
                sd[f"{bu}res{s}.{b}.shortcut.weight"] = rng.normal(size=(out_ch, ic, 1, 1)).astype(np.float32) * 0.03
                frozen_bn(f"{bu}res{s}.{b}.shortcut.norm", out_ch)
        in_ch, out_ch = out_ch, out_ch * 2

    chans = {2: 256, 3: 512, 4: 1024, 5: 2048}
    for s in (2, 3, 4, 5):  # RCNN FPN covers p2..p5 (maxpool p6: no params)
        conv(f"backbone.fpn_lateral{s}", 256, chans[s], 1)
        conv(f"backbone.fpn_output{s}", 256, 256, 3)

    rp = "proposal_generator.rpn_head."
    conv(f"{rp}conv", 256, 256, 3)
    conv(f"{rp}objectness_logits", 3, 256, 1)
    conv(f"{rp}anchor_deltas", 12, 256, 1)

    linear("roi_heads.box_head.fc1", 1024, 256 * 7 * 7)
    linear("roi_heads.box_head.fc2", 1024, 1024)
    linear("roi_heads.box_predictor.cls_score", num_classes + 1, 1024)
    reg_classes = 1 if cls_agnostic else num_classes
    linear("roi_heads.box_predictor.bbox_pred", reg_classes * 4, 1024)
    linear("roi_heads.box_predictor.bbox_pred_std", reg_classes * 4, 1024)
    return sd


def test_full_rcnn_checkpoint_roundtrip_and_coverage():
    from ubteacher_tpu.checkpoint.torch_weights import (
        TrackingStateDict,
        convert_ubt_rcnn_model,
    )
    from ubteacher_tpu.modeling.rcnn import build_two_stage_rcnn

    cfg = get_cfg()
    add_ubteacher_config(cfg)
    cfg.merge_from_file(os.path.join(
        os.path.dirname(__file__), "..", "configs", "Faster-RCNN",
        "coco-standard", "faster_rcnn_R_50_FPN_ut2_sup1_run0.yaml",
    ))
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_two_stage_rcnn(cfg)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    rng = np.random.default_rng(1)
    sd = TrackingStateDict(_synthetic_rcnn_reference_state(18, 80, rng))
    converted = convert_ubt_rcnn_model(sd, depth=18)

    # every reference parameter consumed, zero leftovers
    assert sd.unused() == [], sd.unused()[:10]

    flat_c = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    missing = set(map(str, flat_p)) - set(map(str, flat_c))
    assert not missing, f"converter missed params: {sorted(missing)[:8]}"
    extra = set(map(str, flat_c)) - set(map(str, flat_p))
    assert not extra, f"converter produced unknown params: {sorted(extra)[:8]}"
    for path, leaf in flat_p.items():
        got = np.asarray(flat_c[path])
        assert got.shape == leaf.shape, (path, got.shape, leaf.shape)

    merged = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float32), converted
    )
    outs = model.apply({"params": merged}, x)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_fcos_checkpoint_coverage():
    """The FCOS converter also consumes every reference key."""
    from ubteacher_tpu.checkpoint.torch_weights import TrackingStateDict

    rng = np.random.default_rng(2)
    sd = TrackingStateDict(_synthetic_reference_state(18, 80, 4 * 17, rng))
    convert_ubt_fcos_model(sd, depth=18)
    assert sd.unused() == [], sd.unused()[:10]


def test_fc1_permutation_matches_torch():
    """torch Linear on (C,P,P)-flattened ROI features == our Dense kernel on
    (P,P,C)-flattened features after the converter's permutation."""
    import torch

    from ubteacher_tpu.checkpoint.torch_weights import convert_ubt_rcnn_model

    rng = np.random.default_rng(3)
    c, p, d = 8, 7, 16
    w = rng.normal(size=(d, c * p * p)).astype(np.float32)
    b = rng.normal(size=(d,)).astype(np.float32)
    feat_chw = rng.normal(size=(c, p, p)).astype(np.float32)

    torch_out = torch.nn.functional.linear(
        torch.from_numpy(feat_chw.reshape(-1)), torch.from_numpy(w),
        torch.from_numpy(b),
    ).numpy()

    k = w.reshape(d, c, p, p).transpose(2, 3, 1, 0).reshape(p * p * c, d)
    feat_hwc = feat_chw.transpose(1, 2, 0)  # our NHWC pooled layout
    ours = feat_hwc.reshape(-1) @ k + b
    np.testing.assert_allclose(ours, torch_out, rtol=1e-5, atol=1e-5)


def test_split_ensemble_state():
    from ubteacher_tpu.checkpoint.torch_weights import split_ensemble_state

    sd = {
        "modelTeacher.backbone.stem.conv1.weight": np.ones(1),
        "modelStudent.module.backbone.stem.conv1.weight": np.zeros(1),
    }
    parts = split_ensemble_state(sd)
    assert list(parts["teacher"]) == ["backbone.stem.conv1.weight"]
    assert list(parts["student"]) == ["backbone.stem.conv1.weight"]
    assert parts["teacher"]["backbone.stem.conv1.weight"][0] == 1
    assert parts["student"]["backbone.stem.conv1.weight"][0] == 0
