"""Torch/caffe2 -> flax weight conversion for the ResNet backbone.

The reference bootstraps the student from detectron2's MSRA ImageNet pkl
("detectron2://ImageNetPretrained/MSRA/R-50.pkl", configs/*/coco-standard)
through name-matching heuristics (reference:
checkpoint/detection_checkpoint.py:13-36). Here conversion is explicit:

  * caffe2 pkl names (conv1_w, res{s}_{b}_branch2{a,b,c}_w, *_bn_{s,b}) —
    the `_bn_s/_bn_b` pairs are AffineChannel scale/bias, i.e. already-folded
    frozen BN, mapping 1:1 onto our FrozenBN (scale, bias);
  * detectron2 module names (backbone.bottom_up.res2.0.conv1.weight,
    ...conv1.norm.{weight,bias,running_mean,running_var}) — FrozenBN is
    folded: scale = gamma / sqrt(var + eps), bias = beta - mean * scale.

Conv kernels transpose from torch (O, I, kh, kw) to flax NHWC (kh, kw, I, O).
"""

from __future__ import annotations

import pickle
from typing import Dict

import numpy as np

from ..modeling.resnet import RESNET_STAGES

_BRANCH_TO_CONV = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3",
                   "branch1": "shortcut"}


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def load_c2_pickle(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if "model" in data:
        data = data["model"]
    return {k: np.asarray(v) for k, v in data.items() if isinstance(v, np.ndarray) or hasattr(v, "shape")}


def convert_c2_resnet(weights: Dict[str, np.ndarray], depth: int = 50) -> Dict:
    """caffe2 MSRA names -> our ResNet param tree (dict of dicts)."""
    out: Dict[str, Dict] = {}
    out["stem_conv1"] = {"kernel": _t(weights["conv1_w"])}
    out["stem_conv1_norm"] = {
        "scale": weights["res_conv1_bn_s"],
        "bias": weights["res_conv1_bn_b"],
    }
    num_blocks = RESNET_STAGES[depth]
    for stage_idx, n in enumerate(num_blocks):
        s = stage_idx + 2  # res2..res5
        for b in range(n):
            blk = f"res{s}_block{b}"
            out[blk] = {}
            for branch, conv in _BRANCH_TO_CONV.items():
                wk = f"res{s}_{b}_{branch}_w"
                if wk not in weights:
                    continue
                out[blk][conv] = {"kernel": _t(weights[wk])}
                out[blk][f"{conv}_norm"] = {
                    "scale": weights[f"res{s}_{b}_{branch}_bn_s"],
                    "bias": weights[f"res{s}_{b}_{branch}_bn_b"],
                }
    return out


def convert_d2_resnet(
    state_dict: Dict[str, np.ndarray],
    depth: int = 50,
    prefix: str = "backbone.bottom_up.",
    eps: float = 1e-5,
) -> Dict:
    """detectron2 module-path names -> our ResNet param tree, folding
    FrozenBN stats into affine (scale, bias)."""

    def fold(base: str) -> Dict[str, np.ndarray]:
        gamma = state_dict[f"{base}.weight"]
        beta = state_dict[f"{base}.bias"]
        mean = state_dict.get(f"{base}.running_mean")
        var = state_dict.get(f"{base}.running_var")
        if mean is None:  # already-affine
            return {"scale": gamma, "bias": beta}
        scale = gamma / np.sqrt(var + eps)
        return {"scale": scale, "bias": beta - mean * scale}

    out: Dict[str, Dict] = {}
    out["stem_conv1"] = {"kernel": _t(state_dict[f"{prefix}stem.conv1.weight"])}
    out["stem_conv1_norm"] = fold(f"{prefix}stem.conv1.norm")
    num_blocks = RESNET_STAGES[depth]
    for stage_idx, n in enumerate(num_blocks):
        s = stage_idx + 2
        for b in range(n):
            blk = f"res{s}_block{b}"
            out[blk] = {}
            for conv in ("conv1", "conv2", "conv3"):
                base = f"{prefix}res{s}.{b}.{conv}"
                out[blk][conv] = {"kernel": _t(state_dict[f"{base}.weight"])}
                out[blk][f"{conv}_norm"] = fold(f"{base}.norm")
            sc = f"{prefix}res{s}.{b}.shortcut"
            if f"{sc}.weight" in state_dict:
                out[blk]["shortcut"] = {"kernel": _t(state_dict[f"{sc}.weight"])}
                out[blk]["shortcut_norm"] = fold(f"{sc}.norm")
    return out


def convert_d2_fpn(state_dict: Dict[str, np.ndarray], prefix: str = "backbone.") -> Dict:
    """detectron2 FPN names -> our FPN param tree (lateral/output convs +
    FCOS top block)."""
    out: Dict[str, Dict] = {}
    for stage in (2, 3, 4, 5):
        for kind in ("lateral", "output"):
            base = f"{prefix}fpn_{kind}{stage}"
            if f"{base}.weight" not in state_dict:
                continue
            out[f"fpn_{kind}{stage}"] = {
                "kernel": _t(state_dict[f"{base}.weight"]),
                "bias": state_dict[f"{base}.bias"],
            }
    for blk, ours in (("top_block.p6", "top_block_p6"), ("top_block.p7", "top_block_p7")):
        if f"{prefix}{blk}.weight" in state_dict:
            out[ours] = {
                "kernel": _t(state_dict[f"{prefix}{blk}.weight"]),
                "bias": state_dict[f"{prefix}{blk}.bias"],
            }
    return out


def convert_ubt_fcos_head(state_dict: Dict[str, np.ndarray],
                          prefix: str = "proposal_generator.fcos_head.") -> Dict:
    """Reference FCOSHead names (fcos.py:220-336: {cls,bbox,share}_tower.N,
    cls_logits, bbox_pred, bbox_pred_std, ctrness, scales.N.scale) -> our
    FCOSHead tree ({cls,bbox,share}_conv{i}/_gn{i}, same leaf heads,
    'scales' vector)."""
    out: Dict[str, Dict] = {}
    for tower, ours in (("cls_tower", "cls"), ("bbox_tower", "bbox"),
                        ("share_tower", "share")):
        i = 0
        n = 0  # torch Sequential index: conv at 3k, GN at 3k+1, ReLU 3k+2
        while f"{prefix}{tower}.{n}.weight" in state_dict:
            out[f"{ours}_conv{i}"] = {
                "kernel": _t(state_dict[f"{prefix}{tower}.{n}.weight"]),
                "bias": state_dict[f"{prefix}{tower}.{n}.bias"],
            }
            if f"{prefix}{tower}.{n + 1}.weight" in state_dict and (
                state_dict[f"{prefix}{tower}.{n + 1}.weight"].ndim == 1
            ):
                out[f"{ours}_gn{i}"] = {
                    "GroupNorm_0": {
                        "scale": state_dict[f"{prefix}{tower}.{n + 1}.weight"],
                        "bias": state_dict[f"{prefix}{tower}.{n + 1}.bias"],
                    }
                }
            i += 1
            n += 3
    for head in ("cls_logits", "bbox_pred", "bbox_pred_std", "ctrness"):
        if f"{prefix}{head}.weight" in state_dict:
            out[head] = {
                "kernel": _t(state_dict[f"{prefix}{head}.weight"]),
                "bias": state_dict[f"{prefix}{head}.bias"],
            }
    scales = []
    n = 0
    while f"{prefix}scales.{n}.scale" in state_dict:
        scales.append(np.asarray(state_dict[f"{prefix}scales.{n}.scale"]).reshape(()))
        n += 1
    if scales:
        out["scales"] = np.stack(scales)
    return out


def convert_ubt_fcos_model(state_dict: Dict[str, np.ndarray], depth: int = 50) -> Dict:
    """Full reference OneStageDetector state dict -> our OneStageDetector
    param tree {backbone, fpn, head}. Accepts teacher or student sub-dicts
    of an EnsembleTSModel checkpoint (strip the 'modelTeacher.'/
    'modelStudent.' prefix first)."""
    return {
        "backbone": convert_d2_resnet(state_dict, depth),
        "fpn": convert_d2_fpn(state_dict),
        "head": convert_ubt_fcos_head(state_dict),
    }


class TrackingStateDict(dict):
    """dict wrapper that records which keys a converter consumed, so tests
    can assert zero unmapped reference parameters (VERDICT r1 item 4)."""

    def __init__(self, data: Dict):
        super().__init__(data)
        self.used: set = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            self.used.add(k)
        return super().get(k, default)

    def unused(self, ignore_substrings=()) -> list:
        return sorted(
            k for k in self
            if k not in self.used
            and not any(s in k for s in ignore_substrings)
        )


def _dense(state_dict: Dict[str, np.ndarray], base: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear (out, in) -> flax Dense kernel (in, out)."""
    return {
        "kernel": np.ascontiguousarray(state_dict[f"{base}.weight"].T),
        "bias": state_dict[f"{base}.bias"],
    }


def convert_ubt_rcnn_model(
    state_dict: Dict[str, np.ndarray],
    depth: int = 50,
    pooler_resolution: int = 7,
) -> Dict:
    """Full reference TwoStagePseudoLabGeneralizedRCNN state dict -> our
    TwoStageRCNN param tree {backbone, fpn, rpn_head, box_head,
    box_predictor}.

    Reference module names (D2 StandardRPNHead via PseudoLabRPN rpn.py:15;
    FastRCNNConvFCHead fc1/fc2; *BoundaryVar predictors fast_rcnn.py:255-271
    cls_score / bbox_pred / bbox_pred_std):
      proposal_generator.rpn_head.{conv,objectness_logits,anchor_deltas}
      roi_heads.box_head.fc{1,2}
      roi_heads.box_predictor.{cls_score,bbox_pred[,bbox_pred_std]}

    The RCNN FPN has no p6p7 convs (top block is a parameter-free maxpool).
    fc1 needs an input permutation: torch flattens ROI features (C, P, P)
    channel-major, our NHWC head flattens (P, P, C).
    """
    rpn_prefix = "proposal_generator.rpn_head."
    out: Dict[str, Dict] = {
        "backbone": convert_d2_resnet(state_dict, depth),
        "fpn": convert_d2_fpn(state_dict),
        "rpn_head": {
            name: {
                "kernel": _t(state_dict[f"{rpn_prefix}{name}.weight"]),
                "bias": state_dict[f"{rpn_prefix}{name}.bias"],
            }
            for name in ("conv", "objectness_logits", "anchor_deltas")
        },
    }

    bh = "roi_heads.box_head."
    w1 = np.asarray(state_dict[f"{bh}fc1.weight"])  # (D, C*P*P) chw-major
    d_out = w1.shape[0]
    p = pooler_resolution
    c = w1.shape[1] // (p * p)
    k1 = np.ascontiguousarray(
        w1.reshape(d_out, c, p, p).transpose(2, 3, 1, 0).reshape(p * p * c, d_out)
    )
    box_head: Dict[str, Dict] = {
        "fc1": {"kernel": k1, "bias": state_dict[f"{bh}fc1.bias"]}
    }
    i = 2
    while f"{bh}fc{i}.weight" in state_dict:
        box_head[f"fc{i}"] = _dense(state_dict, f"{bh}fc{i}")
        i += 1
    out["box_head"] = box_head

    bp = "roi_heads.box_predictor."
    predictor = {
        "cls_score": _dense(state_dict, f"{bp}cls_score"),
        "bbox_pred": _dense(state_dict, f"{bp}bbox_pred"),
    }
    if f"{bp}bbox_pred_std.weight" in state_dict:  # BoundaryVar variants
        predictor["bbox_pred_std"] = _dense(state_dict, f"{bp}bbox_pred_std")
    out["box_predictor"] = predictor
    return out


def split_ensemble_state(state_dict: Dict[str, np.ndarray]) -> Dict[str, Dict]:
    """EnsembleTSModel checkpoint -> {'teacher': sub_sd, 'student': sub_sd}
    (reference: ts_ensemble.py:6-16 holds modelTeacher/modelStudent; DDP
    'module.' prefixes are stripped like detection_checkpoint.py:24-28)."""
    out: Dict[str, Dict] = {"teacher": {}, "student": {}}
    for k, v in state_dict.items():
        for torch_name, ours in (
            ("modelTeacher.", "teacher"), ("modelStudent.", "student")
        ):
            if k.startswith(torch_name):
                sub = k[len(torch_name):]
                if sub.startswith("module."):
                    sub = sub[len("module."):]
                out[ours][sub] = v
    return out


def load_pretrained_backbone(params: Dict, weights_path: str, depth: int = 50) -> Dict:
    """Returns a copy of `params` with the backbone subtree replaced by the
    converted pretrained weights (student-only bootstrap; the teacher starts
    from the burn-in copy like the reference, trainer.py:213-214)."""
    import jax

    raw = load_c2_pickle(weights_path)
    if "conv1_w" in raw:
        converted = convert_c2_resnet(raw, depth)
    else:
        converted = convert_d2_resnet(raw, depth)
    params = jax.tree.map(lambda x: x, params)  # shallow copy tree
    backbone = params["backbone"]
    for k, v in converted.items():
        assert k in backbone, f"missing backbone module {k}"
        backbone[k] = jax.tree.map(
            lambda new, old: np.asarray(new, old.dtype).reshape(old.shape),
            v,
            backbone[k],
        )
    return params


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint from disk -> {name: np.ndarray}.

    Accepts torch .pth/.pt (optionally wrapped as {"model": sd}, e.g. a
    DetectionTSCheckpointer save) and pickle .pkl files (D2 weight zoo
    format). Mirrors the formats DetectionTSCheckpointer consumes
    (reference: checkpoint/detection_checkpoint.py:10-89)."""
    if path.endswith((".pth", ".pt")):
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "model" in raw:
            raw = raw["model"]
        if hasattr(raw, "state_dict"):
            raw = raw.state_dict()
        return {
            k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in raw.items()
            if hasattr(v, "shape")
        }
    with open(path, "rb") as f:
        raw = pickle.load(f, encoding="latin1")
    if isinstance(raw, dict) and "model" in raw:
        raw = raw["model"]
    return {k: np.asarray(v) for k, v in raw.items() if hasattr(v, "shape")}


def cast_like(converted: Dict, init: Dict) -> Dict:
    """Reshape/cast a converted param tree onto the dtypes and shapes of an
    initialized one, asserting every init leaf is covered."""
    import jax

    flat_c = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    flat_i = dict(jax.tree_util.tree_flatten_with_path(init)[0])
    missing = [str(p) for p in flat_i if p not in flat_c]
    if missing:
        raise ValueError(f"converter missed params: {missing[:8]}")
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: np.asarray(flat_c[p], leaf.dtype).reshape(leaf.shape),
        init,
    )
