"""Two-stage pseudo-label Generalized R-CNN meta-architecture.

TPU-native rewrite of TwoStagePseudoLabGeneralizedRCNN (reference:
ubteacher/modeling/meta_arch/rcnn.py:7-72). The flax module only holds the
parametric pieces (backbone, FPN, RPN head, box head); branch orchestration
(supervised / unsup_data_weak / unsup_data_train) lives in the jitted train
step (engine/rcnn_trainer.py) as pure functions over this module's methods.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.roi_align import multilevel_roi_align
from .fast_rcnn import BoundaryVarOutputLayers, FastRCNNConvFCHead
from .fpn import FPN, fpn_from_cfg
from .resnet import ResNet, resnet_from_cfg
from .rpn import RPNHead
from ..ops.boxes import mask_canvas_padding


class TwoStageRCNN(nn.Module):
    backbone: ResNet
    fpn: FPN
    rpn_head: RPNHead
    box_head: FastRCNNConvFCHead
    box_predictor: BoundaryVarOutputLayers
    rpn_in_features: Sequence[str] = ("p2", "p3", "p4", "p5", "p6")
    roi_in_features: Sequence[str] = ("p2", "p3", "p4", "p5")
    pooler_resolution: int = 7
    # 0 = D2-adaptive ROIAlignV2 grid (the reference's default POOLER_SAMPLING_RATIO)
    pooler_sampling_ratio: int = 0
    pixel_mean: Tuple[float, ...] = (103.530, 116.280, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)

    def features(
        self, images: jnp.ndarray, hw: jnp.ndarray | None = None
    ) -> Dict[str, jnp.ndarray]:
        # images may arrive uint8 (the loader ships raw pixels — 4x less
        # host->device traffic than f32; values identical): normalize in
        # float32 regardless
        if not jnp.issubdtype(images.dtype, jnp.floating):
            images = images.astype(jnp.float32)
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        x = (images - mean) / std
        if hw is not None:
            # reference pads AFTER normalization (D2 preprocess_image +
            # ImageList.from_tensors): padding must be 0 in normalized space
            x = mask_canvas_padding(x, hw)
        return self.fpn(self.backbone(x))

    def rpn(self, pyramid: Dict[str, jnp.ndarray]):
        """-> (objectness (B, L, A_cell), deltas (B, L, A_cell, 4)):
        locations (L, concatenated over levels in anchor order) major,
        cell-anchor dim minor — no lane relayout between the head convs
        and the losses/proposal selection (see RPNHead)."""
        feats = [pyramid[f] for f in self.rpn_in_features]
        logits, deltas = self.rpn_head(feats)
        return jnp.concatenate(logits, axis=1), jnp.concatenate(deltas, axis=1)

    def roi_box(self, pyramid: Dict[str, jnp.ndarray], boxes: jnp.ndarray):
        """boxes (B, R, 4) -> (scores (B,R,K+1), deltas (B,R,4),
        deltas_std (B,R,4))."""
        pooled = multilevel_roi_align(
            pyramid, boxes, self.roi_in_features, self.pooler_resolution,
            self.pooler_sampling_ratio,
        )
        x = self.box_head(pooled)
        return self.box_predictor(x)

    def __call__(self, images: jnp.ndarray):
        """Initialization-only path: touches every submodule."""
        pyramid = self.features(images)
        logits, deltas = self.rpn(pyramid)
        b = images.shape[0]
        dummy_boxes = jnp.tile(
            jnp.asarray([[0.0, 0.0, 32.0, 32.0]], jnp.float32), (b, 4, 1)
        )
        scores, box_deltas, box_std = self.roi_box(pyramid, dummy_boxes)
        return logits, deltas, scores, box_deltas, box_std


def build_two_stage_rcnn(cfg) -> TwoStageRCNN:
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    num_cell_anchors = len(cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]) * len(
        cfg.MODEL.ANCHOR_GENERATOR.SIZES[0]
    )
    return TwoStageRCNN(
        backbone=resnet_from_cfg(cfg, dtype=dtype),
        fpn=fpn_from_cfg(cfg, top_block="maxpool", dtype=dtype),
        rpn_head=RPNHead(num_anchors=num_cell_anchors, dtype=dtype),
        box_head=FastRCNNConvFCHead(
            fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
            num_fc=cfg.MODEL.ROI_BOX_HEAD.NUM_FC,
            dtype=dtype,
        ),
        box_predictor=BoundaryVarOutputLayers(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            cls_agnostic=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
            dtype=dtype,
        ),
        rpn_in_features=tuple(cfg.MODEL.RPN.IN_FEATURES),
        roi_in_features=tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES),
        pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
        pooler_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )
