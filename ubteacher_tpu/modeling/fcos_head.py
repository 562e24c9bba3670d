"""FCOS head + one-stage detector module (flax, NHWC).

Rewrite of the reference's FCOS/FCOSHead (reference:
ubteacher/modeling/fcos/fcos.py:44-377) and OneStageDetector preprocessing
(reference: ubteacher/modeling/one_stage_detector.py:46-115).

The head is applied per FPN level with shared weights; outputs are flattened
and concatenated over levels into a single (B, L, ...) FCOSDense pytree so
every downstream op (assignment, loss, decode) is one fused elementwise pass.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .fcos_outputs import FCOSDense
from .fpn import FPN, fpn_from_cfg
from .resnet import ResNet, resnet_from_cfg
from ..ops.boxes import mask_canvas_padding


class GroupNorm32(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        # Mean/var accumulate in fp32 regardless of input dtype (flax
        # force_float32_reductions); the normalize/affine math runs in the
        # tower compute dtype so no fp32 copy of the activations is ever
        # materialized (profiled ~30 ms/step of convert+reduce at bf16
        # towers, batch 8+8).
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=x.dtype)(x)


class FCOSHead(nn.Module):
    """Shared-weight per-level head (reference: fcos.py:220-377)."""

    num_classes: int = 80
    num_levels: int = 5
    num_cls_convs: int = 4
    num_box_convs: int = 4
    num_share_convs: int = 0
    norm: str = "GN"
    use_scale: bool = True
    reg_discrete: bool = False
    reg_max: int = 16
    kl_loss: bool = True
    prior_prob: float = 0.01
    dtype: Any = jnp.bfloat16

    def setup(self):
        conv_init = nn.initializers.normal(0.01)

        def tower(n, prefix):
            layers = []
            for i in range(n):
                layers.append(
                    nn.Conv(
                        256, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                        kernel_init=conv_init, bias_init=nn.initializers.zeros,
                        dtype=self.dtype, name=f"{prefix}_conv{i}",
                    )
                )
                if self.norm == "GN":
                    layers.append(GroupNorm32(256, name=f"{prefix}_gn{i}"))
            return layers

        self.share_tower = tower(self.num_share_convs, "share")
        self.cls_tower = tower(self.num_cls_convs, "cls")
        self.bbox_tower = tower(self.num_box_convs, "bbox")

        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        self.cls_logits = nn.Conv(
            self.num_classes, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=conv_init,
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype, name="cls_logits",
        )
        reg_out = 4 * (self.reg_max + 1) if self.reg_discrete else 4
        self.bbox_pred = nn.Conv(
            reg_out, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=conv_init, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="bbox_pred",
        )
        if self.kl_loss:
            # KL-Loss init: tiny weights so initial stds ~ 0 (fcos.py:327-331)
            self.bbox_pred_std = nn.Conv(
                4, (3, 3), padding=((1, 1), (1, 1)),
                kernel_init=nn.initializers.normal(0.0001),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype, name="bbox_pred_std",
            )
        self.ctrness = nn.Conv(
            1, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=conv_init, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="ctrness",
        )
        if self.use_scale:
            self.scales = self.param(
                "scales", nn.initializers.ones, (self.num_levels,)
            )

    def _run_tower(self, layers, x):
        for i, layer in enumerate(layers):
            x = layer(x)
            if isinstance(layer, GroupNorm32) or self.norm != "GN":
                x = nn.relu(x)
        return x

    def __call__(self, features: List[jnp.ndarray]) -> FCOSDense:
        logits_all, reg_all, ctr_all, std_all = [], [], [], []
        for lvl, feat in enumerate(features):
            b = feat.shape[0]
            x = self._run_tower(self.share_tower, feat)
            ct = self._run_tower(self.cls_tower, x)
            bt = self._run_tower(self.bbox_tower, x)

            logits = self.cls_logits(ct).astype(jnp.float32)
            ctr = self.ctrness(bt).astype(jnp.float32)
            reg = self.bbox_pred(bt).astype(jnp.float32)
            if self.use_scale:
                reg = reg * self.scales[lvl]
            if not self.reg_discrete:
                reg = nn.relu(reg)
            logits_all.append(logits.reshape(b, -1, self.num_classes))
            reg_all.append(reg.reshape(b, -1, reg.shape[-1]))
            ctr_all.append(ctr.reshape(b, -1))
            if self.kl_loss:
                std = self.bbox_pred_std(bt).astype(jnp.float32)
                std_all.append(std.reshape(b, -1, 4))
            else:
                std_all.append(jnp.zeros_like(reg[..., :4]).reshape(b, -1, 4))
        return FCOSDense(
            logits=jnp.concatenate(logits_all, axis=1),
            reg=jnp.concatenate(reg_all, axis=1),
            ctrness=jnp.concatenate(ctr_all, axis=1),
            reg_std=jnp.concatenate(std_all, axis=1),
        )


class OneStageDetector(nn.Module):
    """ResNet + FPN(P3-P7) + FCOS head -> FCOSDense.

    Input images are (B, H, W, 3) float32 in BGR channel order, raw pixel
    scale; normalization happens in-graph (reference:
    one_stage_detector.py:59-64, 88-90 — pixel_mean/std buffers).
    """

    backbone: ResNet
    fpn: FPN
    head: FCOSHead
    in_features: Sequence[str] = ("p3", "p4", "p5", "p6", "p7")
    pixel_mean: Tuple[float, ...] = (103.530, 116.280, 123.675)
    pixel_std: Tuple[float, ...] = (1.0, 1.0, 1.0)

    def __call__(
        self, images: jnp.ndarray, hw: jnp.ndarray | None = None
    ) -> FCOSDense:
        # images may arrive uint8 (the loader ships raw pixels — 4x less
        # host->device traffic than f32; values identical): normalize in
        # float32 regardless
        if not jnp.issubdtype(images.dtype, jnp.floating):
            images = images.astype(jnp.float32)
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        x = (images - mean) / std
        if hw is not None:
            # reference pads AFTER normalization (one_stage_detector.py:
            # 59-64, 88-90): padding must be 0 in normalized space
            x = mask_canvas_padding(x, hw)
        feats = self.backbone(x)
        pyramid = self.fpn(feats)
        return self.head([pyramid[f] for f in self.in_features])


def build_one_stage_detector(cfg) -> OneStageDetector:
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    f = cfg.MODEL.FCOS
    head = FCOSHead(
        num_classes=f.NUM_CLASSES,
        num_levels=len(f.IN_FEATURES),
        num_cls_convs=f.NUM_CLS_CONVS,
        num_box_convs=f.NUM_BOX_CONVS,
        num_share_convs=f.NUM_SHARE_CONVS,
        norm=f.NORM,
        use_scale=f.USE_SCALE,
        reg_discrete=f.REG_DISCRETE,
        reg_max=f.REG_MAX,
        kl_loss=f.KL_LOSS,
        prior_prob=f.PRIOR_PROB,
        dtype=dtype,
    )
    return OneStageDetector(
        backbone=resnet_from_cfg(cfg, dtype=dtype),
        fpn=fpn_from_cfg(cfg, top_block="p6p7", dtype=dtype),
        head=head,
        in_features=tuple(f.IN_FEATURES),
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
    )
