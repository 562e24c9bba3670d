"""Feature Pyramid Network, detectron2-compatible, NHWC flax.

Rewrite of D2's FPN + the reference's extra-level blocks
(reference: ubteacher/modeling/backbone/fpn.py:11-78). FCOS uses P6/P7
stride-2 convs fed from **p5** (fpn.py:65); Faster R-CNN uses a stride-2
maxpool p6 (D2 LastLevelMaxPool).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 (matches F.interpolate(..., mode='nearest'))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    """in_features e.g. ("res3","res4","res5") -> {"p3".."p7"} NHWC maps.

    top_block: "p6p7" (FCOS), "maxpool" (RCNN) or "" (none).
    """

    in_features: Sequence[str] = ("res3", "res4", "res5")
    out_channels: int = 256
    top_block: str = "p6p7"
    fuse_type: str = "sum"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, bottom_up: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        feats = [bottom_up[f] for f in self.in_features]  # low -> high stage
        stages = [int(f[3:]) for f in self.in_features]   # e.g. [3, 4, 5]

        # lateral 1x1 + top-down pathway (highest stage first)
        laterals = [
            nn.Conv(
                self.out_channels, (1, 1), use_bias=True, dtype=self.dtype,
                name=f"fpn_lateral{s}",
            )(x)
            for s, x in zip(stages, feats)
        ]
        results = [None] * len(laterals)
        prev = laterals[-1]
        results[-1] = prev
        for i in range(len(laterals) - 2, -1, -1):
            td = _upsample_nearest_2x(prev)
            prev = laterals[i] + td
            if self.fuse_type == "avg":
                prev = prev / 2.0
            results[i] = prev

        outputs: Dict[str, jnp.ndarray] = {}
        for i, s in enumerate(stages):
            outputs[f"p{s}"] = nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                use_bias=True, dtype=self.dtype, name=f"fpn_output{s}",
            )(results[i])

        top_stage = stages[-1]
        if self.top_block == "p6p7":
            p6 = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), use_bias=True, dtype=self.dtype,
                name="top_block_p6",
            )(outputs[f"p{top_stage}"])
            p7 = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=((1, 1), (1, 1)), use_bias=True, dtype=self.dtype,
                name="top_block_p7",
            )(nn.relu(p6))
            outputs[f"p{top_stage + 1}"] = p6
            outputs[f"p{top_stage + 2}"] = p7
        elif self.top_block == "maxpool":
            outputs[f"p{top_stage + 1}"] = nn.max_pool(
                outputs[f"p{top_stage}"], (1, 1), strides=(2, 2)
            )
        return outputs


def fpn_from_cfg(cfg, top_block: str, dtype=None) -> FPN:
    return FPN(
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        top_block=top_block,
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )
