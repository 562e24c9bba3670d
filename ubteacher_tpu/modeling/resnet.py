"""ResNet-50/101 backbone, detectron2-compatible (caffe/MSRA variant).

TPU-native flax rewrite of detectron2's `build_resnet_backbone` as consumed
by the reference (reference: ubteacher/modeling/backbone/fpn.py:59). NHWC
layout, explicit torch-style paddings so converted torch weights reproduce
outputs exactly. FrozenBatchNorm is folded into per-channel (scale, bias)
affine params; freezing (FREEZE_AT and all FrozenBN stats) is enforced by
the optimizer's trainable mask, not by the module.

Conv compute runs in a configurable dtype (bfloat16 by default) with fp32
params — the MXU path.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

# blocks per stage, keyed by depth (torchvision/caffe resnet family)
RESNET_STAGES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBN(nn.Module):
    """BatchNorm folded to y = x * scale + bias (stats frozen).

    detectron2 loads caffe2 ResNets with FrozenBatchNorm; the converter
    (checkpoint/torch_weights.py) folds (gamma, beta, mean, var) into
    (scale, bias) at load time.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class _StemKernelParams(nn.Module):
    """Declares stem_conv1/kernel without running a conv — the fused
    Pallas stem consumes the raw parameters. Same name/shape/init as
    StemConv, so the parameter tree is identical in every stem mode."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, cin, self.features),
            jnp.float32,
        )


class _StemNormParams(nn.Module):
    """Declares stem_conv1_norm/{scale,bias} (same tree as FrozenBN)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class StemConv(nn.Module):
    """The 7x7/s2 stem conv, with MXU-friendly compute modes.

    The naive form ("conv") feeds a 3-channel image into the MXU: 3/128
    lane utilization (profiled at ~7% MXU efficiency, ~30 ms/step across
    the teacher/student forward+backward instances of the FCOS mutual
    step). Two algebraically identical reformulations:

    - "s2d": input rearranged to (H/2, W/2, 12) and the SAME kernel
      zero-padded 7->8 and regrouped into an equivalent 4x4/s1 conv over
      12 channels — 4x the lane utilization, no stride-2 input relayout.
      Measured slower on this chip (relayout cost), kept for other
      regimes.
    - "im2col": explicit patch extraction (49 strided slices concatenated
      to a (B, H/2, W/2, 147) patch tensor) followed by ONE dense
      (.., 147) @ (147, C) matmul — the MXU runs a real GEMM instead of a
      channel-starved convolution. Patch building is pure elementwise
      data movement XLA fuses into the concat write; the matmul runs at
      K=147 density instead of K_eff=3.

    The parameter tree is unchanged (stem_conv1/kernel, (7,7,3,C)) in all
    modes, so torch-converted checkpoints load any of them.
    """

    features: int
    mode: str = "conv"  # "conv" | "s2d" | "im2col"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        import jax.lax as lax

        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, cin, self.features),
            jnp.float32,
        )
        b, h, w, _ = x.shape
        if self.mode == "im2col":
            x = x.astype(self.dtype)
            ho, wo = (h - 1) // 2 + 1, (w - 1) // 2 + 1
            xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
            views = []
            for ky in range(7):
                for kx in range(7):
                    views.append(
                        lax.slice(
                            xp,
                            (0, ky, kx, 0),
                            (b, ky + 2 * ho - 1, kx + 2 * wo - 1, cin),
                            (1, 2, 2, 1),
                        )
                    )
            # (ky, kx, c)-ordered patch axis matches kernel.reshape below
            patches = jnp.concatenate(views, axis=-1)
            return lax.dot_general(
                patches,
                kernel.reshape(49 * cin, self.features).astype(self.dtype),
                (((3,), (0,)), ((), ())),
            )
        if self.mode != "s2d" or h % 2 or w % 2:
            return lax.conv_general_dilated(
                x,
                kernel.astype(self.dtype),
                (2, 2),
                ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # x -> (B, H/2, W/2, (dy, dx, c)); out(i,j) of the 7x7/s2 conv reads
        # x[2i+ky-3] with ky = 2a+dy-1, a in 0..3 — i.e. a 4x4/s1 conv over
        # the depth-packed input with the kernel regrouped the same way
        # (leading zero-pad supplies the ky=-1 tap).
        x2 = (
            x.reshape(b, h // 2, 2, w // 2, 2, cin)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, w // 2, 4 * cin)
        )
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8,8,c,o)
        k2 = (
            k8.reshape(4, 2, 4, 2, cin, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * cin, self.features)
        )
        return lax.conv_general_dilated(
            x2,
            k2.astype(self.dtype),
            (1, 1),
            ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with FrozenBN; caffe variant puts the
    stride on the 1x1 (STRIDE_IN_1X1=True, D2 default for MSRA weights)."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    has_shortcut: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = nn.Conv(
            self.bottleneck_channels, (1, 1), strides=(s1, s1), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        out = FrozenBN(self.bottleneck_channels, name="conv1_norm")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.bottleneck_channels, (3, 3), strides=(s3, s3),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            name="conv2",
        )(out)
        out = FrozenBN(self.bottleneck_channels, name="conv2_norm")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv3",
        )(out)
        out = FrozenBN(self.out_channels, name="conv3_norm")(out)

        if self.has_shortcut:
            sc = nn.Conv(
                self.out_channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="shortcut",
            )(x)
            sc = FrozenBN(self.out_channels, name="shortcut_norm")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    """Returns a dict {"res2": ..., "res3": ..., "res4": ..., "res5": ...}
    (NHWC), keyed like detectron2. `out_features` selects which to compute.
    """

    depth: int = 50
    out_features: Sequence[str] = ("res3", "res4", "res5")
    stride_in_1x1: bool = True
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stem_mode: str = "conv"
    dtype: Any = jnp.bfloat16

    STEM_MODES = ("conv", "s2d", "im2col", "pallas", "pallas_interpret")

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        # a typo'd mode must not silently fall back to "conv" and lose the
        # optimization (round-3 advisor finding)
        if self.stem_mode not in self.STEM_MODES:
            raise ValueError(
                f"unknown stem_mode {self.stem_mode!r}; "
                f"expected one of {self.STEM_MODES}"
            )
        # stem: 7x7/2 + frozen BN + relu + maxpool 3x3/2 (torch paddings)
        if self.stem_mode.startswith("pallas"):
            from ubteacher_tpu.ops.pallas.stem_pallas import stem_conv_pool

            kernel = _StemKernelParams(
                self.stem_out_channels, name="stem_conv1"
            )(x.shape[-1])
            scale, bias = _StemNormParams(
                self.stem_out_channels, name="stem_conv1_norm"
            )()
            # "pallas_interpret" forces the Pallas branch through the
            # interpreter so CPU tests exercise the ResNet→kernel
            # integration (compiled TPU coverage: tools/validate_tpu.py)
            x = stem_conv_pool(
                x, kernel, scale, bias, self.dtype,
                self.stem_mode == "pallas_interpret",
            )
        else:
            x = x.astype(self.dtype)
            x = StemConv(
                self.stem_out_channels, mode=self.stem_mode,
                dtype=self.dtype, name="stem_conv1",
            )(x)
            x = FrozenBN(self.stem_out_channels, name="stem_conv1_norm")(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
        x = x.astype(self.dtype)

        num_blocks = RESNET_STAGES[self.depth]
        out_ch = self.res2_out_channels
        bott_ch = out_ch // 4
        outputs: Dict[str, jnp.ndarray] = {}
        max_stage = max(
            int(f[3:]) for f in self.out_features if f.startswith("res")
        )
        for stage_idx in range(4):  # res2..res5
            stage_name = f"res{stage_idx + 2}"
            if stage_idx + 2 > max_stage:
                break
            first_stride = 1 if stage_idx == 0 else 2
            for b in range(num_blocks[stage_idx]):
                x = BottleneckBlock(
                    out_channels=out_ch,
                    bottleneck_channels=bott_ch,
                    stride=first_stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    has_shortcut=(b == 0),
                    dtype=self.dtype,
                    name=f"{stage_name}_block{b}",
                )(x)
            outputs[stage_name] = x
            out_ch *= 2
            bott_ch *= 2
        return {k: v for k, v in outputs.items() if k in self.out_features}


def resnet_from_cfg(cfg, dtype=None) -> ResNet:
    r = cfg.MODEL.RESNETS
    return ResNet(
        depth=r.DEPTH,
        out_features=tuple(r.OUT_FEATURES),
        stride_in_1x1=r.STRIDE_IN_1X1,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        stem_mode="s2d" if cfg.TPU.STEM_SPACE_TO_DEPTH else cfg.TPU.STEM_MODE,
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )
