"""Fused ResNet stem as a Pallas TPU kernel.

One VMEM pass computes 7x7/s2 conv + folded FrozenBN affine + ReLU +
3x3/s2 maxpool — the full detectron2 BasicStem as consumed by the
reference backbone (reference: ubteacher/modeling/backbone/fpn.py:59 →
d2 resnet.py BasicStem). The stem is frozen (FREEZE_AT >= 1 in every
recipe) so this is a forward-only hot path: no backward kernel needed;
a custom_vjp falls back to differentiating the XLA reference composition
in the (never exercised) unfrozen case.

Why a kernel: C_in=3 starves the MXU — XLA's conv runs ~20x off its
roofline (measured 5.8 ms vs a ~0.3 ms floor on the RCNN mutual step) —
and the conv→affine→relu→pool chain round-trips the full (H/2, W/2, 64)
activation through HBM. Here only the pooled (H/4, W/4, 64) output ever
reaches HBM, and the conv itself runs as five dense (M, 84) @ (84, 64)
GEMMs per block.

The stride-2 problem and the mod-4 phase trick
----------------------------------------------
A stride-2 conv along the lane (W) axis needs stride-2 lane gathers,
which Mosaic has no cheap primitive for. Decompose W into 4 phases
(w % 4). Output col xo reads input cols u = 2*xo + kx - 3 (kx < 7):

  even xo = 2m: u = 4m + kx - 3 → phases (1,2,3) at m-1, (0,1,2,3) at m
  odd xo = 2m+1: u = 4m + kx - 1 → phase 3 at m-1, (0..3) at m, (0,1) at m+1

so with phase-split input every tap is a whole phase plane at a STATIC
shift s ∈ {-1, 0, +1} along the phase index m. The XLA prep packs, for
each conv row r, the 7 ky input rows × 4 phases × 3 channels into an
84-long lane axis of X[b, r, m, :] (im2col along H only — contiguous
strided row slices, no lane gathers). The kernel then needs exactly five
GEMMs per block of conv rows: one per (output parity, shift) pair, with
a weight matrix that zeroes the phases not active at that shift. The
FrozenBN scale is folded into the weights, the bias is added before the
in-kernel ReLU, and pooling (post-ReLU values are >= 0, so shifted-in /
padded zeros are exact -inf-pad equivalents) runs on registers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (parity, shift) → {phase: kx} tap maps; see module docstring derivation.
_TAPS = (
    {1: 0, 2: 1, 3: 2},          # even, s=-1
    {0: 3, 1: 4, 2: 5, 3: 6},    # even, s=0
    {3: 0},                      # odd,  s=-1
    {0: 1, 1: 2, 2: 3, 3: 4},    # odd,  s=0
    {0: 5, 1: 6},                # odd,  s=+1
)

# static 0/1 selector: sel[i, g, ky, kx, c] with g = ky*12 + ph*3 + c
_SEL = np.zeros((5, 84, 7, 7, 3), np.float32)
for _i, _taps in enumerate(_TAPS):
    for _ky in range(7):
        for _ph, _kx in _taps.items():
            for _c in range(3):
                _SEL[_i, _ky * 12 + _ph * 3 + _c, _ky, _kx, _c] = 1.0


def _fold_weights(kernel, scale, dtype):
    """(3, 84, 2C) shift matrices from the (7,7,3,C) kernel, scale folded.

    The even- and odd-parity output columns share the s=-1 and s=0 input
    slabs, so their weight matrices are concatenated along the output
    axis: one (84, 2C) GEMM per shift computes both parities at full
    MXU lane utilization (2C = 128 for the C=64 stem)."""
    k = kernel.astype(jnp.float32) * scale.astype(jnp.float32)
    # HIGHEST: XLA's default TPU f32 contraction rounds operands through
    # bf16 (~2^-9 relative) — that error would bake into the weights.
    m5 = jnp.einsum(
        "sgabc,abco->sgo", jnp.asarray(_SEL), k,
        precision=lax.Precision.HIGHEST,
    )
    zero = jnp.zeros_like(m5[0])
    mats = jnp.stack(
        [
            jnp.concatenate([m5[0], m5[2]], axis=1),  # s=-1: even | odd
            jnp.concatenate([m5[1], m5[3]], axis=1),  # s=0
            jnp.concatenate([zero, m5[4]], axis=1),   # s=+1: odd only
        ]
    )
    return mats.astype(dtype)


def _prep_inputs(x, dtype):
    """(B, Ho+8, Wq+2, 84) phase-packed H-im2col rows (see docstring)."""
    b, h, w, cin = x.shape
    ho, wq = h // 2, w // 4
    x = x.astype(dtype)
    # H pad (3, 2): conv row r reads rows 2r+ky-3 ∈ [-3, h+1].
    # W pad (4, 4): phase block m ∈ [-1, wq] ↔ padded col 4(m+1)+ph.
    xp = jnp.pad(x, ((0, 0), (3, 2), (4, 4), (0, 0)))
    xv = xp.reshape(b, h + 5, wq + 2, 4, cin)
    # ky-slab for conv row r = padded rows 2r + ky, r ∈ [0, Ho)
    slabs = [xv[:, ky : ky + 2 * ho - 1 : 2] for ky in range(7)]
    xall = jnp.stack(slabs, axis=3)  # (B, Ho, WqP, 7, 4, 3)
    xall = xall.reshape(b, ho, wq + 2, 84)
    # one zero conv-row on top (pool row 0's excluded conv row -1) and 7
    # tail rows so the +1-row overlap spec's last 8-row fetch is in range
    return jnp.pad(xall, ((0, 0), (1, 7), (0, 0), (0, 0)))


def _stem_kernel(x1_ref, x2_ref, kmat_ref, bias_ref, out_ref, *, rhp, wq,
                 acc_dtype_exact):
    pb = pl.program_id(1)
    rr = 2 * rhp + 1
    out_dtype = out_ref.dtype
    xw = jnp.concatenate([x1_ref[0], x2_ref[0, :1]], axis=0)  # (rr,WqP,84)

    prec = lax.Precision.HIGHEST if acc_dtype_exact else None
    kmat = kmat_ref[...]

    def shifted(s):
        return xw[:, s : s + wq, :].reshape(rr * wq, 84)

    def mm(a, m):
        return lax.dot_general(
            a, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    x0, x1s, x2s = shifted(0), shifted(1), shifted(2)
    # one (M, 84) @ (84, 2C) GEMM per shift computes both output parities
    # (full 128-lane MXU util); bias+ReLU run in the output dtype (the
    # XLA path's affine is bf16 too) to keep f32 traffic to the GEMM sum.
    acc = mm(x0, kmat[0]) + mm(x1s, kmat[1]) + mm(x2s, kmat[2])
    feat = acc.shape[-1] // 2
    y = jnp.maximum(acc.astype(out_dtype) + bias_ref[...], 0)
    y = y.reshape(rr, wq, 2 * feat)

    # 3x3/s2 pool, pad 1: pooled (j, q) covers conv rows 2j..2j+2 (window-
    # local; global row 2p-1..2p+1) and conv cols 2q-1, 2q, 2q+1 =
    # odd[q-1], even[q], odd[q]. Everything is post-ReLU so 0 == -inf pad.
    # The q-1 shift runs on the full-lane row-pooled tensor (lane offset
    # 0) — shifting the odd lane-slice directly trips a Mosaic concat
    # layout mismatch (offset-64 operand vs offset-0 zeros).
    def wcombine(ym):
        ysh = jnp.concatenate(
            [jnp.zeros_like(ym[..., :1, :]), ym[..., :-1, :]], axis=-2
        )
        return jnp.maximum(
            jnp.maximum(ym[..., :feat], ym[..., feat:]), ysh[..., feat:]
        )

    # stride-2 row selection via major-dim pair reshapes (Mosaic lowers
    # strided slices as unsupported >2D gathers): rows (2j, 2j+1) from the
    # [0, 2rhp) split, row 2j+2 from the [1, 2rhp+1) split's second half.
    def rowmax3(c):
        a = c[: 2 * rhp].reshape(rhp, 2, wq, -1)
        z = c[1 : 2 * rhp + 1].reshape(rhp, 2, wq, -1)
        return jnp.maximum(jnp.maximum(a[:, 0], a[:, 1]), z[:, 1])

    out_ref[0] = wcombine(rowmax3(y))

    # global pooled row 0: conv row -1 is a zero-X pad row whose folded
    # affine is relu(bias) != 0 — recompute from conv rows 1, 2 only.
    @pl.when(pb == 0)
    def _():
        out_ref[0, 0] = wcombine(jnp.maximum(y[1], y[2]))


def _reference(x, kernel, scale, bias, dtype):
    """XLA composition with the exact module-path semantics
    (StemConv + FrozenBN + relu + max_pool in modeling/resnet.py)."""
    y = lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * scale.astype(dtype) + bias.astype(dtype)
    y = jnp.maximum(y, 0)
    return lax.reduce_window(
        y, -jnp.inf if y.dtype == jnp.float32 else jnp.array(
            -jnp.inf, y.dtype),
        lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _pallas_impl(x, kernel, scale, bias, dtype, interpret):
    b, h, w, _ = x.shape
    hp, wq = h // 4, w // 4
    feat = kernel.shape[-1]
    xall = _prep_inputs(x, dtype)
    kmat = _fold_weights(kernel, scale, dtype)
    bias2 = jnp.concatenate([bias, bias]).reshape(1, 2 * feat).astype(dtype)
    return _call_kernel(xall, kmat, bias2, b, hp, wq, feat, interpret)


def _call_kernel(xall, kmat, bias2, b, hp, wq, feat, interpret):
    dtype = xall.dtype
    # 2*rhp must be a multiple of 8 for the +1-row overlap spec's 8-row
    # fetch alignment; the scoped-VMEM cap below covers the footprint at
    # rhp=16 bf16 / rhp=8 f32 (v5e has 128 MB VMEM — the 16 MB default
    # scoped cap is not the hardware).
    if dtype != jnp.float32 and hp % 16 == 0:
        rhp = 16
    else:
        rhp = 8 if hp % 8 == 0 else 4
    wqp = wq + 2
    grid = (b, hp // rhp)
    kern = functools.partial(
        _stem_kernel, rhp=rhp, wq=wq,
        acc_dtype_exact=(dtype == jnp.float32),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, hp, wq, feat), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 2 * rhp, wqp, 84), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, wqp, 84),
                lambda i, j: (i, (2 * rhp * (j + 1)) // 8, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rhp, wq, feat), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xall, xall, kmat, bias2)


def _supported(x, dtype):
    b, h, w, cin = x.shape
    if cin != 3 or h % 4 or w % 4:
        return False
    if (h // 4) % 4:
        return False
    wq = w // 4
    # Mosaic major→sublane merges need the sublane dim tile-aligned
    if wq % (16 if dtype == jnp.bfloat16 else 8):
        return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def stem_conv_pool(x, kernel, scale, bias, dtype=jnp.bfloat16,
                   interpret=False):
    """Fused stem: conv7x7/s2 + (scale, bias) affine + ReLU + maxpool3x3/s2.

    x: (B, H, W, 3) float; kernel: (7, 7, 3, C); scale/bias: (C,).
    Returns (B, H/4, W/4, C) in `dtype`. Falls back to the XLA
    composition for shapes the kernel does not cover and on non-TPU
    backends (interpret=True forces the Pallas path for tests).
    """
    if not _supported(x, dtype):
        return _reference(x, kernel, scale, bias, dtype)
    if not interpret:
        from jax.extend import backend as _jax_backend

        if _jax_backend.get_backend().platform != "tpu":
            return _reference(x, kernel, scale, bias, dtype)
    return _pallas_impl(x, kernel, scale, bias, dtype, interpret)


def _fwd(x, kernel, scale, bias, dtype, interpret):
    out = stem_conv_pool(x, kernel, scale, bias, dtype, interpret)
    return out, (x, kernel, scale, bias)


def _bwd(dtype, interpret, residuals, g):
    # The stem is frozen in every recipe, so this path is never traced in
    # training; it exists so non-frozen configurations stay correct.
    x, kernel, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, dtype), x, kernel, scale, bias
    )
    return vjp(g.astype(dtype))


stem_conv_pool.defvjp(_fwd, _bwd)
