"""GIoU loss on aligned ltrb distances as a fused Pallas TPU kernel.

Equivalent of IOULoss('giou') (reference: layers/iou_loss.py:23-76) including
its (I+1)/(U+1) iou smoothing. Layout: ltrb components arrive as 4 separate
(1, N)-style rows packed into an (8, N) tile per operand so the whole loss
is lane-parallel VPU math. Differentiable via a custom VJP whose backward is
computed with jax.grad over the same formula in interpret-able form (the
per-element formula is cheap; the win is fusing 20+ elementwise ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _giou_formula(p, t):
    """p, t: (..., 4) ltrb; returns per-row loss (1 - giou)."""
    pl_, pt_, pr_, pb_ = (p[..., i] for i in range(4))
    tl, tt, tr, tb = (t[..., i] for i in range(4))
    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl_ + pr_) * (pt_ + pb_)
    w_i = jnp.minimum(pl_, tl) + jnp.minimum(pr_, tr)
    h_i = jnp.minimum(pb_, tb) + jnp.minimum(pt_, tt)
    g_w = jnp.maximum(pl_, tl) + jnp.maximum(pr_, tr)
    g_h = jnp.maximum(pb_, tb) + jnp.maximum(pt_, tt)
    ac = g_w * g_h
    inter = w_i * h_i
    union = target_area + pred_area - inter
    ious = (inter + 1.0) / (union + 1.0)
    gious = ious - (ac - union) / jnp.where(ac == 0, 1.0, ac)
    return 1.0 - gious


def _fwd_kernel(p_ref, t_ref, w_ref, out_ref):
    # rows 0..3 = ltrb, packed (8, N)
    p = jnp.stack([p_ref[i, :] for i in range(4)], axis=-1)  # (N, 4)
    t = jnp.stack([t_ref[i, :] for i in range(4)], axis=-1)
    loss = _giou_formula(p, t) * w_ref[0, :]
    out_ref[...] = loss[None, :]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def giou_loss_pallas(
    pred_ltrb: jnp.ndarray,     # (N, 4)
    target_ltrb: jnp.ndarray,   # (N, 4)
    weight: jnp.ndarray,        # (N,)
    interpret: bool = False,
) -> jnp.ndarray:
    """Weighted SUM of per-row GIoU losses (matches ops.losses.iou_loss)."""
    return _run(pred_ltrb, target_ltrb, weight, interpret).sum()


def _run(pred, target, weight, interpret):
    n_in = pred.shape[0]
    n = _round_up(max(n_in, 128), 128)

    def pack(x):
        out = jnp.zeros((8, n), jnp.float32)
        return out.at[:4, :n_in].set(x.T)

    wrow = jnp.zeros((8, n), jnp.float32).at[0, :n_in].set(weight)
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pack(pred), pack(target), wrow)
    return out[0, :n_in]


def _fwd(pred, target, weight, interpret):
    return giou_loss_pallas(pred, target, weight, interpret), (pred, target, weight)


def _bwd(interpret, residuals, g):
    pred, target, weight = residuals
    # analytic-via-autodiff on the plain formula (fused by XLA; backward is
    # off the hot path relative to the conv towers)
    def f(p):
        return (_giou_formula(p, target) * weight).sum()

    dp = jax.grad(f)(pred) * g
    return dp, None, None


giou_loss_pallas.defvjp(_fwd, _bwd)
