"""Fused sigmoid focal loss as a Pallas TPU kernel with custom VJP.

Equivalent of fvcore's sigmoid_focal_loss_jit (reference usage:
fcos_outputs.py:329, 619) but fused: one VMEM pass computes the per-element
loss; the backward pass is a second fused kernel using the analytic
gradient, so no intermediate (p, ce, p_t) tensors ever hit HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 512


def _fwd_kernel(x_ref, t_ref, out_ref, *, alpha: float, gamma: float):
    x = x_ref[...]
    t = t_ref[...]
    p = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * t + (1.0 - p) * (1.0 - t)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * t + (1.0 - alpha) * (1.0 - t)) * loss
    out_ref[...] = loss


def _bwd_kernel(x_ref, t_ref, g_ref, dx_ref, *, alpha: float, gamma: float):
    """Analytic d(loss)/dx * g.

    loss = a_t * (1 - p_t)^g * ce
    d ce / dx = p - t
    d p_t / dx = p (1 - p) * (2t - 1)
    d loss / dx = a_t * [ (1-p_t)^g (p - t)
                         - g (1-p_t)^(g-1) p(1-p)(2t-1) ce ]
    """
    x = x_ref[...]
    t = t_ref[...]
    g = g_ref[...]
    p = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * t + (1.0 - p) * (1.0 - t)
    one_m = jnp.maximum(1.0 - p_t, 1e-20)
    term = one_m**gamma * (p - t) - gamma * one_m ** (gamma - 1.0) * p * (
        1.0 - p
    ) * (2.0 * t - 1.0) * ce
    if alpha >= 0:
        term = (alpha * t + (1.0 - alpha) * (1.0 - t)) * term
    dx_ref[...] = term * g


def _call(kernel, n_out, *args, alpha, gamma, interpret):
    rows, cols = args[0].shape
    grid = (pl.cdiv(rows, _BLOCK_ROWS),)
    spec = pl.BlockSpec(
        (_BLOCK_ROWS, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(kernel, alpha=alpha, gamma=gamma),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        grid=grid,
        in_specs=[spec] * len(args),
        out_specs=spec,
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sigmoid_focal_loss_pallas(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-element focal loss, same semantics as ops.losses.sigmoid_focal_loss.

    Inputs must be 2-D (N, C); reshape at the call site.
    """
    return _call(_fwd_kernel, 1, logits, targets,
                 alpha=alpha, gamma=gamma, interpret=interpret)


def _fwd(logits, targets, alpha, gamma, interpret):
    out = _call(_fwd_kernel, 1, logits, targets,
                alpha=alpha, gamma=gamma, interpret=interpret)
    return out, (logits, targets)


def _bwd(alpha, gamma, interpret, residuals, g):
    logits, targets = residuals
    dx = _call(_bwd_kernel, 1, logits, targets, g,
               alpha=alpha, gamma=gamma, interpret=interpret)
    return dx, None


sigmoid_focal_loss_pallas.defvjp(_fwd, _bwd)
