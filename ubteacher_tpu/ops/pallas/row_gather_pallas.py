"""Batched row gather whose transpose is a Pallas scatter-add kernel.

take_rows(x (B, L, D), rows (B, K)) == jnp.take_along_axis(x, rows[...,
None], axis=1) — the forward gather lowers fine on TPU, but XLA's
transpose is a scatter-add into the full (B, L, D) grid that lowers to a
serial while-loop plus dynamic-update-slice chunking and layout copies
(~7 ms/step at RPN shapes: L ~ 86k rows, K ~ 384 sampled). The gradient
rows are few and small, so the Pallas backward keeps the whole per-image
gradient grid resident in VMEM ((D, L/128, 128) — the anchor dim split
sublane/lane so VMEM doesn't pad D up to a full lane tile), accumulates
K rows with one-hot lane masks, and writes the grid out once.

Used by modeling/rpn.py rpn_losses (reference behavior: rpn.py:153-225
gathers via Instances indexing; the transpose there is torch
index_put_ on GPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _scatter_rows_kernel(rows_ref, g_ref, out_ref, *, k: int):
    """rows_ref (B, K) i32 scalar-prefetch; g_ref (1, K, D); out_ref
    (1, D, NL, 128) — row r of the (L, D) gradient lives at
    [:, r // 128, r % 128]."""
    b = pl.program_id(0)
    d = g_ref.shape[-1]
    out_ref[...] = jnp.zeros_like(out_ref)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    ident = (
        jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    ).astype(g_ref.dtype)

    def body(j, _):
        r = rows_ref[b, j]
        # row j of g as lanes, then a tiny matmul transposes it to sublanes
        g_row = jnp.sum(
            g_ref[0] * (kcol == j).astype(g_ref.dtype),
            axis=0,
            keepdims=True,
        )                                              # (1, D)
        g_t = jax.lax.dot_general(
            ident, g_row, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)                        # (D, 1)
        onehot = (lane == jax.lax.rem(r, _LANE)).astype(out_ref.dtype)
        upd = g_t[:, :, None] * onehot[None]           # (D, 1, 128)
        rhi = jax.lax.div(r, _LANE)
        cur = out_ref[0, :, pl.ds(rhi, 1), :]
        out_ref[0, :, pl.ds(rhi, 1), :] = cur + upd
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def scatter_rows_pallas(
    g: jnp.ndarray,      # (B, K, D)
    rows: jnp.ndarray,   # (B, K) int32 in [0, L)
    l: int,
    interpret=None,
) -> jnp.ndarray:
    """Transpose of the row gather: (B, L, D) grid with g[b, j] added at
    row rows[b, j] (duplicate rows accumulate, matching scatter-add).
    interpret=None resolves by backend (compiled on TPU, interpreted
    elsewhere — same convention as ops.roi_align)."""
    if interpret is None:
        from jax.extend import backend as _jax_backend

        interpret = _jax_backend.get_backend().platform != "tpu"
    b, k, d = g.shape
    nl = _round_up(l, _LANE) // _LANE
    out = pl.pallas_call(
        functools.partial(_scatter_rows_kernel, k=k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (1, k, d), lambda bi, rr: (bi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, d, nl, _LANE), lambda bi, rr: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, nl, _LANE), g.dtype),
        interpret=interpret,
    )(rows.astype(jnp.int32), g)
    return out.transpose(0, 2, 3, 1).reshape(b, nl * _LANE, d)[:, :l]


def _scatter_rows_xla(g: jnp.ndarray, rows: jnp.ndarray, l: int):
    def one(gi, ri):
        return jnp.zeros((l,) + gi.shape[1:], gi.dtype).at[ri].add(gi)

    return jax.vmap(one)(g, rows)


@jax.custom_vjp
def take_rows(x: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """x (B, L, D), rows (B, K) -> (B, K, D); gradient flows to x only."""
    return jnp.take_along_axis(x, rows[..., None], axis=1)


def _take_rows_fwd(x, rows):
    return (
        jnp.take_along_axis(x, rows[..., None], axis=1),
        (rows, x.shape[1]),
    )


def _take_rows_bwd(res, g):
    rows, l = res
    # Pallas is opaque to GSPMD; shard the batch over the data mesh. The
    # kernel runs interpreted off-TPU, so CPU tests and dryrun_multichip
    # exercise this exact path.
    from ...parallel.mesh import shard_over_data

    call = shard_over_data(
        functools.partial(scatter_rows_pallas, l=l), g.shape[0], 2
    )
    return call(g, rows), np.zeros(rows.shape, jax.dtypes.float0)


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)
