"""Greedy NMS as a Pallas TPU kernel.

Replaces the O(K^2)-memory XLA path in ops/nms.py (which materializes the
full IoU matrix) with a blocked streaming kernel. Same kept set as
ops.nms.nms_keep (torchvision semantics: suppress IoU > threshold).

Greedy NMS is sequentially dependent, but the dependency is only BETWEEN
overlap chains, whose depth on real box data is tiny. Structure:
  * candidates are packed score-descending into (NB, 8, 128) blocks
    (x1, y1, x2, y2, area, valid, nvalid on separate sublanes);
  * within a block, greedy suppression is solved as the unique fixpoint of
      k = k0 & ~(k @ U)          (U = strictly-upper suppression matrix)
    iterated to convergence with a while_loop. Each iteration is one
    (1,128)x(128,128) matmul; the iteration count equals the block's
    suppression-chain depth (measured <= 8 on clustered 2048-box RPN
    pools), replacing the 128-step sequential scalar loop of the previous
    version (~16x less sequential work per block);
  * after a block is decided, one dense (128, 128) pass per LATER block
    suppresses its candidates against everything this block kept (the
    block geometry is transposed to sublanes by a single small matmul);
    later blocks then start their fixpoint with that suppression applied.

Three hard-won compiled-mode rules (tools/validate_tpu.py check_nms
guards the numeric ones against an f64 host reference; interpret mode
would never catch them):
  * Matmul-transposed GEOMETRY needs Precision.HIGHEST. The MXU's default
    f32 matmul rounds operands through bf16 (~2^-9 relative error), so the
    identity-matmul transpose silently corrupted coordinates; pairs with
    IoU up to ~4e-3 from the threshold flipped (measured: a pair at f64
    IoU 0.60031 escaped suppression at threshold 0.6). 0/1-valued dots
    are bf16-exact and keep the fast default.
  * NO division in the threshold compare: Mosaic lowers f32 `a / b` via
    the hardware approximate reciprocal (~2.4e-4 relative error). The
    kernel compares `inter > t * union` — exact to one multiply ulp —
    which is also cheaper.
  * nvalid rides in spare sublane 6 of the packed geometry (all lanes
    broadcast) instead of an SMEM operand: scalar operands cannot be
    blocked by vmap batching, and the RCNN path vmaps NMS twice
    (per-image over per-level).

Candidates arrive score-sorted with invalid rows at the tail, so only the
first ceil(nvalid/128) blocks can contain work — the block loops are
bounded by that count, making kernel cost track the candidates that
actually survive the pre-NMS score threshold (like the reference's
dynamic-shape NMS) instead of the static pool size.

The caller pre-sorts by score descending (XLA sort) and pads K to a
multiple of 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 128


def _nms_kernel(blocks_ref, out_ref, sup_ref, *, nb: int, iou_threshold: float):
    """One grid program per image. blocks_ref: (NB, 8, 128) f32 (the image's
    candidates; grid dim squeezed), sublanes = [x1, y1, x2, y2, area,
    valid, nvalid, 0]; out_ref / sup_ref: (NB, 1, 128) f32 keep /
    suppression."""
    out_ref[...] = jnp.zeros_like(out_ref)
    sup_ref[...] = jnp.zeros_like(sup_ref)
    nv = jnp.max(blocks_ref[0, 6:7, :]).astype(jnp.int32)
    nbv = jnp.minimum((nv + _BLK - 1) // _BLK, nb)
    ident = (
        jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 1)
    ).astype(jnp.float32)
    # strict upper triangle: within a block, candidate i (sublane, higher
    # score) may suppress candidate j (lane) only if i < j in score order
    upper = (
        jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BLK), 1)
    )

    def outer(b, _):
        blk = blocks_ref[b]                        # (8, 128)
        area = blk[4:5]
        valid = blk[5:6]

        # block geometry to sublanes: one small matmul transposes all 8
        # rows at once. Precision.HIGHEST is REQUIRED: the MXU's default
        # f32 matmul rounds operands through bf16 (~2^-9 relative), which
        # corrupted transposed coordinates enough to flip IoU comparisons
        # up to ~4e-3 from the threshold (measured; see module docstring).
        # A 3-pass bf16 identity matmul reconstructs f32 exactly. The 0/1
        # dots below (kept_col, k @ eligf) are bf16-exact and stay default.
        blk_t = jax.lax.dot_general(
            ident, blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                          # (128, 8)
        tx1 = blk_t[:, 0:1]
        ty1 = blk_t[:, 1:2]
        tx2 = blk_t[:, 2:3]
        ty2 = blk_t[:, 3:4]
        tarea = blk_t[:, 4:5]

        def overlaps(blk2):
            """(128, 128) mask: sublane candidate i of THIS block overlaps
            lane candidate j of blk2 past the threshold. Division-free:
            iou > t  <=>  inter > t * union (union >= inter >= 0)."""
            ix1 = jnp.maximum(tx1, blk2[0:1])
            iy1 = jnp.maximum(ty1, blk2[1:2])
            ix2 = jnp.minimum(tx2, blk2[2:3])
            iy2 = jnp.minimum(ty2, blk2[3:4])
            inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
            union = tarea + blk2[4:5] - inter
            return inter > iou_threshold * union

        # in-block greedy as a fixpoint: k = k0 & ~(k @ U). U strictly
        # upper => unique fixpoint = the sequential greedy solution; the
        # iteration converges in suppression-chain-depth steps.
        eligf = jnp.where(overlaps(blk) & upper, 1.0, 0.0)  # (128, 128)
        k0 = jnp.where((valid > 0.0) & (sup_ref[b] == 0.0), 1.0, 0.0)

        def fix_cond(c):
            _, changed, it = c
            return changed & (it <= _BLK)

        def fix_body(c):
            k, _, it = c
            s = jax.lax.dot_general(
                k, eligf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                      # (1, 128)
            k_new = jnp.where((k0 > 0.0) & (s == 0.0), 1.0, 0.0)
            return k_new, jnp.any(k_new != k), it + 1

        keptb, _, _ = jax.lax.while_loop(
            fix_cond, fix_body, (k0, jnp.bool_(True), jnp.int32(0))
        )
        out_ref[b] = keptb

        kept_col = jax.lax.dot_general(
            ident, keptb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # (128, 1)

        def cross(bb, _):
            hit = overlaps(blocks_ref[bb]).astype(jnp.float32) * kept_col
            sup_ref[bb] = jnp.maximum(
                sup_ref[bb], hit.max(axis=0, keepdims=True)
            )
            return 0

        jax.lax.fori_loop(b + 1, nbv, cross, 0)
        return 0

    jax.lax.fori_loop(0, nbv, outer, 0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _nms_core(nb: int, iou_threshold: float, interpret: bool):
    """Batched pallas core: blocks (B, NB, 8, 128) f32 -> keep
    (B, NB, 1, 128) f32, one grid program per image.

    Wrapped in custom_vmap so any vmap nesting at the call sites (per-image
    decode, per-level RPN inside per-image — i.e. vmap of vmap) FLATTENS
    extra batch dims into the grid dim instead of stacking batching grid
    dims."""

    def impl(blocks):
        bsz = blocks.shape[0]
        return pl.pallas_call(
            functools.partial(
                _nms_kernel, nb=nb, iou_threshold=iou_threshold
            ),
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec((None, nb, 8, _BLK), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((None, nb, 1, _BLK), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bsz, nb, 1, _BLK), jnp.float32),
            scratch_shapes=[pltpu.VMEM((nb, 1, _BLK), jnp.float32)],
            interpret=interpret,
        )(blocks)

    core = jax.custom_batching.custom_vmap(impl)

    @core.def_vmap
    def _rule(axis_size, in_batched, blocks):
        del axis_size
        assert in_batched[0]
        flat = core(blocks.reshape((-1,) + blocks.shape[2:]))
        return flat.reshape(blocks.shape[:2] + flat.shape[1:]), True

    return core


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_keep_pallas(
    boxes: jnp.ndarray,    # (K, 4) xyxy
    scores: jnp.ndarray,   # (K,)
    valid: jnp.ndarray,    # (K,) bool
    iou_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in equivalent of ops.nms.nms_keep. Returns keep mask (K,).

    Non-differentiable by construction (the output is a boolean mask);
    inputs are stop_gradient'ed so autodiff tracing never descends into the
    pallas_call.
    """
    boxes = jax.lax.stop_gradient(boxes)
    scores = jax.lax.stop_gradient(scores)
    k_in = boxes.shape[0]
    k = _round_up(k_in, _BLK)
    nb = k // _BLK

    masked = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-masked)
    sboxes = boxes[order]
    svalid = valid[order]

    x1, y1, x2, y2 = (sboxes[:, i] for i in range(4))
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    packed = jnp.zeros((8, k), jnp.float32)
    packed = packed.at[0, :k_in].set(x1)
    packed = packed.at[1, :k_in].set(y1)
    packed = packed.at[2, :k_in].set(x2)
    packed = packed.at[3, :k_in].set(y2)
    packed = packed.at[4, :k_in].set(area)
    packed = packed.at[5, :k_in].set(svalid.astype(jnp.float32))
    nvalid = jnp.sum(valid.astype(jnp.float32))
    packed = packed.at[6, :].set(nvalid)
    blocks = packed.reshape(8, nb, _BLK).transpose(1, 0, 2)  # (NB, 8, 128)

    core = _nms_core(nb, float(iou_threshold), bool(interpret))
    out = core(blocks[None])[0]

    keep_sorted = out.reshape(-1)[:k_in] > 0.5
    return jnp.zeros((k_in,), bool).at[order].set(keep_sorted)
