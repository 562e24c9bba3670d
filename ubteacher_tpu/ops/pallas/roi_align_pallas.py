"""Windowed multi-level ROIAlign as Pallas TPU kernels.

TPU-native replacement for detectron2's C++/CUDA ROIAlignV2 + ROIPooler
(reference: ubteacher/modeling/roi_heads/roi_heads.py:40-45,118; SURVEY.md
§2b), and for the XLA formulations in ops/roi_align.py. Why a kernel: the
full-map matmul formulation wastes ~15x FLOPs (it contracts every roi
against the whole feature map, on all 4 levels), while the XLA windowed
variant pays per-roi dynamic-slice gathers that measured 2.1x slower than
the waste it removes. Here the per-roi window crop is an **async DMA**
(double-buffered, overlapped with the previous roi's matmul) and the FPN
level is selected per roi inside the kernel (4 predicated DMA sources), so
both sources of waste are gone.

Math: bilinear interpolation along an axis is a sparse weight row
w[p, h] = relu(1 - |y_p - h|); averaging the bin's sample grid is linear,
so it folds into the weights (ops.roi_align.bin_axis_weights — including
the D2-adaptive sampling_ratio=0 grid as masked coefficients). The
whole pooled output for one roi is then ONE matmul:
    out[(p,q), c] = sum_{(h,w)} W2t[(h,w), (p,q)] * crop[(h,w), c]
with W2t = kron(wy_bin, wx_bin), TRANSPOSED and built in VMEM inside the
kernel from the small separable factors (_kron_in_kernel — the former
XLA-side (N, P*P, Wh*Ww) tensor cost >1 GB of HBM plus a same-size layout
copy at RCNN shapes). (W*W, P*P) contracted on its first dim against
(W*W, C) rides the MXU; all kernel reshapes only collapse/expand major
dims (layout-preserving on TPU tiles — Mosaic rejects minor-dim merges,
which is why the kron is built with P*P as the lane dim).

The backward (d/dfeatures only — proposals are detached, like D2's
ROIAlign which never backprops to roi coords) is the exact transpose:
dcrop = W2t @ g per roi (a plain matmul in the transposed layout),
accumulated into the per-level feature gradient. The default backward is
TILE-COALESCED (_bwd_tiled_kernel): rois sort by (image, level, 48x112
spatial tile) and each sequential grid step does ONE read-modify-write
of a tile+window region for all its rois — clustered proposals'
overlapping windows move once instead of per roi (~2x the per-roi RMW
kernel, which remains under UBT_ROIALIGN_BWD=roi). TPU grid steps run
sequentially on a core, so overlapping regions accumulate without races.

Oversized rois (clamped into p5 by FPN level assignment with a span larger
than the window) clamp their outer samples to the window edge — documented
deviation shared with ops.roi_align.roi_align_windowed.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..roi_align import assign_levels, bin_axis_weights, bin_sample_positions

# backward implementation: "tiled" (default) or "roi" (per-roi RMW, for
# A/B). Read ONCE at import — flipping the env var later would not evict
# already-jitted programs, so a mid-process flip must not look effective.
_BWD_IMPL = os.environ.get("UBT_ROIALIGN_BWD", "tiled")
if _BWD_IMPL not in ("tiled", "roi"):
    raise ValueError(f"UBT_ROIALIGN_BWD must be 'tiled' or 'roi', got {_BWD_IMPL}")

# forward implementation: "tiled" (coalesced window reads, default) or
# "roi" (per-roi window DMA, for A/B). Same read-once rule as above.
_FWD_IMPL = os.environ.get("UBT_ROIALIGN_FWD", "tiled")
if _FWD_IMPL not in ("tiled", "roi"):
    raise ValueError(f"UBT_ROIALIGN_FWD must be 'tiled' or 'roi', got {_FWD_IMPL}")

# ---------------------------------------------------------------- host prep


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _win_wh(window) -> Tuple[int, int]:
    """Normalize the window parameter to (win_h, win_w).

    Capacity: a roi is pooled exactly when its sample span fits, i.e.
    span_y <= win_h - 2 and span_x <= win_w - 9 (the W dim is
    sublane-tiled (8) in the HBM layout of (B, H, W, C) maps, so the DMA
    start x0 is aligned down to a multiple of 8, costing up to 7 px of
    x capacity). D2 level assignment gives base spans in [14, 28) px on
    the assigned level (x/y scaled by sqrt(ar) each way), so the default
    (48, 56) is exact for aspect ratios up to ~2.8 at the worst-case base
    span, and for whole-image rois clamped into p5 on canvases up to
    ~1470 px. Beyond that, outer samples clamp to the window edge
    (documented deviation, shared with roi_align_windowed)."""
    if isinstance(window, int):
        return window, _round_up(window, 8) + 8
    win_h, win_w = window
    if win_w % 8:
        raise ValueError(f"win_w must be a multiple of 8, got {win_w}")
    return win_h, win_w


def _size_classes(win_h: int, win_w: int) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Static DMA size classes per axis. The bilinear support of a roi is
    span+2 pixels — usually far below the full window (D2 level assignment
    puts base spans in [14, 28)); moving only the rows/cols that can be
    nonzero cuts the HBM traffic of the window DMAs ~2x (and much more for
    small rois) at identical math: weights outside the support are exactly
    zero. Col classes are multiples of 8 (W is the sublane dim in the HBM
    (B, H, W, C) layout)."""
    rows = tuple(c for c in (16, 32) if c < win_h) + (win_h,)
    cols = tuple(c for c in (24, 40) if c < win_w) + (win_w,)
    return rows, cols


def _prep(
    boxes: jnp.ndarray,        # (B, R, 4) xyxy image pixels
    level_hw: Tuple[Tuple[int, int], ...],  # true (H, W) per level
    levels: Tuple[int, ...],   # e.g. (2, 3, 4, 5)
    output_size: int,
    sampling_ratio: int,
    window,
):
    """Per-roi level assignment, window origins, DMA size classes and
    bin-collapsed bilinear weights. Returns (bidx, lvl, rcls, ccls, y0, x0)
    int32 (N,) and wy, wx f32 (N, P, window)."""
    b, r, _ = boxes.shape
    n = b * r
    win_h, win_w = _win_wh(window)
    flat = boxes.reshape(n, 4)
    min_lvl, max_lvl = min(levels), max(levels)
    assigned = assign_levels(flat, min_lvl, max_lvl)      # (N,) absolute lvl
    lvl_idx = assigned - min_lvl                          # (N,) 0-based
    scale = 0.5 ** assigned.astype(jnp.float32)           # (N,)

    hs = jnp.asarray([hw[0] for hw in level_hw], jnp.float32)[lvl_idx]
    ws = jnp.asarray([hw[1] for hw in level_hw], jnp.float32)[lvl_idx]
    # padded map sizes (what the DMA window must stay inside)
    hp = jnp.asarray(
        [max(hw[0], win_h) for hw in level_hw], jnp.float32
    )[lvl_idx]
    wp = jnp.asarray(
        [_round_up(max(hw[1], win_w), 8) for hw in level_hw], jnp.float32
    )[lvl_idx]

    p = output_size
    # aligned=True sample coords on the assigned level
    x1 = flat[:, 0] * scale - 0.5
    y1 = flat[:, 1] * scale - 0.5
    x2 = flat[:, 2] * scale - 0.5
    y2 = flat[:, 3] * scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)
    # sample positions + grid-average coefficients (N, P, S); adaptive
    # grids (sampling_ratio=0, ROIAlignV2) are masked slots of a static S
    ys, cy = bin_sample_positions(y1, roi_h, p, sampling_ratio)
    xs, cx = bin_sample_positions(x1, roi_w, p, sampling_ratio)
    ys = jnp.clip(ys, 0.0, hs[:, None, None] - 1.0)  # clip to TRUE map extent
    xs = jnp.clip(xs, 0.0, ws[:, None, None] - 1.0)  # so padding gets weight 0
    y0 = jnp.clip(jnp.floor(ys[:, 0, 0]) - 1.0, 0.0, hp - win_h)
    x0 = jnp.clip(jnp.floor(xs[:, 0, 0]) - 1.0, 0.0, wp - win_w)
    # HBM (B, H, W, C) maps are sublane-tiled on W: DMA start must be
    # 8-aligned (clip bound already leaves room for the widened window)
    x0 = jnp.floor(x0 / 8.0) * 8.0
    ys_loc = jnp.clip(ys - y0[:, None, None], 0.0, win_h - 1.0)
    xs_loc = jnp.clip(xs - x0[:, None, None], 0.0, win_w - 1.0)

    # DMA size class per roi: smallest class covering the bilinear support
    # (last sample's floor + 1, i.e. floor+2 rows/cols from the origin;
    # inactive sample slots alias the bin's first sample, so the max is the
    # max over active samples)
    row_cls, col_cls = _size_classes(win_h, win_w)
    rows_needed = jnp.minimum(
        jnp.floor(ys_loc.max(axis=(1, 2))) + 2.0, float(win_h)
    )
    cols_needed = jnp.minimum(
        jnp.floor(xs_loc.max(axis=(1, 2))) + 2.0, float(win_w)
    )
    rcls = jnp.searchsorted(
        jnp.asarray(row_cls, jnp.float32), rows_needed, side="left"
    ).astype(jnp.int32)
    ccls = jnp.searchsorted(
        jnp.asarray(col_cls, jnp.float32), cols_needed, side="left"
    ).astype(jnp.int32)

    # bin-collapsed weights (grid average folded in)
    wy = bin_axis_weights(ys_loc, cy, win_h)       # (N, P, win_h)
    wx = bin_axis_weights(xs_loc, cx, win_w)       # (N, P, win_w)

    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    return (
        bidx,
        lvl_idx.astype(jnp.int32),
        rcls,
        ccls,
        y0.astype(jnp.int32),
        x0.astype(jnp.int32),
        wy,
        wx,
    )


def _padded_hw(h: int, w: int, window) -> Tuple[int, int]:
    win_h, win_w = _win_wh(window)
    return max(h, win_h), _round_up(max(w, win_w), 8)


def _pad_levels(feats: Sequence[jnp.ndarray], window):
    """Pad each (B, H, W, C) map so the window DMA stays in-bounds."""
    out = []
    for f in feats:
        _, h, w, _ = f.shape
        th, tw = _padded_hw(h, w, window)
        if th > h or tw > w:
            f = jnp.pad(f, ((0, 0), (0, th - h), (0, tw - w), (0, 0)))
        out.append(f)
    return tuple(out)


def _kron_in_kernel(wy2: jnp.ndarray, wx2: jnp.ndarray) -> jnp.ndarray:
    """(P, Wh), (P, Ww) -> TRANSPOSED kron weights (Wh*Ww, P*P) in VMEM.

    The kron is ~260 KB per roi; building it in-kernel from the separable
    factors (a few KB each) replaces the former HBM-materialized
    (N, P*P, Wh*Ww) tensor — >1 GB at RCNN shapes, plus an XLA layout
    copy of the same size (profiled ~9 ms/step of copies alone).

    Transposed layout because Mosaic rejects merging minor dims in a
    shape cast ((P,P,Wh,Ww)->(PP,WhWw) needs lanes Ww->WhWw): with PP as
    the lane dim, expanding wy/wx to (Wh, PP)/(Ww, PP) via tiny one-hot
    selector matmuls and collapsing (Wh,Ww) — a supported major-dim
    merge — builds w2t [yx, pq] = wy[pq//P, y] * wx[pq%P, x] directly."""
    p, wh = wy2.shape
    ww = wx2.shape[1]
    pp = p * p
    pq = jax.lax.broadcasted_iota(jnp.int32, (p, pp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (p, pp), 0)
    sel_p = (row == pq // p).astype(wy2.dtype)   # one-hot of pq // P
    sel_q = (row == pq % p).astype(wx2.dtype)    # one-hot of pq % P
    wy_e = jax.lax.dot_general(                  # (Wh, PP)
        wy2, sel_p, (((0,), (0,)), ((), ())), preferred_element_type=wy2.dtype
    )
    wx_e = jax.lax.dot_general(                  # (Ww, PP)
        wx2, sel_q, (((0,), (0,)), ((), ())), preferred_element_type=wx2.dtype
    )
    w2t = wy_e[:, None, :] * wx_e[None, :, :]    # (Wh, Ww, PP)
    return w2t.reshape(wh * ww, pp)


# ------------------------------------------------------------- fwd kernel


def _fwd_kernel(
    bidx, lvl, rcls, ccls, y0, x0,   # scalar prefetch (N,) int32
    *rest,
    nlev: int,
    window,
):
    frefs = rest[:nlev]
    wy_ref = rest[nlev]
    wx_ref = rest[nlev + 1]
    out_ref = rest[nlev + 2]
    crop = rest[nlev + 3]
    sem = rest[nlev + 4]

    win_h, win_w = _win_wh(window)
    row_cls, col_cls = _size_classes(win_h, win_w)
    i = pl.program_id(0)
    nrois = pl.num_programs(0)

    def dma(slot, j, start):
        b, l, yy, xx = bidx[j], lvl[j], y0[j], x0[j]
        rc, cc = rcls[j], ccls[j]
        xx = pl.multiple_of(xx, 8)
        for k in range(nlev):
            for ri, rsz in enumerate(row_cls):
                for ci, csz in enumerate(col_cls):
                    copy = pltpu.make_async_copy(
                        frefs[k].at[b, pl.ds(yy, rsz), pl.ds(xx, csz), :],
                        crop.at[slot, :rsz, :csz],
                        sem.at[slot],
                    )

                    @pl.when((l == k) & (rc == ri) & (cc == ci))
                    def _(copy=copy):
                        if start:
                            copy.start()
                        else:
                            copy.wait()

    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        dma(0, 0, start=True)

    @pl.when(i + 1 < nrois)
    def _():
        dma(1 - slot, i + 1, start=True)

    dma(slot, i, start=False)

    # per-class matmul: weights outside the roi's size class are exactly
    # zero, so contracting only the class region is exact and cuts the
    # MXU work ~2x (the 49-lane output makes this matmul MXU-inefficient,
    # so its time scales with the contraction length). Exactly one class
    # predicate holds per roi, so out_ref is written exactly once.
    rc_i, cc_i = rcls[i], ccls[i]
    for ri, rsz in enumerate(row_cls):
        for ci, csz in enumerate(col_cls):
            @pl.when((rc_i == ri) & (cc_i == ci))
            def _(rsz=rsz, csz=csz):
                cr = crop[slot, :rsz, :csz]           # (rsz, csz, C)
                crf = cr.reshape(rsz * csz, cr.shape[-1])
                w2t = _kron_in_kernel(
                    wy_ref[0, :, :rsz], wx_ref[0, :, :csz]
                ).astype(crf.dtype)
                # out[pq, c] = sum_yx w2t[yx, pq] crf[yx, c] — A^T B form
                out = jax.lax.dot_general(
                    w2t,
                    crf,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                     # (P*P, C)
                out_ref[0] = out.astype(out_ref.dtype)


def _fwd_call(feats, wy, wx, bidx, lvl, rcls, ccls, y0, x0, *, window,
              interpret: bool):
    nlev = len(feats)
    n, p, win_h = wy.shape
    win_w = wx.shape[2]
    pp = p * p
    c = feats[0].shape[-1]
    dtype = feats[0].dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nlev
        + [
            pl.BlockSpec(
                (1, p, win_h), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, p, win_w), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, pp, c), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win_h, win_w, c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nlev=nlev, window=window),
        out_shape=jax.ShapeDtypeStruct((n, pp, c), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bidx, lvl, rcls, ccls, y0, x0, *feats, wy, wx)


# ------------------------------------------------- tiled fwd (coalesced)


def _fwd_tiled_kernel(
    start, tb, tl, tyo, txo, oidx, y0s, x0s, rcls, ccls,   # scalar prefetch
    *rest,
    nlev: int,
    window,
    p: int,
    extents: Tuple[Tuple[int, int], ...],
):
    """Tile-coalesced forward: rois are pre-sorted by (image, level,
    spatial tile); each grid step DMAs ONE (TILE+window)-sized feature
    region into VMEM and pools every roi of that tile against it (per-roi
    wy/wx rows double-buffered from HBM, per-roi outputs written back by
    double-buffered VMEM->HBM copies at the roi's ORIGINAL index, so no
    XLA-side unsort is needed). The per-roi window DMA of _fwd_kernel
    (~0.2-0.7 MB x N, overlapping windows re-read per roi) becomes one
    read per touched tile — ~4x less HBM traffic at RCNN shapes. Compute
    is identical: the same per-size-class kron matmul, now slicing the
    resident tile instead of a private crop."""
    frefs = rest[:nlev]
    wy_hbm = rest[nlev]
    wx_hbm = rest[nlev + 1]
    out_hbm = rest[nlev + 2]
    tile = rest[nlev + 3]           # (TBH, TBW, C)
    wyb = rest[nlev + 4]            # (2, P8, WH128)
    wxb = rest[nlev + 5]            # (2, P8, WW128)
    outb = rest[nlev + 6]           # (2, PP8, C)
    tsem = rest[nlev + 7]
    fsem = rest[nlev + 8]           # (2, 2)
    osem = rest[nlev + 9]           # (2,)

    win_h, win_w = _win_wh(window)
    row_cls, col_cls = _size_classes(win_h, win_w)
    t = pl.program_id(0)
    n0, n1 = start[t], start[t + 1]
    c = tile.shape[-1]
    pp = p * p

    def tile_in(do: str):
        bb, oy = tb[t], tyo[t]
        ox = pl.multiple_of(txo[t], 8)
        for k, (tbh, tbw) in enumerate(extents):
            copy = pltpu.make_async_copy(
                frefs[k].at[bb, pl.ds(oy, tbh), pl.ds(ox, tbw), :],
                tile.at[:tbh, :tbw],
                tsem,
            )

            @pl.when(tl[t] == k)
            def _(copy=copy, do=do):
                getattr(copy, do)()

    def fetch(slot, j, do: str):
        r = oidx[j]
        for q, (hbm, buf) in enumerate(((wy_hbm, wyb), (wx_hbm, wxb))):
            copy = pltpu.make_async_copy(
                hbm.at[r], buf.at[slot], fsem.at[slot, q]
            )
            getattr(copy, do)()

    def owrite(j, slot, do: str):
        copy = pltpu.make_async_copy(
            outb.at[slot], out_hbm.at[oidx[j]], osem.at[slot]
        )
        getattr(copy, do)()

    @pl.when(n1 > n0)
    def _():
        # the compute loop only writes rows [:pp]; zero the pad rows
        # [pp, pp_pad) once so the full-buffer DMA to HBM ships zeros,
        # not stale VMEM scratch (callers may slice them off, but the
        # out buffer must never contain garbage — ADVICE r4)
        if outb.shape[1] > pp:
            outb[:, pp:] = jnp.zeros_like(outb[:, pp:])
        tile_in("start")
        fetch(0, n0, "start")
        tile_in("wait")

        def body(j, _):
            slot = jax.lax.rem(j - n0, 2)

            @pl.when(j + 1 < n1)
            def _():
                fetch(1 - slot, j + 1, "start")

            fetch(slot, j, "wait")
            r = oidx[j]
            ly = y0s[r] - tyo[t]
            lx = pl.multiple_of(x0s[r] - txo[t], 8)
            rc, cc = rcls[r], ccls[r]
            # outb[slot] was handed to the DMA engine two rois ago (same
            # parity) — wait that write out before overwriting the buffer
            @pl.when(j - n0 >= 2)
            def _():
                owrite(j - 2, slot, "wait")

            for ri, rsz in enumerate(row_cls):
                for ci, csz in enumerate(col_cls):
                    @pl.when((rc == ri) & (cc == ci))
                    def _(rsz=rsz, csz=csz):
                        cr = tile[pl.ds(ly, rsz), pl.ds(lx, csz), :]
                        crf = cr.reshape(rsz * csz, c)
                        w2t = _kron_in_kernel(
                            wyb[slot, :p, :rsz], wxb[slot, :p, :csz]
                        ).astype(crf.dtype)
                        out = jax.lax.dot_general(
                            w2t, crf, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )                                     # (PP, C)
                        outb[slot, :pp] = out.astype(outb.dtype)

            owrite(j, slot, "start")
            return 0

        jax.lax.fori_loop(n0, n1, body, 0)
        # drain: the last one or two writes are still in flight
        last = n1 - 1
        owrite(last, jax.lax.rem(last - n0, 2), "wait")

        @pl.when(n1 - n0 >= 2)
        def _():
            owrite(last - 1, jax.lax.rem(last - 1 - n0, 2), "wait")


def _fwd_tiled_call(
    padded_feats, wy, wx, start, tb, tl, tyo, txo, oidx, y0, x0, rcls,
    ccls, *, window, output_size: int, extents, interpret: bool,
):
    nlev = len(padded_feats)
    n = wy.shape[0]
    c = padded_feats[0].shape[-1]
    dtype = padded_feats[0].dtype
    pp = output_size * output_size
    pp_pad = _round_up(pp, 8)
    tbh = max(e[0] for e in extents)
    tbw = max(e[1] for e in extents)
    t = tb.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (nlev + 2),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tbh, tbw, c), dtype),
            pltpu.VMEM((2,) + wy.shape[1:], wy.dtype),
            pltpu.VMEM((2,) + wx.shape[1:], wx.dtype),
            pltpu.VMEM((2, pp_pad, c), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_tiled_kernel, nlev=nlev, window=window, p=output_size,
            extents=tuple(extents),
        ),
        out_shape=jax.ShapeDtypeStruct((n, pp_pad, c), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(start, tb, tl, tyo, txo, oidx, y0, x0, rcls, ccls,
      *padded_feats, wy, wx)


# ------------------------------------------------------------- bwd kernel


def _bwd_kernel(
    bidx, lvl, rcls, ccls, y0, x0,
    *rest,
    nlev: int,
    window,
    pipelined: bool,
):
    # inputs: nlev zero-initialized grad buffers (aliased to outputs),
    # wy/wx blocks, g block; outputs: nlev grad buffers; scratch: two
    # window accumulators (parity double-buffer) + dcrop + read/write sems
    zrefs = rest[:nlev]          # aliased: same buffers as outputs
    wy_ref = rest[nlev]
    wx_ref = rest[nlev + 1]
    g_ref = rest[nlev + 2]
    outs = rest[nlev + 3 : nlev + 3 + nlev]
    acc = rest[2 * nlev + 3]     # (2, win_h, win_w, C)
    dcr = rest[2 * nlev + 4]
    rsem = rest[2 * nlev + 5]
    wsem = rest[2 * nlev + 6]
    del zrefs

    win_h, win_w = _win_wh(window)
    row_cls, col_cls = _size_classes(win_h, win_w)
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    # predicated partial-window RMW: only the roi's size class moves.
    # dcrop is exactly zero outside the class region (zero weights), so
    # skipping the read/write there is exact; the skipped region of acc
    # holds stale values that are never written back.
    def rmw(j, s, sem, to_vmem: bool, do: str):
        b, l, yy, xx = bidx[j], lvl[j], y0[j], x0[j]
        rc, cc = rcls[j], ccls[j]
        xx = pl.multiple_of(xx, 8)
        for k in range(nlev):
            for ri, rsz in enumerate(row_cls):
                for ci, csz in enumerate(col_cls):
                    region = outs[k].at[b, pl.ds(yy, rsz), pl.ds(xx, csz), :]
                    buf = acc.at[s, :rsz, :csz]
                    src, dst = (region, buf) if to_vmem else (buf, region)
                    copy = pltpu.make_async_copy(src, dst, sem.at[s])

                    @pl.when((l == k) & (rc == ri) & (cc == ci))
                    def _(copy=copy, do=do):
                        getattr(copy, do)()

    # Pipelined (B > 1): the write-back of roi i is NOT waited in step i —
    # it drains while step i+1 reads/computes. Safe because the host
    # interleaves rois across images (consecutive rois can never touch the
    # same region) and acc[slot] is only reused once roi i-2's write (same
    # parity) is waited here. Non-pipelined (B == 1): consecutive rois may
    # overlap, so the write is waited in-step (sequential RMW).
    if pipelined:
        @pl.when(i >= 2)
        def _():
            rmw(i - 2, slot, wsem, to_vmem=False, do="wait")
    rmw(i, slot, rsem, to_vmem=True, do="start")

    # dcrop[(hw), c] = sum_pq W2t[(hw), (pq)] * g[(pq), c] — the fwd W2t
    # contracted on its SECOND dim: a plain matmul, no transposed copy.
    # Per-class region only (weights beyond it are exactly zero), staged
    # into a scratch so the MXU work still overlaps the read DMA.
    c = g_ref.shape[-1]
    rc_i, cc_i = rcls[i], ccls[i]
    for ri, rsz in enumerate(row_cls):
        for ci, csz in enumerate(col_cls):
            @pl.when((rc_i == ri) & (cc_i == ci))
            def _(rsz=rsz, csz=csz):
                w2t = _kron_in_kernel(
                    wy_ref[0, :, :rsz], wx_ref[0, :, :csz]
                ).astype(g_ref.dtype)
                dcr[: rsz * csz] = jax.lax.dot_general(
                    w2t,
                    g_ref[0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                      # (rsz*csz, C)

    rmw(i, slot, rsem, to_vmem=True, do="wait")

    for ri, rsz in enumerate(row_cls):
        for ci, csz in enumerate(col_cls):
            @pl.when((rc_i == ri) & (cc_i == ci))
            def _(rsz=rsz, csz=csz):
                acc[slot, :rsz, :csz] = acc[slot, :rsz, :csz] + dcr[
                    : rsz * csz
                ].reshape(rsz, csz, c).astype(acc.dtype)

    rmw(i, slot, wsem, to_vmem=False, do="start")
    if pipelined:
        # drain: the final step leaves writes i and (if any) i-1 in flight
        @pl.when(i == n - 1)
        def _():
            rmw(n - 1, slot, wsem, to_vmem=False, do="wait")
        if n >= 2:
            @pl.when(i == n - 1)
            def _():
                rmw(n - 2, 1 - slot, wsem, to_vmem=False, do="wait")
    else:
        rmw(i, slot, wsem, to_vmem=False, do="wait")


def _bwd_call(
    zero_feats, wy, wx, g, bidx, lvl, rcls, ccls, y0, x0, *, window,
    pipelined: bool, interpret: bool,
):
    nlev = len(zero_feats)
    n, p, win_h = wy.shape
    win_w = wx.shape[2]
    pp = p * p
    c = zero_feats[0].shape[-1]
    dtype = zero_feats[0].dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nlev
        + [
            pl.BlockSpec(
                (1, p, win_h), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, p, win_w), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, pp, c), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nlev,
        scratch_shapes=[
            pltpu.VMEM((2, win_h, win_w, c), dtype),
            pltpu.VMEM((win_h * win_w, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, nlev=nlev, window=window, pipelined=pipelined
        ),
        out_shape=[
            jax.ShapeDtypeStruct(f.shape, f.dtype) for f in zero_feats
        ],
        grid_spec=grid_spec,
        # operand index space includes the 6 scalar-prefetch args
        input_output_aliases={6 + k: k for k in range(nlev)},
        interpret=interpret,
    )(bidx, lvl, rcls, ccls, y0, x0, *zero_feats, wy, wx, g)


# ------------------------------------------------- tiled fwd/bwd (coalesced)

_TILE_H, _TILE_W = 48, 112   # tile interior; the buffer adds the window


def _padto(v, s1, s2):
    """Pad the two minor dims up to (s1, s2) — per-roi row DMAs from HBM
    must move whole (8, 128) tiles."""
    return jnp.pad(v, ((0, 0), (0, s1 - v.shape[1]), (0, s2 - v.shape[2])))


def _tile_tables(padded_hw, b: int, win_h: int, win_w: int):
    """Static tile layout over every (image, level): stride-(48, 112)
    tiles whose read regions are CLAMPED to each level's padded bounds —
    both at the bottom/right edge and in overall extent, so a level
    smaller than one (48+win_h, 112+win_w) region gets a single region
    of its own exact size and the gradient buffers never grow beyond
    _padded_hw. Returns the per-tile scalar tables, the per-level grid
    dims for roi->tile assignment, and the per-level region extents."""
    nty, ntx, oys, oxs, extents = [], [], [], [], []
    for hp, wp in padded_hw:
        tbh = min(_TILE_H + win_h, hp)
        tbw = min(_TILE_W + win_w, wp)
        a = (max(hp - tbh, 0) + _TILE_H - 1) // _TILE_H + 1
        x = (max(wp - tbw, 0) + _TILE_W - 1) // _TILE_W + 1
        nty.append(a)
        ntx.append(x)
        oys.append([min(i * _TILE_H, hp - tbh) for i in range(a)])
        oxs.append([min(i * _TILE_W, wp - tbw) for i in range(x)])
        extents.append((tbh, tbw))
    counts = [a * x for a, x in zip(nty, ntx)]
    level_base = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    t1 = int(level_base[-1])
    tb, tl, tyo, txo = [], [], [], []
    for bi in range(b):
        for k in range(len(padded_hw)):
            for oy in oys[k]:
                for ox in oxs[k]:
                    tb.append(bi)
                    tl.append(k)
                    tyo.append(oy)
                    txo.append(ox)
    return t1, level_base, nty, ntx, tb, tl, tyo, txo, extents


def _tile_sort(bidx, lvl, y0, x0, t1, level_base, nty, ntx, t_total):
    """Sort rois by tile id; returns (order, start) with start[t]:start[t+1]
    the sorted-roi range of tile t. Edge rois assign to the clamped tile
    (ty/tx capped at the grid dim), whose region still covers them."""
    nty_l = jnp.asarray(nty, jnp.int32)[lvl]
    ntx_l = jnp.asarray(ntx, jnp.int32)[lvl]
    ty = jnp.minimum(y0 // _TILE_H, nty_l - 1)
    tx = jnp.minimum(x0 // _TILE_W, ntx_l - 1)
    gidx = (
        bidx * t1
        + jnp.asarray(level_base[:-1], jnp.int32)[lvl]
        + ty * ntx_l
        + tx
    )
    order = jnp.argsort(gidx)
    start = jnp.searchsorted(
        gidx[order], jnp.arange(t_total + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    return order, start


def _bwd_tiled_kernel(
    start, tb, tl, tyo, txo, y0s, x0s, rcls, ccls,      # scalar prefetch
    *rest,
    nlev: int,
    window,
    p: int,
    extents: Tuple[Tuple[int, int], ...],
):
    """Tile-coalesced backward: rois are pre-sorted by (image, level,
    spatial tile); each grid step reads ONE (TILE+window)-sized region of
    the gradient buffer into VMEM, accumulates every roi of that tile
    with per-size-class kron matmuls (per-roi wy/wx/g rows are double-
    buffered HBM fetches), and writes the region back once. Per-roi RMW
    traffic (~1.3 MB/roi at the median size class) becomes per-TILE
    traffic (~16.6 MB per touched tile, ~28 rois/tile at RCNN shapes) —
    ~2.5x less HBM movement than the per-roi kernel, and empty tiles are
    skipped entirely. Sequential grid steps keep halo-overlap RMW exact."""
    zrefs = rest[:nlev]
    wy_hbm = rest[nlev]
    wx_hbm = rest[nlev + 1]
    g_hbm = rest[nlev + 2]
    outs = rest[nlev + 3 : 2 * nlev + 3]
    tile = rest[2 * nlev + 3]       # (TBH, TBW, C)
    wyb = rest[2 * nlev + 4]        # (2, P, WH)
    wxb = rest[2 * nlev + 5]        # (2, P, WW)
    gb = rest[2 * nlev + 6]         # (2, PP, C)
    tsem = rest[2 * nlev + 7]
    fsem = rest[2 * nlev + 8]       # (2, 3)
    del zrefs

    win_h, win_w = _win_wh(window)
    row_cls, col_cls = _size_classes(win_h, win_w)
    t = pl.program_id(0)
    n0, n1 = start[t], start[t + 1]
    c = tile.shape[-1]

    def tile_copy(do: str, to_vmem: bool):
        bb, oy = tb[t], tyo[t]
        ox = pl.multiple_of(txo[t], 8)
        for k, (tbh, tbw) in enumerate(extents):
            region = outs[k].at[bb, pl.ds(oy, tbh), pl.ds(ox, tbw), :]
            buf = tile.at[:tbh, :tbw]
            src, dst = (region, buf) if to_vmem else (buf, region)
            copy = pltpu.make_async_copy(src, dst, tsem)

            @pl.when(tl[t] == k)
            def _(copy=copy, do=do):
                getattr(copy, do)()

    def fetch(slot, j, do: str):
        for q, (hbm, buf) in enumerate(
            ((wy_hbm, wyb), (wx_hbm, wxb), (g_hbm, gb))
        ):
            copy = pltpu.make_async_copy(
                hbm.at[j], buf.at[slot], fsem.at[slot, q]
            )
            getattr(copy, do)()

    @pl.when(n1 > n0)
    def _():
        tile_copy("start", to_vmem=True)
        fetch(0, n0, "start")
        tile_copy("wait", to_vmem=True)

        def body(j, _):
            slot = jax.lax.rem(j - n0, 2)

            @pl.when(j + 1 < n1)
            def _():
                fetch(1 - slot, j + 1, "start")

            fetch(slot, j, "wait")
            ly = y0s[j] - tyo[t]
            lx = pl.multiple_of(x0s[j] - txo[t], 8)
            rc_j, cc_j = rcls[j], ccls[j]
            # per-size-class compute + RMW: dcrop is exactly zero outside
            # the roi's class region (zero weights), so building the kron
            # and updating the tile at class size is exact — and ~2x less
            # VPU/VMEM work than the former full-window matmul + RMW at
            # the median class (profiled ~6 ms/step at batch 8+8)
            for ri, rsz in enumerate(row_cls):
                for ci, csz in enumerate(col_cls):
                    @pl.when((rc_j == ri) & (cc_j == ci))
                    def _(rsz=rsz, csz=csz):
                        w2t = _kron_in_kernel(
                            wyb[slot, :p, :rsz], wxb[slot, :p, :csz]
                        ).astype(gb.dtype)
                        dcr = jax.lax.dot_general(
                            w2t, gb[slot, : p * p, :c],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )                            # (rsz*csz, C)
                        cur = tile[pl.ds(ly, rsz), pl.ds(lx, csz), :]
                        tile[pl.ds(ly, rsz), pl.ds(lx, csz), :] = (
                            cur + dcr.reshape(rsz, csz, c).astype(tile.dtype)
                        )
            return 0

        jax.lax.fori_loop(n0, n1, body, 0)
        tile_copy("start", to_vmem=False)
        tile_copy("wait", to_vmem=False)


def _bwd_tiled_call(
    zero_feats, wy, wx, g, start, tb, tl, tyo, txo, y0s, x0s, rcls, ccls,
    *, window, output_size: int, extents, interpret: bool,
):
    nlev = len(zero_feats)
    c = zero_feats[0].shape[-1]
    dtype = zero_feats[0].dtype
    tbh = max(e[0] for e in extents)
    tbw = max(e[1] for e in extents)
    t = tb.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (nlev + 3),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nlev,
        scratch_shapes=[
            pltpu.VMEM((tbh, tbw, c), dtype),
            pltpu.VMEM((2,) + wy.shape[1:], wy.dtype),
            pltpu.VMEM((2,) + wx.shape[1:], wx.dtype),
            pltpu.VMEM((2,) + g.shape[1:], g.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _bwd_tiled_kernel, nlev=nlev, window=window, p=output_size,
            extents=tuple(extents),
        ),
        out_shape=[
            jax.ShapeDtypeStruct(f.shape, f.dtype) for f in zero_feats
        ],
        grid_spec=grid_spec,
        # operand index space includes the 9 scalar-prefetch args
        input_output_aliases={9 + k: k for k in range(nlev)},
        interpret=interpret,
    )(start, tb, tl, tyo, txo, y0s, x0s, rcls, ccls, *zero_feats, wy, wx, g)


# ----------------------------------------------------------------- wrapper


def multilevel_roi_align_pallas(
    feats: Tuple[jnp.ndarray, ...],   # per level (B, H_l, W_l, C)
    boxes: jnp.ndarray,               # (B, R, 4) xyxy image pixels
    levels: Tuple[int, ...] = (2, 3, 4, 5),
    output_size: int = 7,
    sampling_ratio: int = 2,
    window=(48, 56),
    interpret=None,
) -> jnp.ndarray:
    """(B, R, P, P, C) pooled from the per-roi assigned pyramid level.

    Gradients flow to `feats` only; `boxes` get zero gradient (proposals
    are detached in the reference trainer, SURVEY.md E2).
    interpret=None resolves by backend (compiled on TPU, interpreted
    elsewhere, e.g. the CPU test mesh)."""
    if interpret is None:
        from jax.extend import backend as _jax_backend

        interpret = _jax_backend.get_backend().platform != "tpu"
    return _mra_pallas(
        feats, boxes, levels, output_size, sampling_ratio, window, interpret
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def _mra_pallas(
    feats: Tuple[jnp.ndarray, ...],
    boxes: jnp.ndarray,
    levels: Tuple[int, ...],
    output_size: int,
    sampling_ratio: int,
    window,
    interpret: bool,
) -> jnp.ndarray:
    out, _ = _fwd(
        feats, boxes, levels, output_size, sampling_ratio, window, interpret
    )
    return out


def _fwd(feats, boxes, levels, output_size, sampling_ratio, window, interpret):
    b, r, _ = boxes.shape
    level_hw = tuple((f.shape[1], f.shape[2]) for f in feats)
    bidx, lvl, rcls, ccls, y0, x0, wy, wx = _prep(
        boxes, level_hw, levels, output_size, sampling_ratio, window
    )
    padded = _pad_levels(feats, window)
    if _FWD_IMPL == "tiled":
        win_h, win_w = _win_wh(window)
        padded_hw = [_padded_hw(f.shape[1], f.shape[2], window) for f in feats]
        t1, level_base, nty, ntx, tb, tl, tyo, txo, extents = _tile_tables(
            padded_hw, b, win_h, win_w
        )
        order, start = _tile_sort(
            bidx, lvl, y0, x0, t1, level_base, nty, ntx, b * t1
        )
        pp = output_size * output_size
        pooled = _fwd_tiled_call(
            padded,
            _padto(wy, _round_up(output_size, 8), _round_up(win_h, 128)),
            _padto(wx, _round_up(output_size, 8), _round_up(win_w, 128)),
            start,
            jnp.asarray(tb, jnp.int32), jnp.asarray(tl, jnp.int32),
            jnp.asarray(tyo, jnp.int32), jnp.asarray(txo, jnp.int32),
            order.astype(jnp.int32), y0, x0, rcls, ccls,
            window=window, output_size=output_size, extents=extents,
            interpret=interpret,
        )[:, :pp, :]                                    # (N, P*P, C)
    else:
        pooled = _fwd_call(
            padded, wy, wx, bidx, lvl, rcls, ccls, y0, x0,
            window=window, interpret=interpret,
        )                                               # (N, P*P, C)
    c = feats[0].shape[-1]
    out = pooled.reshape(b, r, output_size, output_size, c)
    return out, (feats, boxes)


def _bwd(levels, output_size, sampling_ratio, window, interpret, res, g):
    feats, boxes = res
    b, r, _ = boxes.shape
    c = feats[0].shape[-1]
    level_hw = tuple((f.shape[1], f.shape[2]) for f in feats)
    bidx, lvl, rcls, ccls, y0, x0, wy, wx = _prep(
        boxes, level_hw, levels, output_size, sampling_ratio, window
    )
    dtype = feats[0].dtype
    gf = g.reshape(b * r, output_size * output_size, c).astype(dtype)
    win_h, win_w = _win_wh(window)

    if _BWD_IMPL == "tiled":
        # tile-coalesced RMW (see _bwd_tiled_kernel): sort rois by
        # (image, level, spatial tile), one VMEM-resident region per tile
        padded = [
            _padded_hw(f.shape[1], f.shape[2], window) for f in feats
        ]
        t1, level_base, nty, ntx, tb, tl, tyo, txo, extents = _tile_tables(
            padded, b, win_h, win_w
        )
        order, start = _tile_sort(
            bidx, lvl, y0, x0, t1, level_base, nty, ntx, b * t1
        )
        zero_padded = tuple(
            jnp.zeros((f.shape[0], hp, wp, c), dtype)
            for f, (hp, wp) in zip(feats, padded)
        )
        # manual per-roi row DMAs require (8, 128)-tile-aligned minor dims
        pp = output_size * output_size
        dpadded = _bwd_tiled_call(
            zero_padded,
            _padto(wy[order], _round_up(output_size, 8), _round_up(win_h, 128)),
            _padto(wx[order], _round_up(output_size, 8), _round_up(win_w, 128)),
            _padto(gf[order], _round_up(pp, 8), _round_up(c, 128)),
            start,
            jnp.asarray(tb, jnp.int32), jnp.asarray(tl, jnp.int32),
            jnp.asarray(tyo, jnp.int32), jnp.asarray(txo, jnp.int32),
            y0[order], x0[order], rcls[order], ccls[order], window=window,
            output_size=output_size, extents=extents, interpret=interpret,
        )
    else:
        # per-roi RMW kernel (UBT_ROIALIGN_BWD=roi), kept for A/B.
        # Interleave rois across images ((B, R) -> (R, B) order):
        # consecutive grid steps then touch different images, so the
        # pipelined kernel can leave each roi's write-back in flight
        # through the next step without any region-overlap hazard.
        def inter(v):
            return v.reshape(b, r, *v.shape[1:]).swapaxes(0, 1).reshape(
                v.shape
            )

        if b > 1:
            bidx, lvl, rcls, ccls, y0, x0, wy, wx, gf = (
                inter(v)
                for v in (bidx, lvl, rcls, ccls, y0, x0, wy, wx, gf)
            )
        zero_padded = tuple(
            jnp.zeros(
                (f.shape[0], *_padded_hw(f.shape[1], f.shape[2], window), c),
                dtype,
            )
            for f in feats
        )
        dpadded = _bwd_call(
            zero_padded, wy, wx, gf, bidx, lvl, rcls, ccls, y0, x0,
            window=window, pipelined=b > 1, interpret=interpret,
        )
    dfeats = tuple(
        d[:, : f.shape[1], : f.shape[2], :] for d, f in zip(dpadded, feats)
    )
    return dfeats, jnp.zeros_like(boxes)


_mra_pallas.defvjp(
    lambda feats, boxes, levels, output_size, sampling_ratio, window,
    interpret: _fwd(
        feats, boxes, levels, output_size, sampling_ratio, window, interpret
    ),
    _bwd,
)
