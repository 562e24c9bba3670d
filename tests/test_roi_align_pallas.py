"""Pallas windowed ROIAlign kernel vs the exact XLA full-map matmul.

Runs the kernel in interpret mode on the CPU test backend; the same code
compiles natively for TPU (verified on v5e — ops/pallas/roi_align_pallas.py).
Reference semantics: detectron2 ROIAlignV2 via ROIPooler
(ubteacher/modeling/roi_heads/roi_heads.py:40-45,118).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubteacher_tpu.ops.roi_align import multilevel_roi_align
from ubteacher_tpu.ops.pallas.roi_align_pallas import multilevel_roi_align_pallas

LEVELS = (2, 3, 4, 5)
IN_FEATURES = ("p2", "p3", "p4", "p5")


def _make_case(seed=0, B=2, R=12, C=128, H=96, W=160, max_sz=380):
    rng = np.random.RandomState(seed)
    feats, pyr = [], {}
    for l in LEVELS:
        f = rng.randn(B, H >> (l - 2), W >> (l - 2), C).astype(np.float32)
        pyr[f"p{l}"] = jnp.asarray(f)
        feats.append(jnp.asarray(f))
    img_w, img_h = W * 4, H * 4
    cx = rng.uniform(10, img_w - 10, (B, R))
    cy = rng.uniform(10, img_h - 10, (B, R))
    sz = rng.uniform(12, max_sz, (B, R))
    ar = rng.uniform(0.5, 2.0, (B, R))
    w = sz * np.sqrt(ar)
    h = sz / np.sqrt(ar)
    boxes = np.stack(
        [
            np.clip(cx - w / 2, 0, img_w),
            np.clip(cy - h / 2, 0, img_h),
            np.clip(cx + w / 2, 0, img_w),
            np.clip(cy + h / 2, 0, img_h),
        ],
        -1,
    ).astype(np.float32)
    return tuple(feats), pyr, jnp.asarray(boxes)


# both kernel variants stay covered even though CI runs the env-default
# ('tiled'): the retained per-roi A/B baseline (UBT_ROIALIGN_FWD/BWD=roi)
# must not silently rot (ADVICE r4)
@pytest.mark.parametrize("impl", ["tiled", "roi"])
def test_forward_matches_exact_full_map(impl, monkeypatch):
    from ubteacher_tpu.ops.pallas import roi_align_pallas as rap

    monkeypatch.setattr(rap, "_FWD_IMPL", impl)
    feats, pyr, boxes = _make_case()
    exact = multilevel_roi_align(pyr, boxes, IN_FEATURES, 7, 2, method="matmul")
    got = multilevel_roi_align_pallas(
        feats, boxes, LEVELS, 7, 2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(exact), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("impl", ["tiled", "roi"])
def test_backward_matches_exact_full_map(impl, monkeypatch):
    from ubteacher_tpu.ops.pallas import roi_align_pallas as rap

    monkeypatch.setattr(rap, "_BWD_IMPL", impl)
    feats, pyr, boxes = _make_case(seed=1)

    def loss_pallas(fs):
        out = multilevel_roi_align_pallas(
            fs, boxes, LEVELS, 7, 2, interpret=True
        )
        return jnp.sum(out**2)

    def loss_exact(fs):
        p = {f"p{l}": f for l, f in zip(LEVELS, fs)}
        return jnp.sum(
            multilevel_roi_align(p, boxes, IN_FEATURES, 7, 2, method="matmul")
            ** 2
        )

    gp = jax.grad(loss_pallas)(feats)
    gx = jax.grad(loss_exact)(feats)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_boxes_get_zero_gradient():
    feats, _, boxes = _make_case(seed=2, R=6)

    def loss(b):
        return jnp.sum(
            multilevel_roi_align_pallas(
                feats, b, LEVELS, 7, 2, interpret=True
            )
            ** 2
        )

    g = jax.grad(loss)(boxes)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_oversized_roi_clamps_but_stays_finite():
    # an extreme-aspect box whose x-span exceeds the window on its level
    feats, pyr, boxes = _make_case(seed=3, R=4)
    big = jnp.asarray([[5.0, 100.0, 635.0, 140.0]])  # 630x40 px, sqrt~159 -> p3
    boxes = boxes.at[0, 0].set(big[0])
    got = multilevel_roi_align_pallas(
        feats, boxes, LEVELS, 7, 2, interpret=True
    )
    assert bool(jnp.all(jnp.isfinite(got)))
    # non-oversized rois still match exactly
    exact = multilevel_roi_align(pyr, boxes, IN_FEATURES, 7, 2, method="matmul")
    np.testing.assert_allclose(
        np.asarray(got[0, 1:]), np.asarray(exact[0, 1:]), rtol=1e-5, atol=1e-5
    )


def test_small_feature_maps_padded():
    # maps smaller than the window in both axes (tiny image)
    feats, pyr, boxes = _make_case(seed=4, B=1, R=5, H=24, W=24, max_sz=80)
    exact = multilevel_roi_align(pyr, boxes, IN_FEATURES, 7, 2, method="matmul")
    got = multilevel_roi_align_pallas(
        feats, boxes, LEVELS, 7, 2, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(exact), rtol=1e-5, atol=1e-5
    )


def test_shard_map_over_data_mesh_matches_unsharded():
    """With an active mesh, the pallas path runs under shard_map (per-device
    batch slice) instead of being silently replicated by GSPMD; results and
    gradients match the unsharded call and the output stays batch-sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ubteacher_tpu.parallel.mesh import get_mesh, set_active_mesh

    feats, pyr, boxes = _make_case(seed=5, B=8, R=6)
    mesh = get_mesh()
    assert mesh.size == 8
    sh = NamedSharding(mesh, P("data"))
    feats_s = tuple(jax.device_put(f, sh) for f in feats)
    boxes_s = jax.device_put(boxes, sh)

    def pooled_sum(fs, bx):
        return jnp.sum(
            multilevel_roi_align(
                {f"p{l}": f for l, f in zip(LEVELS, fs)},
                bx,
                IN_FEATURES,
                7,
                2,
                method="pallas",
            )
            ** 2
        )

    ref_val = pooled_sum(feats, boxes)
    ref_grad = jax.grad(pooled_sum)(feats, boxes)

    set_active_mesh(mesh)
    try:
        fn = jax.jit(
            lambda fs, bx: multilevel_roi_align(
                {f"p{l}": f for l, f in zip(LEVELS, fs)},
                bx,
                IN_FEATURES,
                7,
                2,
                method="pallas",
            )
        )
        out = fn(feats_s, boxes_s)
        assert "data" in str(out.sharding.spec), out.sharding
        val = jax.jit(pooled_sum)(feats_s, boxes_s)
        grad = jax.jit(jax.grad(pooled_sum))(feats_s, boxes_s)
    finally:
        set_active_mesh(None)

    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    for a, b in zip(grad, ref_grad):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_large_output_size_grad():
    """POOLER_RESOLUTION=14 (the D2/base-config default) through the
    tiled backward: the per-roi weight-row pad must round P up, not
    assume P <= 8."""
    rng = np.random.default_rng(0)
    feats = tuple(
        jnp.asarray(rng.normal(size=(1, s, s, 8)).astype(np.float32))
        for s in (64, 32, 16, 8)
    )
    b1 = rng.uniform(0, 120, (1, 6, 2)).astype(np.float32)
    boxes = jnp.asarray(
        np.concatenate([b1, b1 + rng.uniform(8, 80, (1, 6, 2))], -1)
    ).astype(jnp.float32)

    def f(fs):
        return (
            multilevel_roi_align_pallas(
                fs, boxes, output_size=14, interpret=True
            ) ** 2
        ).sum()

    grads = jax.grad(f)(feats)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    assert any(float(jnp.abs(g).sum()) > 0 for g in grads)
