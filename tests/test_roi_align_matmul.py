import jax
import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.ops.roi_align import roi_align, roi_align_matmul


def test_matmul_matches_gather_roi_align():
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(32, 48, 8)).astype(np.float32))
    boxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 80, 16),
                rng.uniform(0, 60, 16),
                rng.uniform(90, 180, 16),
                rng.uniform(70, 120, 16),
            ],
            axis=1,
        ).astype(np.float32)
    )
    ref = roi_align(feat, boxes, spatial_scale=0.25, output_size=7,
                    sampling_ratio=2)
    got = roi_align_matmul(feat, boxes, spatial_scale=0.25, output_size=7,
                           sampling_ratio=2, roi_chunk=5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_windowed_matches_gather_roi_align():
    from ubteacher_tpu.ops.roi_align import roi_align_windowed

    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.normal(size=(40, 56, 8)).astype(np.float32))
    # rois spanning <= window feature pixels (exactness condition):
    # at scale 0.25 with window=32, image-space extent must stay < ~120
    x1 = rng.uniform(0, 100, 16)
    y1 = rng.uniform(0, 80, 16)
    boxes = jnp.asarray(
        np.stack(
            [x1, y1, x1 + rng.uniform(30, 110, 16), y1 + rng.uniform(30, 75, 16)],
            axis=1,
        ).astype(np.float32)
    )
    ref = roi_align(feat, boxes, spatial_scale=0.25, output_size=7,
                    sampling_ratio=2)
    got = roi_align_windowed(feat, boxes, spatial_scale=0.25, output_size=7,
                             sampling_ratio=2, window=32, roi_chunk=5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_windowed_differentiable():
    from ubteacher_tpu.ops.roi_align import roi_align_windowed

    rng = np.random.default_rng(4)
    feat = jnp.asarray(rng.normal(size=(16, 16, 4)).astype(np.float32))
    boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0]], jnp.float32)
    g = jax.grad(lambda x: roi_align_windowed(x, boxes, 0.25, 7, 2).sum())(feat)
    assert float(jnp.abs(g).sum()) > 0


def test_matmul_roi_align_differentiable():
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.normal(size=(16, 16, 4)).astype(np.float32))
    boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0]], jnp.float32)

    def f(x):
        return roi_align_matmul(x, boxes, 0.25, 7, 2).sum()

    g = jax.grad(f)(feat)
    assert g.shape == feat.shape
    assert float(jnp.abs(g).sum()) > 0
