import jax
import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.data.augment import (
    _from_hsv,
    _to_hsv,
    apply_weak_augment,
    resize_shortest_edge_params,
    strong_augment,
)


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
    h, s, v = _to_hsv(x)
    rec = _from_hsv(h, s, v)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


def test_strong_augment_shapes_and_range():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(
        rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    )
    out = strong_augment(imgs, jax.random.PRNGKey(0))
    assert out.shape == imgs.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0
    # deterministic per key, different across keys
    out2 = strong_augment(imgs, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = strong_augment(imgs, jax.random.PRNGKey(1))
    assert np.abs(np.asarray(out3) - np.asarray(out)).max() > 1.0
    # geometry preserved: images in the batch get independent randomness
    assert np.abs(np.asarray(out[0]) - np.asarray(out[1])).max() > 0


def test_resize_shortest_edge_params():
    rng = np.random.default_rng(2)
    nh, nw = resize_shortest_edge_params(480, 640, (800,), 1333, "choice", rng)
    assert nh == 800 and nw == int(round(800 / 480 * 640))
    # max_size cap
    nh, nw = resize_shortest_edge_params(100, 1000, (800,), 1333, "choice", rng)
    assert nw == 1333
    # range sampling stays in bounds
    for _ in range(5):
        nh, nw = resize_shortest_edge_params(
            500, 500, (400, 600), 1333, "range", rng
        )
        assert 400 <= nh <= 600


def test_weak_augment_transforms_boxes():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
    boxes = np.asarray([[20.0, 10.0, 60.0, 50.0]], np.float32)
    rec = apply_weak_augment(
        img, boxes, canvas_hw=(256, 256), min_size=(128,), max_size=256,
        sampling="choice", rng=np.random.default_rng(0), flip=False,
    )
    assert rec["image"].shape == (256, 256, 3)
    # scale = 128/100
    s = 128 / 100
    np.testing.assert_allclose(rec["boxes"][0], np.asarray(boxes[0]) * s, rtol=1e-5)
    np.testing.assert_allclose(rec["hw"], [128, 256])

    # flipped geometry: x-coords mirror within the resized width
    rec_f = apply_weak_augment(
        img, boxes, canvas_hw=(256, 256), min_size=(128,), max_size=256,
        sampling="choice", rng=np.random.default_rng(1), flip=True,
    )
    # with this seed flip triggers or not; just validate box stays in canvas
    b = rec_f["boxes"][0]
    assert 0 <= b[0] < b[2] <= 256 and 0 <= b[1] < b[3] <= 256


def test_gaussian_blur_matches_edge_padded_conv():
    """The banded-matmul blur equals an edge-padded separable convolution
    (data/augment.py:_gaussian_blur)."""
    import numpy as np
    import jax.numpy as jnp
    from ubteacher_tpu.data.augment import _gaussian_blur

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (17, 23, 3)).astype(np.float32)
    sigma, taps, half = 1.3, 9, 4
    d = np.arange(-half, half + 1, dtype=np.float64)
    k = np.exp(-(d**2) / (2 * sigma**2))
    k /= k.sum()

    xp = np.pad(x, ((half, half), (half, half), (0, 0)), mode="edge")
    tmp = np.zeros_like(xp)
    for t in range(taps):  # along W
        tmp[:, half:-half] += k[t] * xp[:, t:t + x.shape[1]]
    out = np.zeros_like(x)
    for t in range(taps):  # along H
        out += k[t] * tmp[t:t + x.shape[0], half:-half]

    got = np.asarray(_gaussian_blur(jnp.asarray(x), jnp.float32(sigma)))
    # the blur matmuls run in bf16 (operand rounding ~2^-9 per stage, two
    # stages): tolerance sits at ~2 uint8 quanta — still below the visible
    # noise floor of the reference's uint8 PIL blur, and half the cost of
    # the f32 einsums (see _gaussian_blur docstring)
    np.testing.assert_allclose(got, out, atol=8e-3)
    assert np.abs(got - out).mean() < 2e-3


def test_blur_band_matrix_exact_f32():
    """Weight CONSTRUCTION stays exact independent of the bf16 rounding
    budget above (ADVICE r4): the f32 band matrix must equal a numpy
    edge-padded-convolution matrix to f32 precision, and every row must
    sum to 1 (the kernel is normalized, so blur preserves constants)."""
    import numpy as np
    import jax.numpy as jnp
    from ubteacher_tpu.data.augment import _blur_band_matrix

    sigma, half, n = 0.7, 4, 23
    d = np.arange(-half, half + 1, dtype=np.float64)
    k = np.exp(-(d**2) / (2 * sigma**2))
    k /= k.sum()

    ref = np.zeros((n, n), np.float64)
    for i in range(n):
        for t in range(-half, half + 1):
            ref[i, int(np.clip(i + t, 0, n - 1))] += k[t + half]

    got = np.asarray(
        _blur_band_matrix(n, jnp.asarray(k, jnp.float32), half)
    )
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-6)
