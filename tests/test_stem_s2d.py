"""All StemConv compute modes == the plain 7x7/s2 stem (same params).

"s2d" and "im2col" are the MXU-efficient reformulations
(modeling/resnet.py:StemConv): identical parameter tree, identical
outputs up to f32 summation order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubteacher_tpu.modeling.resnet import ResNet, StemConv


@pytest.mark.parametrize("mode", ["s2d", "im2col"])
def test_stem_mode_matches_plain(mode):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    plain = StemConv(64, mode="conv", dtype=jnp.float32)
    alt = StemConv(64, mode=mode, dtype=jnp.float32)
    v = plain.init(jax.random.PRNGKey(0), x)
    y1 = plain.apply(v, x)
    y2 = alt.apply(v, x)
    assert y1.shape == y2.shape == (2, 32, 48, 64)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("mode", ["s2d", "im2col"])
def test_stem_mode_odd_size(mode):
    # odd sizes: s2d falls back to the plain conv; im2col handles them
    # directly (ceil(H/2) output rows, same as the padded conv).
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 63, 95, 3).astype(np.float32))
    plain = StemConv(64, mode="conv", dtype=jnp.float32)
    alt = StemConv(64, mode=mode, dtype=jnp.float32)
    v = plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(plain.apply(v, x)), np.asarray(alt.apply(v, x)),
        rtol=1e-5, atol=1e-5,
    )


def test_resnet_param_tree_unchanged_by_stem_mode():
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    a = ResNet(depth=18, stem_mode="conv", dtype=jnp.float32)
    trees = {}
    for mode in ("s2d", "im2col"):
        b = ResNet(depth=18, stem_mode=mode, dtype=jnp.float32)
        trees[mode] = b.init(jax.random.PRNGKey(0), x)["params"]
    va = a.init(jax.random.PRNGKey(0), x)["params"]
    for vb in trees.values():
        assert jax.tree.structure(va) == jax.tree.structure(vb)
        np.testing.assert_allclose(
            np.asarray(va["stem_conv1"]["kernel"]),
            np.asarray(vb["stem_conv1"]["kernel"]),
        )
