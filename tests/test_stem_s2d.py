"""Space-to-depth stem conv == the plain 7x7/s2 stem (same params).

The s2d form is the TPU-efficient stem (modeling/resnet.py:StemConv):
identical parameter tree, identical outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ubteacher_tpu.modeling.resnet import ResNet, StemConv


def test_stem_s2d_matches_plain():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    plain = StemConv(64, space_to_depth=False, dtype=jnp.float32)
    s2d = StemConv(64, space_to_depth=True, dtype=jnp.float32)
    v = plain.init(jax.random.PRNGKey(0), x)
    y1 = plain.apply(v, x)
    y2 = s2d.apply(v, x)
    assert y1.shape == y2.shape == (2, 32, 48, 64)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5
    )


def test_stem_s2d_odd_size_falls_back():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 63, 95, 3).astype(np.float32))
    plain = StemConv(64, space_to_depth=False, dtype=jnp.float32)
    s2d = StemConv(64, space_to_depth=True, dtype=jnp.float32)
    v = plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(plain.apply(v, x)), np.asarray(s2d.apply(v, x)),
        rtol=1e-5, atol=1e-5,
    )


def test_resnet_param_tree_unchanged_by_s2d():
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    a = ResNet(depth=18, stem_space_to_depth=False, dtype=jnp.float32)
    b = ResNet(depth=18, stem_space_to_depth=True, dtype=jnp.float32)
    va = a.init(jax.random.PRNGKey(0), x)["params"]
    vb = b.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(va) == jax.tree.structure(vb)
    np.testing.assert_allclose(
        np.asarray(va["stem_conv1"]["kernel"]),
        np.asarray(vb["stem_conv1"]["kernel"]),
    )
