"""Fused Pallas stem == the XLA stem composition (same params).

stem_conv_pool (ops/pallas/stem_pallas.py) fuses conv7x7/s2 + FrozenBN
affine + ReLU + maxpool3x3/s2. Interpret mode on CPU; the compiled TPU
kernel is covered by tools/validate_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubteacher_tpu.modeling.resnet import ResNet
from ubteacher_tpu.ops.pallas.stem_pallas import (
    _reference,
    stem_conv_pool,
)


def _inputs(b, h, w, feat=64, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 50)
    k = jnp.asarray(rng.randn(7, 7, 3, feat).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, feat).astype(np.float32))
    bias = jnp.asarray(rng.randn(feat).astype(np.float32))
    return x, k, scale, bias


@pytest.mark.parametrize("hw", [(64, 128), (96, 160), (128, 224)])
def test_fused_matches_reference_f32(hw):
    h, w = hw
    x, k, s, b = _inputs(2, h, w)
    ref = _reference(x, k, s, b, jnp.float32)
    got = stem_conv_pool(x, k, s, b, jnp.float32, True)
    assert got.shape == ref.shape == (2, h // 4, w // 4, 64)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_fused_bf16_error_no_worse_than_xla_bf16():
    # bf16 regime: folded-weight rounding differs from conv-then-affine,
    # so fused-vs-XLA-bf16 can disagree by ulps that maxpool amplifies on
    # near-ties. The meaningful claim: against the f32 truth, the fused
    # bf16 path is as accurate as the XLA bf16 path (same policy as the
    # other bf16-regime kernels).
    x, k, s, b = _inputs(1, 64, 128, seed=3)
    truth = np.asarray(_reference(x, k, s, b, jnp.float32))
    ref16 = np.asarray(
        _reference(x, k, s, b, jnp.bfloat16), dtype=np.float32
    )
    got16 = np.asarray(
        stem_conv_pool(x, k, s, b, jnp.bfloat16, True), dtype=np.float32
    )
    denom = np.maximum(np.abs(truth), 1.0)
    err_ref = np.abs(ref16 - truth) / denom
    err_got = np.abs(got16 - truth) / denom
    assert np.max(err_got) < max(2.0 * np.max(err_ref), 0.02)
    assert np.mean(err_got) < 2.0 * np.mean(err_ref) + 1e-4


def test_edge_rows_and_cols_exact():
    # pooled row/col 0 exclude the pad line; make the edge values large
    # and negative-biased so a wrong pad-inclusion would show.
    x, k, s, b = _inputs(1, 64, 128, seed=7)
    b = b - 5.0  # relu(bias) pad row would inject max(0, b) -> mostly 0,
    b = b.at[::2].set(7.0)  # ...but these channels would inject 7.0
    ref = _reference(x, k, s, b, jnp.float32)
    got = stem_conv_pool(x, k, s, b, jnp.float32, True)
    np.testing.assert_allclose(
        np.asarray(got[:, 0]), np.asarray(ref[:, 0]), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got[:, :, 0]), np.asarray(ref[:, :, 0]),
        rtol=1e-5, atol=1e-4,
    )


def test_unsupported_shape_falls_back():
    x, k, s, b = _inputs(1, 60, 100, seed=1)  # H%4 != 0
    ref = _reference(x, k, s, b, jnp.float32)
    got = stem_conv_pool(x, k, s, b, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_grad_falls_back_to_reference():
    x, k, s, b = _inputs(1, 64, 128, seed=2)

    def f_fused(k_):
        return jnp.sum(stem_conv_pool(x, k_, s, b, jnp.float32, True))

    def f_ref(k_):
        return jnp.sum(_reference(x, k_, s, b, jnp.float32))

    g1 = jax.grad(f_fused)(k)
    g2 = jax.grad(f_ref)(k)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4
    )


def test_resnet_pallas_mode_param_tree_and_output():
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 64, 128, 3).astype(np.float32)
    )
    a = ResNet(depth=18, stem_mode="conv", dtype=jnp.float32)
    c = ResNet(depth=18, stem_mode="pallas", dtype=jnp.float32)
    va = a.init(jax.random.PRNGKey(0), x)["params"]
    vc = c.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(va) == jax.tree.structure(vc)
    # same params -> same features. NOTE: on CPU backends stem_conv_pool
    # with interpret=False returns the XLA _reference composition, so this
    # case covers the param-tree plumbing + fallback only; the kernel
    # integration is exercised by the pallas_interpret case below.
    ya = a.apply({"params": va}, x)
    yc = c.apply({"params": va}, x)
    for key in ya:
        np.testing.assert_allclose(
            np.asarray(ya[key]), np.asarray(yc[key]), rtol=1e-4, atol=1e-4
        )


def test_resnet_pallas_interpret_runs_kernel_on_cpu():
    # stem_mode="pallas_interpret" forces the Pallas branch through the
    # interpreter, so the ResNet→kernel integration (param plumbing,
    # folded weights, shapes) runs on the CPU mesh (round-3 advisor).
    x = jnp.asarray(
        np.random.RandomState(1).randn(1, 64, 128, 3).astype(np.float32)
    )
    a = ResNet(depth=18, stem_mode="conv", dtype=jnp.float32)
    c = ResNet(depth=18, stem_mode="pallas_interpret", dtype=jnp.float32)
    va = a.init(jax.random.PRNGKey(0), x)["params"]
    ya = a.apply({"params": va}, x)
    yc = c.apply({"params": va}, x)
    for key in ya:
        np.testing.assert_allclose(
            np.asarray(ya[key]), np.asarray(yc[key]), rtol=1e-4, atol=1e-4
        )


def test_resnet_rejects_unknown_stem_mode():
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    bad = ResNet(depth=18, stem_mode="palas", dtype=jnp.float32)
    with pytest.raises(ValueError, match="unknown stem_mode"):
        bad.init(jax.random.PRNGKey(0), x)
