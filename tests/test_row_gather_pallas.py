"""take_rows / scatter_rows_pallas vs XLA gather + scatter-add.

The Pallas scatter is the TRANSPOSE of the row gather, so it must equal
the XLA scatter-add exactly (pure adds of the same values, one-hot
placement) — including duplicate rows, which must accumulate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ubteacher_tpu.ops.pallas.row_gather_pallas import (
    _scatter_rows_xla,
    scatter_rows_pallas,
    take_rows,
)


@pytest.mark.parametrize("seed,d", [(0, 3), (1, 12), (2, 1)])
def test_scatter_rows_matches_xla(seed, d):
    rng = np.random.default_rng(seed)
    b, k, l = 3, 40, 700
    g = jnp.asarray(rng.normal(size=(b, k, d)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, l, (b, k)).astype(np.int32))
    got = scatter_rows_pallas(g, rows, l, interpret=True)
    ref = _scatter_rows_xla(g, rows, l)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_scatter_rows_duplicates_accumulate():
    g = jnp.asarray(np.ones((1, 5, 2), np.float32))
    rows = jnp.asarray(np.array([[7, 7, 7, 0, 255]], np.int32))
    got = np.asarray(scatter_rows_pallas(g, rows, 256, interpret=True))
    assert got[0, 7, 0] == 3.0 and got[0, 0, 1] == 1.0
    assert got[0, 255, 0] == 1.0
    assert got.sum() == 10.0


def test_take_rows_value_and_grad():
    rng = np.random.default_rng(3)
    b, l, d, k = 2, 300, 4, 17
    x = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, l, (b, k)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(take_rows(x, rows)),
        np.asarray(jnp.take_along_axis(x, rows[..., None], axis=1)),
    )
    w = jnp.asarray(rng.normal(size=(b, k, d)).astype(np.float32))

    def f(x_):
        return (take_rows(x_, rows) * w).sum()

    def f_ref(x_):
        return (jnp.take_along_axis(x_, rows[..., None], axis=1) * w).sum()

    gx = jax.grad(f)(x)
    gx_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-6)
