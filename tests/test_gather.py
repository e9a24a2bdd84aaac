"""ops.gather: one-hot matmul lookup equivalence with real gathers."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracerpython_tpu.ops.gather import take_columns_packed, take_rows


def test_take_rows_matches_gather_small():
    table = jnp.arange(24.0).reshape(8, 3)
    idx = jnp.asarray([[0, 7], [3, 3]], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(take_rows(table, idx, onehot_rows=256)), np.asarray(table[idx])
    )


def test_take_rows_large_table_falls_back():
    table = jnp.arange(600.0).reshape(200, 3)
    idx = jnp.asarray([0, 199, 57], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(take_rows(table, idx, onehot_rows=128)),
        np.asarray(table[idx]),
    )


def test_take_rows_gradient_is_scatter_add():
    table = jnp.ones((4, 2))
    idx = jnp.asarray([1, 1, 3], jnp.int32)

    def f(t):
        return jnp.sum(take_rows(t, idx, onehot_rows=256) * 2.0)

    g = np.asarray(jax.grad(f)(table))
    expect = np.zeros((4, 2))
    expect[1] = 4.0  # two rows land on index 1
    expect[3] = 2.0
    np.testing.assert_array_equal(g, expect)


def test_take_columns_packed_matches_individual():
    a = jnp.arange(12.0).reshape(4, 3)
    b = jnp.arange(4.0).reshape(4, 1)
    c = jnp.arange(8.0).reshape(4, 2)
    idx = jnp.asarray([[2, 0]], jnp.int32)
    ra, rb, rc = take_columns_packed([a, b, c], idx, onehot_rows=256)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(a[idx]))
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(b[idx]))
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(c[idx]))
