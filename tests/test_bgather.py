"""One-hot boundary gather/scatter (ops/bgather.py) is bit-equal to direct
indexing — the helpers replace XLA's scalarized small-gather lowering on the
BC paths (reference: per-marker vertex loops,
solver_direct_reactive.cpp:2881-4129)."""

import numpy as np
import jax
import jax.numpy as jnp

from su2_tpu.ops import bgather as bg


def _rng(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape))


def test_rows_matches_indexing():
    x = _rng((500, 16))
    idx = np.array([3, 99, 499, 0, 17, 17])   # duplicates allowed for rows
    np.testing.assert_array_equal(np.asarray(bg.rows(x, idx)),
                                  np.asarray(x[idx]))


def test_rows_1d_and_3d():
    v = _rng((321,), 1)
    idx = np.array([5, 7, 320])
    np.testing.assert_array_equal(np.asarray(bg.rows(v, idx)),
                                  np.asarray(v[idx]))
    g = _rng((100, 14, 2), 2)
    np.testing.assert_array_equal(np.asarray(bg.rows(g, idx % 100)),
                                  np.asarray(g[idx % 100]))


def test_add_rows_matches_scatter_add():
    dest = _rng((200, 13), 3)
    # unique indices (marker vertex lists are unique): bit-equal
    idx = np.array([0, 5, 41, 199])
    vals = _rng((4, 13), 4)
    np.testing.assert_array_equal(np.asarray(bg.add_rows(dest, idx, vals)),
                                  np.asarray(dest.at[idx].add(vals)))
    # duplicates still sum, up to addition-order rounding
    idx2 = np.array([0, 5, 5, 199])
    np.testing.assert_allclose(np.asarray(bg.add_rows(dest, idx2, vals)),
                               np.asarray(dest.at[idx2].add(vals)),
                               rtol=1e-14)


def test_set_rows_and_col():
    dest = _rng((150, 4), 5)
    idx = np.array([2, 9, 149])
    vals = _rng((3, 4), 6)
    np.testing.assert_array_equal(np.asarray(bg.set_rows(dest, idx, vals)),
                                  np.asarray(dest.at[idx].set(vals)))
    cv = _rng((3,), 7)
    np.testing.assert_array_equal(
        np.asarray(bg.set_col_rows(dest, idx, 2, cv)),
        np.asarray(dest.at[idx, 2].set(cv)))


def test_traced_index_falls_back():
    x = _rng((50, 3))

    @jax.jit
    def f(idx):
        return bg.rows(x, idx)

    idx = jnp.asarray([1, 2, 3])
    np.testing.assert_array_equal(np.asarray(f(idx)), np.asarray(x[idx]))


def test_bool_dest_falls_back():
    mask = jnp.zeros((40,), bool)
    idx = np.array([1, 4])
    out = bg.set_rows(mask, idx, True)
    assert bool(out[1]) and bool(out[4]) and not bool(out[0])
