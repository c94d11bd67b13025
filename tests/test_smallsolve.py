import numpy as np
import jax.numpy as jnp

from su2_tpu.linalg.smallsolve import gauss_solve


def test_gauss_solve_random_batch():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (500, 9, 9)) + 5.0 * np.eye(9)
    b = rng.normal(0, 1, (500, 9, 3))
    x = np.asarray(gauss_solve(jnp.asarray(a), jnp.asarray(b)))
    ref = np.linalg.solve(a, b)
    np.testing.assert_allclose(x, ref, rtol=1e-10, atol=1e-12)


def test_gauss_solve_needs_pivoting():
    """Zero leading pivot requires the row-pivot path."""
    a = np.array([[[0.0, 1.0], [1.0, 0.0]],
                  [[1e-12, 1.0], [1.0, 1.0]]])
    b = np.array([[[2.0], [3.0]], [[1.0], [2.0]]])
    x = np.asarray(gauss_solve(jnp.asarray(a), jnp.asarray(b)))
    ref = np.linalg.solve(a, b)
    np.testing.assert_allclose(x, ref, rtol=1e-8)
