"""Batched dense solves for small (Ns x Ns) systems, TPU-native.

jnp.linalg.solve lowers to per-matrix LAPACK-style LU — catastrophic for
huge batches of tiny systems on TPU (it dominated the viscous flux at ~90ms
per step).  This Gauss-Jordan elimination with partial pivoting is pure
vectorized VPU work over the batch: n unrolled pivot steps of elementwise
(B, n, m) updates.
"""

from __future__ import annotations

import jax.numpy as jnp


def gauss_solve(a: jnp.ndarray, b: jnp.ndarray, pivot: bool = True) -> jnp.ndarray:
    """Solve a @ x = b for batches of small systems.

    a: (..., n, n); b: (..., n, k).  Returns (..., n, k).
    Partial (row) pivoting via batched row selection; n is static and small,
    so the pivot loop unrolls at trace time.

    pivot=False skips the row exchanges (argmax + take_along_axis lower to
    per-batch dynamic gathers on TPU, which dominate the solve for large
    batches).  Use it for systems with a guaranteed dominant diagonal — the
    regularized Stefan-Maxwell matrix, the molar->mass operator, and the
    time-augmented block-Jacobi diagonals all qualify.
    """
    n = a.shape[-1]
    if not pivot:
        aug = jnp.concatenate([a, b], axis=-1)
        rows = jnp.arange(n)
        for col in range(n):
            pivval = aug[..., col, col][..., None]
            safe = jnp.where(pivval == 0.0, 1.0, pivval)
            prow = aug[..., col, :] / safe
            factors = aug[..., :, col][..., None]
            not_col = (rows != col)[:, None]
            # single select (the .at[col].set row write lowered to a
            # scatter that dominated the batched solve on TPU)
            aug = jnp.where(not_col, aug - factors * prow[..., None, :],
                            jnp.broadcast_to(prow[..., None, :], aug.shape))
        return aug[..., :, n:]

    aug = jnp.concatenate([a, b], axis=-1)              # (..., n, m)
    rows = jnp.arange(n)

    for col in range(n):
        # partial pivot among rows >= col
        colvals = jnp.abs(aug[..., :, col])
        colvals = jnp.where(rows >= col, colvals, -jnp.inf)
        piv = jnp.argmax(colvals, axis=-1)              # (...,)
        piv_row = jnp.take_along_axis(
            aug, piv[..., None, None], axis=-2)[..., 0, :]   # (..., m)
        cur_row = aug[..., col, :]
        is_piv = (rows[:, None] == piv[..., None, None])     # (..., n, 1)
        aug = jnp.where(is_piv, cur_row[..., None, :], aug)
        aug = aug.at[..., col, :].set(piv_row)

        # normalize pivot row, eliminate all other rows (Gauss-Jordan)
        pivval = aug[..., col, col][..., None]               # (..., 1)
        safe = jnp.where(pivval == 0.0, 1.0, pivval)
        prow = aug[..., col, :] / safe                       # (..., m)
        factors = aug[..., :, col][..., None]                # (..., n, 1)
        not_col = (rows != col)[:, None]
        aug = jnp.where(not_col, aug - factors * prow[..., None, :], aug)
        aug = aug.at[..., col, :].set(prow)

    return aug[..., :, n:]
