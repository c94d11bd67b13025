"""Block-sparse Jacobian in edge-coordinate form + preconditioners.

TPU-native replacement for CSysMatrix (reference:
Common/src/matrix_structure.cpp — block-CSR with AddBlock/SubtractBlock,
Jacobi/ILU0/LU-SGS preconditioners).  Instead of CSR, blocks live in the
natural mesh layout:

  diag:   (nP, v, v)   diagonal blocks
  off_ij: (nE, v, v)   row i, column j block of edge e = (i, j)
  off_ji: (nE, v, v)   row j, column i block

The matvec gathers neighbor values through the padded node->edge adjacency —
deterministic, no atomics.  LU-SGS is inherently sequential over an ordering,
so the TPU preconditioner is block-Jacobi (exact batched block inverse)
optionally wrapped in a few symmetric block-Gauss-Seidel-like sweeps done
Jacobi-style; outer FGMRES tolerance governs accuracy, matching the
reference's convergence contract (linear tol, outer residual history).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from su2_tpu.geometry.mesh_data import MeshArrays


@dataclass(frozen=True)
class BlockJacobian:
    diag: jax.Array     # (nP, v, v)
    off_ij: jax.Array   # (nE, v, v)
    off_ji: jax.Array   # (nE, v, v)


jax.tree_util.register_dataclass(
    BlockJacobian, data_fields=["diag", "off_ij", "off_ji"], meta_fields=[])


def matvec(mesh: MeshArrays, jac: BlockJacobian, x: jax.Array) -> jax.Array:
    """y = A x with x, y of shape (nP, v)."""
    y = jnp.einsum("pij,pj->pi", jac.diag, x)
    # neighbor contributions: node p with sign +1 on edge e=(p, q) uses
    # off_ij[e] @ x[q]; with sign -1 (p == j) uses off_ji[e] @ x[q].
    pad = jnp.zeros((1,) + jac.off_ij.shape[1:], dtype=jac.off_ij.dtype)
    oij = jnp.concatenate([jac.off_ij, pad], axis=0)[mesh.node_edges]  # (nP,D,v,v)
    oji = jnp.concatenate([jac.off_ji, pad], axis=0)[mesh.node_edges]
    sel = jnp.where((mesh.node_sign > 0.5)[:, :, None, None], oij,
                    jnp.where((mesh.node_sign < -0.5)[:, :, None, None], oji,
                              jnp.zeros_like(oij)))
    xn = x[mesh.node_nbrs]                                             # (nP,D,v)
    y = y + jnp.einsum("pdij,pdj->pi", sel, xn)
    return y


def block_jacobi_factor(jac: BlockJacobian) -> jax.Array:
    """Batched inverse of the diagonal blocks, (nP, v, v).

    Via the vectorized Gauss-Jordan solver against identity —
    jnp.linalg.inv lowers to per-matrix LU on TPU (slow for huge batches of
    small blocks, same pathology as linalg.solve)."""
    from su2_tpu.linalg.smallsolve import gauss_solve

    v = jac.diag.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(v, dtype=jac.diag.dtype),
                           jac.diag.shape)
    return gauss_solve(jac.diag, eye, pivot=False)


def block_jacobi_apply(dinv: jax.Array, r: jax.Array) -> jax.Array:
    return jnp.einsum("pij,pj->pi", dinv, r)


def sgs_like_apply(mesh: MeshArrays, jac: BlockJacobian, dinv: jax.Array,
                   r: jax.Array, sweeps: int = 2) -> jax.Array:
    """Jacobi-style symmetric sweeps approximating LU-SGS smoothing:
    x_{k+1} = D^{-1} (r - (L+U) x_k), x_0 = D^{-1} r."""
    x = block_jacobi_apply(dinv, r)

    def body(_, x):
        off = matvec(mesh, jac, x) - jnp.einsum("pij,pj->pi", jac.diag, x)
        return block_jacobi_apply(dinv, r - off)

    return jax.lax.fori_loop(0, sweeps, body, x)
