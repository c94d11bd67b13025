"""Slope limiters for MUSCL reconstruction.

Venkatakrishnan and Barth-Jespersen (SetPrimitive_Limiter,
solver_direct_reactive.cpp:1328-1527), vectorized: per-node neighbor
min/max deltas then a min-reduction of the per-edge-side limiter values.
"""

from __future__ import annotations

import jax.numpy as jnp

from su2_tpu.geometry.mesh_data import MeshArrays

EPS = 1e-16


def _stencil_valid(mesh: MeshArrays, k: int):
    """(nP,) bool: node has a neighbor at stencil offset k."""
    return mesh.stencil_sel[k] != 2 * mesh.edges.shape[0]


def _neighbor_minmax(mesh: MeshArrays, q: jnp.ndarray):
    """Solution_Min/Max per node: extrema of (q_nbr - q_i) over neighbors,
    initialized to +/-EPS like the reference (:1348-1350).

    On static-stencil meshes neighbor access is a roll per offset (min/max
    are order-independent, so results are bit-identical to the gather)."""
    if mesh.stencil_sel is not None:
        qmax = jnp.full_like(q, -jnp.inf)
        qmin = jnp.full_like(q, jnp.inf)
        for k, o in enumerate(mesh.stencil_offsets):
            valid = _stencil_valid(mesh, k)[:, None]
            dq = jnp.roll(q, -o, axis=0) - q
            qmax = jnp.maximum(qmax, jnp.where(valid, dq, -jnp.inf))
            qmin = jnp.minimum(qmin, jnp.where(valid, dq, jnp.inf))
        return jnp.minimum(qmin, EPS), jnp.maximum(qmax, -EPS)
    dq = q[mesh.node_nbrs] - q[:, None, :]           # (nP, D, nG); pad slots = 0
    big = jnp.where(mesh.nbr_mask[:, :, None] > 0.5, dq, -jnp.inf)
    small = jnp.where(mesh.nbr_mask[:, :, None] > 0.5, dq, jnp.inf)
    qmax = jnp.maximum(big.max(axis=1), -EPS)
    qmin = jnp.minimum(small.min(axis=1), EPS)
    return qmin, qmax


def _per_side_min(mesh: MeshArrays, vals_i: jnp.ndarray, vals_j: jnp.ndarray,
                  init: float) -> jnp.ndarray:
    """min-reduce per-edge-side limiter values to nodes.

    vals_i: (nE, nG) limiter candidate seen from edge side i;
    vals_j: same for side j.  Returns (nP, nG).
    """
    pad = jnp.full((1,) + vals_i.shape[1:], jnp.inf, dtype=vals_i.dtype)
    # choose side by sign: +1 -> node is i, -1 -> node is j
    ext_i = jnp.concatenate([vals_i, pad], axis=0)[mesh.node_edges]  # (nP,D,nG)
    ext_j = jnp.concatenate([vals_j, pad], axis=0)[mesh.node_edges]
    sel = jnp.where(mesh.node_sign[:, :, None] > 0.5, ext_i,
                    jnp.where(mesh.node_sign[:, :, None] < -0.5, ext_j, jnp.inf))
    return jnp.minimum(sel.min(axis=1), init)


def venkatakrishnan(mesh: MeshArrays, q: jnp.ndarray, grad: jnp.ndarray,
                    limiter_coeff: float, ref_elem_length: float) -> jnp.ndarray:
    """(nP, nG) Venkatakrishnan limiter (:1444-1522).

    eps2 = (K*dave)^3 with dave = REF_ELEM_LENGTH, K = LIMITER_COEFF.
    """
    qmin, qmax = _neighbor_minmax(mesh, q)
    eps1 = limiter_coeff * ref_elem_length
    eps2 = eps1 ** 3

    def venkat(dm, dp):
        return (dp * dp + 2.0 * dp * dm + eps2) / \
               (dp * dp + dp * dm + 2.0 * dm * dm + eps2)

    if mesh.stencil_sel is not None:
        # roll form: every (node, half-edge-toward-offset-o) candidate is a
        # node-local expression with static midpoint vectors; the min over
        # slots is order-independent, so results match the gather exactly
        lim = jnp.full_like(q, 2.0)
        for k, o in enumerate(mesh.stencil_offsets):
            valid = _stencil_valid(mesh, k)[:, None]
            half = 0.5 * (jnp.roll(mesh.coords, -o, axis=0) - mesh.coords)
            dm = jnp.einsum("nd,ngd->ng", half, grad)
            dp = jnp.where(dm > 0.0, qmax, qmin)
            lim = jnp.minimum(lim, jnp.where(valid, venkat(dm, dp),
                                             jnp.inf))
        return lim

    xi = mesh.coords[mesh.edges[:, 0]]
    xj = mesh.coords[mesh.edges[:, 1]]
    half = 0.5 * (xj - xi)                                     # (nE, d)

    def side(node_idx, sgn):
        dm = jnp.einsum("ed,egd->eg", sgn * half, grad[node_idx])   # (nE, nG)
        dp = jnp.where(dm > 0.0, qmax[node_idx], qmin[node_idx])
        return venkat(dm, dp)

    li = side(mesh.edges[:, 0], 1.0)
    lj = side(mesh.edges[:, 1], -1.0)
    return _per_side_min(mesh, li, lj, 2.0)


def barth_jespersen(mesh: MeshArrays, q: jnp.ndarray, grad: jnp.ndarray) -> jnp.ndarray:
    """(nP, nG) Barth-Jespersen with Venkat smoothing y->(y^2+2y)/(y^2+y+2)
    (:1384-1441)."""
    qmin, qmax = _neighbor_minmax(mesh, q)

    def bj(dm, dp):
        return jnp.where(dm < EPS, 2.0, dp / jnp.where(dm == 0.0, 1.0, dm))

    if mesh.stencil_sel is not None:
        y = jnp.full_like(q, 2.0)
        for k, o in enumerate(mesh.stencil_offsets):
            valid = _stencil_valid(mesh, k)[:, None]
            half = 0.5 * (jnp.roll(mesh.coords, -o, axis=0) - mesh.coords)
            dm = jnp.einsum("nd,ngd->ng", half, grad)
            dp = jnp.where(dm > EPS, qmax, qmin)
            y = jnp.minimum(y, jnp.where(valid, bj(dm, dp), jnp.inf))
        return (y * y + 2.0 * y) / (y * y + y + 2.0)

    xi = mesh.coords[mesh.edges[:, 0]]
    xj = mesh.coords[mesh.edges[:, 1]]
    half = 0.5 * (xj - xi)

    def side(node_idx, sgn):
        dm = jnp.einsum("ed,egd->eg", sgn * half, grad[node_idx])
        dp = jnp.where(dm > EPS, qmax[node_idx], qmin[node_idx])
        return bj(dm, dp)

    li = side(mesh.edges[:, 0], 1.0)
    lj = side(mesh.edges[:, 1], -1.0)
    y = _per_side_min(mesh, li, lj, 2.0)
    return (y * y + 2.0 * y) / (y * y + y + 2.0)
