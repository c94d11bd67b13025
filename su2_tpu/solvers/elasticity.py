"""Linear-elasticity FEM (plane strain) on 2D tri/quad meshes.

Reference capability: CFEASolver / CFEM_ElasticitySolver
(SU2_CFD/src/solver_fem_elasticity.cpp small-deformation branch) and the
linear-elasticity mesh deformation of CVolumetricMovement
(Common/src/grid_movement_structure.cpp::SetVolume_Deformation with
DEFORM_STIFFNESS_TYPE).

Element stiffnesses are precomputed in one batched einsum (P1 triangles
exactly, bilinear quads with 2x2 Gauss); the solve is matrix-free
Jacobi-preconditioned CG with boundary elimination.  Element scatter uses
host-precomputed gather tables where possible; this solver targets setup
work (deformation, structural response), not the per-iteration hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from su2_tpu.io.mesh import RawMesh
from su2_tpu.linalg import krylov

_GAUSS = 1.0 / np.sqrt(3.0)
_QPTS = [(-_GAUSS, -_GAUSS), (_GAUSS, -_GAUSS),
         (_GAUSS, _GAUSS), (-_GAUSS, _GAUSS)]


def _dmat(e_mod, nu):
    """Plane-strain constitutive matrix (3, 3)."""
    c = e_mod / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return np.array([[c * (1 - nu), c * nu, 0.0],
                     [c * nu, c * (1 - nu), 0.0],
                     [0.0, 0.0, c * (1 - 2 * nu) / 2.0]])


def _tri_stiffness(xy, d):
    """(nE, 3, 2) -> (nE, 6, 6) exact P1 stiffness."""
    x, y = xy[..., 0], xy[..., 1]
    b = np.stack([y[:, 1] - y[:, 2], y[:, 2] - y[:, 0], y[:, 0] - y[:, 1]],
                 axis=1)
    c = np.stack([x[:, 2] - x[:, 1], x[:, 0] - x[:, 2], x[:, 1] - x[:, 0]],
                 axis=1)
    area2 = (x[:, 0] * b[:, 0] + x[:, 1] * b[:, 1] + x[:, 2] * b[:, 2])
    area = 0.5 * np.abs(area2)
    bm = np.zeros((len(xy), 3, 6))
    for a in range(3):
        bm[:, 0, 2 * a] = b[:, a]
        bm[:, 1, 2 * a + 1] = c[:, a]
        bm[:, 2, 2 * a] = c[:, a]
        bm[:, 2, 2 * a + 1] = b[:, a]
    bm /= area2[:, None, None]
    return np.einsum("eia,ij,ejb,e->eab", bm, d, bm, area)


def _quad_stiffness(xy, d):
    """(nE, 4, 2) -> (nE, 8, 8) bilinear stiffness, 2x2 Gauss."""
    ke = np.zeros((len(xy), 8, 8))
    for xi, eta in _QPTS:
        dn = 0.25 * np.array([
            [-(1 - eta), -(1 - xi)], [(1 - eta), -(1 + xi)],
            [(1 + eta), (1 + xi)], [-(1 + eta), (1 - xi)]])  # (4, 2)
        jac = np.einsum("ai,eaj->eij", dn, xy)               # (nE, 2, 2)
        det = jac[:, 0, 0] * jac[:, 1, 1] - jac[:, 0, 1] * jac[:, 1, 0]
        inv = np.empty_like(jac)
        inv[:, 0, 0] = jac[:, 1, 1]
        inv[:, 1, 1] = jac[:, 0, 0]
        inv[:, 0, 1] = -jac[:, 0, 1]
        inv[:, 1, 0] = -jac[:, 1, 0]
        inv /= det[:, None, None]
        gdn = np.einsum("eij,aj->eai", inv, dn)              # (nE, 4, 2)
        bm = np.zeros((len(xy), 3, 8))
        for a in range(4):
            bm[:, 0, 2 * a] = gdn[:, a, 0]
            bm[:, 1, 2 * a + 1] = gdn[:, a, 1]
            bm[:, 2, 2 * a] = gdn[:, a, 1]
            bm[:, 2, 2 * a + 1] = gdn[:, a, 0]
        ke += np.einsum("eia,ij,ejb,e->eab", bm, d, bm, np.abs(det))
    return ke


def element_stiffness(mesh: RawMesh, e_mod=1.0, nu=0.3,
                      stiffness_type: str = "CONSTANT_STIFFNESS"):
    """Batched element stiffnesses; INVERSE_VOLUME scales E by 1/area
    (DEFORM_STIFFNESS_TYPE, grid_movement_structure.cpp)."""
    d = _dmat(1.0, nu)
    kes, elem_lists = [], []
    for t, fn, nn in ((5, _tri_stiffness, 3), (9, _quad_stiffness, 4)):
        sel = np.nonzero(mesh.elem_types == t)[0]
        if sel.size == 0:
            continue
        nodes = mesh.elem_nodes[sel][:, :nn]
        xy = mesh.coords[nodes]
        ke = fn(xy, d)
        if stiffness_type == "INVERSE_VOLUME":
            if t == 5:
                x, y = xy[..., 0], xy[..., 1]
                area = 0.5 * np.abs(
                    (x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0])
                    - (x[:, 2] - x[:, 0]) * (y[:, 1] - y[:, 0]))
            else:
                area = 0.5 * np.abs(
                    (xy[:, 2, 0] - xy[:, 0, 0]) * (xy[:, 3, 1] - xy[:, 1, 1])
                    - (xy[:, 3, 0] - xy[:, 1, 0]) * (xy[:, 2, 1] - xy[:, 0, 1]))
            ke = ke / area[:, None, None]
        kes.append(e_mod * ke)
        elem_lists.append(nodes)
    return kes, elem_lists


def solve_elasticity(mesh: RawMesh, bnd_mask: np.ndarray,
                     bnd_disp: np.ndarray, e_mod=1.0, nu=0.3,
                     stiffness_type="CONSTANT_STIFFNESS",
                     n_iter: int = 600, tol: float = 1e-12):
    """Displacement field with Dirichlet data on bnd_mask nodes."""
    kes, elem_lists = element_stiffness(mesh, e_mod, nu, stiffness_type)
    kes = [jnp.asarray(k) for k in kes]
    elem_lists = [jnp.asarray(e, dtype=jnp.int32) for e in elem_lists]
    n = mesh.npoint
    mask = jnp.asarray(bnd_mask)
    disp_b = jnp.where(mask[:, None], jnp.asarray(bnd_disp), 0.0)

    def kmul(x):
        y = jnp.zeros_like(x)
        for ke, en in zip(kes, elem_lists):
            nn = en.shape[1]
            ue = x[en].reshape(en.shape[0], 2 * nn)
            fe = jnp.einsum("eab,eb->ea", ke, ue).reshape(en.shape[0], nn, 2)
            y = y.at[en].add(fe)
        return y

    def op(x):
        x0 = jnp.where(mask[:, None], 0.0, x)
        return jnp.where(mask[:, None], x, kmul(x0))

    # Jacobi preconditioner from the stiffness diagonal
    diag = jnp.zeros((n, 2))
    for ke, en in zip(kes, elem_lists):
        nn = en.shape[1]
        de = jnp.diagonal(ke, axis1=1, axis2=2).reshape(en.shape[0], nn, 2)
        diag = diag.at[en].add(de)
    dinv = jnp.where(mask[:, None], 1.0, 1.0 / jnp.maximum(diag, 1e-300))

    rhs = jnp.where(mask[:, None], 0.0, -kmul(disp_b))
    x, _, _ = krylov.cg(op, lambda r: dinv * r, rhs,
                        max_iter=n_iter, tol=tol)
    return disp_b + jnp.where(mask[:, None], 0.0, x)
