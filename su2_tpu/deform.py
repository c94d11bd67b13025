"""Mesh deformation: Hicks-Henne surface design variables + spring-analogy
volume propagation (SU2_DEF capability; reference:
Common/src/grid_movement_structure.cpp — CSurfaceMovement::SetHicksHenne
:3080-3260, CVolumetricMovement).

The reference propagates surface displacements with a linear-elasticity FEM
solve; here the volume motion uses the classical edge-spring analogy
(stiffness 1/len^2) solved matrix-free with Jacobi-preconditioned CG — the
same Dirichlet data and a TPU-parallel operator.  Simplifications vs the
reference's Hicks-Henne: deformation applied along +y (2D airfoil
convention), chord computed from the marker extent, no AoA rotation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from su2_tpu.geometry.mesh_data import MeshArrays
from su2_tpu.linalg import krylov


def hicks_henne(xs: np.ndarray, x_loc: float, t2: float = 3.0) -> np.ndarray:
    """Bump shape f(x) = sin(pi x^m)^t2 with m = log(0.5)/log(x_loc)
    (SetHicksHenne, grid_movement_structure.cpp:3200)."""
    x_loc = min(max(x_loc, 1e-6), 1.0 - 1e-6)
    m = np.log(0.5) / np.log(x_loc)
    xs = np.clip(xs, 0.0, 1.0)
    return np.sin(np.pi * xs ** m) ** t2


def surface_displacement(coords: np.ndarray, marker_nodes: np.ndarray,
                         dvs: list) -> np.ndarray:
    """Accumulated (nP, d) boundary displacement from Hicks-Henne DVs.

    dvs: list of dicts {kind: 'HICKS_HENNE', up: 0/1, x_loc: float,
    value: float}.  The x coordinate is chord-normalized over the marker.
    """
    disp = np.zeros_like(coords)
    mx = coords[marker_nodes, 0]
    x0, x1 = mx.min(), mx.max()
    chord = max(x1 - x0, 1e-300)
    xn = (mx - x0) / chord
    for dv in dvs:
        if dv["kind"] != "HICKS_HENNE":
            raise NotImplementedError(dv["kind"])
        ek = hicks_henne(xn, dv["x_loc"])
        sgn = 1.0 if dv.get("up", 1) else -1.0
        disp[marker_nodes, 1] += sgn * dv["value"] * ek * chord
    return disp


def spring_deform(mesh: MeshArrays, bnd_mask: np.ndarray,
                  bnd_disp: np.ndarray, n_iter: int = 200,
                  tol: float = 1e-12) -> jnp.ndarray:
    """Propagate boundary displacements into the volume.

    Solves K dx = 0 on interior nodes with Dirichlet rows at every boundary
    node (the reference fixes all non-moving boundaries too,
    CVolumetricMovement::SetBoundaryDisplacements).  K is the graph
    Laplacian with edge stiffness 1/len^2.
    """
    i = np.asarray(mesh.edges)[:, 0]
    j = np.asarray(mesh.edges)[:, 1]
    coords = np.asarray(mesh.coords)
    k_e = 1.0 / np.maximum(((coords[i] - coords[j]) ** 2).sum(1), 1e-300)
    k_e = jnp.asarray(k_e)
    mask = jnp.asarray(bnd_mask)
    disp_b = jnp.where(mask[:, None], jnp.asarray(bnd_disp), 0.0)

    def lap(x):
        flux = k_e[:, None] * (x[mesh.edges[:, 0]] - x[mesh.edges[:, 1]])
        return mesh.scatter_edges(flux)

    # boundary elimination keeps the interior operator SPD for CG: identity
    # on boundary rows, pure-interior Laplacian elsewhere
    def matvec(x):
        x0 = jnp.where(mask[:, None], 0.0, x)
        return jnp.where(mask[:, None], x, lap(x0))

    deg = mesh.sum_edges_abs(k_e[:, None])[:, 0]
    dinv = jnp.where(mask, 1.0, 1.0 / jnp.maximum(deg, 1e-300))

    rhs = jnp.where(mask[:, None], 0.0, -lap(disp_b))
    x, _, _ = krylov.cg(matvec, lambda r: dinv[:, None] * r, rhs,
                        max_iter=n_iter, tol=tol)
    return disp_b + jnp.where(mask[:, None], 0.0, x)


def deform_coords(mesh: MeshArrays, marker_disp: np.ndarray,
                  n_iter: int = 200, method: str = "SPRING",
                  raw=None, stiffness_type: str = "INVERSE_VOLUME") -> jnp.ndarray:
    """coords + volume-propagated displacement field.

    method SPRING uses the edge-spring analogy; ELASTICITY (requires the
    RawMesh for element connectivity) uses the linear-elasticity FEM like
    the reference's CVolumetricMovement.
    """
    bnd_mask = np.zeros(mesh.npoint, dtype=bool)
    for tag, (nodes, _) in mesh.markers.items():
        bnd_mask[np.asarray(nodes)] = True
    if method == "ELASTICITY" and raw is not None:
        from su2_tpu.solvers import elasticity
        dx = elasticity.solve_elasticity(
            raw, bnd_mask, marker_disp, stiffness_type=stiffness_type,
            n_iter=max(n_iter, 400))
    else:
        dx = spring_deform(mesh, bnd_mask, marker_disp, n_iter=n_iter)
    return mesh.coords + dx


def parse_dv_options(cfg) -> tuple[list, list]:
    """DV_KIND / DV_MARKER / DV_PARAM / DV_VALUE (config_structure.cpp
    design-variable options).  Returns (dv list, marker tags)."""
    kinds = cfg.dv_kind if isinstance(cfg.dv_kind, list) else [cfg.dv_kind]
    params = cfg.dv_param
    values = cfg.dv_value if isinstance(cfg.dv_value, list) else [cfg.dv_value]
    dvs = []
    for k, (kind, val) in enumerate(zip(kinds, values)):
        p = params[k] if k < len(params) else [1.0, 0.5]
        dvs.append({"kind": kind, "up": int(round(p[0])) if len(p) > 1 else 1,
                    "x_loc": float(p[-1]), "value": float(val)})
    return dvs, list(cfg.dv_marker)
