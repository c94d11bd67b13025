"""Scalar auxiliary solvers: Poisson, heat, wave.

Reference capability: CPoissonSolver / CHeatSolver / CWaveSolver
(SU2_CFD/src/solver_direct_poisson.cpp, solver_direct_heat.cpp,
solver_direct_wave.cpp — PHYSICAL_PROBLEM= POISSON_EQUATION /
HEAT_EQUATION / WAVE_EQUATION).  The reference discretizes these with
Galerkin FEM on the primal elements; here they use the same median-dual
finite-volume machinery as the flow solvers (two-point flux
(phi_j - phi_i) |n|^2 / (n . d) per edge), which is consistent on the
orthogonal-ish meshes these solvers target and keeps every kernel an edge
gather — one jittable XLA program per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from su2_tpu.geometry.mesh_data import MeshArrays
from su2_tpu.linalg import krylov


def _laplacian_coeffs(mesh: MeshArrays):
    """Per-edge transmissibility |n|^2 / (n . d) (two-point flux)."""
    i, j = mesh.edges[:, 0], mesh.edges[:, 1]
    d = mesh.coords[j] - mesh.coords[i]
    nd = jnp.einsum("ed,ed->e", mesh.edge_normal, d)
    n2 = jnp.einsum("ed,ed->e", mesh.edge_normal, mesh.edge_normal)
    return n2 / jnp.where(jnp.abs(nd) < 1e-300, 1e-300, nd)


def laplacian(mesh: MeshArrays, phi: jax.Array, coeff=None) -> jax.Array:
    """Integral of div(grad phi) over each dual CV (edge-flux sum)."""
    c = _laplacian_coeffs(mesh) if coeff is None else coeff
    i, j = mesh.edges[:, 0], mesh.edges[:, 1]
    flux = c * (phi[j] - phi[i])
    return mesh.scatter_edges(flux[:, None])[:, 0]


def solve_poisson(mesh: MeshArrays, rhs: jax.Array, dirichlet_nodes,
                  dirichlet_vals, n_iter: int = 400, tol: float = 1e-12,
                  point_sources=None):
    """-div(grad phi) = rhs (volume-integrated) with Dirichlet markers.

    SPD interior system via boundary elimination, Jacobi-preconditioned CG
    (the reference assembles the FEM stiffness and uses its linear solver).
    ``point_sources`` (nP,) adds already-integrated fluxes to the balance —
    the inhomogeneous-Neumann term (boundary CVs are natural zero-flux).
    """
    c = _laplacian_coeffs(mesh)
    n = mesh.npoint
    mask = jnp.zeros(n, dtype=bool).at[dirichlet_nodes].set(True)
    phi_b = jnp.zeros(n, dtype=rhs.dtype).at[dirichlet_nodes].set(
        dirichlet_vals)

    def op(x):
        x0 = jnp.where(mask, 0.0, x)
        return jnp.where(mask, x, -laplacian(mesh, x0, c))

    deg = mesh.sum_edges_abs(jnp.abs(c)[:, None])[:, 0]
    dinv = jnp.where(mask, 1.0, 1.0 / jnp.maximum(deg, 1e-300))
    b = rhs * mesh.volume + laplacian(mesh, phi_b, c)
    if point_sources is not None:
        b = b + point_sources
    b = jnp.where(mask, 0.0, b)
    x, rel, _ = krylov.cg(op, lambda r: dinv * r, b, max_iter=n_iter, tol=tol)
    return phi_b + jnp.where(mask, 0.0, x)


def heat_step(mesh: MeshArrays, t: jax.Array, alpha: float, dt: float,
              iso_nodes=None, iso_vals=None, flux_nodes=None, flux_vals=None):
    """One explicit step of dT/dt = alpha lap(T) with isothermal and
    heat-flux markers (CHeatSolver capability)."""
    rhs = alpha * laplacian(mesh, t)
    if flux_nodes is not None:
        area = jnp.linalg.norm(mesh.bnd_accum_normal[flux_nodes], axis=-1)
        rhs = rhs.at[flux_nodes].add(flux_vals * area)
    t_new = t + dt * rhs / mesh.volume
    if iso_nodes is not None:
        t_new = t_new.at[iso_nodes].set(iso_vals)
    return t_new


def wave_step(mesh: MeshArrays, phi: jax.Array, phi_old: jax.Array,
              c2: float, dt: float, dirichlet_nodes=None):
    """Leapfrog step of d2phi/dt2 = c^2 lap(phi) (CWaveSolver capability)."""
    acc = c2 * laplacian(mesh, phi) / mesh.volume
    phi_new = 2.0 * phi - phi_old + dt * dt * acc
    if dirichlet_nodes is not None:
        phi_new = phi_new.at[dirichlet_nodes].set(phi[dirichlet_nodes])
    return phi_new, phi
