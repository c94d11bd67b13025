"""Centered convective schemes: JST and Lax-Friedrichs.

Standard-solver capability (reference: CCentJST_Flow / CCentLax_Flow,
SU2_CFD/src/numerics_direct_mean.cpp:70-250 / :350-500, node precomputes
CEulerSolver::SetUndivided_Laplacian / SetDissipation_Switch,
solver_direct_mean.cpp:5340-5452), generalized to the multispecies
conservative layout: the scalar artificial dissipation applies to every
conserved variable; the energy row uses the rho*H correction and the
pressure-derivative Jacobian rows come from dP/dU instead of a constant
gamma, so the scheme is exact for the single-species ideal gas and
consistent for reactive mixtures.

All node precomputes are edge gathers/scatters over the padded adjacency —
one fused XLA program, no per-edge loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from su2_tpu.geometry.mesh_data import MeshArrays
from su2_tpu.state import Layout

PARAM_P = 0.3   # stretching exponent (numerics_structure.cpp Param_p)


def boundary_mask(mesh: MeshArrays, n: int):
    """Physical-boundary node mask (GetPhysicalBoundary equivalent)."""
    m = jnp.zeros(n, dtype=bool)
    for tag, (nodes, _) in mesh.markers.items():
        m = m.at[nodes].set(True)
    return m


def spectral_radius(lay: Layout, mesh: MeshArrays, v):
    """Node-accumulated inviscid spectral radius Lambda_i (SetLambda):
    edge means |0.5(q_i+q_j).n| + 0.5(a_i+a_j)A plus boundary-vertex terms."""
    i, j = mesh.edges[:, 0], mesh.edges[:, 1]
    vel = v[:, lay.VX:lay.VX + lay.ndim]
    a = v[:, lay.A]
    qn = jnp.einsum("ed,ed->e", 0.5 * (vel[i] + vel[j]), mesh.edge_normal)
    lam_e = jnp.abs(qn) + 0.5 * (a[i] + a[j]) * mesh.edge_area
    lam = mesh.sum_edges_abs(lam_e)
    for tag, (nodes, normal) in mesh.markers.items():
        area = jnp.linalg.norm(normal, axis=1)
        qb = jnp.einsum("vd,vd->v", vel[nodes], normal)
        lam = lam.at[nodes].add(jnp.abs(qb) + a[nodes] * area)
    return lam


def und_laplacian_and_sensor(lay: Layout, mesh: MeshArrays, u, v, bmask):
    """Undivided Laplacian of U (energy row uses rho*H) and the pressure
    sensor, with the reference's interior/boundary masking."""
    i, j = mesh.edges[:, 0], mesh.edges[:, 1]
    diff = u[i] - u[j]                                        # (nE, nvar)
    rhoh = v[:, lay.PRHO] * v[:, lay.H]
    diff = diff.at[:, lay.RHOE].set(rhoh[i] - rhoh[j])
    bi, bj = bmask[i], bmask[j]
    keep_i = (~bi) | bj          # node i receives the edge contribution
    keep_j = (~bj) | bi
    # lapl_i += (U_j - U_i), lapl_j += (U_i - U_j), masked
    lapl = mesh.accumulate_sides(
        jnp.where(keep_i[:, None], -diff, 0.0),
        jnp.where(keep_j[:, None], -diff, 0.0))

    p = v[:, lay.P]
    dp = p[j] - p[i]
    sp = p[i] + p[j]
    num = mesh.accumulate_sides(jnp.where(keep_i, dp, 0.0)[:, None],
                                jnp.where(keep_j, -dp, 0.0)[:, None])[:, 0]
    den = mesh.accumulate_sides(jnp.where(keep_i, sp, 0.0)[:, None],
                                jnp.where(keep_j, sp, 0.0)[:, None])[:, 0]
    sensor = jnp.abs(num) / jnp.where(den == 0.0, 1.0, den)
    return lapl, sensor


def _mean_proj_flux(lay: Layout, v_i, v_j, normal):
    """GetInviscidProjFlux at the arithmetic-mean primitives."""
    rho = 0.5 * (v_i[:, lay.PRHO] + v_j[:, lay.PRHO])
    p = 0.5 * (v_i[:, lay.P] + v_j[:, lay.P])
    h = 0.5 * (v_i[:, lay.H] + v_j[:, lay.H])
    vel = 0.5 * (v_i[:, lay.VX:lay.VX + lay.ndim]
                 + v_j[:, lay.VX:lay.VX + lay.ndim])
    rys = 0.5 * (v_i[:, lay.PRHO, None] * v_i[:, lay.YS:lay.YS + lay.ns]
                 + v_j[:, lay.PRHO, None] * v_j[:, lay.YS:lay.YS + lay.ns])
    qn = jnp.einsum("ed,ed->e", vel, normal)
    flux = jnp.zeros((v_i.shape[0], lay.nvar), dtype=v_i.dtype)
    flux = flux.at[:, lay.RHO].set(rho * qn)
    flux = flux.at[:, lay.RHOVX:lay.RHOVX + lay.ndim].set(
        rho[:, None] * vel * qn[:, None] + p[:, None] * normal)
    flux = flux.at[:, lay.RHOE].set(rho * h * qn)
    flux = flux.at[:, lay.RHOS:lay.RHOS + lay.ns].set(rys * qn[:, None])
    return flux


def inviscid_proj_jac(lay: Layout, vrow, s, normal, scale=1.0):
    """A = d(F.n)/dU for the multispecies layout with dP/dU rows ``s``
    (GetInviscidProjJac generalized; reduces to the Gamma form for the
    single-species perfect gas)."""
    nd, ns = lay.ndim, lay.ns
    ne = vrow.shape[0]
    vel = vrow[:, lay.VX:lay.VX + nd]
    h = vrow[:, lay.H]
    ys = vrow[:, lay.YS:lay.YS + ns]
    qn = jnp.einsum("ed,ed->e", vel, normal)

    jac = jnp.zeros((ne, lay.nvar, lay.nvar), dtype=vrow.dtype)
    # rho row: d(rho qn)/d(rho u_d) = n_d
    jac = jac.at[:, lay.RHO, lay.RHOVX:lay.RHOVX + nd].set(normal)
    # momentum rows
    for d in range(nd):
        r = lay.RHOVX + d
        jac = jac.at[:, r, lay.RHO].set(
            -vel[:, d] * qn + s[:, lay.RHO] * normal[:, d])
        for e in range(nd):
            jac = jac.at[:, r, lay.RHOVX + e].set(
                vel[:, d] * normal[:, e]
                + (qn if d == e else jnp.zeros_like(qn))
                + s[:, lay.RHOVX + e] * normal[:, d])
        jac = jac.at[:, r, lay.RHOE].set(s[:, lay.RHOE] * normal[:, d])
        jac = jac.at[:, r, lay.RHOS:lay.RHOS + ns].set(
            s[:, lay.RHOS:lay.RHOS + ns] * normal[:, d, None])
    # energy row: F_E = rho H qn
    jac = jac.at[:, lay.RHOE, lay.RHO].set(qn * (s[:, lay.RHO] - h))
    jac = jac.at[:, lay.RHOE, lay.RHOVX:lay.RHOVX + nd].set(
        h[:, None] * normal + qn[:, None] * s[:, lay.RHOVX:lay.RHOVX + nd])
    jac = jac.at[:, lay.RHOE, lay.RHOE].set(qn * (1.0 + s[:, lay.RHOE]))
    jac = jac.at[:, lay.RHOE, lay.RHOS:lay.RHOS + ns].set(
        qn[:, None] * s[:, lay.RHOS:lay.RHOS + ns])
    # species rows: F_s = rho_s qn
    for sp in range(ns):
        r = lay.RHOS + sp
        jac = jac.at[:, r, lay.RHO].set(-ys[:, sp] * qn)
        jac = jac.at[:, r, lay.RHOVX:lay.RHOVX + nd].set(
            ys[:, sp, None] * normal)
        jac = jac.at[:, r, r].set(qn)
    return scale * jac


def centered_flux(lay: Layout, mesh: MeshArrays, v, u, dpdu_full,
                  lam_node, lapl, sensor, n_neigh, kind: str,
                  kappa_2: float, kappa_4: float, kappa_0: float,
                  implicit: bool):
    """Edge flux (and Jacobian blocks) of the JST / Lax-Friedrichs scheme."""
    i, j = mesh.edges[:, 0], mesh.edges[:, 1]
    v_i, v_j = v[i], v[j]
    normal = mesh.edge_normal
    flux = _mean_proj_flux(lay, v_i, v_j, normal)

    # scalar dissipation scaling
    vel = v[:, lay.VX:lay.VX + lay.ndim]
    qn_i = jnp.einsum("ed,ed->e", vel[i], normal)
    qn_j = jnp.einsum("ed,ed->e", vel[j], normal)
    area = mesh.edge_area
    lam_i = jnp.abs(qn_i) + v_i[:, lay.A] * area
    lam_j = jnp.abs(qn_j) + v_j[:, lay.A] * area
    mean_lam = 0.5 * (lam_i + lam_j)
    safe_ml = jnp.where(mean_lam == 0.0, 1.0, mean_lam)
    phi_i = (lam_node[i] / (4.0 * safe_ml)) ** PARAM_P
    phi_j = (lam_node[j] / (4.0 * safe_ml)) ** PARAM_P
    stretch = 4.0 * phi_i * phi_j / jnp.where(
        phi_i + phi_j == 0.0, 1.0, phi_i + phi_j)

    nn_i = n_neigh[i]
    nn_j = n_neigh[j]
    sc2 = 3.0 * (nn_i + nn_j) / (nn_i * nn_j)

    rhoh = v[:, lay.PRHO] * v[:, lay.H]
    diff_u = u[i] - u[j]
    diff_u = diff_u.at[:, lay.RHOE].set(rhoh[i] - rhoh[j])

    if kind == "JST":
        eps2 = kappa_2 * 0.5 * (sensor[i] + sensor[j]) * sc2
        eps4 = jnp.maximum(0.0, kappa_4 - eps2) * (sc2 * sc2 / 4.0)
        diff_lapl = lapl[i] - lapl[j]
        diss = (eps2[:, None] * diff_u - eps4[:, None] * diff_lapl) \
            * (stretch * mean_lam)[:, None]
        cte_i = (eps2 + eps4 * (nn_i + 1.0)) * stretch * mean_lam
        cte_j = (eps2 + eps4 * (nn_j + 1.0)) * stretch * mean_lam
    else:  # Lax-Friedrichs
        eps0 = kappa_0 * sc2 * lay.ndim / 3.0
        diss = eps0[:, None] * diff_u * (stretch * mean_lam)[:, None]
        cte_i = eps0 * stretch * mean_lam
        cte_j = cte_i

    flux = flux + diss
    if not implicit:
        return flux

    s_mean = 0.5 * (dpdu_full[i] + dpdu_full[j])
    v_mean = 0.5 * (v_i + v_j)
    jac_c = inviscid_proj_jac(lay, v_mean, s_mean, normal, scale=0.5)
    eye = jnp.eye(lay.nvar, dtype=v.dtype)
    # dissipation Jacobian: cte on every diagonal; the energy row
    # differentiates rho*H = U_E + P -> dP/dU extra terms
    jd_i = cte_i[:, None, None] * eye[None]
    jd_j = -cte_j[:, None, None] * eye[None]
    jd_i = jd_i.at[:, lay.RHOE, :].add(cte_i[:, None] * dpdu_full[i])
    jd_j = jd_j.at[:, lay.RHOE, :].add(-cte_j[:, None] * dpdu_full[j])
    jac_i = jac_c + jd_i
    jac_j = jac_c + jd_j
    return flux, jac_i, jac_j
