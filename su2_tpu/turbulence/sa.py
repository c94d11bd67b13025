"""Spalart-Allmaras turbulence model.

Standard-solver capability (reference: CTurbSASolver in
SU2_CFD/src/solver_direct_turbulent.cpp:1240-2698, numerics
CUpwSca_TurbSA / CAvgGrad_TurbSA / CSourcePieceWise_TurbSA in
numerics_direct_turbulent.cpp).  One transport equation for nu_tilde;
mu_t = rho nu_tilde fv1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from su2_tpu.geometry.mesh_data import MeshArrays
from su2_tpu.linalg import blockcsr, krylov
from su2_tpu.linalg.blockcsr import BlockJacobian
from su2_tpu.ops import gradients
from su2_tpu.state import Layout

EPS = 1e-16

CB1 = 0.1355
CB2 = 0.622
SIGMA = 2.0 / 3.0
KAPPA = 0.41
CW1 = CB1 / KAPPA ** 2 + (1.0 + CB2) / SIGMA
CW2 = 0.3
CW3 = 2.0
CV1 = 7.1

LOWER = 1.0e-10
UPPER = 1.0


def freestream(cfg, rho_inf, mu_inf):
    """nu_tilde_Inf = NuFactor * mu/rho (solver_direct_turbulent.cpp:1284)."""
    nu_inf = cfg.freestream_nu_factor * mu_inf / rho_inf
    chi = nu_inf * rho_inf / mu_inf
    fv1 = chi ** 3 / (chi ** 3 + CV1 ** 3)
    return nu_inf, rho_inf * fv1 * nu_inf


def eddy_viscosity(rho, nu_tilde, mu):
    chi = rho * nu_tilde / mu
    fv1 = chi ** 3 / (chi ** 3 + CV1 ** 3)
    return rho * nu_tilde * fv1


def sa_step(lay: Layout, mesh: MeshArrays, scfg, bcs, nu, v, flow_grad,
            mu, vorticity, dist, dt, nu_inf, gamma_trans=None):
    """One implicit Euler iteration of the SA equation.

    nu: (N,) nu_tilde; returns (nu_new, rms, mu_t_new).
    """
    n = nu.shape[0]
    dtype = nu.dtype
    rho = v[:, lay.PRHO]
    vel = v[:, lay.VX:lay.VX + lay.ndim]
    q = nu[:, None]

    if scfg.grad_method == "GREEN_GAUSS":
        gq = gradients.pg_fix(mesh, gradients.green_gauss(mesh, q))
    else:
        gq = gradients.pg_fix(mesh,
                              gradients.weighted_least_squares(mesh, q))
    grad_nu = gq[:, 0, :]

    # ---- convective upwind (CUpwSca_TurbSA: no density weighting) ----
    i, j = mesh.edges[:, 0], mesh.edges[:, 1]
    qij = 0.5 * jnp.einsum("ed,ed->e", vel[i] + vel[j], mesh.edge_normal)
    a0 = 0.5 * (qij + jnp.abs(qij))
    a1 = 0.5 * (qij - jnp.abs(qij))
    flux = (a0 * nu[i] + a1 * nu[j])[:, None]
    res = mesh.scatter_edges(flux)
    diag = mesh.accumulate_sides(a0, -a1)[:, None, None]
    off_ij = a1[:, None, None]
    off_ji = -a0[:, None, None]

    # ---- viscous diffusion (CAvgGradCorrected_TurbSA — the reference
    # uses the CORRECTED kernel on interior turb edges,
    # driver_structure.cpp:1583): (nu + nu_tilde)/sigma with the
    # edge-projected corrected gradient g.n - (g.e) pv + dnu pv ----
    nu_lam = mu / rho
    eff = (nu_lam + nu) / SIGMA
    eff_e = 0.5 * (eff[i] + eff[j])
    gmean = 0.5 * (grad_nu[i] + grad_nu[j])
    evec = mesh.coords[j] - mesh.coords[i]
    dist2 = jnp.sum(evec * evec, axis=1)
    pvec = jnp.einsum("ed,ed->e", evec, mesh.edge_normal) / \
        jnp.where(dist2 == 0.0, 1.0, dist2)
    proj = jnp.einsum("ed,ed->e", gmean, mesh.edge_normal) \
        + pvec * ((nu[j] - nu[i]) - jnp.einsum("ed,ed->e", gmean, evec))
    vflux = (eff_e * proj)[:, None]
    res = res - mesh.scatter_edges(vflux)
    diag = diag + mesh.accumulate_sides(eff_e * pvec, eff_e * pvec)[:, None, None]
    off_ij = off_ij - (eff_e * pvec)[:, None, None]
    off_ji = off_ji - (eff_e * pvec)[:, None, None]

    # ---- source (CSourcePieceWise_TurbSA) ----
    d2 = jnp.maximum(dist * dist, 1e-20)
    chi = rho * nu / mu
    fv1 = chi ** 3 / (chi ** 3 + CV1 ** 3)
    fv2 = 1.0 - chi / (1.0 + chi * fv1)
    s_hat = vorticity + nu / (KAPPA ** 2 * d2) * fv2
    s_hat = jnp.maximum(s_hat, 1e-10)
    r = jnp.minimum(nu / (s_hat * KAPPA ** 2 * d2), 10.0)
    g = r + CW2 * (r ** 6 - r)
    fw = g * ((1.0 + CW3 ** 6) / (g ** 6 + CW3 ** 6)) ** (1.0 / 6.0)
    prod = CB1 * s_hat * nu
    if gamma_trans is not None:
        # LM transition coupling: effective intermittency scales production
        # (CTransLMSolver -> SA coupling)
        prod = prod * gamma_trans
    dest = CW1 * fw * nu * nu / d2
    cross = CB2 / SIGMA * jnp.sum(grad_nu * grad_nu, axis=1)
    active = dist > 1e-10
    src = jnp.where(active, prod - dest + cross, 0.0)
    vol = mesh.volume
    res = res - (src * vol)[:, None]
    # Jacobian: -d(dest)/dnu (destabilizing production omitted, like SU2)
    dsrc = jnp.where(active, -2.0 * CW1 * fw * nu / d2, 0.0)
    diag = diag.at[:, 0, 0].add(-dsrc * vol)

    # ---- BCs ----
    wall_mask = jnp.zeros(n, dtype=bool)
    for bc in bcs:
        nodes = bc.nodes
        if bc.kind in ("isothermal_wall", "heatflux_wall"):
            wall_mask = wall_mask.at[nodes].set(True)
        elif bc.kind in ("inlet", "supersonic_inlet", "far_field"):
            qb = jnp.einsum("ed,ed->e", vel[nodes], -bc.normal)
            a0b = 0.5 * (qb + jnp.abs(qb))
            a1b = 0.5 * (qb - jnp.abs(qb))
            res = res.at[nodes, 0].add(a0b * nu[nodes] + a1b * nu_inf)
            diag = diag.at[nodes, 0, 0].add(a0b)
        elif bc.kind in ("outlet", "supersonic_outlet"):
            qb = jnp.einsum("ed,ed->e", vel[nodes], -bc.normal)
            res = res.at[nodes, 0].add(qb * nu[nodes])
            diag = diag.at[nodes, 0, 0].add(qb)

    res = jnp.where(wall_mask[:, None], 0.0, res)
    diag = jnp.where(wall_mask[:, None, None], 1.0, diag)
    iw = wall_mask[mesh.edges[:, 0]]
    jw = wall_mask[mesh.edges[:, 1]]
    off_ij = jnp.where(iw[:, None, None], 0.0, off_ij)
    off_ji = jnp.where(jw[:, None, None], 0.0, off_ji)

    # ---- implicit solve + clipped update ----
    ok = dt > EPS
    delta = jnp.where(ok, mesh.volume / (scfg.cfl_red * jnp.where(ok, dt, 1.0)), 0.0)
    diag = diag.at[:, 0, 0].add(delta)
    jac = BlockJacobian(diag=diag, off_ij=off_ij, off_ji=off_ji)
    rhs = -res
    dinv = blockcsr.block_jacobi_factor(jac)
    _sel = blockcsr.gather_offdiag(mesh, jac)
    solver = krylov.bcgstab if scfg.linear_solver == "BCGSTAB" else krylov.fgmres
    sol, _, _ = solver(
        lambda x: blockcsr.matvec(mesh, jac, x, _sel),
        lambda r: blockcsr.block_jacobi_apply(dinv, r),
        rhs, max_iter=scfg.linear_iter, tol=scfg.linear_tol)
    nu_new = jnp.clip(nu + scfg.relax * sol[:, 0], LOWER, UPPER)
    nu_new = jnp.where(wall_mask, 0.0, nu_new)
    rms = jnp.sqrt(jnp.mean(rhs * rhs, axis=0))
    mu_t = eddy_viscosity(rho, nu_new, mu)
    mu_t = jnp.where(wall_mask, 0.0, mu_t)
    return nu_new, rms, mu_t
