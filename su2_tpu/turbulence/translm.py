"""Langtry-Menter gamma-Re_theta transition model.

Reference capability: CTransLMSolver + CSourcePieceWise_TransLM /
CUpwSca_TransLM / CAvgGradCorrected_TransLM
(SU2_CFD/src/solver_direct_transition.cpp,
numerics_direct_transition.cpp:337-540).  The reference implementation is
explicitly experimental (debug prints left in the release source); this
port keeps its correlations and constants (c_a1=2, c_e1=1, c_a2=0.06,
c_e2=50, c_theta=0.03, flen/rey_tc correlations in turbulence intensity,
f_lambda fixed-point for Re_theta_eq) but runs them vectorized with a
fixed-iteration correlation solve and an implicit update shared with the
other scalar turbulence transports.

Coupling: the intermittency gamma_eff = max(gamma, gamma_sep) multiplies
the SA production term (sa_step's ``gamma_trans`` argument).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from su2_tpu.geometry.mesh_data import MeshArrays
from su2_tpu.linalg import blockcsr, krylov
from su2_tpu.linalg.blockcsr import BlockJacobian
from su2_tpu.ops import gradients
from su2_tpu.state import Layout

EPS = 1e-16
C_E1, C_A1 = 1.0, 2.0
C_E2, C_A2 = 50.0, 0.06
C_THETA = 0.03
S1 = 2.0
SIGMA_F = 1.0
SIGMA_THETAT = 2.0


def re_theta_correlation(tu: float, lam, mu, rho, vel_mag, du_ds,
                         n_iter: int = 10):
    """Empirical Re_theta_eq(tu, lambda) with the f_lambda fixed point
    (numerics_direct_transition.cpp:460-499)."""
    def base(f_lambda):
        if tu <= 1.3:
            rt = f_lambda * (1173.51 - 589.428 * tu + 0.2196 / (tu * tu))
        else:
            rt = 331.5 * f_lambda * (tu - 0.5658) ** (-0.671)
        return jnp.maximum(rt, 20.0)

    f_lambda = jnp.ones_like(mu)
    re_theta = base(f_lambda)
    for _ in range(n_iter):
        re_theta = base(f_lambda)
        theta = re_theta * mu / (rho * vel_mag)
        lam_v = jnp.clip(rho * theta * theta * du_ds / mu, -0.1, 0.1)
        f_neg = 1.0 - (-12.986 * lam_v - 123.66 * lam_v ** 2
                       - 405.689 * lam_v ** 3) * jnp.exp(-(2.0 / 3.0 * tu) ** 1.5)
        f_pos = 1.0 + 0.275 * (1.0 - jnp.exp(-35.0 * lam_v)) \
            * jnp.exp(-2.0 * tu)
        f_lambda = jnp.where(lam_v <= 0.0, f_neg, f_pos)
    return re_theta


def lm_sources(lay: Layout, q, v, grad_vel, mu, mu_t, dist, tu):
    """Per-node source terms (production - destruction) for (gamma,
    Re_theta_t) and the separation intermittency gamma_sep."""
    gamma = q[:, 0]
    re_tt = q[:, 1]
    rho = v[:, lay.PRHO]
    vel = v[:, lay.VX:lay.VX + lay.ndim]
    vel_mag = jnp.sqrt(jnp.maximum(jnp.sum(vel * vel, axis=1), 1e-20))

    g = grad_vel                                      # (N, nd, nd)
    vort = jnp.abs(g[:, 1, 0] - g[:, 0, 1])
    strain = jnp.sqrt(2.0 * (g[:, 0, 0] ** 2
                             + 0.5 * (g[:, 0, 1] + g[:, 1, 0]) ** 2
                             + g[:, 1, 1] ** 2))

    rey_tc = (4.45 * tu ** 3 - 5.7 * tu ** 2 + 1.37 * tu + 0.585) * re_tt
    flen = 0.171 * tu ** 2 - 0.0083 * tu + 0.0306
    re_v = rho * dist * dist / mu * strain
    r_t = mu_t / mu
    f_onset1 = re_v / (2.193 * jnp.maximum(rey_tc, EPS))
    f_onset2 = jnp.minimum(jnp.maximum(f_onset1, f_onset1 ** 4), 2.0)
    f_onset3 = jnp.maximum(1.0 - (0.4 * r_t) ** 3, 0.0)
    f_onset = jnp.maximum(f_onset2 - f_onset3, 0.0)
    f_turb = jnp.exp(-(0.25 * r_t) ** 4)

    prod = flen * C_A1 * rho * strain * jnp.sqrt(
        jnp.maximum(f_onset * gamma, 0.0)) * (1.0 - C_E1 * gamma)
    des = C_A2 * rho * vort * gamma * f_turb * (C_E2 * gamma - 1.0)
    src_gamma = prod - des

    # streamwise acceleration and Re_theta_eq
    du = jnp.einsum("ni,nij->nj", vel, g) / jnp.maximum(vel_mag, 1e-20)[:, None]
    du_ds = jnp.einsum("ni,ni->n", vel, du) / jnp.maximum(vel_mag, 1e-20)
    re_theta_eq = re_theta_correlation(tu, None, mu, rho, vel_mag, du_ds)
    time_scale = 500.0 * mu / (rho * jnp.maximum(vel_mag, 1e-20) ** 2)
    var1 = (gamma - 1.0 / C_E2) / (1.0 - 1.0 / C_E2)
    f_theta = jnp.minimum(1.0 - var1 * var1, 1.0)
    src_re = C_THETA * rho / time_scale * (1.0 - f_theta) \
        * (re_theta_eq - re_tt)

    f_reattach = jnp.exp(-(0.05 * r_t) ** 4)
    gamma_sep = S1 * jnp.maximum(
        0.0, re_v / (3.235 * jnp.maximum(rey_tc, EPS)) - 1.0) * f_reattach

    active = dist > 1e-10
    return (jnp.where(active, src_gamma, 0.0),
            jnp.where(active, src_re, 0.0),
            jnp.where(active, jnp.minimum(gamma_sep, 2.0), 0.0))


def lm_step(lay: Layout, mesh: MeshArrays, scfg, bcs, q, v, flow_grad,
            mu, mu_t, dist, dt, tu: float, re_theta_inf: float):
    """One implicit iteration of the two LM transport equations.

    q: (N, 2) = (gamma, Re_theta_t).  Returns (q_new, rms, gamma_eff).
    """
    n = q.shape[0]
    rho = v[:, lay.PRHO]
    vel = v[:, lay.VX:lay.VX + lay.ndim]

    if scfg.grad_method == "GREEN_GAUSS":
        gq = gradients.pg_fix(mesh, gradients.green_gauss(mesh, q))
    else:
        gq = gradients.pg_fix(mesh,
                              gradients.weighted_least_squares(mesh, q))

    i, j = mesh.edges[:, 0], mesh.edges[:, 1]
    # scalar upwind convection, rho-weighted (CUpwSca_TransLM)
    qij = 0.5 * jnp.einsum("ed,ed->e", vel[i] + vel[j], mesh.edge_normal)
    a0 = 0.5 * (qij + jnp.abs(qij))
    a1 = 0.5 * (qij - jnp.abs(qij))
    flux = a0[:, None] * (rho[i, None] * q[i]) \
        + a1[:, None] * (rho[j, None] * q[j])
    res = mesh.scatter_edges(flux)
    eye = jnp.eye(2, dtype=q.dtype)
    diag = mesh.accumulate_sides(a0 * rho[i], -a1 * rho[j])[:, None, None] * eye
    off_ij = (a1 * rho[j])[:, None, None] * eye
    off_ji = -(a0 * rho[i])[:, None, None] * eye

    # diffusion (CAvgGradCorrected_TransLM): (mu + mu_t/sigma) per equation
    eff_g = mu + mu_t / SIGMA_F
    eff_r = SIGMA_THETAT * (mu + mu_t)
    evec = mesh.coords[j] - mesh.coords[i]
    dist2 = jnp.maximum(jnp.sum(evec * evec, axis=1), 1e-300)
    pvec = jnp.einsum("ed,ed->e", evec, mesh.edge_normal) / dist2
    gmean = 0.5 * (gq[i] + gq[j])
    gn = jnp.einsum("egd,ed->eg", gmean, mesh.edge_normal) \
        + (q[j] - q[i] - jnp.einsum("egd,ed->eg", gmean, evec)) * pvec[:, None]
    eff_e = jnp.stack([0.5 * (eff_g[i] + eff_g[j]),
                       0.5 * (eff_r[i] + eff_r[j])], axis=1)
    res = res - mesh.scatter_edges(eff_e * gn)
    dcoef = eff_e * pvec[:, None]
    diag = diag + mesh.accumulate_sides(dcoef, dcoef)[:, :, None] * eye
    off_ij = off_ij - dcoef[:, :, None] * eye
    off_ji = off_ji - dcoef[:, :, None] * eye

    # sources
    gvel = flow_grad[:, 1:1 + lay.ndim, :]
    src_g, src_r, gamma_sep = lm_sources(lay, q, v, gvel, mu, mu_t, dist, tu)
    res = res - jnp.stack([src_g, src_r], axis=1) * mesh.volume[:, None]
    # destruction linearization for stability
    dsg = C_A2 * rho * jnp.abs(gvel[:, 1, 0] - gvel[:, 0, 1]) \
        * (2.0 * C_E2 * q[:, 0] - 1.0)
    diag = diag.at[:, 0, 0].add(jnp.maximum(dsg, 0.0) * mesh.volume)
    diag = diag.at[:, 1, 1].add(C_THETA * rho * mesh.volume
                                / (500.0 * mu / (rho * jnp.maximum(
                                    jnp.sum(vel * vel, 1), 1e-20))))

    # far-field/inlet BCs: gamma=1, Re_theta from the freestream correlation
    for bc in bcs:
        nodes = bc.nodes
        if bc.kind in ("inlet", "supersonic_inlet", "far_field"):
            qb = jnp.einsum("ed,ed->e", vel[nodes], -bc.normal)
            a0b = 0.5 * (qb + jnp.abs(qb))
            a1b = 0.5 * (qb - jnp.abs(qb))
            qin = jnp.stack([jnp.ones_like(qb), jnp.full_like(qb, re_theta_inf)],
                            axis=1)
            res = res.at[nodes].add(
                a0b[:, None] * rho[nodes, None] * q[nodes]
                + a1b[:, None] * rho[nodes, None] * qin)
            diag = diag.at[nodes].add((a0b * rho[nodes])[:, None, None] * eye)
        elif bc.kind in ("outlet", "supersonic_outlet"):
            qb = jnp.einsum("ed,ed->e", vel[nodes], -bc.normal)
            res = res.at[nodes].add(qb[:, None] * rho[nodes, None] * q[nodes])
            diag = diag.at[nodes].add((qb * rho[nodes])[:, None, None] * eye)
        # walls: natural zero-flux (reference imposes no wall condition on
        # gamma/Re_theta either)

    ok = dt > EPS
    delta = jnp.where(ok, mesh.volume / (scfg.cfl_red * jnp.where(ok, dt, 1.0)),
                      0.0)
    diag = diag + delta[:, None, None] * eye
    jac = BlockJacobian(diag=diag, off_ij=off_ij, off_ji=off_ji)
    dinv = blockcsr.block_jacobi_factor(jac)
    sel = blockcsr.gather_offdiag(mesh, jac)
    sol, _, _ = krylov.fgmres(
        lambda x: blockcsr.matvec(mesh, jac, x, sel),
        lambda r: blockcsr.block_jacobi_apply(dinv, r),
        -res, max_iter=scfg.linear_iter, tol=scfg.linear_tol)
    q_new = q + scfg.relax * sol
    q_new = q_new.at[:, 0].set(jnp.clip(q_new[:, 0], 0.0, 1.0 + 1e-6))
    q_new = q_new.at[:, 1].set(jnp.clip(q_new[:, 1], 20.0, 1e6))
    rms = jnp.sqrt(jnp.mean(res * res, axis=0))
    gamma_eff = jnp.maximum(q_new[:, 0], gamma_sep)
    return q_new, rms, gamma_eff
