"""Roe approximate Riemann solver (multispecies-capable).

Standard-solver capability (reference: CUpwRoe_Flow,
SU2_CFD/src/numerics_direct_mean.cpp; decl numerics_structure.hpp:1507),
generalized to the reactive layout: species densities ride the mass flux as
upwinded scalars inside the same dissipation matrix, with an effective frozen
gamma from the Roe-averaged state.  Exact classic Roe for the single-species
calorically perfect gas; for mixtures the frozen-gamma approximation mirrors
how the reference's standard solver would treat them.

Includes the Harten entropy fix on the acoustic eigenvalues.
"""

from __future__ import annotations

import jax.numpy as jnp

from su2_tpu.state import Layout


def roe_flux(lay: Layout, v_i: jnp.ndarray, v_j: jnp.ndarray,
             normal: jnp.ndarray, entropy_fix: float = 0.001, qg=None):
    """Roe flux over a batch of faces. v_*: (nF, nPrim); normal area normals.

    qg: optional (nF,) PROJECTED grid velocity at the face (u_g . unit
    normal) — the ALE / moving-grid form (CUpwRoe_Flow with grid_movement,
    numerics_direct_mean.cpp): eigenvalues use the relative normal speed
    and the central flux subtracts qg * U on each side; pressure terms and
    the Roe eigenvector basis stay in absolute velocities.

    Returns residual (nF, nVar).
    """
    nd = lay.ndim
    ns = lay.ns
    area = jnp.linalg.norm(normal, axis=-1)
    unit = normal / area[:, None]

    rho_i = v_i[:, lay.PRHO]
    rho_j = v_j[:, lay.PRHO]
    vel_i = v_i[:, lay.VX:lay.VX + nd]
    vel_j = v_j[:, lay.VX:lay.VX + nd]
    p_i = v_i[:, lay.P]
    p_j = v_j[:, lay.P]
    h_i = v_i[:, lay.H]
    h_j = v_j[:, lay.H]
    ys_i = v_i[:, lay.YS:lay.YS + ns]
    ys_j = v_j[:, lay.YS:lay.YS + ns]

    # Roe averages
    ri = jnp.sqrt(rho_i)
    rj = jnp.sqrt(rho_j)
    w_i = ri / (ri + rj)
    w_j = rj / (ri + rj)
    vel = w_i[:, None] * vel_i + w_j[:, None] * vel_j
    h = w_i * h_i + w_j * h_j
    ys = w_i[:, None] * ys_i + w_j[:, None] * ys_j
    rho = ri * rj

    # effective gamma from the two frozen sound speeds
    g_i = v_i[:, lay.A] ** 2 * rho_i / p_i
    g_j = v_j[:, lay.A] ** 2 * rho_j / p_j
    gamma = w_i * g_i + w_j * g_j
    q2 = jnp.sum(vel * vel, axis=1)
    a2 = jnp.maximum((gamma - 1.0) * (h - 0.5 * q2), 1e-12)
    a = jnp.sqrt(a2)
    un = jnp.sum(vel * unit, axis=1)

    # eigenvalues with Harten entropy fix on the acoustic waves; moving
    # grids use the RELATIVE normal speed (un - qg) in the wave speeds
    un_rel = un if qg is None else un - qg
    lam_m = jnp.abs(un_rel)
    lam_p = jnp.abs(un_rel + a)
    lam_n = jnp.abs(un_rel - a)
    eps = entropy_fix * (jnp.abs(un_rel) + a)

    def fix(lam):
        return jnp.where(lam < eps, 0.5 * (lam * lam / eps + eps), lam)

    lam_m, lam_p, lam_n = fix(lam_m), fix(lam_p), fix(lam_n)

    # jump decomposition (classic Roe for the [rho, rho u, rho E] core)
    drho = rho_j - rho_i
    dp = p_j - p_i
    dun = jnp.sum((vel_j - vel_i) * unit, axis=1)
    dvel = vel_j - vel_i

    alpha_p = (dp + rho * a * dun) / (2.0 * a2)
    alpha_n = (dp - rho * a * dun) / (2.0 * a2)
    alpha_m = drho - dp / a2

    # dissipation on [rho, rho u, rho E]
    def core(alpha, lam, velw, hw):
        return lam[:, None] * alpha[:, None] * jnp.concatenate(
            [jnp.ones_like(alpha)[:, None], velw, hw[:, None]], axis=1)

    diss = core(alpha_p, lam_p, vel + a[:, None] * unit, h + a * un)
    diss = diss + core(alpha_n, lam_n, vel - a[:, None] * unit, h - a * un)
    diss = diss + core(alpha_m, lam_m, vel, 0.5 * q2)
    # shear-wave contribution
    dvel_t = dvel - dun[:, None] * unit
    shear = lam_m[:, None] * rho[:, None] * jnp.concatenate(
        [jnp.zeros_like(alpha_m)[:, None], dvel_t,
         jnp.sum(vel * dvel_t, axis=1)[:, None]], axis=1)
    diss = diss + shear

    # species dissipation: contact-wave advected mass fractions
    drhoy = rho_j[:, None] * ys_j - rho_i[:, None] * ys_i
    diss_y = lam_m[:, None] * (drhoy - ys * (dp / a2)[:, None]) \
        + ys * (lam_p * alpha_p + lam_n * alpha_n)[:, None]

    # central flux
    mdot_i = rho_i * jnp.sum(vel_i * unit, axis=1)
    mdot_j = rho_j * jnp.sum(vel_j * unit, axis=1)

    def phys(mdot, velx, p, hx, ysx):
        f = jnp.concatenate([
            mdot[:, None], mdot[:, None] * velx + p[:, None] * unit,
            (mdot * hx)[:, None], mdot[:, None] * ysx], axis=1)
        return f

    f_i = phys(mdot_i, vel_i, p_i, h_i, ys_i)
    f_j = phys(mdot_j, vel_j, p_j, h_j, ys_j)

    dis_full = jnp.concatenate([diss[:, :1], diss[:, 1:1 + nd],
                                diss[:, 1 + nd:2 + nd], diss_y], axis=1)
    flux = 0.5 * (f_i + f_j - dis_full)
    if qg is not None:
        # ALE central-flux correction: -qg * 0.5 (U_i + U_j)
        def cons(rho, velx, p, hx, ysx):
            return jnp.concatenate([
                rho[:, None], rho[:, None] * velx,
                (rho * hx - p)[:, None], rho[:, None] * ysx], axis=1)
        u_i = cons(rho_i, vel_i, p_i, h_i, ys_i)
        u_j = cons(rho_j, vel_j, p_j, h_j, ys_j)
        flux = flux - (0.5 * qg)[:, None] * (u_i + u_j)
    return flux * area[:, None]
