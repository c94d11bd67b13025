"""HLLC approximate Riemann flux.

Standard-solver capability (reference: CUpwHLLC_Flow,
SU2_CFD/src/numerics_direct_mean.cpp:2560-2740): Roe-averaged wave-speed
estimates, contact speed sM, star states.  Generalized to the multispecies
layout (species advect with the star density factor); branchless region
selection with nested jnp.where instead of the reference's if-chain.
"""

from __future__ import annotations

import jax.numpy as jnp

from su2_tpu.state import Layout


def hllc_flux(lay: Layout, v_i, v_j, normal):
    """(nF, nPrim) x2 + (nF, d) area normal -> (nF, nVar) flux."""
    nd, ns = lay.ndim, lay.ns
    area = jnp.linalg.norm(normal, axis=-1)
    n = normal / area[:, None]

    def unpack(vr):
        rho = vr[:, lay.PRHO]
        vel = vr[:, lay.VX:lay.VX + nd]
        p = vr[:, lay.P]
        h = vr[:, lay.H]
        a = vr[:, lay.A]
        ys = vr[:, lay.YS:lay.YS + ns]
        qn = jnp.einsum("fd,fd->f", vel, n)
        e = h - p / rho
        return rho, vel, p, h, a, ys, qn, e

    rho_i, vel_i, p_i, h_i, a_i, ys_i, qn_i, e_i = unpack(v_i)
    rho_j, vel_j, p_j, h_j, a_j, ys_j, qn_j, e_j = unpack(v_j)

    # Roe averages (:2630-2660)
    ri, rj = jnp.sqrt(rho_i), jnp.sqrt(rho_j)
    rr = ri + rj
    roe_vel = (vel_i * ri[:, None] + vel_j * rj[:, None]) / rr[:, None]
    roe_qn = jnp.einsum("fd,fd->f", roe_vel, n)
    roe_h = (h_i * ri + h_j * rj) / rr
    # mean frozen gamma for the Roe sound speed (ideal gas: == Gamma)
    gam = 0.5 * (a_i * a_i * rho_i / p_i + a_j * a_j * rho_j / p_j)
    roe_a = jnp.sqrt(jnp.maximum(
        (gam - 1.0) * (roe_h - 0.5 * jnp.sum(roe_vel * roe_vel, axis=1)),
        1e-30))

    s_l = jnp.minimum(roe_qn - roe_a, qn_i - a_i)
    s_r = jnp.maximum(roe_qn + roe_a, qn_j + a_j)
    denom = rho_j * (s_r - qn_j) - rho_i * (s_l - qn_i)
    s_m = (p_i - p_j - rho_i * qn_i * (s_l - qn_i)
           + rho_j * qn_j * (s_r - qn_j)) / denom
    p_star = rho_j * (qn_j - s_r) * (qn_j - s_m) + p_j

    def side_flux(rho, vel, p, h, ys, qn):
        f = jnp.zeros((rho.shape[0], lay.nvar), dtype=rho.dtype)
        f = f.at[:, lay.RHO].set(rho * qn)
        f = f.at[:, lay.RHOVX:lay.RHOVX + nd].set(
            rho[:, None] * vel * qn[:, None] + p[:, None] * n)
        f = f.at[:, lay.RHOE].set(rho * h * qn)
        f = f.at[:, lay.RHOS:lay.RHOS + ns].set(
            rho[:, None] * ys * qn[:, None])
        return f

    def cons(rho, vel, e, ys):
        u = jnp.zeros((rho.shape[0], lay.nvar), dtype=rho.dtype)
        u = u.at[:, lay.RHO].set(rho)
        u = u.at[:, lay.RHOVX:lay.RHOVX + nd].set(rho[:, None] * vel)
        u = u.at[:, lay.RHOE].set(rho * e)
        u = u.at[:, lay.RHOS:lay.RHOS + ns].set(rho[:, None] * ys)
        return u

    def star_state(rho, vel, p, e, ys, qn, s_k):
        c = (s_k - qn) / (s_k - s_m)
        vel_s = vel + (s_m - qn)[:, None] * n
        e_s = e + (s_m - qn) * (s_m + p / (rho * (s_k - qn)))
        return cons(rho * c, vel_s, e_s, ys)

    f_l = side_flux(rho_i, vel_i, p_i, h_i, ys_i, qn_i)
    f_r = side_flux(rho_j, vel_j, p_j, h_j, ys_j, qn_j)
    u_l = cons(rho_i, vel_i, e_i, ys_i)
    u_r = cons(rho_j, vel_j, e_j, ys_j)
    us_l = star_state(rho_i, vel_i, p_i, e_i, ys_i, qn_i, s_l)
    us_r = star_state(rho_j, vel_j, p_j, e_j, ys_j, qn_j, s_r)
    fs_l = f_l + s_l[:, None] * (us_l - u_l)
    fs_r = f_r + s_r[:, None] * (us_r - u_r)

    flux = jnp.where(
        (s_m > 0.0)[:, None],
        jnp.where((s_l > 0.0)[:, None], f_l, fs_l),
        jnp.where((s_r < 0.0)[:, None], f_r, fs_r))
    return flux * area[:, None]
