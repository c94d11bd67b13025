"""Feature-major (lanes-as-edges) AUSM+-up flux + Jacobians.

Same math as ops/ausm.py (CUpwReactiveAUSM, numerics_direct_reactive.cpp
:53-383) with all arrays transposed to (features, edges): inside a Pallas
TPU kernel the trailing edge axis maps onto vector lanes, so every
elementwise op runs at full 128-lane utilization and the (nVar, nVar, E)
Jacobian blocks never round-trip through HBM.  The edge-major version in
ops/ausm.py stays the XLA-path source of truth; tests pin the two to
bit-level agreement.
"""

from __future__ import annotations

import jax.numpy as jnp

from su2_tpu.ops.ausm import BETA, KP, KU, SIGMA, _press_polys, _split_mach
from su2_tpu.state import Layout


def _cat0(parts):
    return jnp.concatenate([p for p in parts if p.shape[0] > 0], axis=0)


def _set_rows(x, start, vals):
    w = vals.shape[0]
    return _cat0([x[:start], vals, x[start + w:]])


def _add_rows(x, start, vals):
    w = vals.shape[0]
    return _cat0([x[:start], x[start:start + w] + vals, x[start + w:]])


def ausm_flux_t(lay: Layout, v_i, v_j, normal, m_infty: float,
                s_i=None, s_j=None):
    """v_*: (nPrim, E); normal: (d, E); s_*: (nVar, E) dP/dU rows.

    With s_i/s_j: returns (res (nVar, E), jac_i, jac_j (nVar, nVar, E));
    without: returns res only (explicit path).
    """
    nd, ns, nvar = lay.ndim, lay.ns, lay.nvar
    area = jnp.sqrt(jnp.sum(normal * normal, axis=0))
    # zero-area guard: family-padded edge slots carry a zero normal and
    # must produce exactly zero flux (0/0 would poison the roll-scatter)
    unit = normal / jnp.maximum(area, 1e-300 if area.dtype == jnp.float64
                                else 1e-30)

    rho_i, rho_j = v_i[lay.PRHO], v_j[lay.PRHO]
    p_i, p_j = v_i[lay.P], v_j[lay.P]
    h_i, h_j = v_i[lay.H], v_j[lay.H]
    a_i, a_j = v_i[lay.A], v_j[lay.A]
    vel_i = v_i[lay.VX:lay.VX + nd]
    vel_j = v_j[lay.VX:lay.VX + nd]

    proj_i = jnp.sum(vel_i * unit, axis=0)
    proj_j = jnp.sum(vel_j * unit, axis=0)

    a_mean = 0.5 * (a_i + a_j)
    m_l = proj_i / a_mean
    m_r = proj_j / a_mean

    m_f2 = 0.5 * (m_l * m_l + m_r * m_r)
    m_ref2 = jnp.minimum(1.0, jnp.maximum(m_f2, m_infty * m_infty))
    m_f = jnp.sqrt(m_f2)

    m_ref = jnp.sqrt(m_ref2)
    fa = m_ref * (2.0 - m_ref)
    alpha = 3.0 / 16.0 * (5.0 * fa * fa - 4.0)

    m_lp, _ = _split_mach(m_l)
    _, m_rm = _split_mach(m_r)
    p_lp, _ = _press_polys(m_l, alpha)
    _, p_rm = _press_polys(m_r, alpha)

    rho_mean = 0.5 * (rho_i + rho_j)
    factor = jnp.maximum(1.0 - SIGMA * m_f2, 0.0)
    m12 = m_lp + m_rm - KP / fa * factor * (p_j - p_i) / (rho_mean * a_mean * a_mean)
    m_lf = 0.5 * (m12 + jnp.abs(m12))
    m_rf = 0.5 * (m12 - jnp.abs(m12))
    mass12 = a_mean * (m_lf * rho_i + m_rf * rho_j)

    one = jnp.ones_like(rho_i)
    phi_i = _cat0([one[None], vel_i, h_i[None], v_i[lay.YS:lay.YS + ns]])
    phi_j = _cat0([one[None], vel_j, h_j[None], v_j[lay.YS:lay.YS + ns]])

    res = 0.5 * (mass12 * (phi_i + phi_j)
                 + jnp.abs(mass12) * (phi_i - phi_j)) * area

    p_lf = p_lp * p_i + p_rm * p_j \
        - KU * p_lp * p_rm * (rho_i + rho_j) * fa * a_mean * (proj_j - proj_i)
    res = _add_rows(res, lay.RHOVX, (p_lf * area) * unit)

    if s_i is None:
        return res

    # ------------------------------------------------------------ Jacobians
    zer = jnp.zeros((nvar,) + rho_i.shape, dtype=v_i.dtype)
    mld = _set_rows(zer, lay.RHO, (-m_l / rho_i)[None])
    mld = _set_rows(mld, lay.RHOVX, unit / (rho_i * a_mean))
    mrd = _set_rows(zer, lay.RHO, (-m_r / rho_j)[None])
    mrd = _set_rows(mrd, lay.RHOVX, unit / (rho_j * a_mean))

    sub_l = (jnp.abs(m_l) < 1.0)[None]
    sub_r = (jnp.abs(m_r) < 1.0)[None]
    safe_ml = jnp.where(m_l == 0.0, 1.0, m_l)
    safe_mr = jnp.where(m_r == 0.0, 1.0, m_r)
    mpol_ld = jnp.where(
        sub_l, mld * (0.5 * (m_l + 1.0) + 4.0 * BETA * m_l * (m_l * m_l - 1.0)),
        mld * (0.5 * (1.0 + jnp.abs(m_l) / safe_ml)))
    mpol_rd = jnp.where(
        sub_r, mrd * (0.5 * (1.0 - m_r) + 4.0 * BETA * m_r * (1.0 - m_r * m_r)),
        mrd * (0.5 * (1.0 - jnp.abs(m_r) / safe_mr)))

    at_ref = (m_f2 == m_ref2)[None]
    safe_mf = jnp.where(m_f == 0.0, 1.0, m_f)
    scal_ld = jnp.where(at_ref, mld * (m_l * (1.0 - m_f) / safe_mf), 0.0)
    scal_rd = jnp.where(at_ref, mrd * (m_r * (1.0 - m_f) / safe_mf), 0.0)

    fpos = (factor > 0.0).astype(v_i.dtype)
    c0 = KP / (a_mean * a_mean * fa * fa * rho_mean * rho_mean)
    mext_ld = -c0 * (
        (fpos * SIGMA * m_l * (p_j - p_i) * fa * rho_mean) * mld
        + (factor * fa * rho_mean) * s_i
        + (factor * (p_j - p_i) * rho_mean) * scal_ld)
    mext_rd = c0 * (
        (fpos * SIGMA * m_r * (p_i - p_j) * fa * rho_mean) * mrd
        + (factor * fa * rho_mean) * s_j
        - (factor * (p_j - p_i) * rho_mean) * scal_rd)
    c1 = KP / (a_mean * a_mean * fa * rho_mean * rho_mean) * 0.5 * factor * (p_j - p_i)
    mext_ld = _add_rows(mext_ld, lay.RHO, (-c1)[None])
    mext_rd = _add_rows(mext_rd, lay.RHO, (-c1)[None])

    sign_m12 = jnp.where(m12 == 0.0, 0.0,
                         jnp.abs(m12) / jnp.where(m12 == 0.0, 1.0, m12))
    sp = 1.0 + sign_m12
    sm = 1.0 - sign_m12
    mass_p_ld = 0.5 * (mpol_ld - mext_ld) * sp
    mass_m_ld = 0.5 * (mpol_ld - mext_ld) * sm
    mass_p_rd = 0.5 * (mpol_rd - mext_rd) * sp
    mass_m_rd = 0.5 * (mpol_rd - mext_rd) * sm

    jac_i = a_mean * ((rho_i * phi_i)[:, None, :] * mass_p_ld[None, :, :]
                      + (rho_j * phi_j)[:, None, :] * mass_m_ld[None, :, :])
    jac_j = a_mean * ((rho_i * phi_i)[:, None, :] * mass_p_rd[None, :, :]
                      + (rho_j * phi_j)[:, None, :] * mass_m_rd[None, :, :])

    eye = jnp.eye(nvar, dtype=v_i.dtype)[:, :, None]
    jac_i = jac_i + (a_mean * m_lf) * eye
    jac_j = jac_j + (a_mean * m_rf) * eye

    # pressure contribution to the energy row
    def add_rows3(x, start, vals):
        w = vals.shape[0]
        return _cat0([x[:start], x[start:start + w] + vals, x[start + w:]])

    jac_i = add_rows3(jac_i, lay.RHOE, ((a_mean * m_lf) * s_i)[None])
    jac_j = add_rows3(jac_j, lay.RHOE, ((a_mean * m_rf) * s_j)[None])

    ppol_ld = jnp.where(
        sub_l,
        (0.25 * (m_l + 1.0) * (3.0 * (1.0 - m_l)
         + 4.0 * alpha * (5.0 * m_l * m_l - 1.0) * (m_l - 1.0))) * mld
        + (15.0 / 8.0 * m_l * (m_l * m_l - 1.0) ** 2) * scal_ld,
        jnp.zeros_like(mld))
    ppol_rd = jnp.where(
        sub_r,
        (0.25 * (m_r - 1.0) * (3.0 * (1.0 + m_r)
         + 4.0 * alpha * (1.0 - 5.0 * m_r * m_r) * (m_r + 1.0))) * mrd
        - (15.0 / 8.0 * m_r * (m_r * m_r - 1.0) ** 2) * scal_rd,
        jnp.zeros_like(mrd))

    rho_sum = rho_i + rho_j
    dproj = proj_j - proj_i
    pext_ld = (KU * p_rm * a_mean) * (
        (rho_sum * fa * dproj) * ppol_ld
        + (p_lp * rho_sum * dproj) * scal_ld)
    pext_rd = (KU * p_lp * a_mean) * (
        (rho_sum * fa * dproj) * ppol_rd
        + (p_rm * rho_sum * dproj) * scal_rd)
    pext_ld = _add_rows(pext_ld, lay.RHO,
                        (KU * p_rm * a_mean * p_lp * fa
                         * (dproj + rho_sum * proj_i / rho_i))[None])
    pext_rd = _add_rows(pext_rd, lay.RHO,
                        (KU * p_lp * a_mean * p_rm * fa
                         * (dproj - rho_sum * proj_j / rho_j))[None])
    pext_ld = _add_rows(pext_ld, lay.RHOVX,
                        -(KU * p_rm * a_mean * p_lp * fa * rho_sum / rho_i)
                        * unit)
    pext_rd = _add_rows(pext_rd, lay.RHOVX,
                        (KU * p_lp * a_mean * p_rm * fa * rho_sum / rho_j)
                        * unit)

    press_ld = p_lp * s_i + p_i * ppol_ld - pext_ld
    press_rd = p_rm * s_j + p_j * ppol_rd - pext_rd

    jac_i = add_rows3(jac_i, lay.RHOVX,
                      unit[:, None, :] * press_ld[None, :, :])
    jac_j = add_rows3(jac_j, lay.RHOVX,
                      unit[:, None, :] * press_rd[None, :, :])

    jac_i = jac_i * area
    jac_j = jac_j * area
    return res, jac_i, jac_j
