"""Fuel-regression (Engine_Inflow) boundary condition.

Rebuilds CReactiveNSSolver::BC_Engine_Inflow
(SU2_CFD/src/solver_direct_reactive.cpp:5947-6354) as a vectorized
fixed-iteration solve over all marker vertices:

  per vertex, solve the coupled surface system
    (Y_g - Y_fuel) * rho_s rb(T) + Jd(Y_g) = 0        (species mass balance,
                                                       Newton w/ FD Jacobian)
    energy balance f_wall(T) = 0                      (regula falsi)
    V_g = (rho_s - rho_g) rb(T) / (rho_g n.dir)       (surface mass balance)

with Jd from the Stefan-Maxwell system using the one-sided molar-fraction
gradient toward the normal neighbor.  The reference iterates each vertex
serially with early exit (maxIter=10 outer, 15 sub-iterations); here every
vertex runs the full fixed iteration budget in lockstep (static shapes,
no data-dependent control flow) - converged vertices simply stop moving.

Deviations from the reference (documented, intentional):
  * the reference's regula-falsi clamp `min(max(x, Tmax), Tmin)` (:6157) has
    its arguments reversed and pins T to Tmin; we clamp to [Tmin, Tmax],
  * the per-dimension 1/|dx_d| factors in the one-sided gradient (:6094)
    divide by zero on axis-aligned neighbor offsets; zero components are
    guarded out,
  * the Ns x Ns Newton step uses a batched direct solve instead of per-vertex
    Eigen BiCGSTAB (tol 1e-9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from su2_tpu.chemistry import library as cl
from su2_tpu.chemistry.library import ChemLib
from su2_tpu.linalg.smallsolve import gauss_solve
from su2_tpu.state import Layout
from su2_tpu.ops import bgather as bg

N_OUTER = 10     # maxIter (:6053)
N_NEWTON = 15    # maxSubIter for the mass-fraction system (:6059)
N_FALSI = 15     # maxSubIter for the wall temperature (:6059)
EPS_FD = 1.0e-7  # FD perturbation (:6098)


def _sm_jd(lib: ChemLib, rho_g, alpha, dij, xs_g, grad_norm, ys_g):
    """(Gamma(rho_g) + alpha y 1^T) Jd = -grad_norm (Solve_SM :451-470 with
    externally fixed alpha, as the BC does at :6076)."""
    gamma = cl.stefan_maxwell_gamma(lib, rho_g, xs_g, ys_g, dij)
    gt = gamma + (alpha[..., None] * ys_g)[..., :, None]
    return gauss_solve(gt, -grad_norm[..., None], pivot=True)[..., 0]


def _wall_energy_residual(lib, fuel, prm, t, ys_g):
    """f_wall(T) (:5991-6016): surface energy balance between gas-side
    conduction/diffusion enthalpy flux and solid-fuel heating."""
    rb = cl.regression_rate(fuel, t)
    hg_s = cl.species_enthalpy(lib, t)                       # (V, S)
    hg = jnp.einsum("vs,vs->v", hg_s, ys_g)
    hgf = jnp.einsum("vs,s->v", hg_s, prm["ys_fuel"])
    kappa_g = cl.mixture_conductivity(lib, t, ys_g)
    grad_tw = -prm["rho_s"] * prm["cp_s"] * rb * (t - prm["t0"]) / prm["kappa_s"]
    partial = jnp.einsum("vs,vs->v", prm["ys_fuel"][None] - ys_g, hg_s)
    return rb * prm["rho_s"] * (hg - hgf + prm["h_pf"] + partial) \
        + grad_tw * (prm["kappa_s"] - kappa_g)


def engine_inflow_state(lib: ChemLib, lay: Layout, bc, v, coords,
                        return_internals: bool = False):
    """Solve the regression surface system for every vertex of the marker.

    Returns (v_ghost, gamma, vel2) in the same shape conventions as the other
    boundary-state builders in solvers/euler.py.  With ``return_internals``
    a diagnostics dict (tg, ys_g, newton residual, wall-energy residual) is
    appended for testing.
    """
    prm = bc.params
    fuel = prm["fuel"]
    nodes, nn = bc.nodes, bc.nn
    nv = nodes.shape[0]
    dtype = v.dtype

    area = jnp.linalg.norm(bc.normal, axis=1)
    unit = -bc.normal / area[:, None]                       # (:6028-6030)
    dco = jnp.abs(bg.rows(coords, nn) - bg.rows(coords, nodes))               # (V, d)
    # one-sided gradient geometric factor with zero-offset guard
    gfac = jnp.sum(jnp.where(dco > 1e-300, unit / jnp.where(dco > 0, dco, 1.0),
                             0.0), axis=1)                  # (V,)

    pg = v[nn, lay.P]
    p_atm = pg / 101325.0
    rho_int = v[nn, lay.PRHO]
    t_init = v[nn, lay.T]
    ys_int = v[nn, lay.YS:lay.YS + lay.ns]
    xs_int = cl.molar_from_mass(lib, ys_int)
    alpha_dir = jnp.einsum("vd,d->v", unit, prm["flow_dir"])

    tmin, tmax = prm["tmin"], prm["tmax"]
    rho_s, cp_s = prm["rho_s"], prm["cp_s"]

    def grad_norm(xs_g):
        return (xs_int - xs_g) * gfac[:, None]              # (V, S)

    def newton_body(_, ys_g, tg):
        """One Newton step of the species system at fixed T (:6082-6141)."""
        dij = cl.binary_diffusion(lib, tg, p_atm) / 1.0e4
        alpha = 1.0 / (rho_int * dij.max(axis=(-2, -1)))
        omega_bar = rho_s * cl.regression_rate(fuel, tg)

        xs_g = cl.molar_from_mass(lib, ys_g)
        rgas = cl.mixture_rgas(lib, ys_g)
        rho_g = pg / (rgas * tg)
        jd = _sm_jd(lib, rho_g, alpha, dij, xs_g, grad_norm(xs_g), ys_g)
        f = (ys_g - prm["ys_fuel"][None]) * omega_bar[:, None] + jd

        # FD Jacobian: perturb every species at once -> (V, S, S) batch
        eye = jnp.eye(lay.ns, dtype=dtype)
        ys_p = ys_g[:, None, :] + EPS_FD * eye[None]        # (V, Sp, S)
        xs_p = cl.molar_from_mass(lib, ys_p)
        gn_p = (xs_int[:, None] - xs_p) * gfac[:, None, None]
        jd_p = _sm_jd(lib, rho_g[:, None], alpha[:, None],
                      dij[:, None], xs_p, gn_p, ys_p)       # (V, Sp, S)
        # fprime[j, i] = (Jd_p[i][j] - Jd[j]) / eps + omega_bar * delta_ij
        fprime = (jd_p - jd[:, None, :]).transpose(0, 2, 1) / EPS_FD \
            + omega_bar[:, None, None] * eye[None]
        delta = gauss_solve(fprime, f[..., None], pivot=True)[..., 0]
        return ys_g - delta

    def falsi_body(_, carry, ys_g):
        """Regula-falsi update for the wall temperature (:6146-6180) with the
        bracket clamp corrected (see module docstring)."""
        tg, ta, tb, fa, fb = carry
        denom = jnp.where(jnp.abs(fb - fa) > 1e-300, fb - fa, 1.0)
        t_new = (ta * fb - tb * fa) / denom
        t_new = jnp.clip(t_new, tmin, tmax)
        t_new = jnp.clip(t_new, tg - 20.0, tg + 20.0)
        f_new = _wall_energy_residual(lib, fuel, prm, t_new, ys_g)
        lower = f_new * fa < 0.0
        tb = jnp.where(lower, t_new, tb)
        fb = jnp.where(lower, f_new, fb)
        ta = jnp.where(lower, ta, t_new)
        fa = jnp.where(lower, fa, f_new)
        return (t_new, ta, tb, fa, fb)

    def outer_body(_, carry):
        tg, ys_g = carry
        ys_g = jax.lax.fori_loop(
            0, N_NEWTON, lambda k, y: newton_body(k, y, tg), ys_g)
        ta = jnp.full((nv,), tmin, dtype=dtype)
        tb = jnp.full((nv,), tmax, dtype=dtype)
        fa = _wall_energy_residual(lib, fuel, prm, ta, ys_g)
        fb = _wall_energy_residual(lib, fuel, prm, tb, ys_g)
        tg, *_ = jax.lax.fori_loop(
            0, N_FALSI, lambda k, c: falsi_body(k, c, ys_g),
            (tg, ta, tb, fa, fb))
        return tg, ys_g

    tg, ys_g = jax.lax.fori_loop(0, N_OUTER, outer_body, (t_init, ys_int))

    # surface mass balance -> blowing velocity (:6185-6196)
    rgas_g = cl.mixture_rgas(lib, ys_g)
    rho_g = pg / (rgas_g * tg)
    rb = cl.regression_rate(fuel, tg)
    vg = (rho_s - rho_g) * rb / (rho_g * alpha_dir)

    # ghost primitive state (:6207-6226): H, a from the solved Y_g; the
    # species slots carry the FUEL surface fractions (reference :6226)
    vel = vg[:, None] * prm["flow_dir"][None, :lay.ndim]
    vel2 = vg * vg
    h = cl.mixture_enthalpy(lib, tg, ys_g) + 0.5 * vel2
    _, a = cl.frozen_gamma_sound(lib, tg, ys_g)
    ys_row = jnp.broadcast_to(prm["ys_fuel"][None], (nv, lay.ns))
    from su2_tpu.solvers.euler import _prim_row
    v_ghost = _prim_row(lay, tg, vel, pg, rho_g, h, a, ys_row)

    # gamma for the ghost dP/dU from the sound speed with the fuel fractions
    # (ComputeFrozenGamma_FromSoundSpeed, reacting_model_library.cpp:424)
    gamma = a * a / (cl.mixture_rgas(lib, ys_row) * tg)
    if not return_internals:
        return v_ghost, gamma, vel2

    dij = cl.binary_diffusion(lib, tg, p_atm) / 1.0e4
    alpha = 1.0 / (rho_int * dij.max(axis=(-2, -1)))
    xs_g = cl.molar_from_mass(lib, ys_g)
    jd = _sm_jd(lib, rho_g, alpha, dij, xs_g, grad_norm(xs_g), ys_g)
    f_newton = (ys_g - prm["ys_fuel"][None]) * (rho_s * rb)[:, None] + jd
    internals = {"tg": tg, "ys_g": ys_g, "vg": vg, "rho_g": rho_g,
                 "f_newton": f_newton,
                 "f_wall": _wall_energy_residual(lib, fuel, prm, tg, ys_g)}
    return v_ghost, gamma, vel2, internals
