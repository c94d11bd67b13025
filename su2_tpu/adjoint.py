"""Discrete adjoint via JAX reverse-mode AD.

TPU-native replacement for the reference's CoDiPack-taped discrete adjoint
(SU2's AD datatypes in Common/include/datatypes + the discrete adjoint solver
SU2_CFD/src/solver_adjoint_discrete.cpp and the SU2_DOT projection tool):
instead of taping C++ operations, the pseudo-time fixed point

    u* = G(u*, x)      (one implicit/explicit update of the flow solver)

is differentiated with `jax.vjp`.  The adjoint state solves

    lambda = dJ/du + (dG/du)^T lambda

by reverse fixed-point iteration (exactly SU2's DiscAdj recipe,
driver_structure.cpp discrete-adjoint iteration), and the mesh sensitivity is

    dJ/dx = dJ/dx|_explicit + (dG/dx)^T lambda

with geometry differentiated through geometry/diffgeo.py.

The temperature secant/bisection solve inside cons2prim is a while_loop
(non-reversible); it is re-attached to the tape through its exact analytic
derivative dT/dU (variable_direct_reactive.cpp:786) via a stop-gradient
linearization, so adjoint gradients remain exact.
"""

from __future__ import annotations

from dataclasses import replace as dc_replace

import jax
import jax.numpy as jnp
import numpy as np

from su2_tpu import state as st
from su2_tpu.chemistry import library as cl
from su2_tpu.geometry.diffgeo import build_diffgeo, remesh
from su2_tpu.linalg import blockcsr, krylov
from su2_tpu.ops import timestep
from su2_tpu.solvers import euler as es
from su2_tpu.solvers import ns


def linearized_primitives(lib, lay, u, t_star, tparams):
    """Primitive rows V(U) with the T-solve linearized around t_star.

    Value == cons2prim's output at the converged state; the Jacobian w.r.t.
    u is exact because T is re-attached through the analytic dT/dU.
    """
    t0 = jax.lax.stop_gradient(t_star)
    # closed-form primitives at temperature t
    rho = u[:, lay.RHO]
    vel = u[:, lay.RHOVX:lay.RHOVX + lay.ndim] / rho[:, None]
    ys = u[:, lay.RHOS:lay.RHOS + lay.ns] / rho[:, None]

    def prim(t):
        rgas = cl.mixture_rgas(lib, ys)
        p = rho * rgas * t
        h = (u[:, lay.RHOE] + p) / rho
        _, a = cl.frozen_gamma_sound(lib, t, ys)
        return jnp.concatenate([
            t[:, None], vel, p[:, None], rho[:, None], h[:, None], a[:, None],
            ys], axis=1)

    v0 = prim(t0)
    dtdu = jax.lax.stop_gradient(st.dtdu(lib, lay, v0))
    t_lin = t0 + jnp.sum(dtdu * (u - jax.lax.stop_gradient(u)), axis=1)
    return prim(t_lin)


def _rebuild_bcs(bcs, mesh):
    return tuple(dc_replace(bc, normal=mesh.markers[bc.tag][1]) for bc in bcs)


def make_fixed_point_step(sim):
    """Differentiable pseudo-time update G(u, coords) of the flow solver.

    Mirrors Simulation._make_implicit_step / _make_explicit_step but with
    (a) metrics re-evaluated from coords and (b) the linearized T-solve.
    Laminar Euler/NS only (frozen-turbulence adjoint is future work).
    """
    lib, lay, prm, tparams = sim.lib, sim.lay, sim.params, sim.tparams
    cfg = sim.cfg
    lower, upper = sim.lower, sim.upper
    dgeo = build_diffgeo(sim.raw, sim.grid)
    base_mesh = sim.mesh
    viscous_mode = cfg.viscous

    def step(u, coords, t_star):
        mesh = remesh(base_mesh, dgeo, coords)
        bcs = _rebuild_bcs(sim.bcs, mesh)
        v = linearized_primitives(lib, lay, u, t_star, tparams)
        if viscous_mode:
            dpdu_full = st.dpdu(lib, lay, v)
            trans0 = ns.viscous.node_transport(lib, lay, v)
            lam_v = ns.viscous_lambda(
                lib, mesh, lay, prm, v, trans0, dpdu_full, None)
            dt, _, _ = timestep.local_time_step(
                mesh, lay, v, prm.cfl, prm.max_dt, lam_visc=lam_v)
            res, wall_mask, _, _, jac = ns.ns_assemble(
                lib, lay, mesh, prm, bcs, v, dt, implicit=True)
            u = ns.enforce_wall_velocity(lay, u, wall_mask)
            dinv = blockcsr.block_jacobi_factor(jac)
            _sel = blockcsr.gather_offdiag(mesh, jac)
            sol, _, _ = krylov.fgmres(
                lambda x: blockcsr.matvec(mesh, jac, x, _sel),
                lambda r: blockcsr.block_jacobi_apply(dinv, r),
                -res, max_iter=cfg.linear_solver_iter,
                tol=cfg.linear_solver_error)
            u_new = jnp.clip(u + cfg.relaxation_factor_flow * sol,
                             lower, upper)
            u_new = ns.enforce_wall_velocity(lay, u_new, wall_mask)
        else:
            dt, _, _ = timestep.local_time_step(
                mesh, lay, v, prm.cfl, prm.max_dt)
            u_new, _, _, _ = es.implicit_euler_update(
                lib, lay, mesh, prm, bcs, u, v, dt, lower, upper,
                relax=cfg.relaxation_factor_flow,
                linear_solver=cfg.linear_solver,
                linear_iter=cfg.linear_solver_iter,
                linear_tol=cfg.linear_solver_error)
        return u_new

    return step, dgeo


def make_objective(sim, tags=None, which="CD"):
    """Differentiable pressure-force coefficient over marker ``tags``
    (Pressure_Forces, solver_direct_mean.cpp:5454; outward = -stored)."""
    lib, lay, tparams = sim.lib, sim.lay, sim.tparams
    cfg = sim.cfg
    dgeo = build_diffgeo(sim.raw, sim.grid)
    base_mesh = sim.mesh
    tags = tuple(tags if tags is not None
                 else (cfg.marker_monitoring or base_mesh.markers.keys()))
    _, _, p_inf, rho_inf, vel_inf, _ = sim.freestream_primitives()
    q_dyn = 0.5 * rho_inf * float(vel_inf @ vel_inf) * cfg.ref_area
    comp = {"CD": 0, "CFx": 0, "CL": 1, "CFy": 1}[which]

    def objective(u, coords, t_star):
        mesh = remesh(base_mesh, dgeo, coords)
        v = linearized_primitives(lib, lay, u, t_star, tparams)
        f = 0.0
        for tag in tags:
            nodes, normal = mesh.markers[tag]
            out_n = -normal
            f = f + jnp.sum((v[nodes, lay.P] - p_inf) * out_n[:, comp])
        return f / q_dyn

    return objective


def adjoint_sensitivity(sim, u_star, t_star, tags=None, which="CD",
                        n_iter: int = 200, tol: float = 1e-10):
    """Adjoint state + mesh sensitivity at a converged flow state.

    Returns dict with J, lambda, dJ/dx (nP, d) total mesh sensitivity, and
    the adjoint fixed-point residual history.
    """
    step, _ = make_fixed_point_step(sim)
    objective = make_objective(sim, tags, which)
    coords = sim.mesh.coords

    g_of_u = lambda u: step(u, coords, t_star)
    g_of_x = lambda x: step(u_star, x, t_star)
    j_val, vjp_ju = jax.vjp(lambda u: objective(u, coords, t_star), u_star)
    _, vjp_jx = jax.vjp(lambda x: objective(u_star, x, t_star), coords)
    _, vjp_gu = jax.vjp(g_of_u, u_star)
    _, vjp_gx = jax.vjp(g_of_x, coords)

    gj_u = vjp_ju(jnp.asarray(1.0, dtype=u_star.dtype))[0]

    @jax.jit
    def adj_iter(lam):
        return gj_u + vjp_gu(lam)[0]

    lam = gj_u
    hist = []
    for _ in range(n_iter):
        lam_new = adj_iter(lam)
        delta = float(jnp.abs(lam_new - lam).max())
        hist.append(delta)
        lam = lam_new
        if delta < tol:
            break

    sens = vjp_jx(jnp.asarray(1.0, dtype=u_star.dtype))[0] + vjp_gx(lam)[0]
    return {"J": float(j_val), "lambda": lam, "sensitivity": sens,
            "adj_hist": np.asarray(hist)}
