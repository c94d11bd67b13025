"""Harmonic-balance (time-spectral) driver.

Reference capability: CHBDriver (SU2_CFD/src/driver_structure.cpp:3790
CHBDriver::Run, :3928 SetHarmonicBalance, :4087 ComputeHB_Operator): the
periodic unsteady problem is replaced by N coupled steady problems at the
time instances t_i = i T / N, linked by the pseudo-spectral time-derivative
operator

    D = Re( V  diag(j Omega_k)  V^{-1} ),   V[i, k] = exp(j Omega_k t_i)

and each instance solves  R(u_i) + Vol * sum_j D_ij u_j = 0.

TPU-first design: the reference runs N separate zone containers in a host
loop; here the instances are a BATCH AXIS — one stacked state
u (N, nP, nvar), the per-instance residual vmapped over the axis, and the
spectral coupling a single einsum.  For moving-grid problems each instance
carries its own coordinates/grid velocities (rigid motion at phase t_i)
through the differentiable remesh, inside the same jit."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def hb_operator(period: float, omegas, n_inst: int) -> np.ndarray:
    """The reference's HB operator (ComputeHB_Operator,
    driver_structure.cpp:4087): D = Re(V diag(j w) V^-1) with
    V[i,k] = exp(j w_k t_i), t_i = i*period/n."""
    omegas = np.asarray(omegas, dtype=float)
    assert omegas.shape == (n_inst,)
    t = np.arange(n_inst) * period / n_inst
    v = np.exp(1j * np.outer(t, omegas))           # (N, N)
    d = v @ np.diag(1j * omegas) @ np.linalg.inv(v)
    return np.real(d)


def default_omegas(period: float, n_inst: int) -> np.ndarray:
    """Symmetric harmonic set (0, +-w0, +-2w0, ...) like the reference's
    OMEGA_HB examples; n_inst must be odd for a symmetric set."""
    w0 = 2.0 * np.pi / period
    k = np.concatenate([[0.0], np.repeat(np.arange(1, (n_inst + 1) // 2), 2)
                        * np.tile([1.0, -1.0], (n_inst - 1) // 2)[:n_inst - 1]])
    return w0 * k[:n_inst]


class HBDriver:
    """N-instance harmonic balance on the inviscid standard (Euler) path,
    with optional rigid motion (each instance frozen at its phase).

    sim: a Simulation configured for the case (and, if moving,
    GRID_MOVEMENT_KIND= RIGID_MOTION).  period/omegas: HB_PERIOD and
    OMEGA_HB (defaults to the symmetric harmonic set)."""

    def __init__(self, sim, n_inst: int, period: float, omegas=None):
        import dataclasses as _dc

        from su2_tpu import motion as mo
        from su2_tpu.adjoint import _rebuild_bcs
        from su2_tpu.geometry.diffgeo import build_diffgeo, remesh
        import su2_tpu.state as st
        from su2_tpu.solvers import euler as es
        from su2_tpu.ops import timestep

        self.sim = sim
        self.n_inst = n_inst
        self.period = period
        om = np.asarray(omegas) if omegas is not None \
            else default_omegas(period, n_inst)
        self.d_op = jnp.asarray(hb_operator(period, om, n_inst),
                                dtype=sim.dtype)
        self.times = np.arange(n_inst) * period / n_inst

        lib, lay, prm, tparams = sim.lib, sim.lay, sim.params, sim.tparams
        lower, upper = sim.lower, sim.upper
        base_mesh = sim.mesh
        coords0 = base_mesh.coords
        moving = sim.motion is not None
        if moving:
            assert sim.motion.kind == "RIGID_MOTION"
            coords_i = jnp.stack([
                mo.rigid_coords_2d(sim.motion, coords0, t).astype(sim.dtype)
                for t in self.times])
            gvel_i = jnp.stack([
                mo.rigid_grid_velocity_2d(sim.motion, c, t).astype(sim.dtype)
                for c, t in zip(coords_i, self.times)])
            dgeo = build_diffgeo(sim.raw, sim.grid)
        else:
            coords_i = jnp.stack([coords0] * n_inst)
            gvel_i = None
            dgeo = build_diffgeo(sim.raw, sim.grid)
        vol0 = base_mesh.volume

        def one_residual(u, t_guess, coords, gvel):
            mesh = _dc.replace(
                remesh(base_mesh, dgeo, coords),
                gg_snormal=None, wls_coeff=None, stencil_pvec=None,
                fam_normal=None, fam_evec=None, fam_offsets=None)
            bcs = _rebuild_bcs(sim.bcs, mesh)
            prm_t = _dc.replace(prm, grid_vel=gvel)
            u2, v, _ = st.cons2prim(lib, lay, u, t_guess, tparams)
            res, _ = es.total_residual(lib, lay, mesh, prm_t, bcs, v)
            dt, _, _ = timestep.local_time_step(
                mesh, lay, v, prm.cfl, prm.max_dt, grid_vel=gvel)
            return u2, v[:, lay.T], res, dt, mesh.volume

        @jax.jit
        def step(u_all, t_all):
            if gvel_i is None:
                u2, tg, res, dt, vol = jax.vmap(
                    lambda u, t, c: one_residual(u, t, c, None))(
                        u_all, t_all, coords_i)
            else:
                u2, tg, res, dt, vol = jax.vmap(one_residual)(
                    u_all, t_all, coords_i, gvel_i)
            # spectral time-derivative source (SetHarmonicBalance):
            # R_i += Vol * sum_j D_ij u_j
            hb_src = jnp.einsum("ij,jnv->inv", self.d_op, u2) \
                * vol[:, :, None]
            res = res + hb_src
            u_new = jax.vmap(
                lambda u, r, d: es.explicit_euler_update(
                    lay, base_mesh, u, r, d, lower, upper)[0])(u2, res, dt)
            rms = jnp.sqrt(jnp.mean(res * res, axis=(0, 1)))
            return u_new, tg, rms

        self._step = step

    def run(self, n_iter: int, quiet: bool = True):
        n = self.n_inst
        u_all = jnp.stack([self.sim.u0] * n)
        t_all = jnp.stack([self.sim.t0] * n)
        hist = []
        for it in range(n_iter):
            u_all, t_all, rms = self._step(u_all, t_all)
            if it % 50 == 0 or it == n_iter - 1:
                lr = np.log10(np.maximum(np.asarray(rms), 1e-300))
                hist.append(lr)
                if not quiet:
                    print(f"HB iter {it:5d}  Res[Rho]: "
                          f"{lr[self.sim.lay.RHO]: .4f}")
        return u_all, t_all, np.array(hist)
