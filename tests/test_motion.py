"""Rigid mesh motion / rotating frame (ALE) tests.

Reference capability: Rigid_Rotation/Rigid_Pitching/Rigid_Translation
(Common/src/grid_movement_structure.cpp:1955-2550), ROTATING_FRAME, and the
moving-grid convective fluxes (CUpwRoe_Flow grid_movement branch).
"""

import os
import textwrap

import numpy as np
import pytest

import jax.numpy as jnp

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.geometry.structured import channel_mesh, sector_mesh

THETA = 0.5
THETA_DEG = THETA * 180.0 / np.pi


def _build(tmp_path, cfg_text, raw):
    cfg_path = tmp_path / "case.cfg"
    cfg_path.write_text(cfg_text)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        return Simulation(Config(str(cfg_path)), raw_mesh=raw)
    finally:
        os.chdir(cwd)


def test_rotating_frame_preserves_quiescent_state(tmp_path):
    """Absolute-velocity rotating-frame formulation: a quiescent fluid in a
    rotating annulus sector (circular walls: u_g . n == 0; rotationally
    periodic cuts) is a steady state — the ALE fluxes -(u_g . n) U, the
    moving-wall work terms, and the frame source must balance."""
    cfg = textwrap.dedent(f"""
        PHYSICAL_PROBLEM= EULER
        MACH_NUMBER= 0.1
        FREESTREAM_TEMPERATURE= 288.15
        FREESTREAM_PRESSURE= 101325.0
        FREESTREAM_VELOCITY= (0.0, 0.0, 0.0)
        MARKER_EULER= ( inner, outer )
        MARKER_PERIODIC= ( side_b, side_a, 0.0, 0.0, 0.0, 0.0, 0.0, {THETA_DEG}, 0.0, 0.0, 0.0 )
        CFL_NUMBER= 0.8
        CONV_NUM_METHOD_FLOW= ROE
        TIME_DISCRE_FLOW= EULER_EXPLICIT
        SPATIAL_ORDER_FLOW= 1ST_ORDER
        NUM_METHOD_GRAD= GREEN_GAUSS
        GRID_MOVEMENT= YES
        GRID_MOVEMENT_KIND= ROTATING_FRAME
        ROTATION_RATE_Z= 50.0
        MESH_FILENAME= unused.su2
    """)
    sim = _build(tmp_path, cfg, sector_mesh(9, 11, theta=THETA))
    u, t_guess, hist = sim.run(50, quiet=True)
    v = np.asarray(u)
    lay = sim.lay
    rho = v[:, lay.RHO]
    vel_mag = np.linalg.norm(v[:, lay.RHOVX:lay.RHOVX + 2], axis=1) / rho
    # |u| stays far below the frame speed omega*r (50 * 1..2 = 50-100 m/s)
    assert vel_mag.max() < 1e-6, vel_mag.max()
    # density stays uniform to rounding-accumulation level
    assert np.abs(rho / rho[0] - 1.0).max() < 1e-9


def test_rigid_translation_preserves_freestream(tmp_path):
    """Constant-rate rigid translation with far-field everywhere: uniform
    freestream is an EXACT discrete steady state of the ALE scheme
    (sum of (u_g . n) over a closed dual CV vanishes for constant u_g)."""
    cfg = textwrap.dedent("""
        PHYSICAL_PROBLEM= EULER
        MACH_NUMBER= 0.3
        FREESTREAM_TEMPERATURE= 288.15
        FREESTREAM_PRESSURE= 101325.0
        MARKER_FAR= ( lower_wall, upper_wall, inlet, outlet )
        CFL_NUMBER= 0.8
        CONV_NUM_METHOD_FLOW= ROE
        TIME_DISCRE_FLOW= EULER_EXPLICIT
        SPATIAL_ORDER_FLOW= 1ST_ORDER
        NUM_METHOD_GRAD= GREEN_GAUSS
        GRID_MOVEMENT= YES
        GRID_MOVEMENT_KIND= RIGID_MOTION
        TRANSLATION_RATE_X= 25.0
        TRANSLATION_RATE_Y= -10.0
        UNSTEADY_SIMULATION= DUAL_TIME_STEPPING-2ND_ORDER
        UNST_TIMESTEP= 2e-4
        UNST_INT_ITER= 12
        MESH_FILENAME= unused.su2
    """)
    sim = _build(tmp_path, cfg, channel_mesh(17, 9, lx=1.0, ly=0.4))
    u0 = np.asarray(sim.u0)
    u, t_guess, hist, per_step = sim.run_rigid_motion(n_steps=5, quiet=True)
    un = np.asarray(u)
    rel = np.abs(un - u0).max() / np.abs(u0).max()
    assert rel < 1e-12, rel


@pytest.mark.slow
def test_pitching_naca_tracks_quasi_steady_lift(tmp_path):
    """Slow rigid pitching of a NACA0012 (reduced frequency k ~ 0.01):
    the unsteady CL(t) from the ALE dual-time loop must track the
    quasi-steady static polar CL(alpha(t)) of the SAME solver within the
    unsteady-correction margin."""
    from su2_tpu.geometry.structured import naca_omesh

    base = textwrap.dedent("""
        PHYSICAL_PROBLEM= EULER
        MACH_NUMBER= 0.3
        FREESTREAM_TEMPERATURE= 288.15
        FREESTREAM_PRESSURE= 101325.0
        MARKER_EULER= ( airfoil )
        MARKER_FAR= ( farfield )
        MARKER_MONITORING= ( airfoil )
        CFL_NUMBER= 0.9
        CONV_NUM_METHOD_FLOW= ROE
        TIME_DISCRE_FLOW= EULER_EXPLICIT
        SPATIAL_ORDER_FLOW= 1ST_ORDER
        NUM_METHOD_GRAD= GREEN_GAUSS
        MESH_FILENAME= unused.su2
    """)
    # steady AOA polar runs use the implicit path (explicit needs tens of
    # thousands of iterations to settle CL on the O-mesh)
    static = base.replace("TIME_DISCRE_FLOW= EULER_EXPLICIT",
                          "TIME_DISCRE_FLOW= EULER_IMPLICIT").replace(
        "CFL_NUMBER= 0.9", """CFL_NUMBER= 8.0
        LINEAR_SOLVER= FGMRES
        LINEAR_SOLVER_PREC= LU_SGS
        LINEAR_SOLVER_ITER= 8
        LINEAR_SOLVER_ERROR= 1e-6""")
    raw = naca_omesh(n_wrap=65, n_rad=33, radius=10.0)

    # static polar at +-2 deg from the same solver (steady AOA runs)
    cl_stat = {}
    for aoa in (2.0, -2.0):
        sim_s = _build(tmp_path, static + f"AOA= {aoa}\n", raw)
        us, ts, _ = sim_s.run(400, quiet=True, chunk=50)
        f = sim_s.monitor_forces(us, ts)
        cl_stat[aoa] = f["CL"]
    slope = (cl_stat[2.0] - cl_stat[-2.0]) / np.deg2rad(4.0)
    assert slope > 3.0, slope           # thin-airfoil-ish lift slope

    # pitching about quarter chord at the same amplitude, k = w c / (2 V)
    v_inf = 0.3 * np.sqrt(1.4 * 287.058 * 288.15)
    omega = 0.02 * 2.0 * v_inf          # reduced frequency k = 0.02
    period = 2.0 * np.pi / omega
    nsteps = 32
    cfg_m = base + textwrap.dedent(f"""
        GRID_MOVEMENT= YES
        GRID_MOVEMENT_KIND= RIGID_MOTION
        MOTION_ORIGIN_X= 0.25
        PITCHING_OMEGA_Z= {omega}
        PITCHING_AMPL_Z= 2.0
        UNSTEADY_SIMULATION= DUAL_TIME_STEPPING-2ND_ORDER
        UNST_TIMESTEP= {period / nsteps}
        UNST_INT_ITER= 1500
    """)
    sim = _build(tmp_path, cfg_m, raw)
    # start from the converged alpha=0 steady state
    sim0 = _build(tmp_path, static + "AOA= 0.0\n", raw)
    u0, t0, _ = sim0.run(400, quiet=True, chunk=50)
    sim.u0, sim.t0 = u0, t0
    u, tg, hist, per_step = sim.run_rigid_motion(
        n_steps=nsteps, quiet=True, monitor_tags=("airfoil",))

    from su2_tpu import motion as mo
    cls = np.array([f["CL"] for (_, _, f) in per_step])
    # NOTE pitching the MESH by +theta with fixed freestream = effective
    # angle of attack -theta
    alphas = np.array([-float(mo.pitch_angle(sim.motion, t))
                       for (t, _, _) in per_step])
    cl_qs = slope * alphas
    # second half of the period (transients washed out): track quasi-steady
    sel = slice(nsteps // 2, nsteps)
    err = np.abs(cls[sel] - cl_qs[sel]).max()
    assert err < 0.35 * np.abs(cl_qs).max() + 0.02, (
        list(zip(alphas[sel], cls[sel], cl_qs[sel])))


@pytest.mark.slow
def test_implicit_ale_preserves_freestream(tmp_path):
    """Round-4 regression: the IMPLICIT assembly carries the ALE face
    speed (convective_system / bc_system previously dropped grid_vel, so
    implicit moving-grid runs saw displacements but not mesh velocity).
    Uniform freestream on a translating mesh must stay exact under the
    implicit update with far-field everywhere."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import su2_tpu.state as st
    from su2_tpu.ops import timestep
    from su2_tpu.solvers import euler as es

    cfg_text = textwrap.dedent("""
        PHYSICAL_PROBLEM= EULER
        MACH_NUMBER= 0.3
        FREESTREAM_TEMPERATURE= 288.15
        FREESTREAM_PRESSURE= 101325.0
        MARKER_FAR= ( lower_wall, upper_wall, inlet, outlet )
        CFL_NUMBER= 5.0
        CONV_NUM_METHOD_FLOW= ROE
        TIME_DISCRE_FLOW= EULER_IMPLICIT
        LINEAR_SOLVER= FGMRES
        LINEAR_SOLVER_PREC= LU_SGS
        LINEAR_SOLVER_ITER= 8
        LINEAR_SOLVER_ERROR= 1e-8
        SPATIAL_ORDER_FLOW= 1ST_ORDER
        NUM_METHOD_GRAD= GREEN_GAUSS
        MESH_FILENAME= unused.su2
    """)
    from su2_tpu.geometry.structured import channel_mesh
    sim = _build(tmp_path, cfg_text, channel_mesh(13, 9, lx=1.0, ly=0.4))
    lib, lay, prm, tparams = sim.lib, sim.lay, sim.params, sim.tparams

    # constant translation velocity: rigid translation of the whole mesh
    gvel = jnp.full_like(sim.mesh.coords, 3.0)
    prm_t = dataclasses.replace(prm, grid_vel=gvel)
    u, t_guess = sim.u0, sim.t0
    for _ in range(5):
        u2, v, _ = st.cons2prim(lib, lay, u, t_guess, tparams)
        t_guess = v[:, lay.T]
        dt, _, _ = timestep.local_time_step(sim.mesh, lay, v, prm.cfl,
                                            prm.max_dt, grid_vel=gvel)
        u, _, _, _ = es.implicit_euler_update(
            lib, lay, sim.mesh, prm_t, sim.bcs, u2, v, dt, sim.lower,
            sim.upper, linear_iter=8, linear_tol=1e-8)
    rel = float(jnp.abs(u - sim.u0).max() / jnp.abs(sim.u0).max())
    assert rel < 1e-10, rel
