"""Characteristic (Riemann) boundary conditions
(MARKER_RIEMANN / solvers/riemann.py; reference BC_Riemann,
solver_direct_mean.cpp:10550).  Subsonic duct validation: the
TOTAL_CONDITIONS_PT + STATIC_PRESSURE pair must hold its targets at the
boundaries and reproduce the steady solution of the SAME duct run with
the standard TOTAL_CONDITIONS inlet / pressure outlet pair."""

import os
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.geometry.structured import channel_mesh


def _build(tmp_path, cfg_text, name="case.cfg"):
    cfg_path = tmp_path / name
    cfg_path.write_text(cfg_text)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        return Simulation(Config(str(cfg_path)),
                          raw_mesh=channel_mesh(17, 9, lx=1.0, ly=0.4))
    finally:
        os.chdir(cwd)


BASE = textwrap.dedent("""
    PHYSICAL_PROBLEM= EULER
    MACH_NUMBER= 0.3
    FREESTREAM_TEMPERATURE= 288.15
    FREESTREAM_PRESSURE= 101325.0
    MARKER_EULER= ( lower_wall, upper_wall )
    CFL_NUMBER= 15.0
    CONV_NUM_METHOD_FLOW= AUSM
    TIME_DISCRE_FLOW= EULER_IMPLICIT
    LINEAR_SOLVER= FGMRES
    LINEAR_SOLVER_PREC= LU_SGS
    LINEAR_SOLVER_ITER= 10
    LINEAR_SOLVER_ERROR= 1e-8
    SPATIAL_ORDER_FLOW= 1ST_ORDER
    NUM_METHOD_GRAD= GREEN_GAUSS
    MESH_FILENAME= unused.su2
""")

PTOT, TTOT, PBACK = 107800.0, 293.3, 101325.0


@pytest.mark.slow
def test_riemann_duct_matches_standard_bcs(tmp_path):
    cfg_r = BASE + textwrap.dedent(f"""
        MARKER_RIEMANN= ( inlet, TOTAL_CONDITIONS_PT, {PTOT}, {TTOT}, 1.0, 0.0, 0.0, outlet, STATIC_PRESSURE, {PBACK}, 0.0, 1.0, 0.0, 0.0 )
    """)
    cfg_s = BASE + textwrap.dedent(f"""
        MARKER_INLET= ( inlet, {TTOT}, {PTOT}, 1.0, 0.0, 0.0 )
        INLET_TYPE= TOTAL_CONDITIONS
        MARKER_OUTLET= ( outlet, {PBACK} )
    """)
    sim_r = _build(tmp_path, cfg_r, "riemann.cfg")
    sim_s = _build(tmp_path, cfg_s, "standard.cfg")
    assert any(bc.kind == "riemann" for bc in sim_r.bcs)

    u_r, t_r, _ = sim_r.run(400, quiet=True)
    u_s, t_s, _ = sim_s.run(400, quiet=True)

    from su2_tpu import state as st
    _, v_r, _ = st.cons2prim(sim_r.lib, sim_r.lay, u_r, t_r, sim_r.tparams)
    _, v_s, _ = st.cons2prim(sim_s.lib, sim_s.lay, u_s, t_s, sim_s.tparams)
    lay = sim_r.lay

    # both runs converged to finite states
    assert np.isfinite(np.asarray(u_r)).all()
    assert np.isfinite(np.asarray(u_s)).all()

    # 1) outlet static pressure hits the target (face mean within 0.2%)
    out_nodes = np.asarray(sim_r.grid.bnd_nodes["outlet"])
    p_out = float(jnp.mean(v_r[out_nodes, lay.P]))
    assert abs(p_out - PBACK) < 2e-3 * PBACK, p_out

    # 2) inlet total conditions recovered (isentropic ideal-gas totals
    #    from the interior state at the inlet faces, within 0.5%)
    in_nodes = np.asarray(sim_r.grid.bnd_nodes["inlet"])
    p_in = np.asarray(v_r[in_nodes, lay.P])
    t_in = np.asarray(v_r[in_nodes, lay.T])
    vel = np.asarray(v_r[in_nodes, lay.VX:lay.VX + 2])
    a_in = np.asarray(v_r[in_nodes, lay.A])
    m2 = (vel ** 2).sum(1) / a_in ** 2
    gam = 1.4
    t_tot = t_in * (1.0 + 0.5 * (gam - 1.0) * m2)
    p_tot = p_in * (t_tot / t_in) ** (gam / (gam - 1.0))
    assert abs(t_tot.mean() - TTOT) < 5e-3 * TTOT, t_tot.mean()
    assert abs(p_tot.mean() - PTOT) < 5e-3 * PTOT, p_tot.mean()

    # 3) interior solution matches the standard-BC run (same physical
    #    problem, different weak formulations: discretization-level gap)
    scale = np.abs(np.asarray(v_s[:, lay.P])).max()
    dp = np.abs(np.asarray(v_r[:, lay.P] - v_s[:, lay.P])).max()
    assert dp < 2e-3 * scale, dp
    dvel = np.abs(np.asarray(
        v_r[:, lay.VX:lay.VX + 2] - v_s[:, lay.VX:lay.VX + 2])).max()
    vscale = np.abs(np.asarray(v_s[:, lay.VX:lay.VX + 2])).max()
    assert dvel < 2e-2 * vscale, dvel


def test_riemann_supersonic_inflow_matches_supersonic_inlet(tmp_path):
    """STATIC_SUPERSONIC_INFLOW_PT: all characteristics incoming, so the
    boundary state equals the specified exterior state — equivalent to
    the standard supersonic inlet."""
    t_in, p_in, mach = 288.15, 101325.0, 1.8
    a = float(np.sqrt(1.4 * 287.058 * t_in))
    cfg_r = BASE.replace("MACH_NUMBER= 0.3", "MACH_NUMBER= 1.8") \
        + textwrap.dedent(f"""
        MARKER_RIEMANN= ( inlet, STATIC_SUPERSONIC_INFLOW_PT, {p_in}, {t_in}, {mach}, 0.0, 0.0 )
        MARKER_SUPERSONIC_OUTLET= ( outlet )
    """)
    cfg_s = BASE.replace("MACH_NUMBER= 0.3", "MACH_NUMBER= 1.8") \
        + textwrap.dedent(f"""
        MARKER_SUPERSONIC_INLET= ( inlet, {t_in}, {p_in}, {mach * a}, 0.0, 0.0 )
        MARKER_SUPERSONIC_OUTLET= ( outlet )
    """)
    sim_r = _build(tmp_path, cfg_r, "riemann.cfg")
    sim_s = _build(tmp_path, cfg_s, "standard.cfg")
    u_r, t_r, _ = sim_r.run(200, quiet=True)
    u_s, t_s, _ = sim_s.run(200, quiet=True)
    ur = np.asarray(u_r)
    us = np.asarray(u_s)
    assert np.isfinite(ur).all() and np.isfinite(us).all()
    rel = np.abs(ur - us).max() / np.abs(us).max()
    assert rel < 1e-3, rel
