"""Harmonic-balance (time-spectral) driver tests (CHBDriver parity)."""

import os
import textwrap

import numpy as np
import pytest

import jax.numpy as jnp

from su2_tpu import hb
from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.geometry.structured import channel_mesh


def test_hb_operator_is_spectrally_exact():
    """D applied to samples of sin/cos at the collocation times equals the
    exact time derivative (the pseudo-spectral property the reference's
    ComputeHB_Operator provides)."""
    period = 0.8
    n = 5
    om = hb.default_omegas(period, n)
    d = hb.hb_operator(period, om, n)
    t = np.arange(n) * period / n
    w0 = 2.0 * np.pi / period
    for f, df in [(np.sin(w0 * t), w0 * np.cos(w0 * t)),
                  (np.cos(2 * w0 * t), -2 * w0 * np.sin(2 * w0 * t)),
                  (np.ones_like(t), np.zeros_like(t))]:
        np.testing.assert_allclose(d @ f, df, atol=1e-9 * max(1.0, w0 * 2))


CFG = textwrap.dedent("""
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
    PITCHING_OMEGA_Z= 62.8318530718
    PITCHING_AMPL_Z= 1.0
    MOTION_ORIGIN_X= 0.5
    MESH_FILENAME= unused.su2
""")


def test_hb_preserves_freestream_under_pitching(tmp_path):
    """Uniform freestream with far-field everywhere is an exact solution of
    the HB system for a rigidly pitching mesh: each instance's ALE residual
    vanishes and the spectral source of an instance-constant state is zero
    (sum_j D_ij = 0).  Joint exactness test of the operator + ALE fluxes."""
    cfg_path = tmp_path / "case.cfg"
    cfg_path.write_text(CFG)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(Config(str(cfg_path)),
                         raw_mesh=channel_mesh(13, 9, lx=1.0, ly=0.4))
    finally:
        os.chdir(cwd)
    period = 2.0 * np.pi / 62.8318530718
    drv = hb.HBDriver(sim, n_inst=3, period=period)
    u0 = np.asarray(sim.u0)
    u_all, t_all, hist = drv.run(20, quiet=True)
    ua = np.asarray(u_all)
    for i in range(3):
        rel = np.abs(ua[i] - u0).max() / np.abs(u0).max()
        assert rel < 1e-12, (i, rel)


def test_hb_single_instance_matches_steady(tmp_path):
    """N=1, Omega=(0,): D == 0 and the HB driver reduces to the steady
    solver — the channel inlet/outlet transient must match Simulation.run's
    trajectory closely (same physics, remesh-evaluated metrics)."""
    cfg_text = textwrap.dedent("""
        PHYSICAL_PROBLEM= EULER
        MACH_NUMBER= 0.3
        FREESTREAM_TEMPERATURE= 288.15
        FREESTREAM_PRESSURE= 101325.0
        MARKER_EULER= ( lower_wall, upper_wall )
        MARKER_INLET= ( inlet, 293.3, 107800.0, 1.0, 0.0, 0.0 )
        MARKER_OUTLET= ( outlet, 101325.0 )
        INLET_TYPE= TOTAL_CONDITIONS
        CFL_NUMBER= 0.8
        CONV_NUM_METHOD_FLOW= ROE
        TIME_DISCRE_FLOW= EULER_EXPLICIT
        SPATIAL_ORDER_FLOW= 1ST_ORDER
        NUM_METHOD_GRAD= GREEN_GAUSS
        MESH_FILENAME= unused.su2
    """)
    cfg_path = tmp_path / "case.cfg"
    cfg_path.write_text(cfg_text)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(Config(str(cfg_path)),
                         raw_mesh=channel_mesh(13, 9, lx=1.0, ly=0.4))
    finally:
        os.chdir(cwd)
    drv = hb.HBDriver(sim, n_inst=1, period=1.0, omegas=[0.0])
    assert np.abs(np.asarray(drv.d_op)).max() == 0.0
    u_all, _, _ = drv.run(60, quiet=True)
    u_ref, _, _ = sim.run(60, quiet=True)
    ua = np.asarray(u_all)[0]
    ur = np.asarray(u_ref)
    rel = np.abs(ua - ur).max() / np.abs(ur).max()
    # same equations; metrics evaluated by remesh vs the host builder agree
    # to rounding
    assert rel < 1e-9, rel
