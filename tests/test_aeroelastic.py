"""Aeroelastic typical-section model (su2_tpu/aeroelastic.py; reference
CSolver::SolveTypicalSectionWingModel, solver_structure.cpp:1482-1600 +
AeroelasticDeform, grid_movement_structure.cpp:6363)."""

import math
import os
import textwrap

import numpy as np
import pytest

from su2_tpu import aeroelastic as ae


def test_modal_setup_orthonormality():
    """Phi^T M Phi = I and Phi^T K Phi = diag(omega^2)
    (SetUpTypicalSectionWingModel's normalization contract)."""
    w_h, w_a, x_a, r_a2 = 100.0, 100.0, 1.8, 3.48
    phi, omega = ae.typical_section_modes(w_h, w_a, x_a, r_a2)
    m = np.array([[1.0, x_a], [x_a, r_a2]])
    k = np.array([[(w_h / w_a) ** 2, 0.0], [0.0, r_a2]])
    np.testing.assert_allclose(phi.T @ m @ phi, np.eye(2), atol=1e-12)
    np.testing.assert_allclose(phi.T @ k @ phi, np.diag(omega ** 2),
                               atol=1e-10)


def test_step_load_converges_to_static_deflection():
    """Constant (CL, CM) load: the BDF2 modal integrator must settle on
    the analytic static solution q = Phi diag(1/omega^2) Phi^T f with
    f = vf^2/pi (-CL, -2 CM) — pins the forcing convention, the modal
    transforms and the time discretization in one check."""
    vf, w_a = 0.3, 100.0
    sect = ae.TypicalSection(w_h=100.0, w_a=w_a, x_a=1.8, r_a2=3.48,
                             vf=vf, b=0.5)
    cl, cm = 0.4, -0.05
    dt = 1e-3                     # w_a dt = 0.1 per structural step
    # zero structural damping (reference xi = 0): the step response
    # oscillates about the static solution indefinitely, so compare the
    # MEAN over whole mode-0 periods (linear oscillation mean == static);
    # also pin the discrete fixed point directly.
    traj = []
    for _ in range(8000):
        sect.step(cl, cm, dt)
        sect.advance_time()
        traj.append((sect.plunge, sect.pitch))
    traj = np.array(traj)
    cons = vf * vf / math.pi
    f = np.array([cons * (-cl), cons * (2.0 * -cm)])
    eta_static = (sect.phi.T @ f) / sect.omega ** 2
    q_static = sect.phi @ eta_static
    n_per = int(round(2.0 * math.pi / sect.omega[0] / (dt * w_a)))
    mean = traj[-10 * n_per:].mean(axis=0)
    assert abs(mean[0] - q_static[0]) < 2e-2 * max(abs(q_static[0]),
                                                   1e-3), (mean, q_static)
    assert abs(mean[1] - q_static[1]) < 2e-2 * max(abs(q_static[1]),
                                                   1e-3), (mean, q_static)

    # the static solution is an exact fixed point of the BDF2 update
    sect2 = ae.TypicalSection(w_h=100.0, w_a=w_a, x_a=1.8, r_a2=3.48,
                              vf=vf, b=0.5)
    for arr in (sect2.x_np1, sect2.x_n, sect2.x_n1):
        arr[0, :] = eta_static
    dh, dalpha, h_dot, alpha_dot = sect2.step(cl, cm, dt)
    assert abs(dh) < 1e-15 and abs(dalpha) < 1e-15
    assert abs(h_dot) < 1e-12 and abs(alpha_dot) < 1e-12


def test_free_vibration_frequency():
    """Wind-off (zero load) free vibration from an initial modal
    displacement oscillates at the modal frequency (BDF2 adds small
    period errors ~ (w dt)^2)."""
    sect = ae.TypicalSection(w_h=100.0, w_a=100.0, x_a=1.8, r_a2=3.48,
                             vf=0.3, b=0.5)
    # seed the BDF history with a pure mode-0 displacement
    eta0 = 0.1
    sect.x_np1[0, 0] = eta0
    sect.x_n[0, 0] = eta0
    sect.x_n1[0, 0] = eta0
    dt = 5e-4
    w0 = sect.omega[0] * 100.0           # back to physical rad/s (w_a)
    series = []
    for _ in range(3000):
        sect.step(0.0, 0.0, dt)
        sect.advance_time()
        series.append(sect.x_np1[0, 0])
    series = np.array(series)
    # measure the oscillation period from zero crossings
    sign = np.sign(series)
    crossings = np.where(np.diff(sign) != 0)[0]
    assert len(crossings) > 4
    period = 2.0 * np.mean(np.diff(crossings)) * dt
    w_meas = 2.0 * math.pi / period
    assert abs(w_meas - w0) < 0.05 * w0, (w_meas, w0)


@pytest.mark.slow
def test_aeroelastic_naca_static_equilibrium(tmp_path):
    """Coupled loop on the NACA O-mesh at an angle of attack: with a low
    flutter-speed index the airfoil must settle toward a static aeroelastic
    equilibrium (finite, small pitch/plunge; nose-down pitch for positive
    lift ahead of the CG with these signs) instead of diverging."""
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.geometry.structured import naca_omesh

    cfg_text = textwrap.dedent("""
        PHYSICAL_PROBLEM= EULER
        MACH_NUMBER= 0.3
        AOA= 2.0
        FREESTREAM_TEMPERATURE= 288.15
        FREESTREAM_PRESSURE= 101325.0
        MARKER_EULER= ( airfoil )
        MARKER_FAR= ( farfield )
        MARKER_MONITORING= ( airfoil )
        CFL_NUMBER= 8.0
        CONV_NUM_METHOD_FLOW= ROE
        TIME_DISCRE_FLOW= EULER_IMPLICIT
        LINEAR_SOLVER= FGMRES
        LINEAR_SOLVER_PREC= LU_SGS
        LINEAR_SOLVER_ITER= 8
        LINEAR_SOLVER_ERROR= 1e-6
        SPATIAL_ORDER_FLOW= 1ST_ORDER
        NUM_METHOD_GRAD= GREEN_GAUSS
        GRID_MOVEMENT= YES
        GRID_MOVEMENT_KIND= AEROELASTIC
        MOTION_ORIGIN_X= 0.25
        UNST_TIMESTEP= 2e-3
        FLUTTER_SPEED_INDEX= 0.2
        PLUNGE_NATURAL_FREQUENCY= 100.0
        PITCH_NATURAL_FREQUENCY= 100.0
        AIRFOIL_MASS_RATIO= 60.0
        CG_LOCATION= 1.8
        RADIUS_GYRATION_SQUARED= 3.48
        MESH_FILENAME= unused.su2
    """)
    cfg_path = tmp_path / "ae.cfg"
    cfg_path.write_text(cfg_text)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(Config(str(cfg_path)),
                         raw_mesh=naca_omesh(n_wrap=49, n_rad=25,
                                             radius=8.0))
    finally:
        os.chdir(cwd)
    # settle the flow first
    u0, t0, _ = sim.run(250, quiet=True, chunk=50)
    sim.u0, sim.t0 = u0, t0
    u, t, hist = ae.run_aeroelastic(sim, n_steps=6, n_inner=120)
    assert np.isfinite(hist).all()
    pitches = hist[:, 2]
    plunges = hist[:, 1]
    # bounded, small (static equilibrium scale at vf=0.2: |q| << 1)
    assert np.abs(pitches).max() < 0.2
    assert np.abs(plunges).max() < 0.5
    # the structure actually responded to the aero load
    assert np.abs(pitches[-1]) + np.abs(plunges[-1]) > 1e-6
