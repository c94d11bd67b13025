"""Incompressible (artificial compressibility) solver tests
(INCOMPRESSIBLE regime of CEulerSolver/CNSSolver)."""

import textwrap

import numpy as np
import pytest

from su2_tpu.config import Config
from su2_tpu.geometry.structured import channel_mesh
from su2_tpu.solvers.incomp import IncSimulation


def _cfg(text):
    return Config(text=textwrap.dedent(text))


def test_uniform_flow_preserved():
    cfg = _cfg("""
        PHYSICAL_PROBLEM= EULER
        REGIME_TYPE= INCOMPRESSIBLE
        FREESTREAM_DENSITY= 998.0
        FREESTREAM_VELOCITY= ( 1.0, 0.0, 0.0 )
        ARTCOMP_FACTOR= 4.0
        MARKER_FAR= ( inlet, outlet, lower_wall, upper_wall )
        CFL_NUMBER= 5.0
        LINEAR_SOLVER_ITER= 5
        MESH_FILENAME= unused.su2
    """)
    sim = IncSimulation(cfg, raw_mesh=channel_mesh(9, 7))
    u, hist = sim.run(3)
    assert hist[-1].max() < -10.0, hist[-1]


def test_inlet_outlet_channel_converges():
    cfg = _cfg("""
        PHYSICAL_PROBLEM= EULER
        REGIME_TYPE= INCOMPRESSIBLE
        FREESTREAM_DENSITY= 1.0
        FREESTREAM_VELOCITY= ( 1.0, 0.0, 0.0 )
        ARTCOMP_FACTOR= 4.0
        MARKER_EULER= ( lower_wall, upper_wall )
        MARKER_INLET= ( inlet, 0.0, 2.0, 1.0, 0.0, 0.0 )
        MARKER_OUTLET= ( outlet, 0.0 )
        CFL_NUMBER= 5.0
        LINEAR_SOLVER_ITER= 8
        MESH_FILENAME= unused.su2
    """)
    # init at u=1, inlet drives u=2: the solver must converge to the new
    # uniform state
    sim = IncSimulation(cfg, raw_mesh=channel_mesh(17, 9, lx=1.0, ly=0.4))
    u, hist = sim.run(400)
    assert np.isfinite(hist).all()
    assert hist[-1][1] < hist[0][1] - 2.0, (hist[0], hist[-1])
    # slip channel: uniform u = 2 everywhere at convergence
    vel = np.asarray(u[:, 1:]) / sim.rho0
    np.testing.assert_allclose(vel[:, 0], 2.0, atol=2e-2)
    np.testing.assert_allclose(vel[:, 1], 0.0, atol=2e-2)


def test_poiseuille_profile():
    """Viscous channel: no-slip walls produce the parabolic profile shape."""
    cfg = _cfg("""
        PHYSICAL_PROBLEM= NAVIER_STOKES
        REGIME_TYPE= INCOMPRESSIBLE
        FREESTREAM_DENSITY= 1.0
        FREESTREAM_VELOCITY= ( 1.0, 0.0, 0.0 )
        ARTCOMP_FACTOR= 4.0
        VISCOSITY_CONSTANT= 0.05
        MARKER_HEATFLUX= ( lower_wall, 0.0, upper_wall, 0.0 )
        MARKER_INLET= ( inlet, 0.0, 1.0, 1.0, 0.0, 0.0 )
        MARKER_OUTLET= ( outlet, 0.0 )
        CFL_NUMBER= 3.0
        LINEAR_SOLVER_ITER= 8
        MESH_FILENAME= unused.su2
    """)
    sim = IncSimulation(cfg, raw_mesh=channel_mesh(25, 13, lx=2.0, ly=1.0))
    u, hist = sim.run(800)
    assert np.isfinite(hist).all()
    coords = np.asarray(sim.mesh.coords)
    vel_x = np.asarray(u[:, 1]) / sim.rho0
    # mid-channel column: zero at walls, max at center, concave
    col = np.isclose(coords[:, 0], 1.5, atol=0.05)
    y = coords[col, 1]
    vx = vel_x[col]
    order = np.argsort(y)
    y, vx = y[order], vx[order]
    assert abs(vx[0]) < 0.05 and abs(vx[-1]) < 0.05   # no-slip
    assert vx[len(vx) // 2] > 1.1                     # accelerated core
    # symmetric-ish profile
    assert abs(vx[len(vx) // 2] - vx.max()) < 0.15
