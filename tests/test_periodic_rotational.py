"""Rotationally periodic boundaries (ghost element layer,
geometry/periodic.rotational_ghost_layer; solver-side rotated refresh —
reference: SU2_MSH periodic setup + Set_MPI_* rotation,
Common/src/geometry_structure.cpp:11805-11830)."""

import os
import textwrap

import numpy as np
import pytest

import jax.numpy as jnp

from su2_tpu.config import Config
from su2_tpu.geometry.structured import sector_mesh

THETA = 0.5                                   # radians
THETA_DEG = THETA * 180.0 / np.pi             # cfg angles are in degrees

CFG = textwrap.dedent(f"""
    PHYSICAL_PROBLEM= EULER
    MACH_NUMBER= 0.3
    FREESTREAM_TEMPERATURE= 288.15
    FREESTREAM_PRESSURE= 101325.0
    MARKER_EULER= ( inner, outer )
    MARKER_PERIODIC= ( side_b, side_a, 0.0, 0.0, 0.0, 0.0, 0.0, {THETA_DEG}, 0.0, 0.0, 0.0 )
    CFL_NUMBER= 0.8
    TIME_DISCRE_FLOW= EULER_EXPLICIT
    SPATIAL_ORDER_FLOW= 2ND_ORDER_LIMITER
    SLOPE_LIMITER_FLOW= VENKATAKRISHNAN
    NUM_METHOD_GRAD= WEIGHTED_LEAST_SQUARES
    MESH_FILENAME= unused.su2
""")


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    from su2_tpu.driver import Simulation
    tmp = tmp_path_factory.mktemp("rotper")
    cfg_path = tmp / "case.cfg"
    cfg_path.write_text(CFG)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        return Simulation(Config(str(cfg_path)),
                          raw_mesh=sector_mesh(9, 11, theta=THETA))
    finally:
        os.chdir(cwd)


def test_ghost_layer_geometry(sim):
    """Ghost layer gives the periodic-face nodes complete dual CVs: the
    signed edge-normal sums at the face nodes must equal zero minus the
    wall vertex normals (CV closure, like any interior node)."""
    assert sim.pghost is not None
    n0 = sim.pghost.start
    grid = sim.grid
    acc = np.zeros((grid.npoint, 2))
    e = np.asarray(grid.edges)
    en = np.asarray(grid.edge_normal)
    np.add.at(acc, e[:, 0], en)
    np.add.at(acc, e[:, 1], -en)
    bnd = np.zeros((grid.npoint, 2))
    for tag in grid.bnd_nodes:
        np.add.at(bnd, np.asarray(grid.bnd_nodes[tag]),
                  np.asarray(grid.bnd_normal[tag]))
    err = np.abs(acc - bnd)[:n0]
    # periodic-face interior nodes (not wall corners) must close exactly
    raw = sim.raw
    side = np.unique(np.asarray(raw.markers["side_a"]).ravel())
    interior_side = [p for p in side
                     if err.shape[0] > p and
                     not any(p in np.unique(np.asarray(raw.markers[t]).ravel())
                             for t in ("inner", "outer"))]
    assert len(interior_side) > 0
    assert err[interior_side].max() < 1e-10


def test_rest_state_preserved(sim):
    """Uniform pressure at rest is a steady state; the residual through the
    rotationally periodic faces must vanish to roundoff."""
    lay = sim.lay
    u = np.asarray(sim.u0).copy()
    u[:, lay.RHOVX:lay.RHOVX + 2] = 0.0           # at rest
    uj = jnp.asarray(u)
    t = sim.t0
    for _ in range(3):
        uj, t, rms, rmax, nerr, min_dt = sim._step(uj, t)
    rms = np.asarray(rms)
    assert np.log10(max(float(rms[lay.RHO]), 1e-300)) < -10.0


def test_solid_body_rotation_refresh(sim):
    """u = Omega x r is exactly rotation-periodic: after the ghost refresh
    the ghost-row velocities equal Omega x r at the ghost coordinates."""
    lay = sim.lay
    coords = np.asarray(sim.grid.coords)
    omega = 7.0
    u = np.asarray(sim.u0).copy()
    rho = u[:, lay.RHO]
    u[:, lay.RHOVX] = rho * (-omega * coords[:, 1])
    u[:, lay.RHOVX + 1] = rho * (omega * coords[:, 0])
    ur = np.asarray(sim._pg_refresh_u(jnp.asarray(u)))
    n0 = sim.pghost.start
    vel_g = ur[n0:, lay.RHOVX:lay.RHOVX + 2] / ur[n0:, lay.RHO, None]
    expect = np.stack([-omega * coords[n0:, 1],
                       omega * coords[n0:, 0]], axis=1)
    np.testing.assert_allclose(vel_g, expect, rtol=1e-10, atol=1e-10)


def test_step_refreshes_ghosts(sim):
    """The explicit step must refresh ghost rows internally: garbage ghost
    input may not survive or contaminate the update."""
    lay = sim.lay
    coords = np.asarray(sim.grid.coords)
    omega = 7.0
    u = np.asarray(sim.u0).copy()
    rho = u[:, lay.RHO]
    u[:, lay.RHOVX] = rho * (-omega * coords[:, 1])
    u[:, lay.RHOVX + 1] = rho * (omega * coords[:, 0])
    n0 = sim.pghost.start
    u[n0:] = 777.0                       # poison the ghost rows
    uj, t = jnp.asarray(u), sim.t0
    u1, t1, rms, rmax, nerr, min_dt = sim._step(uj, t)
    u1 = np.asarray(u1)
    assert np.isfinite(u1).all()
    # ghost rows were replaced by the rotated donor state at step start and
    # carry zero residual, so the output ghosts equal refresh(u_in)
    ref = np.asarray(sim._pg_refresh_u(jnp.asarray(u)))
    np.testing.assert_allclose(u1[n0:], ref[n0:], rtol=1e-12)
    # interior stayed bounded (no contamination by the poisoned rows)
    assert np.abs(u1[:n0, lay.RHO] - u[:n0, lay.RHO]).max() \
        < 0.5 * np.abs(u[:n0, lay.RHO]).max()
