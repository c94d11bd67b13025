"""Periodic-boundary tests (MARKER_PERIODIC / SU2_MSH periodic capability,
implemented by dual-CV merging — geometry/periodic.py)."""

import os
import textwrap

import numpy as np
import pytest

from su2_tpu.config import Config
from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.geometry.periodic import match_periodic_nodes, merge_periodic
from su2_tpu.geometry.structured import channel_mesh


def test_merge_geometry_invariants():
    raw = channel_mesh(9, 7, lx=1.0, ly=0.4)
    grid = build_dual_grid(raw)
    pairs = match_periodic_nodes(grid, "inlet", "outlet", [1.0, 0.0])
    assert len(pairs) == 7
    merged = merge_periodic(grid, pairs, "inlet", "outlet")
    # total volume conserved (orphans contribute their placeholder 1.0)
    orphans = pairs[:, 1]
    vol = np.asarray(merged.volume).copy()
    vol[orphans] = 0.0
    assert abs(vol.sum() - grid.volume.sum()) < 1e-12
    # CV closure: signed edge normals equal the remaining (wall) vertex
    # normals — periodic cut contributions cancel
    acc = np.zeros((merged.npoint, 2))
    e = np.asarray(merged.edges)
    en = np.asarray(merged.edge_normal)
    np.add.at(acc, e[:, 0], en)
    np.add.at(acc, e[:, 1], -en)
    bnd = np.zeros((merged.npoint, 2))
    for tag in merged.bnd_nodes:
        np.add.at(bnd, np.asarray(merged.bnd_nodes[tag]),
                  np.asarray(merged.bnd_normal[tag]))
    err = np.abs(acc - bnd)
    err[orphans] = 0.0
    assert err.max() < 1e-12, err.max()
    assert set(merged.bnd_nodes) == {"lower_wall", "upper_wall"}


CFG = textwrap.dedent("""
    PHYSICAL_PROBLEM= EULER
    MACH_NUMBER= 0.3
    FREESTREAM_TEMPERATURE= 288.15
    FREESTREAM_PRESSURE= 101325.0
    MARKER_EULER= ( lower_wall, upper_wall )
    MARKER_PERIODIC= ( outlet, inlet, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0 )
    CFL_NUMBER= 0.8
    TIME_DISCRE_FLOW= EULER_EXPLICIT
    SPATIAL_ORDER_FLOW= 1ST_ORDER
    MESH_FILENAME= unused.su2
""")


def test_periodic_channel_preserves_freestream(tmp_path):
    from su2_tpu.driver import Simulation

    cfg_path = tmp_path / "case.cfg"
    cfg_path.write_text(CFG)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(Config(str(cfg_path)),
                         raw_mesh=channel_mesh(9, 7, lx=1.0, ly=0.4))
        _, _, hist = sim.run(3, quiet=True)
    finally:
        os.chdir(cwd)
    assert hist[-1][sim.lay.RHO] < -10.0, hist[-1]


def test_periodic_advection_wraps(tmp_path):
    """A density bump advects through the periodic cut and total mass is
    conserved (no inflow/outflow)."""
    import jax.numpy as jnp
    from su2_tpu.driver import Simulation

    cfg_path = tmp_path / "case.cfg"
    # uniform dt (MAX_DELTA_TIME cap) so the FV mass balance is exact —
    # local time stepping trades conservation-in-time for convergence speed
    cfg_path.write_text(CFG + "MAX_DELTA_TIME= 2e-7\n")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(Config(str(cfg_path)),
                         raw_mesh=channel_mesh(33, 7, lx=1.0, ly=0.4))
    finally:
        os.chdir(cwd)
    coords = np.asarray(sim.grid.coords)
    orphans = None
    # identify orphan nodes (zero incident edges)
    deg = np.asarray(sim.mesh.nbr_mask).sum(axis=1)
    live = deg > 0
    u = np.asarray(sim.u0).copy()
    bump = 1.0 + 0.02 * np.exp(-((coords[:, 0] - 0.7) / 0.08) ** 2)
    u *= bump[:, None]
    u0 = jnp.asarray(u)
    vol = np.asarray(sim.mesh.volume)
    mass0 = float((vol * np.asarray(u0)[:, sim.lay.RHO])[live].sum())
    t = sim.t0
    uj = u0
    for _ in range(200):
        uj, t, rms, rmax, nerr, min_dt = sim._step(uj, t)
    ua = np.asarray(uj)
    assert np.isfinite(ua[live]).all()
    mass1 = float((vol * ua[:, sim.lay.RHO])[live].sum())
    # mass change only through walls (slip, no normal flux) -> conserved
    assert abs(mass1 - mass0) / mass0 < 1e-11, (mass0, mass1)
    # the perturbation is still present (advected, not destroyed)
    assert ua[live, sim.lay.RHO].max() > 1.004 * ua[live, sim.lay.RHO].min()
