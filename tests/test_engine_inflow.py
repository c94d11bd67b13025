"""Fuel-regression (Engine_Inflow) BC tests.

Reference: CReactiveNSSolver::BC_Engine_Inflow
(solver_direct_reactive.cpp:5947-6354), ReadDataFuel/ComputeRegressionRate
(reacting_model_library.cpp:1457-1516).  No shipped test case exercises this
BC (and the reference's regula-falsi clamp is inverted), so these tests check
the mathematical invariants of the surface system instead of binary parity.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from su2_tpu.chemistry import library as cl
from su2_tpu.io.tables import read_fuel_data

FUEL_TXT = """\
Physical properties of the solid fuel
A1   = 0.0054
EA1  = -2040.0
A2   = 0.0012
EA2  = -1104.0
Tbar = 750.0
STOP
"""


@pytest.fixture(scope="module")
def lib(combustion_dir):
    return cl.load_library(os.path.join(combustion_dir, "test_chem_second.txt"))


@pytest.fixture()
def fuel_file(tmp_path):
    p = tmp_path / "fuel.dat"
    p.write_text(FUEL_TXT)
    return str(p)


def test_read_fuel_data(fuel_file):
    d = read_fuel_data(fuel_file)
    assert d == {"A1": 0.0054, "EA1": -2040.0, "A2": 0.0012,
                 "EA2": -1104.0, "Tbar": 750.0}


def test_regression_rate_branches(fuel_file):
    d = {k: jnp.asarray(v) for k, v in read_fuel_data(fuel_file).items()}
    from su2_tpu.io.tables import R_UNGAS_SCAL
    t = jnp.asarray([600.0, 900.0])
    rb = np.asarray(cl.regression_rate(d, t))
    np.testing.assert_allclose(
        rb[0], 0.0012 * np.exp(-1104.0 / (R_UNGAS_SCAL * 600.0)), rtol=1e-12)
    np.testing.assert_allclose(
        rb[1], 0.0054 * np.exp(-2040.0 / (R_UNGAS_SCAL * 900.0)), rtol=1e-12)


def _channel_sim(tmp_path, combustion_dir, fuel_file):
    import textwrap

    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.geometry.structured import channel_mesh

    # fuel-rich surface blend of the 9-species mixture (C4H6 index 4)
    ys_fuel = "0.0, 0.0, 0.0, 0.0, 0.9, 0.0, 0.0, 0.1, 0.0"
    cfg_text = textwrap.dedent(f"""
        PHYSICAL_PROBLEM= REACTIVE_NAVIER_STOKES
        CONFIG_LIB_FILE= {combustion_dir}/test_chem_second.txt
        LIBRARY_PATH= {combustion_dir}
        SPECIES_ORDER= ( O2, H2O, H2, N2, C4H6, CO2, CO, OH, H )
        FREESTREAM_MASS_FRAC= ( 0.23, 0.0, 0.0, 0.77, 0.0, 0.0, 0.0, 0.0, 0.0 )
        MACH_NUMBER= 0.1
        FREESTREAM_PRESSURE= 101325.0
        FREESTREAM_TEMPERATURE= 1200.0
        MARKER_INLET= ( inlet, 1210.0, 5.0, 1.0, 0.0, 0.0 )
        INLET_TYPE= TEMPERATURE_IMPOSE
        INLET_MASS_FRAC= ( inlet, 0.23, 0.0, 0.0, 0.77, 0.0, 0.0, 0.0, 0.0, 0.0 )
        MARKER_OUTLET= ( outlet, 101325.0 )
        MARKER_HEATFLUX= ( upper_wall, 0.0 )
        MARKER_ENGINE_INFLOW= ( lower_wall, 0.0 )
        INFLOW_MASS_FRAC= ( lower_wall, {ys_fuel} )
        INFLOW_VELOCITY_DIR= ( 0.0, 1.0, 0.0 )
        FUEL_DATA_FILE= {fuel_file}
        FUEL_TEMPERATURE= 300.0
        NUM_METHOD_GRAD= GREEN_GAUSS
        CFL_NUMBER= 1.0
        TIME_DISCRE_FLOW= EULER_IMPLICIT
        LINEAR_SOLVER= FGMRES
        LINEAR_SOLVER_ITER= 5
        MESH_FILENAME= unused.su2
    """)
    cfg_path = tmp_path / "engine.cfg"
    cfg_path.write_text(cfg_text)
    return Simulation(Config(str(cfg_path)),
                      raw_mesh=channel_mesh(9, 7, lx=0.1, ly=0.02))


def test_engine_inflow_surface_system(tmp_path, combustion_dir, fuel_file):
    """The converged surface state satisfies its defining balances."""
    from su2_tpu import state as st
    from su2_tpu.solvers import engine_inflow as ei

    sim = _channel_sim(tmp_path, combustion_dir, fuel_file)
    bc = [b for b in sim.bcs if b.kind == "engine_inflow"][0]
    _, v, _ = st.cons2prim(sim.lib, sim.lay, sim.u0, sim.t0, sim.tparams)
    v_ghost, gamma, vel2, info = ei.engine_inflow_state(
        sim.lib, sim.lay, bc, v, sim.mesh.coords, return_internals=True)

    lay = sim.lay
    assert np.all(np.isfinite(np.asarray(v_ghost)))
    # species Newton system converged
    assert np.abs(np.asarray(info["f_newton"])).max() < 1e-8
    # mass fractions of the solved surface state are near-physical: the
    # surface system (like the reference's) has no explicit sum-to-one
    # constraint, so only approximate closure holds under strong
    # composition gradients
    ys_g = np.asarray(info["ys_g"])
    np.testing.assert_allclose(ys_g.sum(axis=1), 1.0, atol=0.05)
    # surface mass balance: rho_g Vg (n.dir) == (rho_s - rho_g) rb
    rb = np.asarray(cl.regression_rate(bc.params["fuel"], info["tg"]))
    area = np.linalg.norm(np.asarray(bc.normal), axis=1)
    unit = -np.asarray(bc.normal) / area[:, None]
    adir = unit @ np.asarray(bc.params["flow_dir"])
    lhs = np.asarray(info["rho_g"]) * np.asarray(info["vg"]) * adir
    rhs = (float(bc.params["rho_s"]) - np.asarray(info["rho_g"])) * rb
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
    # ghost state: ideal-gas consistent, fuel fractions in the species slots
    rho_chk = np.asarray(v_ghost[:, lay.P]) / (
        np.asarray(cl.mixture_rgas(sim.lib, info["ys_g"]))
        * np.asarray(info["tg"]))
    np.testing.assert_allclose(np.asarray(v_ghost[:, lay.PRHO]), rho_chk,
                               rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(v_ghost[:, lay.YS:lay.YS + lay.ns]),
        np.tile(np.asarray(bc.params["ys_fuel"]), (v_ghost.shape[0], 1)),
        atol=0)
    # temperature within bracket
    tg = np.asarray(info["tg"])
    assert np.all(tg >= float(bc.params["tmin"]))
    assert np.all(tg <= float(bc.params["tmax"]))


@pytest.mark.slow
def test_engine_inflow_step_runs(tmp_path, combustion_dir, fuel_file):
    """One implicit RANS-less NS step with the regression BC stays finite."""
    sim = _channel_sim(tmp_path, combustion_dir, fuel_file)
    u, t_guess, hist = sim.run(2, quiet=True)
    assert np.all(np.isfinite(np.asarray(u)))
    assert np.all(np.isfinite(hist))
