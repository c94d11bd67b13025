import numpy as np

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.geometry.structured import channel_mesh

CFG = """
PHYSICAL_PROBLEM= {prob}
MACH_NUMBER= 0.3
FREESTREAM_TEMPERATURE= 300.0
FREESTREAM_VELOCITY= (104.0, 0.0, 0.0)
FREESTREAM_PRESSURE= 101325.0
GAS_CONSTANT= 287.058
GAMMA_VALUE= 1.4
INLET_TYPE = TEMPERATURE_IMPOSE
MARKER_INLET= ( inlet, 300.0, 104.0, 1.0, 0.0, 0.0 )
MARKER_OUTLET= ( outlet, 101325.0)
{walls}
NUM_METHOD_GRAD= GREEN_GAUSS
CFL_NUMBER= 1.0
CONV_NUM_METHOD_FLOW= AUSM
SPATIAL_ORDER_FLOW= 2ND_ORDER
TIME_DISCRE_FLOW= {tdisc}
"""


def test_euler_freestream_preservation():
    """Uniform flow through an aligned channel is an exact steady state of
    the standard (single-species ideal gas) Euler path."""
    cfg = Config(text=CFG.format(
        prob="EULER", tdisc="EULER_EXPLICIT",
        walls="MARKER_EULER= ( lower_wall, upper_wall )"))
    sim = Simulation(cfg, raw_mesh=channel_mesh(33, 17))
    u, t, hist = sim.run(niter=20, quiet=True)
    assert hist[-1][sim.lay.RHO] < -12.0    # machine-level residual
    assert np.isfinite(np.asarray(u)).all()


def test_ns_channel_develops():
    """Implicit laminar NS channel with no-slip walls runs stably and
    enforces the wall condition."""
    cfg = Config(text=CFG.format(
        prob="NAVIER_STOKES", tdisc="EULER_IMPLICIT",
        walls="MARKER_HEATFLUX = (lower_wall, 0.0, upper_wall, 0.0)"))
    sim = Simulation(cfg, raw_mesh=channel_mesh(33, 17))
    u, t, hist = sim.run(niter=10, quiet=True)
    assert np.isfinite(np.asarray(u)).all()
    wall_nodes = np.asarray(sim.mesh.markers["lower_wall"][0])
    mom = np.asarray(u)[wall_nodes][:, sim.lay.RHOVX:sim.lay.RHOVX + 2]
    assert np.abs(mom).max() == 0.0


def test_marker_sym_behaves_as_euler_wall(tmp_path):
    """MARKER_SYM == slip wall (BC_Sym_Plane forwards to BC_Euler_Wall,
    solver_direct_mean.cpp:13194); previously the markers parsed but got
    NO boundary treatment.  A channel with SYM side walls must produce
    exactly the MARKER_EULER solution."""
    import textwrap
    from su2_tpu.geometry.structured import channel_mesh

    base = textwrap.dedent("""
        PHYSICAL_PROBLEM= EULER
        MACH_NUMBER= 0.3
        FREESTREAM_TEMPERATURE= 288.15
        FREESTREAM_PRESSURE= 101325.0
        MARKER_INLET= ( inlet, 293.3, 107800.0, 1.0, 0.0, 0.0 )
        INLET_TYPE= TOTAL_CONDITIONS
        MARKER_OUTLET= ( outlet, 101325.0 )
        CFL_NUMBER= 10.0
        CONV_NUM_METHOD_FLOW= AUSM
        TIME_DISCRE_FLOW= EULER_IMPLICIT
        LINEAR_SOLVER= FGMRES
        LINEAR_SOLVER_PREC= LU_SGS
        LINEAR_SOLVER_ITER= 8
        LINEAR_SOLVER_ERROR= 1e-8
        SPATIAL_ORDER_FLOW= 1ST_ORDER
        NUM_METHOD_GRAD= GREEN_GAUSS
        MESH_FILENAME= unused.su2
    """)

    import os

    def run(extra, name):
        p = tmp_path / name
        p.write_text(base + extra)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            sim = Simulation(Config(str(p)),
                             raw_mesh=channel_mesh(13, 9, lx=1.0, ly=0.4))
        finally:
            os.chdir(cwd)
        u, t, _ = sim.run(60, quiet=True)
        return np.asarray(u)

    u_wall = run("MARKER_EULER= ( lower_wall, upper_wall )\n", "w.cfg")
    u_sym = run("MARKER_SYM= ( lower_wall, upper_wall )\n", "s.cfg")
    np.testing.assert_array_equal(u_sym, u_wall)
