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
