import numpy as np
import jax.numpy as jnp

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.geometry.structured import channel_mesh

CFG = """
PHYSICAL_PROBLEM= EULER
MACH_NUMBER= 0.5
FREESTREAM_TEMPERATURE= 288.15
FREESTREAM_VELOCITY= (170.1, 0.0, 0.0)
FREESTREAM_PRESSURE= 101325.0
MARKER_FAR= ( inlet, outlet, lower_wall, upper_wall )
NUM_METHOD_GRAD= GREEN_GAUSS
CFL_NUMBER= 1.0
CONV_NUM_METHOD_FLOW= ROE
SPATIAL_ORDER_FLOW= 2ND_ORDER
TIME_DISCRE_FLOW= EULER_IMPLICIT
"""


def test_roe_farfield_freestream_and_decay():
    """Roe flux + characteristic far-field preserves freestream exactly and
    damps a random perturbation (implicit Euler)."""
    cfg = Config(text=CFG)
    sim = Simulation(cfg, raw_mesh=channel_mesh(33, 17))
    u, t, hist = sim.run(niter=10, quiet=True)
    assert hist[-1][sim.lay.RHO] < -12.0

    rng = np.random.default_rng(0)
    u0 = np.asarray(sim.u0)
    u0p = u0 * (1 + 0.01 * rng.normal(0, 1, u0.shape))
    u2, t2, hist2 = sim.run(niter=100, u=jnp.asarray(u0p), quiet=True)
    assert hist2[-1][sim.lay.RHO] < hist2[0][sim.lay.RHO] - 1.0
    assert np.isfinite(np.asarray(u2)).all()
