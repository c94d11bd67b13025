import os

import numpy as np

from su2_tpu.config import Config
from su2_tpu.driver import Simulation


def test_implicit_combustion_smoke(combustion_dir):
    """Implicit Euler on the combustion case at 10x the explicit CFL:
    runs stably with finite residuals and positive density."""
    cfg = Config(
        os.path.join(combustion_dir, "my_combustion_second_chem_PaSR.cfg"),
        overrides={"TIME_DISCRE_FLOW": "EULER_IMPLICIT", "CFL_NUMBER": "1.0",
                   "RESTART_SOL": "NO"})
    sim = Simulation(cfg)
    u, t, hist, turb = sim.run(niter=5, quiet=True)
    assert np.isfinite(np.asarray(u)).all()
    assert np.isfinite(hist).all()
    assert (np.asarray(u)[:, sim.lay.RHO] > 0).all()
    # implicit must not blow up: rho-residual not larger than start + margin
    assert hist[-1][sim.lay.RHO] < hist[0][sim.lay.RHO] + 0.5
