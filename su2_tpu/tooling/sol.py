"""SU2_SOL equivalent: restart + mesh -> visualization files.

Reference: SU2_SOL/src/SU2_SOL.cpp reads the cfg, mesh and restart_flow.dat
and writes Tecplot/ParaView volume + surface solutions.  Here the solver is
memory-resident so this is a thin CLI over Simulation.write_solution, usable
on any restart file (including ones written by the reference binary).

Usage: python -m su2_tpu.tooling.sol <config.cfg>
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from su2_tpu.config import Config
from su2_tpu.driver import Simulation


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m su2_tpu.tooling.sol <config.cfg>")
        return 1
    cfg = Config(argv[0], overrides={"RESTART_SOL": "YES"})
    sim = Simulation(cfg)
    turb = None
    if sim.turbulent:
        q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
        turb = (q0, mu_t0)
    sim.out_dir = None
    import os
    sim.out_dir = os.getcwd()
    sim.write_solution(sim.u0, sim.t0, turb)
    print(f"wrote {cfg.volume_flow_filename} / {cfg.surface_flow_filename} "
          f"from {cfg.solution_flow_filename}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
