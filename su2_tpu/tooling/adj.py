"""Discrete-adjoint CLI (SU2_CFD_AD equivalent).

Usage: python -m su2_tpu.tooling.adj <config.cfg> [n_primal]
Converges the primal flow, runs the reverse fixed-point adjoint for the
OBJECTIVE_FUNCTION over MARKER_MONITORING, and writes:
  - surface_sensitivity.npz  (node ids, coords, dJ/dx field)
  - surface_adjoint.csv      (per marker-node sensitivity)
Reference capability: SU2_CFD with MATH_PROBLEM= DISCRETE_ADJOINT
(solver_adjoint_discrete.cpp) + the surface-sensitivity output.
"""

from __future__ import annotations

import sys

import numpy as np

from su2_tpu import adjoint as adj
from su2_tpu.config import Config
from su2_tpu.driver import Simulation

OBJ_MAP = {"DRAG": "CD", "LIFT": "CL", "FORCE_X": "CFx", "FORCE_Y": "CFy"}


def run(cfg: Config, n_primal: int | None = None, raw_mesh=None):
    sim = Simulation(cfg, raw_mesh=raw_mesh)
    out = sim.run(n_primal if n_primal is not None else cfg.ext_iter,
                  quiet=True)
    u_star, t_star = out[0], out[1]
    which = OBJ_MAP.get(cfg.objective_function, "CD")
    tags = tuple(cfg.marker_monitoring) or tuple(sim.mesh.markers)
    result = adj.adjoint_sensitivity(sim, u_star, t_star, tags=tags,
                                     which=which)
    sens = np.asarray(result["sensitivity"])
    np.savez("surface_sensitivity.npz", sensitivity=sens,
             coords=np.asarray(sim.grid.coords), J=result["J"])
    # volume adjoint restart (reference restart_adj layout) — consumed by
    # the GRAD_ADJOINT / GRAD_FLOW_ADJ adaptation sensors (tooling/msh.py)
    from su2_tpu.io import restart as rio
    rio.write_restart(getattr(cfg, "restart_adj_filename",
                              "restart_adj.dat"),
                      np.asarray(sim.grid.coords),
                      np.asarray(result["lambda"]))
    with open("surface_adjoint.csv", "w") as f:
        f.write("node,x,y,dJdx,dJdy\n")
        for tag in tags:
            for p in np.asarray(sim.grid.bnd_nodes[tag]):
                c = sim.grid.coords[p]
                f.write(f"{p},{c[0]},{c[1]},{sens[p, 0]},{sens[p, 1]}\n")
    return result, sim


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m su2_tpu.tooling.adj <config.cfg> [n_primal]")
        return 1
    cfg = Config(argv[0])
    n = int(argv[1]) if len(argv) > 1 else None
    result, _ = run(cfg, n)
    print(f"J = {result['J']:.10e}; adjoint residual "
          f"{result['adj_hist'][-1]:.3e}; wrote surface_sensitivity.npz")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
