"""Finite-difference design gradients (SU2_PY/finite_differences.py
equivalent).

Usage: python -m su2_tpu.tooling.fd_grad <config.cfg> [step]

For each design variable in DEFINITION_DV: displace the surface by +-step,
propagate through the volume deformation, re-converge the primal, and
central-difference the objective.  Writes ``of_grad_fd.dat`` in the
reference's gradient-file format (the same file SU2_DOT/adjoint writes, so
the two gradient routes are directly comparable — the reference's
finite_differences.py has the same role).

The in-process discrete adjoint (tooling/adj.py, tooling/opt.py) supersedes
this for production; the FD route exists as the independent cross-check the
reference ships.
"""

from __future__ import annotations

import copy
import sys

import numpy as np

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.tooling.adj import OBJ_MAP
from su2_tpu.tooling.opt import ShapeProblem


def _objective_at(prob: ShapeProblem, alpha):
    coords = prob.coords_of(np.asarray(alpha))
    raw = copy.deepcopy(prob.raw0)
    raw.coords[:] = coords
    sim = Simulation(prob.cfg, raw_mesh=raw)
    out = sim.run(prob.n_primal, quiet=True)
    u, t_guess = out[0], out[1]
    turb = (out[3][0], out[3][1]) if sim.turbulent else None
    f = sim.monitor_forces(u, t_guess, turb)
    return f[prob.which]


def run(cfg: Config, step: float = 1e-4, raw=None,
        n_primal: int | None = None, out_path: str = "of_grad_fd.dat"):
    prob = ShapeProblem(cfg, raw=raw, n_primal=n_primal)
    grads = []
    for k in range(len(prob.dvs)):
        a_p = np.zeros(len(prob.dvs))
        a_m = np.zeros(len(prob.dvs))
        a_p[k] = step
        a_m[k] = -step
        j_p = _objective_at(prob, a_p)
        j_m = _objective_at(prob, a_m)
        grads.append((j_p - j_m) / (2.0 * step))
    with open(out_path, "w") as fh:
        fh.write('VARIABLES = "VARIABLE", "GRADIENT", "FINDIFF_STEP"\n')
        for k, g in enumerate(grads):
            fh.write(f"{k} , {g:.10e} , {step:.3e}\n")
    return np.asarray(grads)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m su2_tpu.tooling.fd_grad <cfg> [step]")
        return 1
    cfg = Config(argv[0])
    step = float(argv[1]) if len(argv) > 1 else 1e-4
    grads = run(cfg, step)
    print("FD gradient:", grads)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
