"""Polar-sweep workflow (SU2_PY/compute_polar.py equivalent).

Usage: python -m su2_tpu.tooling.polar <config.cfg> [aoa0 aoa1 n]

Runs the steady solver across a sweep of angles of attack and writes the
polar table (AOA, CL, CD, CMz) to ``polar.dat`` — the reference's
compute_polar.py loops SU2_CFD subprocesses over modified cfgs
(SU2_PY/compute_polar.py); here the sweep runs in-process, reusing the
preprocessed mesh and warm-starting each angle from the previous converged
state (the reference restarts from scratch per angle).
"""

from __future__ import annotations

import sys

import numpy as np

from su2_tpu.config import Config
from su2_tpu.driver import Simulation


def run(cfg_path: str, aoa0: float = -2.0, aoa1: float = 2.0, n: int = 5,
        niter: int | None = None, out_path: str = "polar.dat", raw=None,
        quiet: bool = True):
    angles = np.linspace(aoa0, aoa1, n)
    rows = []
    state = None
    for aoa in angles:
        cfg = Config(cfg_path, overrides={"AOA": f"{aoa}"})
        sim = Simulation(cfg, raw_mesh=raw)
        kw = dict(u=state[0], t_guess=state[1]) if state is not None else {}
        out = sim.run(niter, quiet=quiet, **kw)
        if sim.turbulent:
            u, t_guess, _, turb = out
            turb2 = (turb[0], turb[1])
        else:
            u, t_guess, _ = out
            turb2 = None
        state = (u, t_guess)
        f = sim.monitor_forces(u, t_guess, turb2)
        rows.append((aoa, f["CL"], f["CD"], f["CMz"]))
        if not quiet:
            print(f"AOA {aoa:7.3f}  CL {f['CL']:+.6f}  CD {f['CD']:+.6f}")
    with open(out_path, "w") as fh:
        fh.write('VARIABLES = "AoA", "CL", "CD", "CMz"\n')
        for aoa, cl, cd, cm in rows:
            fh.write(f"{aoa: .6e} {cl: .10e} {cd: .10e} {cm: .10e}\n")
    return rows


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m su2_tpu.tooling.polar <cfg> [aoa0 aoa1 n]")
        return 1
    args = [float(x) for x in argv[1:4]]
    run(argv[0], *(args[:2] + ([int(args[2])] if len(args) > 2 else [])),
        quiet=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
