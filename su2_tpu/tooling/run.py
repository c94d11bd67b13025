"""parallel_computation.py equivalent.

The reference's SU2_PY driver shells out to `mpirun -n N SU2_CFD` and then
SU2_SOL (SU2_PY/parallel_computation.py).  Here multi-chip runs are one SPMD
process, so the equivalent is: build the Simulation over n devices, run, and
write the merged output files directly.

Usage: python -m su2_tpu.tooling.run <config.cfg> [-n NDEVICES] [-i NITER]
"""

from __future__ import annotations

import argparse

import jax

from su2_tpu.config import Config
from su2_tpu.driver import Simulation


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("-n", "--ndevices", type=int, default=None,
                    help="devices to shard over (default: all if >1)")
    ap.add_argument("-i", "--niter", type=int, default=None)
    args = ap.parse_args(argv)

    nd = args.ndevices
    if nd is None:
        nd = len(jax.devices())
    nd = nd if nd > 1 else None

    cfg = Config(args.config)
    sim = Simulation(cfg, ndevices=nd)
    sim.enable_output()
    out = sim.run(args.niter)
    if sim.turbulent:
        u, t, hist, ts = out
        sim.write_solution(u, t, (ts[0], ts[1]))
    else:
        u, t, hist = out
        sim.write_solution(u, t)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
