"""SU2_DOT equivalent: project mesh sensitivities onto design variables.

Usage: python -m su2_tpu.tooling.dot <config.cfg> [surface_sensitivity.npz]
Computes dJ/dalpha_k = sum_nodes (dx/dalpha_k) . (dJ/dx) where dx/dalpha is
the Hicks-Henne displacement field of each DV (reference:
SU2_DOT/src/SU2_DOT.cpp surface-gradient projection).  Writes
of_grad.dat in the reference's gradient-file format.
"""

from __future__ import annotations

import sys

import numpy as np

from su2_tpu import deform
from su2_tpu.config import Config
from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.io.mesh import read_su2_mesh


def run(cfg: Config, sens_file: str = "surface_sensitivity.npz", raw=None,
        sens=None):
    raw = raw if raw is not None else read_su2_mesh(
        cfg.resolve(cfg.mesh_filename))
    grid = build_dual_grid(raw)
    if sens is None:
        sens = np.load(sens_file)["sensitivity"]
    dvs, tags = deform.parse_dv_options(cfg)
    boxes = deform.build_ffd_boxes(cfg, raw.ndim)
    grads = []
    for dv in dvs:
        disp = np.zeros_like(raw.coords)
        unit_dv = dict(dv, value=1.0)
        for tag in tags:
            nodes = np.asarray(grid.bnd_nodes[tag])
            disp += deform.surface_displacement(raw.coords, nodes, [unit_dv],
                                                ffd_boxes=boxes,
                                                ffd_scale=cfg.ffd_scale)
        grads.append(float((disp * sens).sum()))
    with open("of_grad.dat", "w") as f:
        f.write('VARIABLES="VARIABLE","GRADIENT","FINDIFF_STEP"\n')
        for k, g in enumerate(grads):
            f.write(f"{k}, {g:.10e}, 0.0\n")
    return grads


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m su2_tpu.tooling.dot <config.cfg> [sens.npz]")
        return 1
    cfg = Config(argv[0])
    grads = run(cfg, argv[1] if len(argv) > 1 else "surface_sensitivity.npz")
    print("gradients:", grads, "-> of_grad.dat")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
