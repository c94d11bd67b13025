"""SU2_DEF equivalent: apply design variables and deform the volume mesh.

Usage: python -m su2_tpu.tooling.deform <config.cfg>
Reads DV_KIND/DV_MARKER/DV_PARAM/DV_VALUE, applies Hicks-Henne bumps on the
DV markers, propagates with the spring analogy and writes MESH_OUT_FILENAME
(reference: SU2_DEF/src/SU2_DEF.cpp main loop).
"""

from __future__ import annotations

import sys

import numpy as np

from su2_tpu import deform
from su2_tpu.config import Config
from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.geometry.mesh_data import mesh_arrays
from su2_tpu.io.mesh import read_su2_mesh, write_su2_mesh


def run(cfg: Config, raw=None):
    raw = raw if raw is not None else read_su2_mesh(
        cfg.resolve(cfg.mesh_filename))
    grid = build_dual_grid(raw)
    mesh = mesh_arrays(grid)
    dvs, tags = deform.parse_dv_options(cfg)
    boxes = deform.build_ffd_boxes(cfg, raw.ndim)
    disp = np.zeros_like(raw.coords)
    for tag in tags:
        nodes = np.asarray(grid.bnd_nodes[tag])
        disp += deform.surface_displacement(raw.coords, nodes, dvs,
                                            ffd_boxes=boxes,
                                            ffd_scale=cfg.ffd_scale)
    new_coords = np.asarray(deform.deform_coords(
        mesh, disp, n_iter=cfg.deform_linear_iter,
        method=cfg.deform_method, raw=raw,
        stiffness_type=cfg.deform_stiffness_type))
    write_su2_mesh(raw, cfg.mesh_out_filename, coords=new_coords)
    return new_coords


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m su2_tpu.tooling.deform <config.cfg>")
        return 1
    cfg = Config(argv[0])
    run(cfg)
    print(f"deformed mesh written to {cfg.mesh_out_filename}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
