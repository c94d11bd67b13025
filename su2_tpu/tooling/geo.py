"""SU2_GEO equivalent: geometric evaluation of 2D surface markers.

Usage: python -m su2_tpu.tooling.geo <config.cfg>
Computes airfoil-style section properties of the DV_MARKER (or
MARKER_PLOTTING) surface — area, chord, max/station thickness — and, when
DV definitions are present, their finite-difference gradients w.r.t. each
design variable (reference: SU2_GEO/src/SU2_GEO.cpp, Compute_MaxThickness /
Compute_Chord / Compute_Area in Common/src/geometry_structure.cpp).
"""

from __future__ import annotations

import sys

import numpy as np

from su2_tpu import deform
from su2_tpu.config import Config
from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.io.mesh import read_su2_mesh

STATIONS = (0.25, 0.333333, 0.5, 0.666666, 0.75)


def section_properties(coords: np.ndarray, marker_nodes: np.ndarray) -> dict:
    """2D section metrics over the marker node set."""
    pts = coords[marker_nodes]
    x, y = pts[:, 0], pts[:, 1]
    i_le = int(np.argmin(x))
    i_te = int(np.argmax(x))
    chord = float(np.hypot(x[i_te] - x[i_le], y[i_te] - y[i_le]))
    xn = (x - x[i_le]) / max(x[i_te] - x[i_le], 1e-300)
    # split upper/lower by the chord line
    t = np.clip(xn, 0.0, 1.0)
    y_chord = y[i_le] + t * (y[i_te] - y[i_le])
    upper = y >= y_chord
    thick = {}
    for s in STATIONS:
        yu = _interp_side(xn[upper], y[upper], s)
        yl = _interp_side(xn[~upper], y[~upper], s)
        thick[s] = float(yu - yl) if np.isfinite(yu) and np.isfinite(yl) \
            else float("nan")
    vals = [v for v in thick.values() if np.isfinite(v)]
    max_thickness = float(np.nanmax(list(thick.values()))) if vals else 0.0
    # polygon area via the shoelace over angularly-sorted marker points
    cx, cy = x.mean(), y.mean()
    order = np.argsort(np.arctan2(y - cy, x - cx))
    xs, ys = x[order], y[order]
    area = 0.5 * abs(float(np.dot(xs, np.roll(ys, -1))
                           - np.dot(ys, np.roll(xs, -1))))
    return {"AREA": area, "CHORD": chord, "MAX_THICKNESS": max_thickness,
            **{f"THICKNESS_{int(s*100):02d}": v for s, v in thick.items()}}


def _interp_side(xn, y, s):
    if len(xn) < 2:
        return float("nan")
    order = np.argsort(xn)
    return float(np.interp(s, xn[order], y[order]))


def run(cfg: Config, raw=None):
    raw = raw if raw is not None else read_su2_mesh(
        cfg.resolve(cfg.mesh_filename))
    grid = build_dual_grid(raw)
    tags = list(cfg.dv_marker) or list(cfg.marker_plotting) \
        or list(grid.bnd_nodes)
    nodes = np.concatenate([np.asarray(grid.bnd_nodes[t]) for t in tags])
    funcs = section_properties(raw.coords, nodes)

    grads = {}
    dvs, _ = deform.parse_dv_options(cfg)
    if dvs and any(abs(dv["value"]) >= 0 for dv in dvs):
        eps = 1e-6
        boxes = deform.build_ffd_boxes(cfg, raw.ndim)
        for k, dv in enumerate(dvs):
            disp = deform.surface_displacement(raw.coords, nodes,
                                               [dict(dv, value=eps)],
                                               ffd_boxes=boxes,
                                               ffd_scale=cfg.ffd_scale)
            f_p = section_properties(raw.coords + disp, nodes)
            grads[k] = {name: (f_p[name] - funcs[name]) / eps
                        for name in funcs}
    return funcs, grads


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m su2_tpu.tooling.geo <config.cfg>")
        return 1
    cfg = Config(argv[0])
    funcs, grads = run(cfg)
    with open("of_func.dat", "w") as f:
        for name, v in funcs.items():
            f.write(f"{name} = {v:.10e}\n")
            print(f"{name} = {v:.10e}")
    if grads:
        with open("of_grad_geo.dat", "w") as f:
            f.write('VARIABLES="VARIABLE",' +
                    ",".join(f'"{n}"' for n in funcs) + "\n")
            for k, g in grads.items():
                f.write(f"{k}, " + ", ".join(f"{g[n]:.10e}" for n in funcs)
                        + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
