"""SU2_MSH equivalent: mesh adaptation.

Usage: python -m su2_tpu.tooling.msh <config.cfg>
KIND_ADAPT= FULL (uniform conforming h-refinement) writes
MESH_OUT_FILENAME (reference: SU2_MSH/src/SU2_MSH.cpp + CGridAdaptation).

The reference's other SU2_MSH job — periodic ghost-layer setup — has no
file-level counterpart here: MARKER_PERIODIC is consumed directly at solver
setup by dual-CV merging (geometry/periodic.py), so no intermediate mesh is
needed.
"""

from __future__ import annotations

import sys

from su2_tpu.adapt import gradient_sensor, refine_adaptive, refine_full
from su2_tpu.config import Config
from su2_tpu.io.mesh import read_su2_mesh, write_su2_mesh


def run(cfg: Config, raw=None):
    raw = raw if raw is not None else read_su2_mesh(
        cfg.resolve(cfg.mesh_filename))
    kind = getattr(cfg, "kind_adapt", "FULL")
    if kind in ("FULL", "FULL_FLOW"):
        refined, parent, _ = refine_full(raw)
    elif kind == "GRAD_FLOW":
        # density-gradient sensor on the restart solution; tag the top
        # NEW_ELEMS percent of elements (SetIndicator_Flow,
        # grid_adaptation_structure.cpp:3196-3256)
        import numpy as np
        import jax.numpy as jnp
        from su2_tpu.geometry.dual_grid import build_dual_grid
        from su2_tpu.geometry.mesh_data import mesh_arrays
        from su2_tpu.precision import enable_x64
        enable_x64()
        mesh = mesh_arrays(build_dual_grid(raw), jnp.float64)
        # density column of the restart (id, x, y, [z], rho, ...)
        rows = []
        with open(cfg.resolve(cfg.solution_flow_filename)) as f:
            f.readline()
            for ln in f:
                toks = ln.split()
                if toks and toks[0].lstrip("-").isdigit():
                    rows.append((int(toks[0]), float(toks[1 + raw.ndim])))
        rho = np.zeros(raw.npoint)
        for i, r in rows:
            rho[i] = r
        sens = gradient_sensor(mesh, rho)
        # max over each element's REAL nodes (pad slots masked)
        elem_sens = np.where(raw.elem_nodes >= 0,
                             sens[np.maximum(raw.elem_nodes, 0)],
                             -np.inf).max(axis=1)
        frac = max(float(getattr(cfg, "new_elems", 15.0)), 0.0) / 100.0
        nsel = min(max(1, int(frac * raw.nelem)), raw.nelem)
        thresh = np.partition(elem_sens, -nsel)[-nsel]
        refined, parent, _ = refine_adaptive(raw, elem_sens >= thresh)
    else:
        raise NotImplementedError(
            f"KIND_ADAPT= {kind} (FULL / FULL_FLOW / GRAD_FLOW supported)")
    write_su2_mesh(refined, cfg.mesh_out_filename)
    return refined, parent


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m su2_tpu.tooling.msh <config.cfg>")
        return 1
    cfg = Config(argv[0])
    refined, _ = run(cfg)
    print(f"adapted mesh: {refined.npoint} points, {refined.nelem} elements "
          f"-> {cfg.mesh_out_filename}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
