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


def _read_restart_col(path: str, col: int, n: int):
    """Column `col` (0-based, after the coordinate block) of a reference-
    layout restart: rows are (id, x, y, [z], field...)."""
    import numpy as np
    out = np.zeros(n)
    with open(path) as f:
        header = f.readline()
        ndim = 3 if '"z"' in header else 2
        for ln in f:
            toks = ln.split()
            if toks and toks[0].lstrip("-").isdigit():
                out[int(toks[0])] = float(toks[1 + ndim + col])
    return out


def _node_sensor(cfg, raw, field):
    """|grad field| * Vol^power per node -> per-element max sensor."""
    import numpy as np
    import jax.numpy as jnp
    from su2_tpu.geometry.dual_grid import build_dual_grid
    from su2_tpu.geometry.mesh_data import mesh_arrays
    from su2_tpu.precision import enable_x64
    enable_x64()
    mesh = mesh_arrays(build_dual_grid(raw), jnp.float64)
    sens = gradient_sensor(mesh, field)
    return np.where(raw.elem_nodes >= 0,
                    sens[np.maximum(raw.elem_nodes, 0)],
                    -np.inf).max(axis=1)


def _top_mask(elem_sens, frac_percent, nelem):
    import numpy as np
    frac = max(float(frac_percent), 0.0) / 100.0
    nsel = min(max(1, int(frac * nelem)), nelem)
    thresh = np.partition(elem_sens, -nsel)[-nsel]
    return elem_sens >= thresh


def run(cfg: Config, raw=None):
    raw = raw if raw is not None else read_su2_mesh(
        cfg.resolve(cfg.mesh_filename))
    kind = getattr(cfg, "kind_adapt", "FULL")
    new_elems = float(getattr(cfg, "new_elems", 15.0))
    if kind in ("FULL", "FULL_FLOW"):
        refined, parent, _ = refine_full(raw)
    elif kind == "GRAD_FLOW":
        # density-gradient sensor on the restart solution; tag the top
        # NEW_ELEMS percent of elements (SetIndicator_Flow,
        # grid_adaptation_structure.cpp:3196-3256)
        rho = _read_restart_col(cfg.resolve(cfg.solution_flow_filename),
                                0, raw.npoint)
        refined, parent, _ = refine_adaptive(
            raw, _top_mask(_node_sensor(cfg, raw, rho), new_elems,
                           raw.nelem))
    elif kind == "GRAD_ADJOINT":
        # same sensor on psi_rho of the adjoint restart (SetIndicator_Adj,
        # grid_adaptation_structure.cpp:3261-3326: GG gradient of
        # AdjVar_Sol[...][0] with dual-area scaling); the volume adjoint
        # file is written by tooling/adj.py
        psi = _read_restart_col(cfg.resolve(cfg.solution_adj_filename),
                                0, raw.npoint)
        refined, parent, _ = refine_adaptive(
            raw, _top_mask(_node_sensor(cfg, raw, psi), new_elems,
                           raw.nelem))
    elif kind == "GRAD_FLOW_ADJ":
        # half the refinement budget by the flow sensor, half by the
        # adjoint sensor, union of the tags (SetIndicator_FlowAdj,
        # grid_adaptation_structure.cpp:3328-3406: max_elem_new_flow =
        # max_elem_new_adj = 0.5 * NEW_ELEMS)
        rho = _read_restart_col(cfg.resolve(cfg.solution_flow_filename),
                                0, raw.npoint)
        psi = _read_restart_col(cfg.resolve(cfg.solution_adj_filename),
                                0, raw.npoint)
        mask = (_top_mask(_node_sensor(cfg, raw, rho), 0.5 * new_elems,
                          raw.nelem)
                | _top_mask(_node_sensor(cfg, raw, psi), 0.5 * new_elems,
                            raw.nelem))
        refined, parent, _ = refine_adaptive(raw, mask)
    else:
        raise NotImplementedError(
            f"KIND_ADAPT= {kind} (FULL / FULL_FLOW / GRAD_FLOW / "
            "GRAD_ADJOINT / GRAD_FLOW_ADJ supported)")
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
