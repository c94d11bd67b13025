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

from su2_tpu.adapt import refine_full
from su2_tpu.config import Config
from su2_tpu.io.mesh import read_su2_mesh, write_su2_mesh


def run(cfg: Config, raw=None):
    raw = raw if raw is not None else read_su2_mesh(
        cfg.resolve(cfg.mesh_filename))
    kind = getattr(cfg, "kind_adapt", "FULL")
    if kind not in ("FULL", "FULL_FLOW"):
        raise NotImplementedError(f"KIND_ADAPT= {kind} (FULL supported)")
    refined, parent, _ = refine_full(raw)
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
