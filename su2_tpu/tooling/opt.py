"""Shape-optimization driver (SU2_PY shape_optimization.py equivalent).

Usage: python -m su2_tpu.tooling.opt <config.cfg> [max_iter]

Pipeline per design iteration (reference: SU2_PY/SU2/opt/scipy_tools.py +
SU2/eval/functions.py / gradients.py):
  1. deform the baseline mesh with the current DV vector (spring analogy),
  2. converge the primal flow (Simulation),
  3. evaluate OBJECTIVE_FUNCTION over MARKER_MONITORING,
  4. discrete adjoint -> mesh sensitivity -> project onto the DVs,
then hand (J, dJ/dalpha) to scipy.optimize SLSQP.

Unlike the reference's file-and-subprocess orchestration, everything runs
in-process: the mesh sensitivity comes from jax.vjp (adjoint.py), and the
DV projection includes the volume-deformation chain through the same
spring-deform operator used to move the mesh (the reference projects only
surface displacement; including the volume chain is the exact gradient of
this pipeline).
"""

from __future__ import annotations

import sys

import numpy as np

from su2_tpu import adjoint as adj
from su2_tpu import deform
from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.geometry.mesh_data import mesh_arrays
from su2_tpu.io.mesh import read_su2_mesh
from su2_tpu.tooling.adj import OBJ_MAP


class ShapeProblem:
    def __init__(self, cfg: Config, raw=None, n_primal: int | None = None):
        self.cfg = cfg
        self.raw0 = raw if raw is not None else read_su2_mesh(
            cfg.resolve(cfg.mesh_filename))
        self.grid0 = build_dual_grid(self.raw0)
        self.mesh0 = mesh_arrays(self.grid0)
        self.dvs, self.tags = deform.parse_dv_options(cfg)
        self.n_primal = n_primal if n_primal is not None else cfg.ext_iter
        self.which = OBJ_MAP.get(cfg.objective_function, "CD")
        self.mon = tuple(cfg.marker_monitoring) or tuple(self.grid0.bnd_nodes)
        self.history = []

    # -- geometry chain -------------------------------------------------
    def _unit_fields(self):
        """dx_surf/dalpha_k for each DV (surface only)."""
        fields = []
        boxes = deform.build_ffd_boxes(self.cfg, self.raw0.ndim)
        for dv in self.dvs:
            disp = np.zeros_like(self.raw0.coords)
            for tag in self.tags:
                nodes = np.asarray(self.grid0.bnd_nodes[tag])
                disp += deform.surface_displacement(
                    self.raw0.coords, nodes, [dict(dv, value=1.0)],
                    ffd_boxes=boxes, ffd_scale=self.cfg.ffd_scale)
            fields.append(disp)
        return fields

    def coords_of(self, alpha):
        surf = np.zeros_like(self.raw0.coords)
        for a, f in zip(alpha, self._unit_fields()):
            surf += a * f
        return np.asarray(deform.deform_coords(
            self.mesh0, surf, n_iter=self.cfg.deform_linear_iter))

    # -- function + gradient --------------------------------------------
    def evaluate(self, alpha):
        import copy

        coords = self.coords_of(np.asarray(alpha))
        raw = copy.deepcopy(self.raw0)
        raw.coords[:] = coords
        sim = Simulation(self.cfg, raw_mesh=raw)
        out = sim.run(self.n_primal, quiet=True)
        u_star, t_star = out[0], out[1]
        res = adj.adjoint_sensitivity(sim, u_star, t_star, tags=self.mon,
                                      which=self.which)
        sens = np.asarray(res["sensitivity"])
        # project through the full deform chain: dx/dalpha = spring(unit_surf)
        grads = []
        for f in self._unit_fields():
            chain = np.asarray(deform.deform_coords(self.mesh0, f,
                                                    n_iter=200)) \
                - np.asarray(self.mesh0.coords)
            grads.append(float((chain * sens).sum()))
        self.history.append((list(map(float, alpha)), res["J"]))
        return res["J"], np.asarray(grads)


def optimize(cfg: Config, max_iter: int = 5, raw=None,
             n_primal: int | None = None):
    from scipy import optimize as sopt

    prob = ShapeProblem(cfg, raw=raw, n_primal=n_primal)
    x0 = np.asarray([dv["value"] for dv in prob.dvs])
    cache = {}

    def fun(x):
        key = tuple(np.round(x, 14))
        if key not in cache:
            cache[key] = prob.evaluate(x)
        return cache[key][0]

    def jac(x):
        key = tuple(np.round(x, 14))
        if key not in cache:
            cache[key] = prob.evaluate(x)
        return cache[key][1]

    res = sopt.minimize(fun, x0, jac=jac, method="SLSQP",
                        options={"maxiter": max_iter, "ftol": 1e-12})
    return res, prob.history


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m su2_tpu.tooling.opt <config.cfg> [max_iter]")
        return 1
    cfg = Config(argv[0])
    max_iter = int(argv[1]) if len(argv) > 1 else 5
    res, hist = optimize(cfg, max_iter)
    print("optimization history:")
    for alpha, j in hist:
        print("  ", alpha, "->", j)
    print("final:", res.x, res.fun)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
