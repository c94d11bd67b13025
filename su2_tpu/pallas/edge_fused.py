"""Fused explicit edge kernel: AUSM + viscous + SST closure in one pass.

The explicit REACTIVE_RANS residual walks the edge list twice (convective
AUSM, viscous avg-gradient with the Stefan-Maxwell solve and SST closures)
plus two more sweeps for the spectral radii.  Built from XLA ops these
chains compile to hundreds of tiny fusions — on the shipped 9k-cell case
the step is fusion-launch bound, not bandwidth bound.  This kernel runs the
whole per-edge pipeline (ops/ausm_t.py + ops/viscous_t.py, feature-major
lanes-as-edges layout) in ONE pallas_call, returning

    flux_total = conv - visc   (nVar, E)  [res = scatter_edges(flux_total)]
    lam_conv   (E,)  inviscid spectral radius  (|v_mean.N| + a_mean)*Area
    lam_visc   (E,)  viscous spectral radius   (SetTime_Step NS branch)

Reference semantics: Upwind_Residual + Viscous_Residual + SetTime_Step
(solver_direct_reactive.cpp:2535, :5305, :5057).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from su2_tpu.ops import ausm_t, viscous_t
from su2_tpu.ops.viscous_t import SpeciesConsts


def _pad_cols(x, npad):
    """Pad trailing edge axis with copies of column 0 (valid data)."""
    extra = npad - x.shape[-1]
    if extra == 0:
        return x
    rep = jnp.broadcast_to(x[..., :1], x.shape[:-1] + (extra,))
    return jnp.concatenate([x, rep], axis=-1)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def fused_edge_flux_pallas(lay, m_infty, prandtl_turb, lewis_turb,
                           prandtl_lam, sc,
                           v_i, v_j, g_i, g_j, normal, evec,
                           mu2, ka2, mut2, tke2, gk_i, gk_j, sigma_k,
                           h_s, cp_s, gamma_i):
    """All edge arrays feature-major with trailing edge axis (module doc).

    sc: viscous_t.SpeciesConsts (tiny static matrices, passed through as
    kernel inputs — pallas kernels may not capture non-scalar constants).
    mu2/ka2/mut2/tke2: (2, E) [node-i row, node-j row]; gamma_i: (1, E).
    g_*: (G*d, E) gradients of [T, u.., X..] flattened row-major (g, d).
    """
    nd, ns, nvar, nprim = lay.ndim, lay.ns, lay.nvar, lay.nprim
    gd = g_i.shape[0]
    ne = v_i.shape[-1]
    tile = 512 if ne >= 512 else max(128, ne)
    npad = -(-ne // tile) * tile
    mm_sum = sc.mm_sum

    ins = [_pad_cols(x, npad) for x in
           (v_i, v_j, g_i, g_j, normal, evec, mu2, ka2, mut2, tke2,
            gk_i, gk_j, sigma_k, h_s, cp_s, gamma_i)] \
        + [sc.mm_col, sc.sm_den]

    def kernel(vi_ref, vj_ref, gi_ref, gj_ref, nm_ref, ev_ref,
               mu_ref, ka_ref, mut_ref, tke_ref, gki_ref, gkj_ref,
               sk_ref, hs_ref, cps_ref, gam_ref, mm_ref, den_ref,
               flux_ref, lc_ref, lv_ref):
        vi = vi_ref[...]
        vj = vj_ref[...]
        nm = nm_ref[...]
        scs = SpeciesConsts(mm_col=mm_ref[...], sm_den=den_ref[...],
                            mm_sum=mm_sum)
        conv = ausm_t.ausm_flux_t(lay, vi, vj, nm, m_infty)
        visc = viscous_t.viscous_flux_t(
            lay, scs, vi, vj,
            gi_ref[...].reshape(gd // nd, nd, tile),
            gj_ref[...].reshape(gd // nd, nd, tile),
            nm, ev_ref[...],
            mu_ref[0], mu_ref[1], ka_ref[0], ka_ref[1],
            mut_ref[0], mut_ref[1], tke_ref[0], tke_ref[1],
            gki_ref[...], gkj_ref[...], sk_ref[0],
            hs_ref[...], cps_ref[...], prandtl_turb, lewis_turb)
        flux_ref[...] = conv - visc

        # spectral radii (ops/timestep.py::max_lambda_inv + ns.viscous_lambda)
        area = jnp.sqrt(jnp.sum(nm * nm, axis=0))
        vel_i = vi[lay.VX:lay.VX + nd]
        vel_j = vj[lay.VX:lay.VX + nd]
        proj = 0.5 * jnp.sum((vel_i + vel_j) * nm, axis=0)
        a_mean = 0.5 * (vi[lay.A] + vj[lay.A])
        lc_ref[0, :] = (jnp.abs(proj) + a_mean) * area

        mean_rho = 0.5 * (vi[lay.PRHO] + vj[lay.PRHO])
        mean_mu = 0.5 * (mu_ref[0] + mu_ref[1])
        mean_mut = 0.5 * (mut_ref[0] + mut_ref[1])
        lam1 = 4.0 / 3.0 * (mean_mu + mean_mut)
        lam2 = (1.0 + (prandtl_lam / prandtl_turb) * (mean_mut / mean_mu)) \
            * (gam_ref[0] * mean_mu / prandtl_lam)
        lv_ref[0, :] = (lam1 + lam2) * area * area / mean_rho

    grid = (npad // tile,)
    interpret = jax.devices()[0].platform != "tpu"
    bs = lambda w: pl.BlockSpec((w, tile), lambda i: (0, i))
    fb = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    flux, lc, lv = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[bs(nprim), bs(nprim), bs(gd), bs(gd), bs(nd), bs(nd),
                  bs(2), bs(2), bs(2), bs(2), bs(nd), bs(nd), bs(1),
                  bs(ns), bs(ns), bs(1), fb(ns, 1), fb(ns, ns)],
        out_specs=[bs(nvar), bs(1), bs(1)],
        out_shape=[
            jax.ShapeDtypeStruct((nvar, npad), v_i.dtype),
            jax.ShapeDtypeStruct((1, npad), v_i.dtype),
            jax.ShapeDtypeStruct((1, npad), v_i.dtype),
        ],
    )(*ins)
    return flux[:, :ne], lc[0, :ne], lv[0, :ne]


def fused_interior_terms(lib, lay, mesh, prm, v, grad, trans, turb,
                         sigma_k_edge, dpdu_e):
    """Gather feature-major edge inputs and run the fused kernel.

    Returns (res_interior (nP, nVar), lam_conv_nodes, lam_visc_nodes) —
    the interior-edge parts of the residual and the two spectral radii
    (boundary-vertex contributions are added by the caller).
    """
    from su2_tpu.chemistry import library as cl

    i, j = mesh.edges[:, 0], mesh.edges[:, 1]
    nd, ns = lay.ndim, lay.ns

    vt = v.T
    v_i, v_j = vt[:, i], vt[:, j]
    ng = 1 + nd + ns
    # gradient rows of the AVGGRAD set [T, u.., X..] (pressure row dropped)
    sel = np.concatenate([np.arange(0, 1 + nd),
                          np.arange(2 + nd, 2 + nd + ns)])
    gsel = grad[:, sel, :].reshape(v.shape[0], ng * nd).T      # (G*d, nP)
    g_i, g_j = gsel[:, i], gsel[:, j]
    normal = mesh.edge_normal.T
    evec = (mesh.coords[j] - mesh.coords[i]).T
    mu2 = jnp.stack([trans.mu[i], trans.mu[j]])
    ka2 = jnp.stack([trans.kappa[i], trans.kappa[j]])
    mut2 = jnp.stack([turb.mu_t[i], turb.mu_t[j]])
    tke2 = jnp.stack([turb.tke[i], turb.tke[j]])
    gk_i, gk_j = turb.grad_tke[i].T, turb.grad_tke[j].T
    sk = sigma_k_edge[None]
    tmean = 0.5 * (v[i, lay.T] + v[j, lay.T])
    h_s = cl.species_enthalpy(lib, tmean).T        # (S, nE) mass-specific
    cp_s = cl.species_cp(lib, tmean).T
    gamma_i = (dpdu_e[i] + 1.0)[None]

    sc = viscous_t.species_consts(np.asarray(lib.mm),
                                  np.asarray(lib.diff_vol), v.dtype)
    flux, lc, lv = fused_edge_flux_pallas(
        lay, prm.m_infty, prm.prandtl_turb, prm.lewis_turb, prm.prandtl_lam,
        sc, v_i, v_j, g_i, g_j, normal, evec, mu2, ka2, mut2, tke2,
        gk_i, gk_j, sk, h_s, cp_s, gamma_i)

    res = mesh.scatter_edges(flux.T)
    lam_c = mesh.sum_edges_abs(lc)
    lam_v = mesh.sum_edges_abs(lv)
    return res, lam_c, lam_v
