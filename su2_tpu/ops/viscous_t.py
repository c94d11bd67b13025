"""Feature-major (lanes-as-edges) viscous flux (+ implicit Jacobians).

Same math as ops/viscous.py::viscous_flux (CAvgGradReactive_Flow,
reference: SU2_CFD/src/numerics_direct_reactive.cpp:1425-1684) with every
array transposed to (features, edges): inside a Pallas TPU kernel the
trailing edge axis maps onto vector lanes, and the whole chain — harmonic
transport means, Fuller binary diffusion, corrected mean gradient,
Stefan-Maxwell solve, SST closure — runs as one kernel with every
intermediate in VMEM.  ops/viscous.py stays the XLA-path source of truth;
tests pin the two to agreement.

With s_i/s_j (dT/dU rows) the approximate viscous Jacobians
(SetLaminarViscousProjJacs, :1200-1409 + SST_Reactive_JacobianClosure,
:891-1097) are also returned, feature-major (nVar, nVar, E).  The dV/dU
factor is applied analytically from its sparsity (identity + momentum
rows + the dT/dU energy row) instead of materializing the matrix, so the
block product is O(nVar^2) lane ops.

Pallas kernels may not capture non-scalar constants, so the static species
matrices arrive as a SpeciesConsts bundle of (tiny) array inputs; masks and
identities are built in-kernel from broadcasted_iota.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from su2_tpu.state import Layout

TWO3 = 2.0 / 3.0


@dataclass(frozen=True)
class SpeciesConsts:
    """Static per-species constant arrays fed to the fused kernel.

    mm_col:  (S, 1) molar masses
    sm_den:  (S, S) Fuller denominator Mij*(vi^(1/3)+vj^(1/3))^2
    mm_sum:  float  sum of molar masses (static)
    """
    mm_col: jax.Array
    sm_den: jax.Array
    mm_sum: float


jax.tree_util.register_dataclass(
    SpeciesConsts, data_fields=["mm_col", "sm_den"], meta_fields=["mm_sum"])


def species_consts(mm: np.ndarray, diff_vol: np.ndarray,
                   dtype) -> SpeciesConsts:
    mm = np.asarray(mm, dtype=np.float64)
    dv = np.asarray(diff_vol, dtype=np.float64)
    mij = np.sqrt(mm[:, None] * mm[None, :] / (mm[:, None] + mm[None, :]))
    cbr = np.cbrt(dv)
    den = mij * (cbr[:, None] + cbr[None, :]) ** 2
    return SpeciesConsts(
        mm_col=jnp.asarray(mm[:, None], dtype=dtype),
        sm_den=jnp.asarray(den, dtype=dtype),
        mm_sum=float(mm.sum()))


def _eye(n, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(dtype)


def gauss_solve_t(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pivot-free Gauss-Jordan for trailing-batch layout.

    a: (n, n, E); b: (n, k, E).  Returns (n, k, E).  Mirrors
    linalg.smallsolve.gauss_solve(pivot=False) (same operation order) so
    results agree with the edge-major path to rounding.
    """
    n = a.shape[0]
    aug = jnp.concatenate([a, b], axis=1)          # (n, n+k, E)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    for col in range(n):
        pivval = aug[col, col][None]                # (1, E)
        safe = jnp.where(pivval == 0.0, 1.0, pivval)
        prow = aug[col] / safe                      # (n+k, E)
        factors = aug[:, col][:, None]              # (n, 1, E)
        # single select (no .at[].set: scatter has no Mosaic lowering)
        aug = jnp.where(rows == col, prow[None], aug - factors * prow[None])
    return aug[:, n:]


def _clip_ys_t(ys):
    """clip_mass_fractions ((S, E)): only negatives are floored
    (SetMassFractions, reacting_model_library.cpp:70-75)."""
    return jnp.where(ys < 0.0, 1.0e-30, ys)


def _molar_from_mass_t(mm_col, ys):
    ysc = _clip_ys_t(ys)
    xs = ysc / mm_col
    return xs * (ysc.sum(0, keepdims=True) / xs.sum(0, keepdims=True))


def _stefan_maxwell_gamma_g(mm_col, rho, xs, ys, g, den):
    """GetGamma (reacting_model_library.cpp:771-798), (S, S, E).

    Exploits the separable Fuller form dij[a, b] = g / den[a, b] (g the
    per-edge harmonic-mean T^1.75/P factor, den the static pair matrix):
    every 1/dij becomes one multiply against a small static matrix, so no
    (S, S, E) pow/divide tensors are ever materialized."""
    s = mm_col.shape[0]
    eye = _eye(s, xs.dtype)
    sigma = ys.sum(0)
    mtot = 1.0 / (ys / mm_col).sum(0)
    prefg = sigma * mtot / (rho * g)                    # pref / g, (E,)
    mm_row = jnp.swapaxes(mm_col, 0, 1)                 # (1, S)
    k1 = den / mm_row * (1.0 - eye)                     # (S, S), tiny
    a_mat = den * (1.0 - eye)
    # middle-axis reductions on 3D arrays crash the Mosaic compiler —
    # unroll the tiny species axis into 2D row ops
    sum_terms = sum(a_mat[:, k][:, None] * xs[k][None] for k in range(s))
    diag = prefg[None] * sum_terms / mm_col
    off = -(prefg[None] * xs)[:, None, :] * k1[:, :, None]
    return off + eye[:, :, None] * diag[:, None, :]


def _molar2mass_solve_t(mm_col, mm_sum, ys, xs, b):
    """Solve M gy = b for the Get_Molar2MassGrad_Operator M
    (numerics_direct_reactive.cpp:855-880) without materializing it.

    M decomposes exactly as D + u 1^T + w z^T with
      D    = diag(mm_sum * sigma / mm),  sigma = sum_k xs_k,
      u    = mm_sum * ys / mm,   w = -mm_sum * xs,   z = 1 / mm,
    (the off-diagonal entry mtot*(ys_s/mm_s - xs_s/mm_k) and the diagonal
    mtot/mm_s*(ys_s - xs_s + sigma) both follow), so Woodbury with the
    rank-2 factor gives an O(S) solve per edge instead of the O(S^3)
    Gauss-Jordan:  M^-1 b = Dinv b - Dinv U (I2 + V^T Dinv U)^-1 V^T Dinv b
    with U = [u w], V = [1 z].

    b: (S, R, E) stacked right-hand sides; returns (S, R, E)."""
    s = mm_col.shape[0]
    sigma = xs.sum(0)                                   # (E,)
    dinv = mm_col / (mm_sum * sigma)[None]              # (S, E)
    u = mm_sum * ys / mm_col
    w = -mm_sum * xs
    zc = 1.0 / mm_col                                   # (S, 1)

    du = dinv * u                                       # (S, E)
    dw = dinv * w
    # 2x2 Gram matrix G = I + V^T Dinv U  (V columns: ones, z)
    g11 = 1.0 + sum(du[k] for k in range(s))
    g12 = sum(dw[k] for k in range(s))
    g21 = sum(zc[k, 0] * du[k] for k in range(s))
    g22 = 1.0 + sum(zc[k, 0] * dw[k] for k in range(s))
    det = g11 * g22 - g12 * g21
    det = jnp.where(det == 0.0, 1.0, det)

    nrhs = b.shape[1]
    cols = []
    for r in range(nrhs):
        db = dinv * b[:, r]                             # (S, E)
        c1 = sum(db[k] for k in range(s))               # 1^T Dinv b
        c2 = sum(zc[k, 0] * db[k] for k in range(s))    # z^T Dinv b
        a1 = (g22 * c1 - g12 * c2) / det
        a2 = (g11 * c2 - g21 * c1) / det
        cols.append((db - du * a1[None] - dw * a2[None])[:, None])
    return jnp.concatenate(cols, axis=1)


def viscous_flux_t(lay: Layout, sc: SpeciesConsts,
                   v_i, v_j, g_i, g_j, normal, evec,
                   mu_i, mu_j, ka_i, ka_j,
                   mu_t_i, mu_t_j, tke_i, tke_j, gk_i, gk_j, sigma_k,
                   h_s, cp_s,
                   prandtl_turb: float, lewis_turb: float,
                   s_i=None, s_j=None):
    """Projected viscous flux, corrected interior variant with SST closure.

    All arrays feature-major with trailing edge axis E:
      v_*: (nPrim, E) primitives; g_*: (1+nd+ns, d, E) gradients of the
      AVGGRAD set [T, u.., X..] (pressure row already dropped);
      normal: (d, E) area normal; evec: (d, E) = coord_j - coord_i;
      mu/ka/mu_t/tke: (E,); gk_*: (d, E) TKE gradients; sigma_k: (E,);
      h_s/cp_s: (S, E) species mass-specific enthalpy/cp at Tmean.
      s_*: (nVar, E) dT/dU rows — when given the approximate viscous
      Jacobians are also returned ((nVar, nVar, E) each).

    Returns flux (nVar, E) with the reference's Proj_Flux_Tensor sign
    (caller subtracts at node i, adds at j) [, jac_i, jac_j].
    """
    nd, ns = lay.ndim, lay.ns
    mm_col = sc.mm_col

    def harm(a, b):
        return 2.0 / (1.0 / a + 1.0 / b)

    mu = harm(mu_i, mu_j)
    ktr = harm(ka_i, ka_j)

    # Fuller Dij per side from node T, P (node_transport: P in atm, cm^2/s
    # -> m^2/s), harmonic face mean.  The Fuller form is separable,
    # dij[a, b] = f(T, P) / den[a, b], and harm(f_i/den, f_j/den) ==
    # harm(f_i, f_j)/den, so only the per-edge scalar g is ever built.
    def f_of(vrow):
        return 1.0e-7 * vrow[lay.T] ** 1.75 \
            / (vrow[lay.P] / 101325.0)

    g_fuller = harm(f_of(v_i), f_of(v_j))                      # (E,)

    vmean = 0.5 * (v_i + v_j)
    rho = vmean[lay.PRHO]
    ys = vmean[lay.YS:lay.YS + ns]
    ysc = _clip_ys_t(ys)
    xs = _molar_from_mass_t(mm_col, ys)

    gmean = 0.5 * (g_i + g_j)                                  # (G, d, E)

    # edge-projection correction (CAvgGradReactive_Flow, :1507-1527);
    # zero-length guard: family-padded edge slots carry evec = 0 and their
    # zero area normal already nulls every flux term
    dist2 = jnp.maximum(jnp.sum(evec * evec, axis=0),
                        1e-300 if v_i.dtype == jnp.float64 else 1e-30)
    xs_i = _molar_from_mass_t(mm_col, v_i[lay.YS:lay.YS + ns])
    xs_j = _molar_from_mass_t(mm_col, v_j[lay.YS:lay.YS + ns])
    diff = jnp.concatenate([
        (v_j[lay.T] - v_i[lay.T])[None],
        v_j[lay.VX:lay.VX + nd] - v_i[lay.VX:lay.VX + nd],
        xs_j - xs_i], axis=0)                                  # (G, E)
    proj = sum(gmean[:, d] * evec[d][None] for d in range(nd))
    gmean = gmean - ((proj - diff) / dist2[None])[:, None, :] * evec[None]

    g_t = gmean[0]                                             # (d, E)
    g_vel = gmean[1:1 + nd]                                    # (nd, d, E)
    g_xs = gmean[1 + nd:]                                      # (ns, d, E)

    div_vel = sum(g_vel[d, d] for d in range(nd))
    eye_d = _eye(nd, v_i.dtype)
    tau = mu[None, None] * (g_vel + jnp.swapaxes(g_vel, 0, 1)) \
        - (TWO3 * mu * div_vel)[None, None] * eye_d[:, :, None]

    vel = vmean[lay.VX:lay.VX + nd]

    # Stefan-Maxwell diffusion flux from the normal-projected X gradient
    grad_xs_norm = sum(g_xs[:, d] * normal[d][None] for d in range(nd))
    den = sc.sm_den
    gamma = _stefan_maxwell_gamma_g(mm_col, rho, xs, ysc, g_fuller, den)
    den_min = den[0, 0]
    for a_ in range(ns):
        for b_ in range(ns):
            if a_ or b_:
                den_min = jnp.minimum(den_min, den[a_, b_])
    # dij_max = g / den_min
    alpha = den_min / (rho * g_fuller)
    gt = gamma + (alpha * ysc)[:, None, :]
    jd = gauss_solve_t(gt, -grad_xs_norm[:, None, :])[:, 0, :]   # (S, E)
    def _rowsum(x):
        # (S, E) -> (E,) without reduce_sum (axis-0 reduces inside the fused
        # kernel crash the Mosaic compiler in some contexts)
        return sum(x[k] for k in range(x.shape[0]))

    e_heat = -_rowsum(h_s * jd)

    mom = jnp.concatenate(
        [sum(tau[i_, j_] * normal[i_] for i_ in range(nd))[None]
         for j_ in range(nd)], axis=0)
    e_tau = sum(tau[i_, j_] * vel[j_] * normal[i_]
                for i_ in range(nd) for j_ in range(nd))
    e_cond = ktr * sum(g_t[d] * normal[d] for d in range(nd))

    # ---- SST closure (SST_Reactive_ResidualClosure, :656-889) ----
    mu_t = harm(mu_t_i, mu_t_j)
    tke = 0.5 * (tke_i + tke_j)
    g_k = 0.5 * (gk_i + gk_j)
    tau_t = mu_t[None, None] * (g_vel + jnp.swapaxes(g_vel, 0, 1)) \
        - (TWO3 * (mu_t * div_vel + tke * rho))[None, None] * eye_d[:, :, None]
    mom = mom + jnp.concatenate(
        [sum(tau_t[i_, j_] * normal[i_] for i_ in range(nd))[None]
         for j_ in range(nd)], axis=0)
    e_tau = e_tau + sum(tau_t[i_, j_] * vel[j_] * normal[i_]
                        for i_ in range(nd) for j_ in range(nd))
    gy = _molar2mass_solve_t(mm_col, sc.mm_sum, ysc, xs, g_xs)  # (S, d, E)
    gy = jnp.where(jnp.abs(g_xs) < 1e-8, 0.0, gy)
    cmt = mu_t / (prandtl_turb * lewis_turb)
    gy_n = sum(gy[:, d] * normal[d][None] for d in range(nd))   # (S, E)
    e_heat = e_heat + cmt * _rowsum(h_s * ysc * gy_n)
    e_cond = e_cond + (mu_t / prandtl_turb) * _rowsum(cp_s * ysc) \
        * sum(g_t[d] * normal[d] for d in range(nd))
    e_cond = e_cond + (mu + mu_t / sigma_k) * sum(
        g_k[d] * normal[d] for d in range(nd))

    # assemble rows in the U layout [rho, rho u.., rho E, rho_s..] by
    # concatenation (.at[].set on integer rows lowers to scatter, which has
    # no Mosaic lowering)
    flux = jnp.concatenate([
        (-_rowsum(jd))[None], mom, (e_tau + e_cond + e_heat)[None],
        -jd + cmt[None] * gy_n], axis=0)
    if s_i is None:
        return flux

    # ------------------------------------------------ approximate Jacobians
    area = jnp.sqrt(jnp.sum(normal * normal, axis=0))
    area_s = jnp.maximum(area, 1e-300 if v_i.dtype == jnp.float64 else 1e-30)
    unit = normal / area_s
    dist = jnp.sqrt(dist2)
    grad_xs_n_unit = grad_xs_norm / area_s[None]
    # per-side mean effective diffusion (reference :556-575) from the
    # separable Fuller form: ds = f_side*(1-xs) / sum_{k!=s} den[s,k]*xs_k
    eye_s = _eye(ns, v_i.dtype)
    dmask = sc.sm_den * (1.0 - eye_s)

    def eff_ds(xs_side, f_side):
        q = sum(dmask[:, k][:, None] * xs_side[k][None] for k in range(ns))
        ds_side = f_side[None] * (1.0 - xs_side) / jnp.where(q == 0.0, 1.0, q)
        return jnp.where((q == 0.0) | ~jnp.isfinite(ds_side), 0.0, ds_side)

    ds = 0.5 * (eff_ds(xs_i, f_of(v_i)) + eff_ds(xs_j, f_of(v_j)))

    jac_i, jac_j = _viscous_jacobians_t(
        lay, sc, v_i, v_j, vmean, mu, ktr, ds, xs, xs_i, xs_j,
        grad_xs_n_unit, jd, dist, area, unit, s_i, s_j, flux,
        mu_t, gy, cmt, ysc, h_s, cp_s, prandtl_turb, lewis_turb)
    return flux, jac_i, jac_j


def _viscous_jacobians_t(lay, sc, v_i, v_j, vmean, mu, ktr, ds, xs,
                         xs_i, xs_j, grad_xs_norm, jd, dist, area, unit,
                         s_i, s_j, flux, mu_t, gy, cmt, ys, h_s, cp_s,
                         prandtl_turb, lewis_turb):
    """Feature-major dF/dV . dV/dU (SetLaminarViscousProjJacs, reference
    numerics_direct_reactive.cpp:1200-1409 + SST_Reactive_JacobianClosure
    :891-1097) — same math as ops/viscous._viscous_jacobians with the
    (nVar, nVar) block held as a dict of (E,) lane rows and the sparse
    dV/dU applied analytically."""
    nd, ns, nvar = lay.ndim, lay.ns, lay.nvar
    mm_col = sc.mm_col

    def _rowsum(x):
        return sum(x[k] for k in range(x.shape[0]))

    tot_mass = _rowsum(mm_col * xs)
    tot_mass_i = _rowsum(mm_col * xs_i)
    tot_mass_j = _rowsum(mm_col * xs_j)
    sigma_i = _rowsum(xs_i)
    sigma_j = _rowsum(xs_j)
    rho = vmean[lay.PRHO]
    rho_i = v_i[lay.PRHO]
    rho_j = v_j[lay.PRHO]

    # ---- dJ/dr species blocks (reference :1260-1293), list-of-rows form --
    mds = mm_col * ds                                        # (S, E)

    def djdr(xs_side, tot_side, sigma_side, rho_side, sgn):
        c = rho / (tot_mass * dist * sigma_side * rho_side)
        t12 = -mds * xs_side * c[None] \
            + ys * (_rowsum(mds * xs_side) * c)[None]        # (S, E) row s
        ck = rho * tot_side * sigma_side / (dist * tot_mass * rho_side)
        t3_col = ds * ck[None]                               # (S, E) col k
        extra = (0.5 * rho / (tot_mass * rho_side)) \
            * _rowsum(mds * grad_xs_norm)
        rows = []
        for s_ in range(ns):
            row = [sgn * (t12[s_] + ys[s_] * t3_col[k]) for k in range(ns)]
            row[s_] = row[s_] + sgn * (-ds[s_] * ck) + extra
            rows.append(row)
        return rows                                          # [s][k] (E,)

    djdr_j = djdr(xs_j, tot_mass_j, sigma_j, rho_j, 1.0)
    djdr_i = djdr(xs_i, tot_mass_i, sigma_i, rho_i, -1.0)

    # ---- dF/dV as sparse dicts of (E,) lanes ------------------------------
    # thin-shear tensor M = theta I + n (x) n / 3 (2D :912-918, 3D
    # :981-995: diag theta + n_d^2/3, off-diag n_d n_e / 3), pi = M u
    theta = sum(unit[d] * unit[d] for d in range(nd))        # == 1
    mrows = [[(theta + unit[d] * unit[d] / 3.0) if d == e
              else unit[d] * unit[e] / 3.0 for e in range(nd)]
             for d in range(nd)]
    pi = [sum(vmean[lay.VX + e] * mrows[d][e] for e in range(nd))
          for d in range(nd)]
    coef = mu / dist * area

    def emp():
        return [[None] * nvar for _ in range(nvar)]

    def dadd(m, a, b, val):
        m[a][b] = val if m[a][b] is None else m[a][b] + val

    dfdv_j = emp()
    for d in range(nd):
        for e in range(nd):
            dadd(dfdv_j, lay.RHOVX + d, lay.RHOVX + e, coef * mrows[d][e])
        dadd(dfdv_j, lay.RHOE, lay.RHOVX + d, coef * pi[d])
    dadd(dfdv_j, lay.RHOE, lay.RHOE, ktr * theta / dist * area)
    dfdv_i = emp()
    for a in range(nvar):
        for b in range(nvar):
            if dfdv_j[a][b] is not None:
                dfdv_i[a][b] = -dfdv_j[a][b]

    # shared Cp-weighted Jd term on the energy diagonal
    jd_cp = -0.5 * _rowsum(jd * cp_s)
    dadd(dfdv_i, lay.RHOE, lay.RHOE, jd_cp)
    dadd(dfdv_j, lay.RHOE, lay.RHOE, jd_cp)

    # species / density / energy rows from dJ/dr (col 0 zero in the ref)
    for side, dj in ((dfdv_j, djdr_j), (dfdv_i, djdr_i)):
        for k in range(ns):
            col_rho = None
            col_e = None
            for s_ in range(ns):
                val = -dj[s_][k] * area
                side[lay.RHOS + s_][lay.RHOS + k] = val
                col_rho = val if col_rho is None else col_rho + val
                he = val * h_s[s_]
                col_e = he if col_e is None else col_e + he
            dadd(side, lay.RHO, lay.RHOS + k, col_rho)
            dadd(side, lay.RHOE, lay.RHOS + k, col_e)

    # ---- SST closure Jacobian (2D :911-983, 3D :996-1090) -----------------
    coef_t = mu_t / dist * area
    add = emp()
    for d in range(nd):
        for e in range(nd):
            dadd(add, lay.RHOVX + d, lay.RHOVX + e, coef_t * mrows[d][e])
        dadd(add, lay.RHOE, lay.RHOVX + d, coef_t * pi[d])
    cpy = _rowsum(cp_s * ys)
    dadd(add, lay.RHOE, lay.RHOE,
         mu_t / prandtl_turb * cpy * theta / dist * area)
    ce = cmt / dist * area * theta
    if nd == 2:
        for k in range(ns):
            # dfdv_j += add (with the rho_j energy/species entry);
            # dfdv_i -= sub (same block, rho_i entry)
            dadd(dfdv_j, lay.RHOE, lay.RHOS + k, ce * h_s[k] * ys[k] / rho_j)
            dadd(dfdv_i, lay.RHOE, lay.RHOS + k, -ce * h_s[k] * ys[k] / rho_i)
    else:
        # the reference's 3D SST closure differs from its 2D branch
        # (SST_Reactive_JacobianClosure :983-1075): the species-species
        # mass-closure diagonal is ACTIVE (2D comments it out, :957-966)
        # and the energy-species term drops the Ys factor (:1067)
        ss_c = mu_t / (prandtl_turb * lewis_turb) / dist * area * theta
        for k in range(ns):
            dadd(dfdv_j, lay.RHOE, lay.RHOS + k, ce * h_s[k] / rho_j)
            dadd(dfdv_i, lay.RHOE, lay.RHOS + k, -ce * h_s[k] / rho_i)
            dadd(dfdv_j, lay.RHOS + k, lay.RHOS + k, ss_c * ys[k] / rho_j)
            dadd(dfdv_i, lay.RHOS + k, lay.RHOS + k, -ss_c * ys[k] / rho_i)
    for a in range(nvar):
        for b in range(nvar):
            if add[a][b] is not None:
                dadd(dfdv_j, a, b, add[a][b])
                dadd(dfdv_i, a, b, -add[a][b])
    # common energy-diagonal term with mass gradients
    aux = [sum(gy[s_, d] * unit[d] for d in range(nd)) for s_ in range(ns)]
    com = cmt * sum(cp_s[s_] * ys[s_] * aux[s_] for s_ in range(ns)) * area
    dadd(dfdv_i, lay.RHOE, lay.RHOE, com)
    dadd(dfdv_j, lay.RHOE, lay.RHOE, com)

    # common flux-dependent term on the energy/velocity entries
    for d in range(nd):
        hm = 0.5 * flux[lay.RHOVX + d]
        dadd(dfdv_i, lay.RHOE, lay.RHOVX + d, hm)
        dadd(dfdv_j, lay.RHOE, lay.RHOVX + d, hm)

    # ---- apply the sparse dV/dU analytically ------------------------------
    #   dV/dU rows: RHO -> e_RHO; RHOVX+d -> (-u_d/rho) e_RHO + (1/rho) e_d;
    #   RHOE -> s (dT/dU row); RHOS+s -> e_s.
    def apply_dvdu(dfdv, vrow, srow):
        rho_l = vrow[lay.PRHO]
        zero = jnp.zeros_like(rho_l)
        rows = []
        for a in range(nvar):
            g = dfdv[a]
            ge = g[lay.RHOE]
            col_rho = g[lay.RHO] if g[lay.RHO] is not None else None
            for d in range(nd):
                gv = g[lay.RHOVX + d]
                if gv is not None:
                    term = -gv * vrow[lay.VX + d] / rho_l
                    col_rho = term if col_rho is None else col_rho + term
            if ge is not None:
                term = ge * srow[lay.RHO]
                col_rho = term if col_rho is None else col_rho + term
            cols = [col_rho if col_rho is not None else zero]
            for d in range(nd):
                gv = g[lay.RHOVX + d]
                cv = gv / rho_l if gv is not None else None
                if ge is not None:
                    term = ge * srow[lay.RHOVX + d]
                    cv = term if cv is None else cv + term
                cols.append(cv if cv is not None else zero)
            cols.append(ge * srow[lay.RHOE] if ge is not None else zero)
            for s_ in range(ns):
                gs = g[lay.RHOS + s_]
                cs = gs if gs is not None else None
                if ge is not None:
                    term = ge * srow[lay.RHOS + s_]
                    cs = term if cs is None else cs + term
                cols.append(cs if cs is not None else zero)
            rows.append(jnp.stack(cols, axis=0))
        return jnp.stack(rows, axis=0)                       # (nvar, nvar, E)

    jac_i = apply_dvdu(dfdv_i, v_i, s_i)
    jac_j = apply_dvdu(dfdv_j, v_j, s_j)
    return jac_i, jac_j
