"""Fused TOTAL_CONDITIONS inlet temperature solve (pallas).

The subsonic-inlet total-conditions branch (BC_Inlet, reference
solver_direct_reactive.cpp:3226-3489; our euler.inlet_state) roots
f(T) = h_mix(T) + 0.5 vb(T)^2 - h_tot with a masked secant (15 its,
tol 1e-9) + bisection fallback (100 its, tol 1e-6).  As XLA while loops
over a ~100-vertex marker each trip pays a dispatch round (~0.4 ms per
call on the flat plate); in one pallas pass the whole solve is a few
microseconds.

The marker's mass fractions are constants, so the mixture enthalpy
collapses to ONE combined spline table y_mix = sum_s (ys_s/mm_s) h_mol_s
(spline evaluation is linear in the table, so this is exact up to the
f64 precombination — done host-side).  Lookups ride the windowed one-hot
contraction of pallas/node_state.spline_gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from su2_tpu.pallas.node_state import (_CHUNK, _pad_cols, _pad_cols_last,
                                       _split3, spline_gather)

_MODE = False


def set_inlet_tc_mode(on: bool):
    global _MODE
    _MODE = bool(on)


def use_pallas() -> bool:
    return _MODE


def _mix_table(lib, ys, dtype):
    """(4 or 12, nTp) stacked [yl; yc; y2l; y2c] combined-enthalpy table
    and the numpy (y, y2) rows for host-side evaluation."""
    w = np.asarray(ys, np.float64) / np.asarray(lib.mm, np.float64)
    y = (w[:, None] * np.asarray(lib.h_y, np.float64)).sum(0)
    y2 = (w[:, None] * np.asarray(lib.h_y2, np.float64)).sum(0)
    yl = np.concatenate([y[:1], y[:-1]])
    y2l = np.concatenate([y2[:1], y2[:-1]])
    tab = jnp.asarray(np.stack([yl, y, y2l, y2]), dtype)
    nt = tab.shape[1]
    ntp = -(-nt // _CHUNK) * _CHUNK
    if ntp != nt:
        tab = _pad_cols_last(tab, ntp)
    if dtype == jnp.float32:
        tab = _split3(tab)
    return tab, (y, y2)


def _mix_eval_np(lib, y, y2, t: float) -> float:
    """Host-side combined-spline evaluation (GetSpline arithmetic)."""
    t0, h, n = float(lib.t0), float(lib.dt), int(lib.nt)
    tc = min(max(t, t0), t0 + (n - 1) * h)
    klo = min(max(int((tc - t0) / h) + 1, 1), n - 1)
    xk = t0 + klo * h
    a = (xk - tc) / h
    b = (tc - (xk - h)) / h
    return float(a * y[klo - 1] + b * y[klo]
                 + ((a ** 3 - a) * y2[klo - 1] + (b ** 3 - b) * y2[klo])
                 * h * h / 6.0)


@functools.partial(jax.jit, static_argnames=("meta",))
def _solve_call(riemann, gamma, alpha, tab, *, meta):
    (t0g, dtg, nt, rgas, htot, ttot, tmin,
     sec_iters, sec_tol, bis_iters, bis_tol) = meta
    r = riemann.shape[0]
    dtype = riemann.dtype
    tile = max(128, -(-r // 128) * 128)
    ins = [_pad_cols(riemann[None], tile), _pad_cols(gamma[None], tile),
           _pad_cols(alpha[None], tile), tab]
    split = dtype == jnp.float32
    tmax_tab = t0g + (nt - 1) * dtg
    eps4 = 4.0 * float(jnp.finfo(dtype).eps)

    def kernel(rm_ref, ga_ref, al_ref, tab_ref, t_ref):
        rm = rm_ref[0]
        ga = ga_ref[0]
        al = al_ref[0]
        gm1 = ga - 1.0

        def h_mix(t):
            tc = jnp.clip(t, t0g, tmax_tab)
            klo = jnp.clip(((tc - t0g) / dtg).astype(jnp.int32) + 1,
                           1, nt - 1)
            g = spline_gather(tab_ref, 4, klo, ntp=tab_ref.shape[1],
                              split=split, dtype=dtype)
            xk = t0g + klo.astype(dtype) * dtg
            a = (xk - tc) / dtg
            b = (tc - (xk - dtg)) / dtg
            return a * g[0] + b * g[1] \
                + ((a ** 3 - a) * g[2] + (b ** 3 - b) * g[3]) \
                * (dtg * dtg) / 6.0

        def f_of(t):
            cb = jnp.sqrt(ga * rgas * t)
            vb = (rm - 2.0 * cb / gm1) / al
            return h_mix(t) + 0.5 * vb * vb - htot

        def _concrete(x):
            # layout pin (see pallas/node_state.py): loop-carry inits must
            # carry the body yields' concrete layout, not the replicated
            # layout of broadcast constants / reductions
            return jnp.where(rm == rm, x, rm)

        t = _concrete(jnp.full_like(rm, ttot))
        t_old = t + 1.0
        f_old0 = _concrete(f_of(t_old))

        def sec_cond(c):
            it, t, t_old, f_old, done = c
            return (it < sec_iters) & (jnp.min(done) < 0.5)

        def sec_body(c):
            it, t, t_old, f_old, done = c
            dmask = done > 0.5
            fv = f_of(t)
            df = fv - f_old
            safe = jnp.where(df == 0.0, 1.0, df)
            t_new = t - fv * (t - t_old) / safe
            conv = jnp.abs(t_new - t) \
                < jnp.maximum(sec_tol, eps4 * jnp.abs(t_new))
            done_n = jnp.maximum(done, conv.astype(dtype))
            t_n = jnp.where(dmask | conv, t, t_new)
            told_n = jnp.where(dmask, t_old, t)
            fold_n = jnp.where(dmask, f_old, fv)
            return it + 1, t_n, told_n, fold_n, done_n

        _, t_sec, _, _, sdone = jax.lax.while_loop(
            sec_cond, sec_body,
            (jnp.asarray(0, jnp.int32), t, t_old, f_old0,
             _concrete(jnp.zeros_like(t))))
        sec_ok = sdone > 0.5

        ta0 = _concrete(jnp.full_like(t, tmin))
        tb0 = _concrete(jnp.full_like(t, ttot))
        bdone0 = _concrete(jnp.zeros_like(t)
                           + (jnp.min(sdone) > 0.5).astype(dtype))

        def bis_cond(c):
            it, ta, tb, tm, bdone = c
            return (it < bis_iters) & (jnp.min(bdone) < 0.5)

        def bis_body(c):
            it, ta, tb, tm, bdone = c
            bmask = bdone > 0.5
            tmid = 0.5 * (ta + tb)
            fv = f_of(tmid)
            conv = jnp.abs(fv) < bis_tol
            hi = fv > 0.0
            ta_n = jnp.where(bmask | conv, ta, jnp.where(hi, tmid, ta))
            tb_n = jnp.where(bmask | conv, tb, jnp.where(hi, tb, tmid))
            tm_n = jnp.where(bmask, tm, tmid)
            return (it + 1, ta_n, tb_n, tm_n,
                    jnp.maximum(bdone, conv.astype(dtype)))

        _, _, _, tbis, _ = jax.lax.while_loop(
            bis_cond, bis_body,
            (jnp.asarray(0, jnp.int32), ta0, tb0,
             _concrete(0.5 * (ta0 + tb0)), bdone0))
        t_ref[0, :] = jnp.where(sec_ok, t_sec, tbis)

    interpret = jax.devices()[0].platform != "tpu"
    bs = lambda w: pl.BlockSpec((w, tile), lambda: (0, 0))
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        in_specs=[bs(1), bs(1), bs(1),
                  pl.BlockSpec(tab.shape, lambda: (0, 0))],
        out_specs=bs(1),
        out_shape=jax.ShapeDtypeStruct((1, tile), dtype),
    )(*ins)
    return out[0, :r]


def total_conditions_t(lib, ys, ttot, riemann, gamma, alpha,
                       tmin=300.0, sec_iters=15, sec_tol=1.0e-9,
                       bis_iters=100, bis_tol=1.0e-6):
    """Solve the inlet temperature for every marker vertex; returns
    (t_b, rgas, tot_enthalpy) with the scalars as Python floats (the
    marker composition is constant)."""
    dtype = riemann.dtype
    tab, (y, y2) = _mix_table(lib, ys, dtype)
    w = np.asarray(ys, np.float64)
    rgas = float((w * (8.31446215 * 1000.0
                       / np.asarray(lib.mm, np.float64))).sum())
    # match cl.mixture_rgas exactly: it uses lib.ri
    rgas = float((w * np.asarray(lib.ri, np.float64)).sum())
    htot = _mix_eval_np(lib, y, y2, float(ttot))
    meta = (float(lib.t0), float(lib.dt), int(lib.nt), rgas, htot,
            float(ttot), float(tmin), int(sec_iters), float(sec_tol),
            int(bis_iters), float(bis_tol))
    t_b = _solve_call(riemann, gamma, alpha, tab, meta=meta)
    return t_b, rgas, htot
