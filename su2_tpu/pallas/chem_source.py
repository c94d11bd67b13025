"""Fused per-node chemistry source kernel (Arrhenius + Keq + PaSR).

One pallas pass computes the species production rates
omega_i = sum_r [k_r] omega_{i,r} for every cell — the XLA chain
(chemistry.library: reaction_rates -> omega_tensor -> dfr_drho ->
pasr_constants -> mass_production, reference
Common/src/Framework/reacting_model_library.cpp:99-227 and :835-920)
lowered to ~40 small fusions plus per-node spline-table gathers that
dominated the source section of the coupled step.

Reactions and species are static and tiny (R ~ 2, S ~ 9), so every
reaction/species loop unrolls; the only table access is the per-reaction
ln Kc / ln Kp lookup (library.build_library tables), done with the same
chunk-skipped one-hot contraction as pallas/node_state.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from su2_tpu.chemistry.library import (R_UNGAS, _KEQ_COMPLETE, _Y_FLOOR,
                                       _Y_JAC_GUARD, _Y_RATE_GUARD)
from su2_tpu.pallas.node_state import (_CHUNK, _pad_cols, _pad_cols_last,
                                       _split3, spline_gather)

_MODE = False


def set_chem_source_mode(on: bool):
    global _MODE
    _MODE = bool(on)


def use_pallas() -> bool:
    return _MODE


def _lnk_tables(lib, dtype):
    """(8R', nTp) stacked [yl; yc; y2l; y2c] for lnkc followed by lnkp,
    knot axis chunk-padded; bf16 3-level split for f32."""
    def stack4(y, y2):
        y_prev = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
        y2_prev = jnp.concatenate([y2[:, :1], y2[:, :-1]], axis=1)
        return [y_prev, y, y2_prev, y2]
    tabs = stack4(lib.lnkc_y, lib.lnkc_y2) + stack4(lib.lnkp_y, lib.lnkp_y2)
    tab = jnp.concatenate(tabs, axis=0).astype(dtype)
    nt = tab.shape[1]
    ntp = -(-nt // _CHUNK) * _CHUNK
    if ntp != nt:
        tab = _pad_cols_last(tab, ntp)
    if dtype == jnp.float32:
        tab = _split3(tab)
    return tab


@functools.partial(jax.jit, static_argnames=("meta",))
def _chem_source_call(t_in, rho_in, ys_in, omt_in, tab, *, meta):
    """t/rho/omt: (N,); ys: (S, N).  Returns omega (S, N).

    meta: (t0, dt, nt, S, R, c_mu, pasr_lb, pasr_on, consts) with consts a
    tuple of static per-reaction/species numbers (see chem_source)."""
    (t0, dtg, nt, ns, nr, c_mu, pasr_lb, pasr_on, consts) = meta
    (mm, arr_a, arr_beta, arr_ta, has_b, arr_a_b, arr_beta_b, arr_ta_b,
     rev, exp_f, exp_b, dcoeff, participates) = consts
    n = t_in.shape[0]
    dtype = t_in.dtype
    tile = 512 if n >= 512 else max(128, n)
    npad = -(-n // tile) * tile
    ins = [_pad_cols(t_in[None], npad), _pad_cols(rho_in[None], npad),
           _pad_cols(ys_in, npad), _pad_cols(omt_in[None], npad), tab]
    split = dtype == jnp.float32
    tmax_tab = t0 + (nt - 1) * dtg

    def kernel(t_ref, rho_ref, ys_ref, omt_ref, tab_ref, om_ref):
        t = t_ref[0]
        rho = rho_ref[0]
        ys = ys_ref[...]
        ysc = jnp.where(ys < 0.0, _Y_FLOOR, ys)

        # ---- ln Kc / ln Kp lookup (windowed one-hot, node_state.spline_gather)
        nrows = 8 * nr
        tc = jnp.clip(t, t0, tmax_tab)
        klo = jnp.clip(((tc - t0) / dtg).astype(jnp.int32) + 1, 1, nt - 1)
        g = spline_gather(tab_ref, nrows, klo, ntp=tab_ref.shape[1],
                          split=split, dtype=dtype)
        xk = t0 + klo.astype(dtype) * dtg
        a = (xk - tc) / dtg
        b = (tc - (xk - dtg)) / dtg
        cub = lambda yl, yc, y2l, y2c: a * yl + b * yc \
            + ((a ** 3 - a) * y2l + (b ** 3 - b) * y2c) * (dtg * dtg) / 6.0
        ln_kc = [cub(g[r], g[nr + r], g[2 * nr + r], g[3 * nr + r])
                 for r in range(nr)]
        ln_kp = [cub(g[4 * nr + r], g[5 * nr + r], g[6 * nr + r],
                     g[7 * nr + r]) for r in range(nr)]

        # ---- rates (SetReactionRates / ComputeRateConstants) ----
        logt = jnp.log(t)
        logcs = [jnp.log(1.0e3 * rho * ysc[s] / mm[s]) for s in range(ns)]
        om = [jnp.zeros_like(t) for _ in range(ns)]
        omt = omt_ref[0]
        inv_tau_mix = c_mu * omt
        for r in range(nr):
            kf = arr_a[r] * jnp.exp(arr_beta[r] * logt - arr_ta[r] / t)
            kc_g = jnp.exp(ln_kc[r])
            kp = jnp.exp(ln_kp[r])
            if has_b[r] > 0.5:
                kb = arr_a_b[r] * jnp.exp(arr_beta_b[r] * logt
                                          - arr_ta_b[r] / t)
            else:
                kb = jnp.where((rev[r] > 0.5) & (kp <= _KEQ_COMPLETE),
                               kf / kc_g, 0.0)

            def prodpow(exps):
                acc = jnp.zeros_like(t)
                guard = jnp.zeros_like(t, dtype=jnp.bool_)
                for s in range(ns):
                    e = float(exps[r][s])
                    if e != 0.0:
                        acc = acc + e * logcs[s]
                        if e < 0.0:
                            guard = guard | (ysc[s] < _Y_RATE_GUARD)
                return jnp.where(guard, 0.0, jnp.exp(acc))

            rf = kf * prodpow(exp_f)
            rb = kb * prodpow(exp_b)
            net = rf - rb

            if pasr_on:
                # tau_c,r = 1/max_j |Dfr_j M_j| (GetTimeCombustion_r)
                highest = jnp.zeros_like(t)
                for s in range(ns):
                    if participates[s][r]:
                        num = rf * float(exp_f[r][s]) - rb * float(exp_b[r][s])
                        guard = ysc[s] > _Y_JAC_GUARD
                        dfr = jnp.where(
                            guard, num / jnp.where(guard, rho * ysc[s], 1.0),
                            0.0)
                        highest = jnp.maximum(highest, jnp.abs(dfr * mm[s]))
                # k = tau_c/(tau_c+tau_mix) = 1/(1 + highest/(C_mu w))
                k_r = 1.0 / (1.0 + highest / inv_tau_mix)
                k_r = jnp.where(highest <= 0.0, 1.0,
                                jnp.maximum(k_r, pasr_lb))
                net = net * k_r

            for s in range(ns):
                d = float(dcoeff[s][r])
                if d != 0.0:
                    om[s] = om[s] + (1.0e-3 * mm[s] * d) * net

        for s in range(ns):
            om_ref[s, :] = om[s]

    grid = (npad // tile,)
    interpret = jax.devices()[0].platform != "tpu"
    bs = lambda w: pl.BlockSpec((w, tile), lambda i: (0, i))
    fb = lambda x: pl.BlockSpec(x.shape, lambda i: (0, 0))
    om = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[bs(1), bs(1), bs(ns), bs(1), fb(tab)],
        out_specs=bs(ns),
        out_shape=jax.ShapeDtypeStruct((ns, npad), dtype),
    )(*ins)
    return om[:, :n]


def chem_source(lib, prm, t, rho, ys, omega_turb=None):
    """omega (N, S) for the explicit chemistry source — pallas path.

    Mirrors cl.reaction_rates + omega_tensor + [dfr_drho + pasr_constants]
    + mass_production; PaSR active when prm.pasr and omega_turb given."""
    dtype = t.dtype
    nr = lib.nreactions
    ns = lib.nspecies
    tab = _lnk_tables(lib, dtype)
    pasr_on = bool(prm.pasr and omega_turb is not None)
    f = lambda x: tuple(float(v) for v in np.asarray(x))
    f2 = lambda x: tuple(tuple(float(v) for v in row)
                         for row in np.asarray(x))
    stoich_r = np.asarray(lib.stoich_r)
    stoich_p = np.asarray(lib.stoich_p)
    participates = tuple(
        tuple(bool((stoich_r[s, r] != 0.0) or (stoich_p[s, r] != 0.0))
              for r in range(nr)) for s in range(ns))
    consts = (f(lib.mm), f(lib.arr_a), f(lib.arr_beta), f(lib.arr_ta),
              f(lib.has_backward), f(lib.arr_a_b), f(lib.arr_beta_b),
              f(lib.arr_ta_b), f(lib.reversible), f2(lib.exp_f),
              f2(lib.exp_b), f2(stoich_p - stoich_r), participates)
    meta = (float(lib.t0), float(lib.dt), int(lib.nt), ns, nr,
            float(prm.c_mu), float(prm.pasr_lb), pasr_on, consts)
    omt = omega_turb if pasr_on else jnp.zeros_like(t)
    from su2_tpu.pallas.context import pallas_shards
    nsh = pallas_shards()
    if nsh > 1:
        # multi-chip: pointwise over cells — per-shard kernel under
        # shard_map, zero communication (round-5 verdict item 1)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from su2_tpu.parallel.tiled_shard import cells_axis_mesh
        lane, vec, rep = P(None, "cells"), P("cells"), P()
        f = lambda *a: _chem_source_call(*a, meta=meta)
        om = shard_map(f, mesh=cells_axis_mesh(nsh),
                       in_specs=(vec, vec, lane, vec, rep),
                       out_specs=lane, check_vma=False)(
                           t, rho, ys.T, omt, tab)
    else:
        om = _chem_source_call(t, rho, ys.T, omt, tab, meta=meta)
    return om.T
