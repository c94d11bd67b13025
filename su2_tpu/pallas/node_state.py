"""Fused per-node state kernel: Cons2Prim + dT/dU + dP/dU + Wilke transport.

One pallas pass over node tiles replaces the hottest per-node chains of the
coupled step (each run TWICE per outer iteration):

  - Cons2PrimVar with the secant temperature solve and the 32-round
    bisection fallback (reference: variable_direct_reactive.cpp:325-561;
    tolerances :385-390).  Built from XLA ops the fallback costs ~5 ms per
    trigger on the 9k-cell case because every round re-evaluates the
    mixture-enthalpy spline over all cells; in-kernel the spline tables are
    VMEM-resident, rounds are per-tile, and tiles whose cells all converged
    by secant skip the fallback entirely.
  - dT/dU and dP/dU analytics (CalcdTdU/CalcdPdU, :786-849).
  - Wilke viscosity / Wasilewska conductivity mixing
    (ComputeEta/ComputeLambda, reacting_model_library.cpp:634-696).
  - mole fractions X_i for the NS gradient set (SetMolarFromMass, :84-93).

Spline lookups use the one-hot MXU contraction of pallas/thermo.py.  Two
stacked tables ride in VMEM: b_h (4S, nT) = [yl; yc; y2l; y2c] of the
enthalpy splines (the secant/bisection inner evaluation), and b_all
(16S, nT) = [yl(h,cp,mu,ka); yc(..); y2l(..); y2c(..)] so the
final-temperature evaluation of all four families is one matmul.

Everything is feature-major (features on sublanes, nodes on lanes) like the
fused edge kernel.  Masks are f32 (Mosaic cannot carry bool vectors through
scf.while), and 3D (S,S,tile) reductions are unrolled over the middle axis
(Mosaic limitation, see ops/viscous_t.py).  The jnp fallback path is the
existing state.py / library.py chain, so numerics agree across backends to
f32 rounding; interpret-mode parity is pinned in tests/test_node_state.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

EPS = 1e-16          # state.py EPS
_Y_FLOOR = 1.0e-30


def _stack4(y, y2):
    """(S, nT) tables -> ([yl], [yc], [y2l], [y2c]) each (S, nT)."""
    y_prev = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
    y2_prev = jnp.concatenate([y2[:, :1], y2[:, :-1]], axis=1)
    return y_prev, y, y2_prev, y2


def _split3(x):
    """f32 (R, n) -> (3R, n) bf16 levels with t1+t2+t3 == x to f32 ulp.

    A one-hot contraction against the three levels (one DEFAULT-precision
    bf16 MXU pass) then recovers the exact f32 table value — replacing the
    HIGHEST-precision f32 dot (6 passes) that dominated the lookup."""
    x = x.astype(jnp.float32)
    t1 = x.astype(jnp.bfloat16)
    r1 = x - t1.astype(jnp.float32)
    t2 = r1.astype(jnp.bfloat16)
    r2 = r1 - t2.astype(jnp.float32)
    t3 = r2.astype(jnp.bfloat16)
    return jnp.concatenate([t1, t2, t3], axis=0)


def _tables(lib, dtype, lite=False):
    """(b_h (4S, nTp), b_all (16S, nTp)) stacked spline tables, with the
    knot axis padded to a multiple of the 128-lane chunk (padding repeats
    the last knot; never selected — klo is clipped to nt-1).

    lite: b_all carries only the [cp, mu] families (8S rows) — the reduced
    turb-phase call needs neither h (only dT/dU, dP/dU read it) nor kappa.

    For f32 states the tables ride as 3-level bf16 splits (see _split3),
    tripling the row count."""
    fams = [_stack4(lib.h_y, lib.h_y2), _stack4(lib.cp_y, lib.cp_y2),
            _stack4(lib.mu_y, lib.mu_y2), _stack4(lib.ka_y, lib.ka_y2)]
    b_h = jnp.concatenate(fams[0], axis=0).astype(dtype)
    use = [fams[1], fams[2]] if lite else fams
    b_all = jnp.concatenate(
        [use[f][k] for k in range(4) for f in range(len(use))], axis=0
    ).astype(dtype)
    nt = b_h.shape[1]
    ntp = -(-nt // _CHUNK) * _CHUNK
    if ntp != nt:
        b_h = _pad_cols_last(b_h, ntp)
        b_all = _pad_cols_last(b_all, ntp)
    if dtype == jnp.float32:
        b_h = _split3(b_h)
        b_all = _split3(b_all)
    return b_h, b_all


_CHUNK = 128
# round-5 sweep (scripts/bench_node_state.py at 565k): 1024x128 runs the
# kernel 14% faster than the old 512x256 (5.06 -> 4.35 ms/call), with
# sumT bitwise-identical (one-hot selection is exact for any window that
# covers the knot); WIN=64 and TILE>=2048 plateau at the same rate
_WIN = 128
# node-tile width (lanes) per grid step; module-level so benchmarks can
# sweep it
_TILE = 1024


def spline_gather(tab_ref, nrows, klo, *, ntp, split, dtype):
    """One-hot MXU gather of spline-table rows at knot indices klo (tile,)
    — or a TUPLE of index vectors, contracted together in one dot and
    returned lane-concatenated (nrows, sum(tiles)).

    tab_ref: (R', ntp) stacked table ref (R' = nrows for f64, 3*nrows for
    f32 bf16 3-level splits — see _split3).  Returns (nrows, tile).

    The hot path slices one 128-aligned _WIN-wide window covering the whole
    tile's knot range (tile temperatures are spatially coherent) and does a
    single one-hot contraction against it; tiles spanning more than the
    window (ignition fronts) fall back to one full-table dot.  This replaces
    the per-128-chunk lax.cond skip loop, which paid ~10 branch overheads
    per lookup."""
    klos = klo if isinstance(klo, tuple) else (klo,)
    kmin = jnp.min(klos[0])
    kmax = jnp.max(klos[0])
    for k in klos[1:]:
        kmin = jnp.minimum(kmin, jnp.min(k))
        kmax = jnp.maximum(kmax, jnp.max(k))

    def _onehot(base, wn, odt):
        # 2-D lane-concat of the per-vector one-hots (Mosaic has no 1-D
        # concat; lanes offsets are 128-aligned for the 512-wide tiles)
        ohs = []
        for k in klos:
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (wn, k.shape[0]), 0) + base
            ohs.append((rows == k[None, :]).astype(odt))
        return ohs[0] if len(ohs) == 1 else jnp.concatenate(ohs, axis=1)

    def contract(win, base):
        if split:
            ohc = _onehot(base, win.shape[1], jnp.bfloat16)
            # DEFAULT, not the session-wide HIGHEST: bf16 inputs with an
            # fp32 contract precision are rejected by Mosaic (and need no
            # pass splitting)
            r3 = jnp.dot(win, ohc, preferred_element_type=dtype,
                         precision=jax.lax.Precision.DEFAULT)
            return r3[:nrows] + r3[nrows:2 * nrows] + r3[2 * nrows:]
        ohc = _onehot(base, win.shape[1], dtype)
        # HIGHEST: exact selection (Mosaic supports only DEFAULT and
        # HIGHEST dot precisions; DEFAULT would round f64 tables to bf16)
        return jnp.dot(win, ohc, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)

    if ntp <= _WIN:
        return contract(tab_ref[...], 0)

    # keep *_CHUNK as the outermost op so Mosaic can prove 128-alignment
    kbase = jnp.minimum(kmin // _CHUNK, (ntp - _WIN) // _CHUNK) * _CHUNK
    covered = kmax < kbase + _WIN

    def win_path(_):
        return contract(tab_ref[:, pl.ds(kbase, _WIN)], kbase)

    def full_path(_):
        return contract(tab_ref[...], 0)

    return jax.lax.cond(covered, win_path, full_path, 0)


def _pad_cols_last(x, npad):
    extra = npad - x.shape[-1]
    rep = jnp.broadcast_to(x[..., -1:], x.shape[:-1] + (extra,))
    return jnp.concatenate([x, rep], axis=-1)


def _pad_cols(x, npad):
    extra = npad - x.shape[-1]
    if extra == 0:
        return x
    rep = jnp.broadcast_to(x[..., :1], x.shape[:-1] + (extra,))
    return jnp.concatenate([x, rep], axis=-1)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def cons2prim_fused(lay, tp, nt_meta, lite, u_t, t_guess, tke, b_h, b_all,
                    mm, ri, b_wilke):
    """u_t: (nVar, N) feature-major conserved state; t_guess, tke: (N,).

    tp: state.TSolveParams (static).  nt_meta: (t0, dt, nT) static.
    b_h/b_all: stacked spline tables (see module doc); mm, ri: (S, 1);
    b_wilke: (2S, 3S) stacked Wilke contraction blocks — see node_state.

    lite (static): the reduced turb-phase variant — the second call per
    outer iteration only feeds the turbulence system (driver.py), which
    reads v, X_s, mu and dP/dU's RHOE entry (= gamma-1).  Skips dT/dU,
    dP/dU, the h table family and the Wasilewska kappa mixing, and returns
    (uclip_t, v_t, nonphys, gm1, mu, xs_t) instead.

    The secant constants c1 = (-rhoE + rho k + rho|v|^2/2)/(rho R) and
    c2 = 1/R plus the enthalpy weights w_h = Y_s/M_s ride in as dedicated
    kernel inputs: Mosaic mis-relayouts values sliced out of the 2-D state
    block when they flow through scf.while loop carries, so everything the
    T-solve loops touch must originate from its own (row-0) input ref.

    Returns feature-major (uclip_t, v_t, nonphys, dtdu_t, dpdu_t, mu,
    kappa, xs_t); nonphys/mu/kappa are (1, N)-squeezed to (N,).
    """
    t0, dtg, nt = nt_meta
    nd, ns, nvar, nprim = lay.ndim, lay.ns, lay.nvar, lay.nprim
    n = u_t.shape[-1]
    dtype = u_t.dtype
    tile = _TILE if n >= _TILE else max(128, n)
    npad = -(-n // tile) * tile

    # ---- XLA pre-pass: exactly the cons2prim head (state.py:183-204) ----
    rho_s0 = u_t[lay.RHOS:lay.RHOS + ns]
    rho_s0 = jnp.where(rho_s0 < 0.0, _Y_FLOOR, rho_s0)
    rho0 = jnp.maximum(u_t[lay.RHO], EPS)
    ys0 = rho_s0 / rho0[None, :]
    vel0 = u_t[lay.RHOVX:lay.RHOVX + nd] / rho0[None, :]
    sqvel0 = jnp.sum(vel0 * vel0, axis=0)
    rho_e0 = u_t[lay.RHOE] - rho0 * tke
    rgas0 = jnp.sum(jnp.asarray(ri)[:, 0][:, None] * ys0, axis=0)
    c1_in = (-rho_e0 + 0.5 * rho0 * sqvel0) / (rho0 * rgas0)
    c2_in = 1.0 / rgas0
    wh_in = ys0 * (1.0 / jnp.asarray(mm))        # (S, N) enthalpy weights

    ins = [_pad_cols(u_t, npad), _pad_cols(t_guess[None], npad),
           _pad_cols(tke[None], npad), _pad_cols(c1_in[None], npad),
           _pad_cols(c2_in[None], npad), _pad_cols(wh_in, npad),
           b_h, b_all, mm, ri, b_wilke]

    def kernel(u_ref, tg_ref, tke_ref, c1_ref, c2_ref, wh_ref,
               bh_ref, ba_ref, mm_ref, ri_ref, bw_ref, *outs):
        if lite:
            uc_ref, v_ref, np_ref, gm1_ref, mu_ref, xs_ref = outs
        else:
            (uc_ref, v_ref, np_ref, dt_ref, dp_ref, mu_ref, ka_ref,
             xs_ref) = outs
        u = u_ref[...]
        mmc = mm_ref[...]                     # (S, 1)
        # reciprocal once per tile: the (S, tile) divides by the constant
        # molar masses (cp_s, h_sp, yom, xs) become multiplies — TPU VPU
        # divides are multi-cycle and this kernel is VPU-bound
        mminv = 1.0 / mmc
        ric = ri_ref[...]

        rho_s = u[lay.RHOS:lay.RHOS + ns]
        nonphys = jnp.max((rho_s < 0.0).astype(dtype), axis=0)
        rho_s = jnp.where(rho_s < 0.0, _Y_FLOOR, rho_s)
        rho = u[lay.RHO]
        nonphys = jnp.maximum(nonphys, (rho < EPS).astype(dtype))
        rho = jnp.maximum(rho, EPS)
        rhoinv = 1.0 / rho
        ys = rho_s * rhoinv[None, :]
        nonphys = jnp.maximum(
            nonphys, (jnp.abs(jnp.sum(ys, axis=0) - 1.0) > 0.1).astype(dtype))
        vel = u[lay.RHOVX:lay.RHOVX + nd] * rhoinv[None, :]
        sqvel = jnp.sum(vel * vel, axis=0)
        rgas = jnp.sum(ric * ys, axis=0)

        tmax_tab = t0 + (nt - 1) * dtg

        split = dtype == jnp.float32

        def _cubic(g, nrows, tc, klo):
            s4 = nrows // 4
            xk = t0 + klo.astype(dtype) * dtg
            a = ((xk - tc) / dtg)[None, :]
            b = ((tc - (xk - dtg)) / dtg)[None, :]
            yl, yc = g[:s4], g[s4:2 * s4]
            y2l, y2c = g[2 * s4:3 * s4], g[3 * s4:]
            return a * yl + b * yc \
                + ((a ** 3 - a) * y2l + (b ** 3 - b) * y2c) * (dtg * dtg) / 6.0

        def _klo(t):
            tc = jnp.clip(t, t0, tmax_tab)
            return tc, jnp.clip(((tc - t0) / dtg).astype(jnp.int32) + 1,
                                1, nt - 1)

        def lookup(tab_ref, nrows, t):
            """One-hot spline eval; tab rows grouped [yl; yc; y2l; y2c] with
            nrows//4 species rows per group.  Returns (nrows//4, tile).
            See spline_gather for the windowed one-hot contraction."""
            tc, klo = _klo(t)
            g = spline_gather(tab_ref, nrows, klo, ntp=tab_ref.shape[1],
                              split=split, dtype=dtype)
            return _cubic(g, nrows, tc, klo)

        def lookup_pair(tab_ref, nrows, t_a, t_b):
            """Spline eval at TWO temperature vectors with ONE contraction.

            The one-hot gather is per-column independent, so stacking both
            klo sets into a (2*tile)-lane contraction returns values
            bit-equal to two separate lookups at ~1.3x the cost of one —
            used for the secant's initial (h(tg), h(tg+1)) pair."""
            tc_a, klo_a = _klo(t_a)
            tc_b, klo_b = _klo(t_b)
            g = spline_gather(tab_ref, nrows, (klo_a, klo_b),
                              ntp=tab_ref.shape[1], split=split, dtype=dtype)
            w = t_a.shape[0]
            return (_cubic(g[:, :w], nrows, tc_a, klo_a),
                    _cubic(g[:, w:], nrows, tc_b, klo_b))

        wh = wh_ref[...]                            # (S, tile) Y_s/M_s

        def h_mix2(t2):
            """(1, tile) -> (1, tile).  All loop-carried per-cell scalars
            stay 2-D and originate from input refs (see docstring)."""
            h_mol = lookup(bh_ref, 4 * ns, t2[0])   # (S, tile) molar
            return jnp.sum(wh * h_mol, axis=0, keepdims=True)

        # ---- temperature solve: secant then bisection fallback
        #      (solve_temperature, state.py; ref :398-502).  Fixed-trip
        #      fori loops with per-cell masking — converged cells are
        #      frozen, so results are identical to the early-exit while
        #      formulation (Mosaic cannot legalize the scf.while chains
        #      this kernel would need: sequential whiles mis-relayout). ----
        c12 = c1_ref[...]
        c22 = c2_ref[...]
        tg = tg_ref[...]                            # (1, tile)
        t_old0 = tg + 1.0
        # dtype-aware tolerance floor (see state.solve_temperature): the
        # reference's 1e-6 K is unreachable in f32 and would force the
        # bisection fallback on every tile
        eps4 = 4.0 * float(jnp.finfo(dtype).eps)

        def _concrete(x):
            """Bit-exact layout pin: reduction outputs carry a replicated
            sublane layout; loop-carry inits must match the body yields'
            concrete layout (Mosaic can only relayout replicated->concrete,
            and unifies toward the init)."""
            return jnp.where(tg == tg, x, tg)

        def sec_cond(c):
            # tile-level early exit: steady-state tiles converge in 2-3
            # rounds; each skipped round saves an h_mix2 spline lookup
            it, t, t_old, h_old, sdone = c
            return (it < tp.secant_iters) & (jnp.min(sdone) < 0.5)

        def sec_body(c):
            it, t, t_old, h_old, sdone = c
            dmask = sdone > 0.5
            f = t - c12 - c22 * h_mix2(t)
            f_old = t_old - c12 - c22 * h_old
            df = f - f_old
            safe_df = jnp.where(df == 0.0, 1.0, df)
            t_new = t - f * (t - t_old) / safe_df
            t_new = jnp.where(df == 0.0, t, t_new)
            # bound the iterate (see state.solve_temperature): keeps the
            # spline cubic finite in f32 for blown-up cells
            t_new = jnp.clip(t_new, -1.0e8, 1.0e8)
            conv_s = jnp.abs(t_new - t) \
                < jnp.maximum(tp.secant_tol, eps4 * jnp.abs(t_new))
            sdone_n = jnp.maximum(sdone, conv_s.astype(dtype))
            t_n = jnp.where(dmask | conv_s, t, t_new)
            told_n = jnp.where(dmask, t_old, t)
            h_n = jnp.where(dmask, h_old, (t - c12 - f) / c22)
            return it + 1, t_n, told_n, h_n, sdone_n

        # Round 0 is peeled out of the while loop so its two enthalpy
        # evaluations — h(tg) and h(tg+1) — ride ONE pair contraction
        # (lookup_pair) instead of two separate spline gathers.  The
        # arithmetic below is sec_body verbatim at (t=tg, t_old=tg+1,
        # sdone=0), so every iterate is bit-equal to the unpeeled loop;
        # warm-started steady-state tiles converge here and skip the loop
        # entirely (1 fused lookup per call instead of 2).
        assert tp.secant_iters >= 1
        h00_raw, h_old0_raw = lookup_pair(bh_ref, 4 * ns, tg[0], t_old0[0])
        h00 = jnp.sum(wh * h00_raw, axis=0, keepdims=True)
        h_old0 = _concrete(jnp.sum(wh * h_old0_raw, axis=0, keepdims=True))
        f0 = tg - c12 - c22 * h00
        f_old0 = t_old0 - c12 - c22 * h_old0
        df0 = f0 - f_old0
        safe_df0 = jnp.where(df0 == 0.0, 1.0, df0)
        t_new0 = tg - f0 * (tg - t_old0) / safe_df0
        t_new0 = jnp.where(df0 == 0.0, tg, t_new0)
        t_new0 = jnp.clip(t_new0, -1.0e8, 1.0e8)
        conv0 = jnp.abs(t_new0 - tg) \
            < jnp.maximum(tp.secant_tol, eps4 * jnp.abs(t_new0))
        sdone1 = _concrete(conv0.astype(dtype))
        t1 = _concrete(jnp.where(conv0, tg, t_new0))
        h1 = _concrete((tg - c12 - f0) / c22)

        _, t_sec2, _, _, sec_done2 = jax.lax.while_loop(
            sec_cond, sec_body,
            (jnp.asarray(1, jnp.int32), t1, _concrete(tg), h1, sdone1))
        sec_ok = sec_done2[0] > 0.5

        ta0 = jnp.full_like(tg, tp.tmin)
        tb0 = jnp.full_like(tg, tp.tmax)
        # skip all bisection work when the whole tile converged by secant
        # (masking makes the rounds no-ops for converged cells either way)
        bdone0 = _concrete(jnp.zeros_like(tg)
                           + (jnp.min(sec_done2) > 0.5).astype(dtype))

        def bis_cond(c):
            it, ta, tb, tbis, bdone = c
            return (it < tp.bisect_iters) & (jnp.min(bdone) < 0.5)

        def bis_body(c):
            it, ta, tb, tbis, bdone = c
            bmask = bdone > 0.5
            tm = 0.5 * (ta + tb)
            fb = tm - c12 - c22 * h_mix2(tm)
            conv_b = (jnp.abs(fb) < tp.bisect_tol) \
                | ((tb - ta) < eps4 * jnp.abs(tm))
            frozen = bmask | conv_b
            go_low = fb > 0.0
            ta_n = jnp.where(frozen, ta, jnp.where(go_low, tm, ta))
            tb_n = jnp.where(frozen, tb, jnp.where(go_low, tb, tm))
            tbis_n = jnp.where(bmask, tbis, tm)
            return (it + 1, ta_n, tb_n, tbis_n,
                    jnp.maximum(bdone, conv_b.astype(dtype)))

        _, _, _, tbis2, _ = jax.lax.while_loop(
            bis_cond, bis_body,
            (jnp.asarray(0, jnp.int32), _concrete(ta0), _concrete(tb0),
             _concrete(0.5 * (ta0 + tb0)), bdone0))
        t = jnp.where(sec_ok, t_sec2[0], tbis2[0])

        # ---- primitives (cons2prim, state.py:208-237) ----
        nonphys = jnp.maximum(
            nonphys, ((t < tp.tmin) | (t > tp.tmax)).astype(dtype))
        t = jnp.clip(t, tp.tmin, tp.tmax)
        press = rho * rgas * t
        nonphys = jnp.maximum(nonphys, (press < EPS).astype(dtype))
        press = jnp.maximum(press, EPS)

        # one matmul for h/cp/mu/kappa at the final T ([cp, mu] only in the
        # lite variant — h feeds only dT/dU-dP/dU, kappa only Wasilewska)
        if lite:
            allq = lookup(ba_ref, 8 * ns, t)          # (2S, tile) molar rows
            cp_mol = allq[:ns]
            mu_s = allq[ns:]
            h_mol = ka_s = None
        else:
            allq = lookup(ba_ref, 16 * ns, t)         # (4S, tile) molar rows
            h_mol = allq[:ns]
            cp_mol = allq[ns:2 * ns]
            mu_s = allq[2 * ns:3 * ns]
            ka_s = allq[3 * ns:]

        cp_s = cp_mol * mminv                     # specific, matches /lib.mm
        cp_mix = jnp.sum(ys * cp_s, axis=0)
        gamma = cp_mix / (cp_mix - rgas)
        sound = jnp.sqrt(gamma * press / rho)
        nonphys = jnp.maximum(nonphys, (sound < EPS).astype(dtype))
        sound = jnp.maximum(sound, EPS)
        htot = (u[lay.RHOE] + press) / rho

        v_ref[lay.T, :] = t
        v_ref[lay.VX:lay.VX + nd, :] = vel
        v_ref[lay.P, :] = press
        v_ref[lay.PRHO, :] = rho
        v_ref[lay.H, :] = htot
        v_ref[lay.A, :] = sound
        v_ref[lay.YS:lay.YS + ns, :] = ys

        uc_ref[...] = u
        uc_ref[lay.RHOS:lay.RHOS + ns, :] = rho_s
        uc_ref[lay.RHO, :] = rho
        np_ref[0, :] = nonphys

        # ---- dT/dU, dP/dU (state.py:254-291); lite: only the RHOE entry
        #      of dP/dU (= gamma-1) survives to the turb system ----
        gm1 = gamma - 1.0
        if lite:
            gm1_ref[0, :] = gm1
        else:
            h_sp = h_mol * mminv
            e_s = h_sp - ric * t[None, :]
            cv = cp_mix - rgas
            rho_cv = rho * cv
            dt_ref[lay.RHO, :] = 0.5 * sqvel / rho_cv
            dt_ref[lay.RHOVX:lay.RHOVX + nd, :] = -vel / rho_cv[None, :]
            dt_ref[lay.RHOE, :] = 1.0 / rho_cv
            dt_ref[lay.RHOS:lay.RHOS + ns, :] = -e_s / rho_cv[None, :]

            dp_ref[lay.RHO, :] = gm1 * 0.5 * sqvel
            dp_ref[lay.RHOVX:lay.RHOVX + nd, :] = (1.0 - gamma)[None, :] * vel
            dp_ref[lay.RHOE, :] = gm1
            dp_ref[lay.RHOS:lay.RHOS + ns, :] = ric * t[None, :] \
                - gm1[None, :] * e_s

        # ---- Wilke mu / Wasilewska kappa (library.py:284-318) as ONE MXU
        #      contraction.  The pair polynomial expands exactly:
        #        (1 + (r_i/r_k) cm_ik)^2 cX_ik =
        #          cX_ik + r_i * (2 cX cm)_ik / r_k + r_i^2 (cX cm^2)_ik / r_k^2
        #      so each phi is three (S,S) contractions of [yom; yom/r;
        #      yom/r^2] recombined with per-row r_i weights.  b_wilke is the
        #      (6S, 3S) block-diagonal stack of those matrices (built in
        #      node_state) — one MXU dot replaces the O(S^2) elementwise
        #      loop (~7% of the kernel at 9 species) ----
        yom = ys * mminv                           # (S, tile)
        r = jnp.sqrt(mu_s)
        rinv = 1.0 / r
        w1 = yom * rinv
        w = jnp.concatenate([yom, w1, w1 * rinv], axis=0)   # (3S, tile)
        phis = jnp.dot(bw_ref[...], w, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)
        r2 = r * r
        phi_mu = phis[:ns] + r * phis[ns:2 * ns] + r2 * phis[2 * ns:3 * ns]
        mu_ref[0, :] = jnp.sum(mu_s * yom / phi_mu, axis=0)
        if not lite:
            phi_ka = phis[3 * ns:4 * ns] + r * phis[4 * ns:5 * ns] \
                + r2 * phis[5 * ns:]
            ka_ref[0, :] = jnp.sum(ka_s * yom / phi_ka, axis=0)

        # ---- mole fractions (molar_from_mass, library.py); ys/M is the
        #      Wilke yom above ----
        xs_ref[...] = yom * (jnp.sum(ys, axis=0)
                             / jnp.sum(yom, axis=0))[None, :]

    grid = (npad // tile,)
    interpret = jax.devices()[0].platform != "tpu"
    bs = lambda w: pl.BlockSpec((w, tile), lambda i: (0, i))
    fb = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    s = lay.ns
    if lite:
        out_widths = [nvar, nprim, 1, 1, 1, s]
        bw_rows = 3 * s
    else:
        out_widths = [nvar, nprim, 1, nvar, nvar, 1, 1, s]
        bw_rows = 6 * s
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[bs(nvar), bs(1), bs(1), bs(1), bs(1), bs(s),
                  fb(b_h.shape[0], b_h.shape[1]),
                  fb(b_all.shape[0], b_all.shape[1]),
                  fb(s, 1), fb(s, 1), fb(bw_rows, 3 * s)],
        out_specs=[bs(w) for w in out_widths],
        out_shape=[jax.ShapeDtypeStruct((w, npad), dtype)
                   for w in out_widths],
    )(*ins)
    if lite:
        uc, v, nonp, gm1, mu, xs = outs
        return (uc[:, :n], v[:, :n], nonp[0, :n], gm1[0, :n],
                mu[0, :n], xs[:, :n])
    uc, v, nonp, dtdu, dpdu, mu, ka, xs = outs
    return (uc[:, :n], v[:, :n], nonp[0, :n], dtdu[:, :n], dpdu[:, :n],
            mu[0, :n], ka[0, :n], xs[:, :n])


def node_state(lib, lay, tp, u, t_guess, turb_ke=None, lite=False):
    """Row-major wrapper: run the fused kernel on (N, nVar) conserved state.

    Returns (u_clip, v, nonphys_bool, dtdu, dpdu, mu, kappa, xs), all
    row-major; with lite=True (u_clip, v, nonphys_bool, gm1, mu, xs) —
    see cons2prim_fused."""
    mmn = np.asarray(lib.mm)
    wk_cmass = (mmn[None, :] / mmn[:, None]) ** 0.25
    wk_cden = 1.0 / np.sqrt(8.0 * (1.0 + mmn[:, None] / mmn[None, :]))
    wk_cdoff = 1.065 * wk_cden * (1.0 - np.eye(lay.ns))
    # (6S, 3S) block-diagonal Wilke contraction stack (see kernel): row
    # blocks [mu order-0/1/2, kappa order-0/1/2], column block j holds the
    # order-j matrix.  kappa's order-0 block carries +I for the phi_ka
    # self-term (the loop form started the accumulation at yom).  The lite
    # variant carries only the mu rows.
    s = lay.ns
    b_wk = np.zeros((6 * s, 3 * s))
    for j, m in enumerate([wk_cden, 2.0 * wk_cden * wk_cmass,
                           wk_cden * wk_cmass ** 2]):
        b_wk[j * s:(j + 1) * s, j * s:(j + 1) * s] = m
    for j, m in enumerate([wk_cdoff + np.eye(s),
                           2.0 * wk_cdoff * wk_cmass,
                           wk_cdoff * wk_cmass ** 2]):
        b_wk[(3 + j) * s:(4 + j) * s, j * s:(j + 1) * s] = m
    if lite:
        b_wk = b_wk[:3 * s]
    b_h, b_all = _tables(lib, u.dtype, lite=lite)
    tke = jnp.zeros_like(t_guess) if turb_ke is None else turb_ke
    nt_meta = (float(lib.t0), float(lib.dt), int(lib.nt))
    args = (u.T, t_guess, tke, b_h, b_all,
            jnp.asarray(lib.mm, u.dtype)[:, None],
            jnp.asarray(lib.ri, u.dtype)[:, None],
            jnp.asarray(b_wk, u.dtype))
    from su2_tpu.pallas.context import pallas_shards
    nsh = pallas_shards()
    if nsh > 1:
        # multi-chip: the kernel is pointwise over nodes — run it
        # per-shard under shard_map (zero communication; round-5 verdict
        # item 1: every pallas fast path composes with sharding)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from su2_tpu.parallel.tiled_shard import cells_axis_mesh
        lane, vec, rep = P(None, "cells"), P("cells"), P()
        out_specs = ((lane, lane, vec, vec, vec, lane) if lite
                     else (lane, lane, vec, lane, lane, vec, vec, lane))
        f = lambda *a: cons2prim_fused(lay, tp, nt_meta, lite, *a)
        outs = shard_map(
            f, mesh=cells_axis_mesh(nsh),
            in_specs=(lane, vec, vec, rep, rep, rep, rep, rep),
            out_specs=out_specs, check_vma=False)(*args)
    else:
        outs = cons2prim_fused(lay, tp, nt_meta, lite, *args)
    if lite:
        uc, v, nonp, gm1, mu, xs = outs
        return (uc.T, v.T, nonp > 0.5, gm1, mu, xs.T)
    uc, v, nonp, dtdu, dpdu, mu, ka, xs = outs
    return (uc.T, v.T, nonp > 0.5, dtdu.T, dpdu.T, mu, ka, xs.T)
