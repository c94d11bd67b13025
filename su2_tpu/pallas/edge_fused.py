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

All per-node inputs ride in ONE stacked feature-major matrix F (48, nP)
so the edge endpoints are TWO gathers (F[:, i], F[:, j]) instead of a
dozen — XLA materializes each separate gather+transpose as its own
fusion, which used to cost ~10x the kernel itself.  The species
enthalpy/cp at the edge-mean temperature are evaluated IN-KERNEL from the
VMEM-resident spline tables (same one-hot MXU contraction as
pallas/node_state.py) instead of a separate XLA spline sweep.

Reference semantics: Upwind_Residual + Viscous_Residual + SetTime_Step
(solver_direct_reactive.cpp:2535, :5305, :5057).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from su2_tpu.ops import ausm_t, viscous_t
from su2_tpu.ops.viscous_t import SpeciesConsts

# edge-tile width (lanes) per grid step; module-level so benchmarks can
# sweep it (see scripts/bench_node_state.py for the node-side sweep)
_TILE = 512


def _pad_cols(x, npad):
    """Pad trailing edge axis with copies of column 0 (valid data)."""
    extra = npad - x.shape[-1]
    if extra == 0:
        return x
    rep = jnp.broadcast_to(x[..., :1], x.shape[:-1] + (extra,))
    return jnp.concatenate([x, rep], axis=-1)


def _hcp_tables(lib, dtype):
    """(8S, nT) stacked h+cp spline tables grouped
    [yl(h,cp); yc(h,cp); y2l(h,cp); y2c(h,cp)] for one-matmul lookup.
    For f32 the table rides as a 3-level bf16 split (3x rows; see
    pallas/node_state._split3)."""
    def stack4(y, y2):
        y_prev = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
        y2_prev = jnp.concatenate([y2[:, :1], y2[:, :-1]], axis=1)
        return y_prev, y, y2_prev, y2
    h4 = stack4(lib.h_y, lib.h_y2)
    c4 = stack4(lib.cp_y, lib.cp_y2)
    tab = jnp.concatenate(
        [jnp.concatenate([h4[k], c4[k]], axis=0) for k in range(4)],
        axis=0).astype(dtype)
    from su2_tpu.pallas.node_state import _CHUNK, _pad_cols_last, _split3
    nt = tab.shape[1]
    ntp = -(-nt // _CHUNK) * _CHUNK
    if ntp != nt:
        tab = _pad_cols_last(tab, ntp)
    if dtype == jnp.float32:
        tab = _split3(tab)
    return tab


def _hcp_pair(consts, tab_ref, mm_ref, tmeans):
    """Species h, cp [mass-specific] at one or more temperature vectors,
    gathered with ONE paired one-hot contraction (node_state.lookup_pair
    pattern — per-column-independent selection, bit-equal to separate
    lookups).  Returns a tuple of (h_s, cp_s) pairs, one per tmean."""
    lay, _, _, _, _, (t0, dtg, nt), _, tile = consts
    ns = lay.ns
    dtype = tmeans[0].dtype
    tmax_tab = t0 + (nt - 1) * dtg
    from su2_tpu.pallas.node_state import spline_gather

    tcs, klos = [], []
    for t in tmeans:
        tc = jnp.clip(t, t0, tmax_tab)
        tcs.append(tc)
        klos.append(jnp.clip(((tc - t0) / dtg).astype(jnp.int32) + 1,
                             1, nt - 1))
    g_all = spline_gather(tab_ref, 8 * ns, tuple(klos),
                          ntp=tab_ref.shape[1],
                          split=tab_ref.dtype == jnp.bfloat16, dtype=dtype)
    out = []
    mmc = mm_ref[...]
    s2 = 2 * ns
    for k, (tc, klo) in enumerate(zip(tcs, klos)):
        g = g_all[:, k * tile:(k + 1) * tile]
        xk = t0 + klo.astype(dtype) * dtg
        a = ((xk - tc) / dtg)[None, :]
        b = ((tc - (xk - dtg)) / dtg)[None, :]
        yl, yc = g[:s2], g[s2:2 * s2]
        y2l, y2c = g[2 * s2:3 * s2], g[3 * s2:]
        q_mol = a * yl + b * yc \
            + ((a ** 3 - a) * y2l + (b ** 3 - b) * y2c) * (dtg * dtg) / 6.0
        out.append((q_mol[:ns] / mmc, q_mol[ns:] / mmc))
    return tuple(out)


def _explicit_side(consts, rows, fi, fj, nm, ev, mm_ref, den_ref, hcp):
    """One edge family's explicit flux + spectral radii from the stacked
    endpoint matrices (the body of fused_edge_flux_pallas)."""
    (lay, m_infty, prandtl_turb, lewis_turb, prandtl_lam, _, mm_sum,
     tile) = consts
    nd = lay.ndim
    nprim = lay.nprim
    gd = rows["gd"]
    r_g, r_mu, r_ka = rows["g"], rows["mu"], rows["ka"]
    r_mut, r_tke, r_gk = rows["mut"], rows["tke"], rows["gk"]
    r_gam, r_sk = rows["gam"], rows["sk"]
    scs = SpeciesConsts(mm_col=mm_ref[...], sm_den=den_ref[...],
                        mm_sum=mm_sum)
    vi = fi[:nprim]
    vj = fj[:nprim]
    conv = ausm_t.ausm_flux_t(lay, vi, vj, nm, m_infty)
    h_s, cp_s = hcp

    visc = viscous_t.viscous_flux_t(
        lay, scs, vi, vj,
        fi[r_g:r_mu].reshape(gd // nd, nd, tile),
        fj[r_g:r_mu].reshape(gd // nd, nd, tile),
        nm, ev,
        fi[r_mu], fj[r_mu], fi[r_ka], fj[r_ka],
        fi[r_mut], fj[r_mut], fi[r_tke], fj[r_tke],
        fi[r_gk:r_gk + nd], fj[r_gk:r_gk + nd], fi[r_sk],
        h_s, cp_s, prandtl_turb, lewis_turb)

    # spectral radii (ops/timestep.py::max_lambda_inv + ns.viscous_lambda)
    area = jnp.sqrt(jnp.sum(nm * nm, axis=0))
    vel_i = vi[lay.VX:lay.VX + nd]
    vel_j = vj[lay.VX:lay.VX + nd]
    proj = 0.5 * jnp.sum((vel_i + vel_j) * nm, axis=0)
    a_mean = 0.5 * (vi[lay.A] + vj[lay.A])
    lc = (jnp.abs(proj) + a_mean) * area

    mean_rho = 0.5 * (vi[lay.PRHO] + vj[lay.PRHO])
    mean_mu = 0.5 * (fi[r_mu] + fj[r_mu])
    mean_mut = 0.5 * (fi[r_mut] + fj[r_mut])
    lam1 = 4.0 / 3.0 * (mean_mu + mean_mut)
    lam2 = (1.0 + (prandtl_lam / prandtl_turb) * (mean_mut / mean_mu)) \
        * (fi[r_gam] * mean_mu / prandtl_lam)
    lv = (lam1 + lam2) * area * area / mean_rho
    return conv - visc, lc, lv


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def fused_edge_flux_pallas_multi(lay, m_infty, prandtl_turb, lewis_turb,
                                 prandtl_lam, nt_meta, sc,
                                 f_i, f_js, normals, evecs, b_hcp, mm):
    """ALL edge families in one launch: f_i is shared across families, so
    its load/unpack and the h/cp spline contraction (paired across
    families) happen once per tile instead of once per family.

    f_js/normals/evecs: tuples of (48, E) / (d, E) per family.
    Returns (fluxes (Kh, nVar, E), lcs (Kh, E), lvs (Kh, E))."""
    t0, dtg, nt = nt_meta
    nd, ns, nvar, nprim = lay.ndim, lay.ns, lay.nvar, lay.nprim
    gd = (1 + nd + ns) * nd
    kh = len(f_js)
    ne = f_i.shape[-1]
    tile = _TILE if ne >= _TILE else max(128, ne)
    npad = -(-ne // tile) * tile
    mm_sum = sc.mm_sum

    ins = [_pad_cols(f_i, npad)] \
        + [_pad_cols(x, npad) for x in f_js] \
        + [_pad_cols(x, npad) for x in normals] \
        + [_pad_cols(x, npad) for x in evecs] \
        + [b_hcp, sc.mm_col, sc.sm_den]

    r_g = nprim
    r_mu = r_g + gd
    r_ka = r_mu + 1
    r_mut = r_ka + 1
    r_tke = r_mut + 1
    r_gk = r_tke + 1
    r_gam = r_gk + nd
    r_sk = r_gam + 1
    rows = dict(g=r_g, mu=r_mu, ka=r_ka, mut=r_mut, tke=r_tke, gk=r_gk,
                gam=r_gam, sk=r_sk, gd=gd)
    consts = (lay, m_infty, prandtl_turb, lewis_turb, prandtl_lam,
              (t0, dtg, nt), mm_sum, tile)

    def kernel(*refs):
        fi_ref = refs[0]
        fj_refs = refs[1:1 + kh]
        nm_refs = refs[1 + kh:1 + 2 * kh]
        ev_refs = refs[1 + 2 * kh:1 + 3 * kh]
        tab_ref, mm_ref, den_ref = refs[1 + 3 * kh:1 + 3 * kh + 3]
        outs = refs[1 + 3 * kh + 3:]
        flux_refs = outs[:kh]
        lc_ref, lv_ref = outs[kh], outs[kh + 1]

        fi = fi_ref[...]
        fjs = [r[...] for r in fj_refs]
        hcps = _hcp_pair(consts, tab_ref, mm_ref,
                         tuple(0.5 * (fi[lay.T] + fj[lay.T]) for fj in fjs))
        for k in range(kh):
            flux, lc, lv = _explicit_side(
                consts, rows, fi, fjs[k], nm_refs[k][...], ev_refs[k][...],
                mm_ref, den_ref, hcps[k])
            flux_refs[k][...] = flux
            lc_ref[k, :] = lc
            lv_ref[k, :] = lv

    grid = (npad // tile,)
    interpret = jax.devices()[0].platform != "tpu"
    bs = lambda w: pl.BlockSpec((w, tile), lambda i: (0, i))
    fb = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[bs(r_sk + 1)] * (1 + kh) + [bs(nd)] * (2 * kh)
        + [fb(b_hcp.shape[0], b_hcp.shape[1]), fb(ns, 1), fb(ns, ns)],
        out_specs=[bs(nvar)] * kh + [bs(kh), bs(kh)],
        out_shape=[jax.ShapeDtypeStruct((nvar, npad), f_i.dtype)] * kh
        + [jax.ShapeDtypeStruct((kh, npad), f_i.dtype)] * 2,
    )(*ins)
    fluxes = [o[:, :ne] for o in outs[:kh]]
    return fluxes, outs[kh][:, :ne], outs[kh + 1][:, :ne]


def _edge_win_plan_sharded(mesh):
    """(T, H, ntiles, loc) for the shard_map'd windowed explicit family
    kernel, or None.  Default ON for multi-chip TPU stencil meshes (the
    host-roll legacy kernel is single-shard by construction);
    SU2_TPU_WIN_EDGE=1 forces it anywhere (CPU interpret tests), =0
    disables (XLA roll path under GSPMD)."""
    import os
    env = os.environ.get("SU2_TPU_WIN_EDGE", "")
    if env == "0":
        return None
    if mesh.fam_offsets is None or mesh.n_shards <= 1:
        return None
    if mesh.npoint % mesh.n_shards != 0:
        return None
    if env != "1" and jax.devices()[0].platform != "tpu":
        return None
    from su2_tpu.pallas.stencil_solve import _round128
    maxoff = max(int(o) for o in mesh.fam_offsets)
    H = _round128(maxoff)
    loc = mesh.npoint // mesh.n_shards
    T = min(16384, _round128(loc))
    if T <= H:
        return None
    ntiles = -(-loc // T)
    return T, H, ntiles, loc


def _edge_win_sharded(mesh, f_all, nm_all, ev_all, b_hcp, mm_col, sm_den,
                      *, lay, m_infty, prandtl_turb, lewis_turb,
                      prandtl_lam, nt_meta, mm_sum, plan):
    """shard_map form of the windowed explicit family kernel: per-shard
    extended lane blocks with ppermute halo slabs
    (parallel/tiled_shard.py).  f_all (48, nP); nm_all/ev_all
    (kh*nd, nP) stacked per-family dual normals / edge vectors (global).

    The halo sanitation mirrors the legacy _pad_cols tricks: lanes whose
    halo state is the ppermute zero-fill (global array ends) get the
    shard's own lane-0 f/ev values (finite arithmetic) while their
    normals stay zero, which gates the flux to exactly zero."""
    from su2_tpu.parallel import tiled_shard as tsh

    T, H, ntiles, loc = plan
    E = ntiles * T + 2 * H
    nsh = mesh.n_shards
    offsets = tuple(int(o) for o in mesh.fam_offsets)
    interpret = jax.devices()[0].platform != "tpu"
    rho_row = lay.ndim + 2          # PRHO row of the v.T block in f_all

    def local(f_l, nm_l, ev_l, b_hcp_r, mm_r, den_r):
        ext = lambda x: tsh.halo_extend(x, H, E)
        f_x, nm_x, ev_x = ext(f_l), ext(nm_l), ext(ev_l)
        dead = f_x[rho_row] <= 0.0
        f_x = jnp.where(dead[None, :], f_x[:, H:H + 1], f_x)
        ev_dead = jnp.sum(ev_x * ev_x, axis=0) <= 0.0
        ev_x = jnp.where(ev_dead[None, :], ev_x[:, H:H + 1], ev_x)
        res, lclv = _edge_win_call(
            f_x, nm_x, ev_x, b_hcp_r, mm_r, den_r, lay=lay,
            m_infty=m_infty, prandtl_turb=prandtl_turb,
            lewis_turb=lewis_turb, prandtl_lam=prandtl_lam,
            nt_meta=nt_meta, mm_sum=mm_sum, offsets=offsets, T=T, H=H,
            ntiles=ntiles, interpret=interpret, ext_loc=loc)
        return res[:, :loc], lclv[:, :loc]

    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    lane, rep = P(None, "cells"), P()
    res, lclv = shard_map(
        local, mesh=tsh.cells_axis_mesh(nsh),
        in_specs=(lane, lane, lane, rep, rep, rep),
        out_specs=lane, check_vma=False)(
            f_all, nm_all, ev_all, b_hcp, mm_col, sm_den)
    return res, lclv


def _edge_win_plan(mesh):
    """(T, H, ntiles) for the windowed explicit family kernel, or None.

    Windowed form of fused_edge_flux_pallas_multi: instead of 4 host-side
    rolls of the 48-row f_all (slice+DUS pairs, ~2.3 ms/iter at 565k) plus
    the flux/lambda roll-subtract scatter (~1 ms), the kernel DMAs one
    halo window per tile, forms f_j by in-VMEM lane rotation, and emits
    the NODE-accumulated residual directly.  Default on for single-shard
    TPU stencil meshes >= 200k nodes (the tiled tier); SU2_TPU_WIN_EDGE=1
    forces it anywhere (tests), =0 disables."""
    import os
    env = os.environ.get("SU2_TPU_WIN_EDGE", "")
    if env == "0":
        return None
    if mesh.fam_offsets is None or mesh.n_shards != 1:
        return None
    if env != "1":
        if mesh.npoint < 200_000 or jax.devices()[0].platform != "tpu":
            return None
    from su2_tpu.pallas.stencil_solve import _round128
    maxoff = max(int(o) for o in mesh.fam_offsets)
    H = _round128(maxoff)
    npad = _round128(mesh.npoint)
    T = min(16384, npad)
    if T <= H:
        return None
    ntiles = -(-npad // T)
    return T, H, ntiles


@functools.partial(jax.jit, static_argnames=(
    "lay", "m_infty", "prandtl_turb", "lewis_turb", "prandtl_lam",
    "nt_meta", "mm_sum", "offsets", "T", "H", "ntiles", "interpret",
    "ext_loc"))
def _edge_win_call(f_e, nm_e, ev_e, b_hcp, mm_col, sm_den, *, lay, m_infty,
                   prandtl_turb, lewis_turb, prandtl_lam, nt_meta, mm_sum,
                   offsets, T, H, ntiles, interpret, ext_loc=None):
    """Windowed multi-family explicit kernel: f_e (48, ntiles*T) unextended;
    nm_e/ev_e (kh*nd, ntiles*T) stacked per-family normals (ZERO-padded
    beyond nP — invalid-edge slots carry zero area) / edge vectors.
    Returns (res (r_res, ntiles*T) rows [0:nvar], lclv (8, ntiles*T) rows
    [lc, lv]) — node-accumulated over all families: res[p] = sum_k
    flux_k[p] - flux_k[p - o_k].  r_res = nvar rounded up to the sublane
    multiple of 8.

    ext_loc (static, sharded form): inputs are EXTENDED lane arrays
    [halo(H) | field(loc..ntiles*T pad) | halo(H)] of width
    E = ntiles*T + 2H; windows sit at [i*T, i*T + W) with no clamp, the
    left halo carries REAL neighbor values (kept: normals NOT zeroed for
    gidx in [-H, 0)), and normals are zeroed for local lanes >= ext_loc
    (the zero-pad/right-halo garbage region — owner residuals only read
    flux lanes <= loc-1, see parallel/tiled_shard.py)."""
    from su2_tpu.pallas.stencil_solve import _roll, _pad_rows8

    W = T + 2 * H
    # lane buffers are padded up to the window width on small meshes so
    # the clamped DMA always fits (extra lanes carry zero normals)
    npad_t = max(ntiles * T, W)
    nd, nvar, nprim = lay.ndim, lay.nvar, lay.nprim
    # Mosaic windowed DMAs need sublane-aligned row extents (see
    # stencil_solve._pad_rows8): pad every HBM operand's row dimension to
    # a multiple of 8.  Padding rides at the END, after every indexed
    # block (rows dict offsets, per-family k*nd slices), so kernel row
    # indexing is unchanged; padded rows carry zeros.
    f_e = _pad_rows8(f_e)
    nm_e = _pad_rows8(nm_e)
    ev_e = _pad_rows8(ev_e)
    r_res = max(8, -(-nvar // 8) * 8)
    gd = (1 + nd + lay.ns) * nd
    kh = len(offsets)
    dtype = f_e.dtype

    r_g = nprim
    r_mu = r_g + gd
    rows = dict(g=r_g, mu=r_mu, ka=r_mu + 1, mut=r_mu + 2, tke=r_mu + 3,
                gk=r_mu + 4, gam=r_mu + 4 + nd, sk=r_mu + 5 + nd, gd=gd)
    consts = (lay, m_infty, prandtl_turb, lewis_turb, prandtl_lam,
              nt_meta, mm_sum, W)

    def kernel(f_h, nm_h, ev_h, tab_ref, mmr, denr, res_o, lclv_o,
               f_s, nm_s, ev_s, res_s, lclv_s, sems):
        i = pl.program_id(0)
        s = i * T
        if ext_loc is None:
            # clamped 128-aligned window start (provable to Mosaic; see
            # stencil_solve unextended-r notes)
            sc0 = jnp.clip((s - H) // 128, 0, (npad_t - W) // 128) * 128
        else:
            # extended inputs: window [i*T, i*T+W) always in range
            sc0 = s
        cps = [
            pltpu.make_async_copy(f_h.at[:, pl.ds(sc0, W)], f_s,
                                  sems.at[0]),
            pltpu.make_async_copy(nm_h.at[:, pl.ds(sc0, W)], nm_s,
                                  sems.at[1]),
            pltpu.make_async_copy(ev_h.at[:, pl.ds(sc0, W)], ev_s,
                                  sems.at[2]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        if ext_loc is None:
            delta = jnp.int32((sc0 - (s - H)) % W)
            fw = pltpu.roll(f_s[...], delta, axis=1)
            nmw = pltpu.roll(nm_s[...], delta, axis=1)
            evw = pltpu.roll(ev_s[...], delta, axis=1)
        else:
            fw, nmw, evw = f_s[...], nm_s[...], ev_s[...]
        # out-of-field lanes (window clamp) must carry ZERO normals so
        # their flux is exactly zero (the legacy path's wrapped-roll lanes
        # relied on the same zero-area guard); f/ev lanes stay real values
        # from the clamp, so everything is finite.  Extended (sharded)
        # form: the left halo [-H, 0) keeps its real neighbor normals and
        # only lanes >= ext_loc are zeroed.
        gidx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) + (s - H)
        lo = 0 if ext_loc is None else -H
        hi = npad_t if ext_loc is None else ext_loc
        nmw = jnp.where((gidx >= lo) & (gidx < hi), nmw, 0.0)

        trow = fw[lay.T:lay.T + 1]                    # 2-D (1, W): Mosaic
        hcps = _hcp_pair(consts, tab_ref, mmr,        # has no 1-D rotate
                         tuple((0.5 * (trow + _roll(trow, o)))[0]
                               for o in offsets))
        res = None
        lc_n = None
        lv_n = None
        for k, o in enumerate(offsets):
            fj = _roll(fw, o)
            flux, lck, lvk = _explicit_side(
                consts, rows, fw, fj, nmw[k * nd:(k + 1) * nd],
                evw[k * nd:(k + 1) * nd], mmr, denr, hcps[k])
            # keep the lambda rows 2-D: Mosaic's dynamic_rotate has no 1-D
            # vector form
            lv2 = jnp.concatenate([lck[None], lvk[None]], axis=0)
            rt = flux - _roll(flux, -o)
            lvn = lv2 + _roll(lv2, -o)
            res = rt if res is None else res + rt
            lc_n = lvn if lc_n is None else lc_n + lvn
        lc_n, lv_n = lc_n[0], lc_n[1]
        res_s[...] = res if r_res == nvar else jnp.concatenate(
            [res, jnp.zeros((r_res - nvar, W), dtype)], axis=0)
        lclv_s[...] = jnp.concatenate(
            [lc_n[None], lv_n[None], jnp.zeros((6, W), dtype)], axis=0)
        cr = pltpu.make_async_copy(res_s.at[:, pl.ds(H, T)],
                                   res_o.at[:, pl.ds(s, T)], sems.at[3])
        cl = pltpu.make_async_copy(lclv_s.at[:, pl.ds(H, T)],
                                   lclv_o.at[:, pl.ds(s, T)], sems.at[4])
        cr.start()
        cl.start()
        cr.wait()
        cl.wait()

    from su2_tpu.pallas.stencil_solve import _VMEM_LIMIT
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    hbmspec = pl.BlockSpec(memory_space=pltpu.HBM)
    fb = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    res_o, lclv_o = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True),
        grid=(ntiles,),
        in_specs=[anyspec] * 3
        + [fb(b_hcp.shape[0], b_hcp.shape[1]), fb(lay.ns, 1),
           fb(lay.ns, lay.ns)],
        out_specs=[hbmspec] * 2,
        out_shape=[jax.ShapeDtypeStruct((r_res, npad_t), dtype),
                   jax.ShapeDtypeStruct((8, npad_t), dtype)],
        scratch_shapes=[
            pltpu.VMEM((f_e.shape[0], W), dtype),
            pltpu.VMEM((nm_e.shape[0], W), dtype),
            pltpu.VMEM((ev_e.shape[0], W), dtype),
            pltpu.VMEM((r_res, W), dtype),
            pltpu.VMEM((8, W), dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )(f_e, nm_e, ev_e, b_hcp, mm_col, sm_den)
    return res_o, lclv_o


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def fused_edge_flux_pallas(lay, m_infty, prandtl_turb, lewis_turb,
                           prandtl_lam, nt_meta, sc,
                           f_i, f_j, normal, evec, b_hcp, mm):
    """f_*: (48, E) stacked node rows gathered to edge endpoints:

      [ v (nPrim=16) | grad[T,u..,X..] flattened (g,d) (24) | mu | kappa |
        mu_t | tke | grad_k (d) | gamma | sigma_k ]

    normal/evec: (d, E); b_hcp: (8S, nT); mm: (S, 1).
    nt_meta: (t0, dt, nT) static.  sc: viscous_t.SpeciesConsts.
    """
    t0, dtg, nt = nt_meta
    nd, ns, nvar, nprim = lay.ndim, lay.ns, lay.nvar, lay.nprim
    gd = (1 + nd + ns) * nd
    ne = f_i.shape[-1]
    tile = _TILE if ne >= _TILE else max(128, ne)
    npad = -(-ne // tile) * tile
    mm_sum = sc.mm_sum

    ins = [_pad_cols(x, npad) for x in (f_i, f_j, normal, evec)] \
        + [b_hcp, sc.mm_col, sc.sm_den]

    r_g = nprim                   # gradient rows start
    r_mu = r_g + gd
    r_ka = r_mu + 1
    r_mut = r_ka + 1
    r_tke = r_mut + 1
    r_gk = r_tke + 1
    r_gam = r_gk + nd
    r_sk = r_gam + 1
    rows = dict(g=r_g, mu=r_mu, ka=r_ka, mut=r_mut, tke=r_tke, gk=r_gk,
                gam=r_gam, sk=r_sk, gd=gd)
    consts = (lay, m_infty, prandtl_turb, lewis_turb, prandtl_lam,
              (t0, dtg, nt), mm_sum, tile)

    def kernel(fi_ref, fj_ref, nm_ref, ev_ref, tab_ref, mm_ref, den_ref,
               flux_ref, lc_ref, lv_ref):
        fi = fi_ref[...]
        fj = fj_ref[...]
        hcp = _hcp_pair(consts, tab_ref, mm_ref,
                        (0.5 * (fi[lay.T] + fj[lay.T]),))
        flux, lc, lv = _explicit_side(consts, rows, fi, fj, nm_ref[...],
                                      ev_ref[...], mm_ref, den_ref, hcp[0])
        flux_ref[...] = flux
        lc_ref[0, :] = lc
        lv_ref[0, :] = lv

    grid = (npad // tile,)
    interpret = jax.devices()[0].platform != "tpu"
    bs = lambda w: pl.BlockSpec((w, tile), lambda i: (0, i))
    fb = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    flux, lc, lv = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[bs(r_sk + 1), bs(r_sk + 1), bs(nd), bs(nd),
                  fb(b_hcp.shape[0], b_hcp.shape[1]), fb(ns, 1), fb(ns, ns)],
        out_specs=[bs(nvar), bs(1), bs(1)],
        out_shape=[
            jax.ShapeDtypeStruct((nvar, npad), f_i.dtype),
            jax.ShapeDtypeStruct((1, npad), f_i.dtype),
            jax.ShapeDtypeStruct((1, npad), f_i.dtype),
        ],
    )(*ins)
    return flux[:, :ne], lc[0, :ne], lv[0, :ne]


def fused_interior_terms(lib, lay, mesh, prm, v, grad, trans, turb,
                         sigma_k, dpdu_e, grad_rows=None):
    """Stack all per-node inputs feature-major, gather both edge endpoints
    in one gather each, and run the fused kernel.

    sigma_k: (nP,) per-node blended sigma_k (the edge value is node i's,
    matching the XLA path's sigma_k_edge = sigma_k[edges[:, 0]]).

    Returns (res_interior (nP, nVar), lam_conv_nodes, lam_visc_nodes) —
    the interior-edge parts of the residual and the two spectral radii
    (boundary-vertex contributions are added by the caller).
    """
    nd, ns = lay.ndim, lay.ns
    npoints = v.shape[0]

    # gradient rows of the AVGGRAD set [T, u.., X..] (pressure row dropped)
    if grad_rows is not None:
        # feature-major fast path: row-slice the (nG*d, nP) rows and build
        # the stack directly in lane layout — no node-major retiling
        gsel_t = jnp.concatenate([grad_rows[:(1 + nd) * nd],
                                  grad_rows[(2 + nd) * nd:]], axis=0)
        f_all = jnp.concatenate([
            v.T, gsel_t, trans.mu[None], trans.kappa[None],
            turb.mu_t[None], turb.tke[None], turb.grad_tke.T,
            (dpdu_e + 1.0)[None], sigma_k[None]], axis=0)        # (48, nP)
    else:
        sel = np.concatenate([np.arange(0, 1 + nd),
                              np.arange(2 + nd, 2 + nd + ns)])
        gsel = grad[:, sel, :].reshape(npoints, (1 + nd + ns) * nd)
        f_all = jnp.concatenate([
            v, gsel, trans.mu[:, None], trans.kappa[:, None],
            turb.mu_t[:, None], turb.tke[:, None], turb.grad_tke,
            (dpdu_e + 1.0)[:, None], sigma_k[:, None]], axis=1).T  # (48, nP)

    sc = viscous_t.species_consts(np.asarray(lib.mm),
                                  np.asarray(lib.diff_vol), v.dtype)
    kernel_args = (lay, prm.m_infty, prm.prandtl_turb, prm.lewis_turb,
                   prm.prandtl_lam, (float(lib.t0), float(lib.dt),
                                     int(lib.nt)), sc)
    tabs = (_hcp_tables(lib, v.dtype), jnp.asarray(lib.mm, v.dtype)[:, None])

    if mesh.fam_normal is not None:
        # family-major (positive-offset) edge layout on stencil meshes:
        # endpoint states are the node matrix and its rolls, the residual
        # scatter is a roll-subtract, and pad slots carry zero normals
        # (the kernels' zero-area guards make their flux exactly zero).
        # ONE kernel launch for all families: f_i (the node matrix, no
        # copy) is loaded/unpacked once per tile and the h/cp spline
        # contraction pairs across families — per-family f_j rolls stay
        # separate operands (a Kh-wide stacked concatenation materialized
        # 2x Kh x 54 MB at 142k cells).
        if mesh.n_shards > 1:
            # multi-chip: shard_map'd windowed kernel (ppermute halo
            # slabs); the host-roll legacy kernel is single-shard only
            plan = _edge_win_plan_sharded(mesh)
            assert plan is not None, "fused gate requires the sharded plan"
            n = npoints
            kh = len(mesh.fam_offsets)
            nm_all = jnp.concatenate(
                [mesh.fam_normal[k].T for k in range(kh)],
                axis=0).astype(v.dtype)
            ev_all = jnp.concatenate(
                [mesh.fam_evec[k].T for k in range(kh)],
                axis=0).astype(v.dtype)
            lay_, m_inf, pr_t, le_t, pr_l, ntm, sc_ = kernel_args
            res, lclv = _edge_win_sharded(
                mesh, f_all, nm_all, ev_all, tabs[0], sc_.mm_col,
                sc_.sm_den, lay=lay_, m_infty=m_inf, prandtl_turb=pr_t,
                lewis_turb=le_t, prandtl_lam=pr_l, nt_meta=ntm,
                mm_sum=sc_.mm_sum, plan=plan)
            return (res[:lay.nvar].T, lclv[0], lclv[1])
        win = _edge_win_plan(mesh)
        if win is not None:
            # windowed form: no host-side f_j rolls, no flux roll-subtract
            # — the kernel emits the node-accumulated residual directly
            T, H, ntiles = win
            npad_t = max(ntiles * T, T + 2 * H)
            n = npoints
            zpad = lambda x: jnp.pad(x, ((0, 0), (0, npad_t - n)))
            f_e = _pad_cols(f_all, npad_t)
            nm_e = zpad(jnp.concatenate(
                [mesh.fam_normal[k].T for k in range(len(mesh.fam_offsets))],
                axis=0).astype(v.dtype))
            # evecs pad with column-0 copies (legacy behavior): zero edge
            # vectors would hit the |e|^2 division in the corrected
            # gradient; the zero NORMALS on those lanes gate the flux
            ev_e = _pad_cols(jnp.concatenate(
                [mesh.fam_evec[k].T for k in range(len(mesh.fam_offsets))],
                axis=0).astype(v.dtype), npad_t)
            lay_, m_inf, pr_t, le_t, pr_l, ntm, sc_ = kernel_args
            interpret = jax.devices()[0].platform != "tpu"
            res16, lclv = _edge_win_call(
                f_e, nm_e, ev_e, tabs[0], sc_.mm_col, sc_.sm_den,
                lay=lay_, m_infty=m_inf, prandtl_turb=pr_t,
                lewis_turb=le_t, prandtl_lam=pr_l, nt_meta=ntm,
                mm_sum=sc_.mm_sum, offsets=tuple(int(o) for o in
                                                 mesh.fam_offsets),
                T=T, H=H, ntiles=ntiles, interpret=interpret)
            return (res16[:lay.nvar, :n].T, lclv[0, :n], lclv[1, :n])
        f_js = tuple(jnp.roll(f_all, -o, axis=1) for o in mesh.fam_offsets)
        normals = tuple(mesh.fam_normal[k].T
                        for k in range(len(mesh.fam_offsets)))
        evecs = tuple(mesh.fam_evec[k].T
                      for k in range(len(mesh.fam_offsets)))
        fluxes, lcs, lvs = fused_edge_flux_pallas_multi(
            *kernel_args, f_all, f_js, normals, evecs, *tabs)
        res_t = lc_n = lv_n = None
        for k, o in enumerate(mesh.fam_offsets):
            rt = fluxes[k] - jnp.roll(fluxes[k], o, axis=1)
            lcn = lcs[k] + jnp.roll(lcs[k], o)
            lvn = lvs[k] + jnp.roll(lvs[k], o)
            res_t = rt if res_t is None else res_t + rt
            lc_n = lcn if lc_n is None else lc_n + lcn
            lv_n = lvn if lv_n is None else lv_n + lvn
        return res_t.T, lc_n, lv_n

    i, j = mesh.edges[:, 0], mesh.edges[:, 1]
    f_i, f_j = f_all[:, i], f_all[:, j]
    normal = mesh.edge_normal.T
    evec = (mesh.coords[j] - mesh.coords[i]).T
    flux, lc, lv = fused_edge_flux_pallas(
        *kernel_args, f_i, f_j, normal, evec, *tabs)

    res, lams = mesh.scatter_edges_mixed(
        flux.T, jnp.stack([lc, lv], axis=1))
    return res, lams[:, 0], lams[:, 1]


# ---------------------------------------------------------------------------
# Implicit variant: AUSM + viscous + BOTH approximate Jacobian pairs in one
# pass, feature-major end-to-end.  MUSCL reconstruction (with thermodynamic
# re-consistency from the VMEM spline tables) and the ghost dP/dU run inside
# the kernel, so the implicit flow assembly reads the node matrix once and
# writes the off-diagonal blocks directly in the static-stencil lane layout
# (no edge-major (nE, v, v) intermediates — those 128-lane-pad to 18x their
# size and dominated the implicit step).
# Reference semantics: Upwind_Residual (solver_direct_reactive.cpp:2535),
# Viscous_Residual (:5305), SetLaminarViscousProjJacs + SST closures.
# ---------------------------------------------------------------------------

def _implicit_rows(lay):
    """Static row offsets of the stacked per-side input matrix."""
    nd, ns, nvar, nprim = lay.ndim, lay.ns, lay.nvar, lay.nprim
    ng = 2 + nd + ns
    r = {}
    r["g"] = nprim
    r["lim"] = r["g"] + ng * nd
    r["mu"] = r["lim"] + (2 + nd)
    r["ka"] = r["mu"] + 1
    r["mut"] = r["ka"] + 1
    r["tke"] = r["mut"] + 1
    r["gk"] = r["tke"] + 1
    r["sk"] = r["gk"] + nd
    r["dtdu"] = r["sk"] + 1
    r["dpdu"] = r["dtdu"] + nvar
    r["total"] = r["dpdu"] + nvar
    return r


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def fused_edge_implicit_pallas(lay, m_infty, prandtl_turb, lewis_turb,
                               muscl, use_limiter, nt_meta, sc,
                               f_i, f_j, normal, evec, b_hcp, mm, ri):
    """One fused pass over an edge family: MUSCL face states + AUSM flux and
    Jacobians + viscous flux and Jacobians (all feature-major).

    f_*: (R, E) stacked node rows (see _implicit_rows); normal/evec: (d, E);
    b_hcp: stacked h/cp spline tables; mm/ri: (S, 1).

    Returns flux_tot = conv - visc (nVar, E) and the combined edge Jacobian
    blocks j_i = conv_jac_i - visc_jac_i, j_j likewise ((nVar^2, E), row-
    major (a*nvar+b) block flattening).
    """
    t0, dtg, nt = nt_meta
    nd, ns, nvar, nprim = lay.ndim, lay.ns, lay.nvar, lay.nprim
    ng = 2 + nd + ns
    r = _implicit_rows(lay)
    ne = f_i.shape[-1]
    tile = _TILE if ne >= _TILE else max(128, ne)
    npad = -(-ne // tile) * tile
    mm_sum = sc.mm_sum
    eps = 1e-16

    ins = [_pad_cols(x, npad) for x in (f_i, f_j, normal, evec)] \
        + [b_hcp, sc.mm_col, sc.sm_den, ri]

    def kernel(fi_ref, fj_ref, nm_ref, ev_ref, tab_ref, mm_ref, den_ref,
               ri_ref, flux_ref, ji_ref, jj_ref):
        fi = fi_ref[...]
        fj = fj_ref[...]
        nm = nm_ref[...]
        ev = ev_ref[...]
        mmc = mm_ref[...]
        ric = ri_ref[...]
        scs = SpeciesConsts(mm_col=mmc, sm_den=den_ref[...], mm_sum=mm_sum)
        dtype = fi.dtype
        tmax_tab = t0 + (nt - 1) * dtg

        from su2_tpu.pallas.node_state import spline_gather

        def lookup_hcp(t):
            """species h, cp [mass-specific] at temperatures t (tile,)."""
            tc = jnp.clip(t, t0, tmax_tab)
            klo = jnp.clip(((tc - t0) / dtg).astype(jnp.int32) + 1, 1, nt - 1)
            g = spline_gather(tab_ref, 8 * ns, klo, ntp=tab_ref.shape[1],
                              split=tab_ref.dtype == jnp.bfloat16,
                              dtype=dtype)
            xk = t0 + klo.astype(dtype) * dtg
            a = ((xk - tc) / dtg)[None, :]
            b = ((tc - (xk - dtg)) / dtg)[None, :]
            s2 = 2 * ns
            yl, yc = g[:s2], g[s2:2 * s2]
            y2l, y2c = g[2 * s2:3 * s2], g[3 * s2:]
            q = a * yl + b * yc + ((a ** 3 - a) * y2l
                                   + (b ** 3 - b) * y2c) * (dtg * dtg) / 6.0
            return q[:ns] / mmc, q[ns:] / mmc

        def face_state(f, dxsign):
            """(v_face (nPrim, tile), dP/dU rows (nVar, tile))."""
            v = f[:nprim]
            if not muscl:
                return v, f[r["dpdu"]:r["dpdu"] + nvar]
            grads = f[r["g"]:r["g"] + ng * nd].reshape(ng, nd, tile)
            dx = dxsign * 0.5 * ev
            q = jnp.concatenate([v[lay.T][None], v[lay.VX:lay.VX + nd],
                                 v[lay.P][None]], axis=0)
            proj = sum(grads[:2 + nd, d] * dx[d][None] for d in range(nd))
            if use_limiter:
                proj = proj * f[r["lim"]:r["lim"] + 2 + nd]
            qr = q + proj
            t_r = qr[0]
            vel_r = qr[1:1 + nd]
            p_r = qr[1 + nd]
            bad = (t_r <= eps) | (p_r <= eps)
            t_face = jnp.where(bad, v[lay.T], t_r)
            ys = v[lay.YS:lay.YS + ns]
            ysc = viscous_t._clip_ys_t(ys)
            rgas = sum(ysc[k] * ric[k, 0] for k in range(ns))
            h_s_f, cp_s_f = lookup_hcp(t_face)
            hmix = sum(ysc[k] * h_s_f[k] for k in range(ns)) \
                + 0.5 * sum(vel_r[d] * vel_r[d] for d in range(nd))
            cpmix = sum(ysc[k] * cp_s_f[k] for k in range(ns))
            gamma_r = cpmix / (cpmix - rgas)
            rho_r = p_r / (rgas * t_r)
            a_r = jnp.sqrt(jnp.abs(gamma_r * p_r / rho_r))
            vface = jnp.concatenate([
                t_r[None], vel_r, p_r[None], rho_r[None], hmix[None],
                a_r[None], ys], axis=0)
            vface = jnp.where(bad[None, :], v, vface)
            # ghost dP/dU of the selected face rows (euler.ghost_dpdu)
            gam = vface[lay.A] ** 2 * vface[lay.PRHO] / vface[lay.P]
            vel2 = sum(vface[lay.VX + d] ** 2 for d in range(nd))
            e_s = h_s_f - ric * t_face[None]
            s_rows = jnp.concatenate([
                ((gam - 1.0) * 0.5 * vel2)[None],
                (1.0 - gam)[None] * vface[lay.VX:lay.VX + nd],
                (gam - 1.0)[None],
                ric * t_face[None] - (gam - 1.0)[None] * e_s], axis=0)
            return vface, s_rows

        vf_i, sc_i = face_state(fi, 1.0)
        vf_j, sc_j = face_state(fj, -1.0)
        conv, cjac_i, cjac_j = ausm_t.ausm_flux_t(
            lay, vf_i, vf_j, nm, m_infty, sc_i, sc_j)

        # viscous terms use the NODE states/gradients (Viscous_Residual)
        vi = fi[:nprim]
        vj = fj[:nprim]
        tmean = 0.5 * (vi[lay.T] + vj[lay.T])
        h_s, cp_s = lookup_hcp(tmean)
        grads_i = fi[r["g"]:r["g"] + ng * nd].reshape(ng, nd, tile)
        grads_j = fj[r["g"]:r["g"] + ng * nd].reshape(ng, nd, tile)
        gsel = lambda g: jnp.concatenate([g[:1 + nd], g[2 + nd:]], axis=0)
        visc, vjac_i, vjac_j = viscous_t.viscous_flux_t(
            lay, scs, vi, vj, gsel(grads_i), gsel(grads_j), nm, ev,
            fi[r["mu"]], fj[r["mu"]], fi[r["ka"]], fj[r["ka"]],
            fi[r["mut"]], fj[r["mut"]], fi[r["tke"]], fj[r["tke"]],
            fi[r["gk"]:r["gk"] + nd], fj[r["gk"]:r["gk"] + nd], fi[r["sk"]],
            h_s, cp_s, prandtl_turb, lewis_turb,
            s_i=fi[r["dtdu"]:r["dtdu"] + nvar],
            s_j=fj[r["dtdu"]:r["dtdu"] + nvar])

        flux_ref[...] = conv - visc
        ji_ref[...] = (cjac_i - vjac_i).reshape(nvar * nvar, tile)
        jj_ref[...] = (cjac_j - vjac_j).reshape(nvar * nvar, tile)

    grid = (npad // tile,)
    interpret = jax.devices()[0].platform != "tpu"
    nrow = r["total"]
    bs = lambda w: pl.BlockSpec((w, tile), lambda i: (0, i))
    fb = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0))
    flux, ji, jj = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[bs(nrow), bs(nrow), bs(nd), bs(nd),
                  fb(b_hcp), fb(sc.mm_col), fb(sc.sm_den), fb(ri)],
        out_specs=[bs(nvar), bs(nvar * nvar), bs(nvar * nvar)],
        out_shape=[
            jax.ShapeDtypeStruct((nvar, npad), f_i.dtype),
            jax.ShapeDtypeStruct((nvar * nvar, npad), f_i.dtype),
            jax.ShapeDtypeStruct((nvar * nvar, npad), f_i.dtype),
        ],
    )(*ins)
    return flux[:, :ne], ji[:, :ne], jj[:, :ne]


def fused_implicit_family_terms(lib, lay, mesh, prm, v, grad, lim,
                                dpdu_full, dtdu_full, trans, turb, sigma_k,
                                grad_rows=None):
    """Family-major fused implicit assembly on a static-stencil mesh.

    Returns (res (nP, nVar), diag (nP, nVar, nVar), sel_t (K*nVar^2, nP))
    where sel_t holds the off-diagonal blocks in the static-stencil lane
    layout expected by pallas/stencil_solve.StencilSolveOps (block k of
    offset stencil_offsets[k], rows a*nvar+b, lanes = node index).
    """
    nd, ns, nvar = lay.ndim, lay.ns, lay.nvar
    npoints = v.shape[0]
    ng = 2 + nd + ns

    if lim is None:
        lim = jnp.ones((npoints, 2 + nd), dtype=v.dtype)
    if grad_rows is not None:
        # feature-major fast path: the tiled gradient rows ride straight
        # into the lane-layout stack — no node-major retiling round trip
        f_all = jnp.concatenate([
            v.T, grad_rows, lim.T, trans.mu[None], trans.kappa[None],
            turb.mu_t[None], turb.tke[None], turb.grad_tke.T,
            sigma_k[None], dtdu_full.T, dpdu_full.T], axis=0)
    else:
        gflat = grad.reshape(npoints, ng * nd)
        f_all = jnp.concatenate([
            v, gflat, lim, trans.mu[:, None], trans.kappa[:, None],
            turb.mu_t[:, None], turb.tke[:, None], turb.grad_tke,
            sigma_k[:, None], dtdu_full,
            dpdu_full], axis=1).T

    sc = viscous_t.species_consts(np.asarray(lib.mm),
                                  np.asarray(lib.diff_vol), v.dtype)
    kernel_args = (lay, prm.m_infty, prm.prandtl_turb, prm.lewis_turb,
                   bool(prm.muscl), bool(prm.use_limiter),
                   (float(lib.t0), float(lib.dt), int(lib.nt)), sc)
    tabs = (_hcp_tables(lib, v.dtype), jnp.asarray(lib.mm, v.dtype)[:, None],
            jnp.asarray(lib.ri, v.dtype)[:, None])

    res_t = None
    diag_t = None
    by_off = {}
    for k, o in enumerate(mesh.fam_offsets):
        f_j = jnp.roll(f_all, -o, axis=1)
        flux, j_i, j_j = fused_edge_implicit_pallas(
            *kernel_args, f_all, f_j, mesh.fam_normal[k].T,
            mesh.fam_evec[k].T, *tabs)
        rt = flux - jnp.roll(flux, o, axis=1)
        dt_k = j_i - jnp.roll(j_j, o, axis=1)
        res_t = rt if res_t is None else res_t + rt
        diag_t = dt_k if diag_t is None else diag_t + dt_k
        by_off[o] = j_j
        by_off[-o] = -jnp.roll(j_i, o, axis=1)
    sel_t = jnp.concatenate([by_off[o] for o in mesh.stencil_offsets], axis=0)
    # transpose-then-minor-split (see ops/gradients.rows_to_grad)
    diag = diag_t.T.reshape(npoints, nvar, nvar)
    return res_t.T, diag, sel_t
