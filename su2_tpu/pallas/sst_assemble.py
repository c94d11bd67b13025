"""Fused SST system assembly for static-stencil meshes (one pallas pass).

The SST step's assembly — blending functions, the K-offset convective +
viscous roll sweep, the source terms, wall-row masking and the Vol/dt
diagonal — is ~40 small XLA fusions per iteration (the 9k-cell flagship
step is fusion-launch bound).  This kernel runs the whole chain in ONE
launch and emits the system directly in the lane layout the fused stencil
solver consumes (pallas/stencil_solve.py): res_t (2, npad), the diagonal
rows (d00, d11), and sel_t (K*4, npad) with the off-diagonal 2x2 blocks
(diagonal blocks a1p - dvn on the 2x2 diagonal, zeros elsewhere) — zero
relayout between assembly and solve.

Like the stencil solve kernels this is FULL-FIELD (no lane grid): the
per-offset neighbor access is a pltpu.roll, which must wrap over the whole
field, and rolled-in garbage at pad lanes is annihilated by the zero
gg_snormal rows of missing neighbors (same contract as the XLA roll sweep
it replaces, turbulence/sst.py).

Reference semantics: CUpwSca_TurbSST + CAvgGrad_TurbSST (uncorrected) +
CSourcePieceWise_TurbSST + SetBlendingFunc
(numerics_direct_turbulent.cpp:865-1257,
variable_direct_turbulent.cpp:178-204) with the MANGOTURB conventions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from su2_tpu.pallas.stencil_solve import (_VMEM_LIMIT, _cparams, _pad_lanes,
                                          _roll)

EPS = 1e-16


def supported(mesh) -> bool:
    """Full-field working set gate (~(30 + 4K + K d) f32 rows)."""
    if mesh.stencil_offsets is None or mesh.n_shards != 1 \
            or mesh.gg_snormal is None:
        return False
    k = len(mesh.stencil_offsets)
    d = mesh.coords.shape[1]
    npad = -(-mesh.npoint // 128) * 128
    rows = 2 * (30 + 4 * k + k * (d + 1))
    return npad * rows * 4 <= _VMEM_LIMIT


def _assemble_body(f, geo, sel_write, *, offsets, d, consts):
    """Shared assembly arithmetic on window VALUES (full-field and tiled
    kernels): returns (res0, res1, dd0, dd1) after calling
    ``sel_write(row_index, row_value)`` for each of the K*4 sel rows.
    Groupings replicate the XLA roll sweep op-for-op."""
    (sk1, sk2, so1, so2, b1, b2, bstar, a1c, al1, al2, cfl_red) = consts
    kk = len(offsets)
    if True:
        r1 = lambda i: f[i:i + 1]
        q_k = r1(0)
        q_w = r1(1)
        rho = r1(2)
        # pad lanes carry zeros; guard the divisors so 0/0 NaNs cannot
        # leak into real lanes through the rolls (real nodes always have
        # rho > 0 and omega >= LOWER[1], so this only touches pads)
        rho = jnp.where(rho > 0.0, rho, 1.0)
        q_w = jnp.where(q_w != 0.0, q_w, 1.0)
        vel = [r1(3 + a) for a in range(d)]
        gq = [r1(3 + d + a) for a in range(2 * d)]   # [gk_x.., gw_x..]
        mu = r1(3 + 3 * d)
        mut = r1(4 + 3 * d)
        dist = r1(5 + 3 * d)
        strain = r1(6 + 3 * d)
        diverg = r1(7 + 3 * d)
        vol = r1(8 + 3 * d)
        dt = r1(9 + 3 * d)
        wall = r1(10 + 3 * d)
        # blending rows precomputed OUTSIDE the kernel from the PREVIOUS
        # step's gradients (reference-stored F1/F2/CDkw vintage — see
        # sst_step's gq_prev contract)
        f1 = r1(11 + 3 * d)
        f2 = r1(12 + 3 * d)
        cdkw = r1(13 + 3 * d)
        coord = [r1(14 + 3 * d + a) for a in range(d)]
        sigk = f1 * sk1 + (1.0 - f1) * sk2
        sigw = f1 * so1 + (1.0 - f1) * so2

        diff_k = mu + sigk * mut
        diff_w = mu + sigw * mut
        rhoq0 = rho * q_k
        rhoq1 = rho * q_w

        res0 = jnp.zeros_like(rho)
        res1 = jnp.zeros_like(rho)
        dg0 = jnp.zeros_like(rho)
        dg1 = jnp.zeros_like(rho)
        for k, o in enumerate(offsets):
            ns = [geo[k * d + a:k * d + a + 1] for a in range(d)]
            pv = geo[kk * d + k:kk * d + k + 1]
            qt = 0.5 * sum((vel[a] + _roll(vel[a], o)) * ns[a]
                           for a in range(d))
            a0p = 0.5 * (qt + jnp.abs(qt))
            a1p = 0.5 * (qt - jnp.abs(qt))
            dm0 = 0.5 * (diff_k + _roll(diff_k, o))
            dm1 = 0.5 * (diff_w + _roll(diff_w, o))
            gm_k = [0.5 * (gq[a] + _roll(gq[a], o)) for a in range(d)]
            gm_w = [0.5 * (gq[d + a] + _roll(gq[d + a], o))
                    for a in range(d)]
            # CORRECTED projected gradient (CAvgGradCorrected_TurbSST):
            # g.n - (g.e) pv + dq pv — groupings replicate the XLA roll
            # sweep (turbulence/sst.py) op-for-op so interpret-mode
            # results match to the ulp
            ev = [_roll(coord[a], o) - coord[a] for a in range(d)]
            corr0 = pv * ((_roll(q_k, o) - q_k)
                          - sum(gm_k[a] * ev[a] for a in range(d)))
            corr1 = pv * ((_roll(q_w, o) - q_w)
                          - sum(gm_w[a] * ev[a] for a in range(d)))
            res0 = res0 + ((a0p * rhoq0 + a1p * _roll(rhoq0, o))
                           - dm0 * (sum(gm_k[a] * ns[a] for a in range(d))
                                    + corr0))
            res1 = res1 + ((a0p * rhoq1 + a1p * _roll(rhoq1, o))
                           - dm1 * (sum(gm_w[a] * ns[a] for a in range(d))
                                    + corr1))
            pv_rho = pv / rho
            dg0 = dg0 + (a0p + dm0 * pv_rho)
            dg1 = dg1 + (a0p + dm1 * pv_rho)
            pv_rro = pv / _roll(rho, o)
            off0 = a1p - dm0 * pv_rro
            off1 = a1p - dm1 * pv_rro
            zero = jnp.zeros_like(off0)
            # wall rows of the off-diagonal blocks are zeroed (strong rows)
            off0 = jnp.where(wall > 0.5, 0.0, off0)
            off1 = jnp.where(wall > 0.5, 0.0, off1)
            sel_write(k * 4, off0)
            sel_write(k * 4 + 1, zero)
            sel_write(k * 4 + 2, zero)
            sel_write(k * 4 + 3, off1)

        # ---- source (CSourcePieceWise_TurbSST) ----
        alfa_b = f1 * al1 + (1.0 - f1) * al2
        beta_b = f1 * b1 + (1.0 - f1) * b2
        pk = mut * strain * strain - 2.0 / 3.0 * rho * q_k * diverg
        pk = jnp.clip(pk, 0.0, 20.0 * bstar * rho * q_w * q_k)
        zeta = jnp.maximum(q_w, strain * f2 / a1c)
        pw = jnp.maximum(strain * strain - 2.0 / 3.0 * zeta * diverg, 0.0)
        active = dist > 1e-10
        src_k = jnp.where(active, pk - bstar * rho * q_w * q_k, 0.0)
        src_w = jnp.where(active,
                          alfa_b * rho * pw - beta_b * rho * q_w * q_w
                          + (1.0 - f1) * cdkw, 0.0)
        res0 = res0 - src_k * vol
        res1 = res1 - src_w * vol
        d00 = dg0 + jnp.where(active, bstar * q_w * vol, 0.0)
        d11 = dg1 + jnp.where(active, 2.0 * beta_b * q_w * vol, 0.0)

        # ---- strong wall rows + Vol/dt diagonal ----
        res0 = jnp.where(wall > 0.5, 0.0, res0)
        res1 = jnp.where(wall > 0.5, 0.0, res1)
        d00 = jnp.where(wall > 0.5, 1.0, d00)
        d11 = jnp.where(wall > 0.5, 1.0, d11)
        ok = dt > EPS
        delta = jnp.where(ok, vol / (cfl_red * jnp.where(ok, dt, 1.0)), 0.0)
        return res0, res1, d00 + delta, d11 + delta


@functools.partial(jax.jit, static_argnames=("offsets", "d", "consts",
                                             "interpret"))
def _assemble_call(f_t, geo_t, *, offsets, d, consts, interpret):
    """f_t: (R, npad) stacked per-node rows (see sst_assemble for the
    layout); geo_t: (K*(d+1), npad) stacked [ns_k rows..., pv_k rows].
    consts: (sigma_k1, sigma_k2, sigma_om1, sigma_om2, beta_1, beta_2,
    beta_star, a1, alfa_1, alfa_2, cfl_red).  Returns (res_t (2, npad),
    dd_t (2, npad) = (d00, d11), sel_t (K*4, npad))."""
    npad = f_t.shape[-1]
    dtype = f_t.dtype
    kk = len(offsets)

    def kernel(f_ref, g_ref, res_ref, dd_ref, sel_ref):
        # all rows kept 2-D (1, npad): Mosaic's vector layouts want >=2-D
        def sel_write(row, val):
            sel_ref[row:row + 1, :] = val

        res0, res1, dd0, dd1 = _assemble_body(
            f_ref[...], g_ref[...], sel_write, offsets=offsets, d=d,
            consts=consts)
        res_ref[0:1, :] = res0
        res_ref[1:2, :] = res1
        dd_ref[0:1, :] = dd0
        dd_ref[1:2, :] = dd1

    full = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim)
    fs = lambda r: pl.BlockSpec((r, npad), lambda: (0, 0))
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else _cparams(),
        in_specs=[full(f_t), full(geo_t)],
        out_specs=[fs(2), fs(2), fs(kk * 4)],
        out_shape=[jax.ShapeDtypeStruct((2, npad), dtype),
                   jax.ShapeDtypeStruct((2, npad), dtype),
                   jax.ShapeDtypeStruct((kk * 4, npad), dtype)],
    )(f_t, geo_t)


def tile_plan(mesh):
    """(T, H, ntiles, E) for the tiled assembly, or None.  Single-pass
    stencil reads: H = max|offset| rounded to the lane boundary."""
    if mesh.stencil_offsets is None or mesh.n_shards != 1 \
            or mesh.gg_snormal is None:
        return None
    k = len(mesh.stencil_offsets)
    d = mesh.coords.shape[1]
    maxoff = max(abs(int(o)) for o in mesh.stencil_offsets)
    H = -(-maxoff // 128) * 128
    # measured VMEM demand: the Mosaic stack for the windowed assembly at
    # W=64k, K=4, d=2 was 114 MB = 1.75 KB/lane (the windowed body keeps
    # every per-offset rolled temporary live across the K-sweep).  Model
    # conservatively at 2 KB/lane scaled by the offset count vs the
    # measured K=4 shape.
    bpl = 2048 * max(1, k) // 4
    from su2_tpu.pallas.stencil_solve import _TILE_W_CAP
    W = min(_TILE_W_CAP, (_VMEM_LIMIT // bpl) // 128 * 128)
    T = W - 2 * H
    if T < max(8 * 128, H):
        return None
    npad = -(-mesh.npoint // 128) * 128
    ntiles = -(-npad // T)
    E = ntiles * T + 2 * H
    return T, H, ntiles, E


@functools.partial(jax.jit, static_argnames=("offsets", "d", "consts",
                                             "T", "H", "ntiles",
                                             "interpret"))
def _assemble_tiled_call(f_e, geo_e, *, offsets, d, consts, T, H, ntiles,
                         interpret):
    """Streaming form of _assemble_call: lane-extended inputs (see
    stencil_solve._extend_lanes), overlapping [i*T, i*T + T + 2H) windows
    DMAed per grid step, owner region [H, H+T) written back.  Bitwise
    identical to the full-field kernel on real lanes (window-edge rolls
    feed only lanes whose gg_snormal/pvec rows are zero, exactly like the
    full kernel's wrap)."""
    from jax.experimental.pallas import tpu as pltpu

    W = T + 2 * H
    dtype = f_e.dtype
    kk = len(offsets)
    fr = f_e.shape[0]
    gr = geo_e.shape[0]
    sel_rows = kk * 4 + ((-(kk * 4)) % 8 if kk * 4 > 8 else 0)

    def kernel(f_h, g_h, res_o, dd_o, sel_o, f_s, g_s, res_s, dd_s, sel_s,
               sems):
        i = pl.program_id(0)
        s = i * T
        cf = pltpu.make_async_copy(f_h.at[:, pl.ds(s, W)], f_s, sems.at[0])
        cg = pltpu.make_async_copy(g_h.at[:, pl.ds(s, W)], g_s, sems.at[1])
        cf.start()
        cg.start()
        cf.wait()
        cg.wait()

        def sel_write(row, val):
            sel_s[row:row + 1, :] = val

        res0, res1, dd0, dd1 = _assemble_body(
            f_s[...], g_s[...], sel_write, offsets=offsets, d=d,
            consts=consts)
        res_s[0:1, :] = res0
        res_s[1:2, :] = res1
        dd_s[0:1, :] = dd0
        dd_s[1:2, :] = dd1
        cps = [
            pltpu.make_async_copy(res_s.at[:, pl.ds(H, T)],
                                  res_o.at[:, pl.ds(s, T)], sems.at[2]),
            pltpu.make_async_copy(dd_s.at[:, pl.ds(H, T)],
                                  dd_o.at[:, pl.ds(s, T)], sems.at[3]),
            pltpu.make_async_copy(sel_s.at[:, pl.ds(H, T)],
                                  sel_o.at[:, pl.ds(s, T)], sems.at[4]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    hbmspec = pl.BlockSpec(memory_space=pltpu.HBM)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True),
        grid=(ntiles,),
        in_specs=[anyspec] * 2,
        out_specs=[hbmspec] * 3,
        out_shape=[jax.ShapeDtypeStruct((2, ntiles * T), dtype),
                   jax.ShapeDtypeStruct((2, ntiles * T), dtype),
                   jax.ShapeDtypeStruct((sel_rows, ntiles * T), dtype)],
        scratch_shapes=[
            pltpu.VMEM((fr, W), dtype),
            pltpu.VMEM((gr, W), dtype),
            pltpu.VMEM((2, W), dtype),
            pltpu.VMEM((2, W), dtype),
            pltpu.VMEM((sel_rows, W), dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )(f_e, geo_e)


def sst_assemble(mesh, consts, q, rho, vel, gq, mu, mut, dist, strain,
                 diverg, dt, wall_mask, f1, f2, cdkw):
    """Run the fused assembly; returns lane-layout (res_t, dd_t, sel_t)
    padded to npad lanes.  All array inputs row-major (nP, ...).
    f1/f2/cdkw: blending values from the previous step's gradients."""
    n = mesh.npoint
    npad = -(-n // 128) * 128
    d = mesh.coords.shape[1]
    dtype = q.dtype
    rows = [q.T, rho[None], vel.T, gq.reshape(n, 2 * d).T,
            mu[None], mut[None], dist[None], strain[None], diverg[None],
            mesh.volume[None], dt[None],
            wall_mask.astype(dtype)[None],
            f1[None], f2[None], cdkw[None], mesh.coords.T]
    f_t = _pad_lanes(jnp.concatenate(rows, axis=0).astype(dtype), npad)
    kk = len(mesh.stencil_offsets)
    geo = jnp.concatenate(
        [mesh.gg_snormal.transpose(0, 2, 1).reshape(kk * d, n),
         mesh.stencil_pvec], axis=0).astype(dtype)
    geo_t = _pad_lanes(geo, npad)
    interpret = jax.devices()[0].platform != "tpu"
    if supported(mesh):
        return _assemble_call(f_t, geo_t,
                              offsets=tuple(mesh.stencil_offsets),
                              d=d, consts=consts, interpret=interpret)
    plan = tile_plan(mesh)
    assert plan is not None, "sst_assemble: no full-field or tiled plan"
    T, H, ntiles, E = plan
    from su2_tpu.pallas.stencil_solve import _extend_lanes, _pad_rows8
    res_o, dd_o, sel_o = _assemble_tiled_call(
        _pad_rows8(_extend_lanes(f_t, H, E)),
        _pad_rows8(_extend_lanes(geo_t, H, E)),
        offsets=tuple(mesh.stencil_offsets), d=d, consts=consts,
        T=T, H=H, ntiles=ntiles, interpret=interpret)
    kk = len(mesh.stencil_offsets)
    return res_o[:, :npad], dd_o[:, :npad], sel_o[:kk * 4, :npad]
