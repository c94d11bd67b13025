"""Tiled (windowed-DMA) gradient sweeps for static-stencil meshes.

The stencil-mesh GG/WLS gradients are K rolls + FMAs over the whole field
(ops/gradients.py).  At million-cell sizes each full-field `jnp.roll` is a
slice+concat pair that XLA moves at a fraction of HBM peak (2.26M profile:
~1.3-1.5 ms per roll op — the dominant data-movement tail, BASELINE.md
round 4).  This kernel streams the same arithmetic through overlapping
lane windows (halo = max|offset|, single pass) with the feature rows
resident in VMEM, reading q and the per-offset geometry coefficients once.

Default ON for TPU stencil meshes >= 200k nodes (measured 565k coupled
step 27.06 -> 25.93 ms/iter, round 4); SU2_TPU_TILED_GRAD=1 forces it
anywhere, =0 disables.  Sharded meshes run it per shard under shard_map
with ppermute halo slabs (round 5, _gradient_tiled_rows_sharded).
Ulp-pinned against the roll path in interpret mode
(tests/test_gradients_tiled.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from su2_tpu.pallas.stencil_solve import (_VMEM_LIMIT, _TILE_W_CAP,
                                          _extend_lanes, _pad_lanes,
                                          _pad_rows8, _roll, _round128)


def tile_plan(mesh, ng: int):
    """(T, H, ntiles, E) for the tiled gradient sweep, or None."""
    if mesh.stencil_offsets is None or mesh.n_shards != 1:
        return None
    k = len(mesh.stencil_offsets)
    d = mesh.coords.shape[1]
    maxoff = max(abs(int(o)) for o in mesh.stencil_offsets)
    H = _round128(maxoff)
    # resident rows: q (ng) + coeff (k*d) + out (ng*d) + aux (d + 1) with
    # a 4x temporaries allowance (the K-sweep keeps rolled dq's live)
    rows = ng + k * d + ng * d + d + 1 + 4 * (ng + ng * d)
    W = min(_TILE_W_CAP, (_VMEM_LIMIT // (rows * 4)) // 128 * 128)
    T = W - 2 * H
    if T < max(8 * 128, H):
        return None
    npad = _round128(mesh.npoint)
    ntiles = -(-npad // T)
    E = ntiles * T + 2 * H
    return T, H, ntiles, E


@functools.partial(jax.jit, static_argnames=(
    "offsets", "ng", "d", "mode", "T", "H", "ntiles", "interpret"))
def _grad_tiled_call(q_e, coef_e, aux_e, *, offsets, ng, d, mode, T, H,
                     ntiles, interpret):
    """mode="WLS":  grad[g,dd] = sum_k coef[k,dd] * (q(p+o_k) - q(p))
       mode="GG":   acc[g,dd]  = sum_k 0.5 (q + q(p+o_k)) * coef[k,dd];
                    grad = (acc - q * aux[dd]) / aux[d]   (bnd normal, vol)
    q_e (ng, E); coef_e (k*d, E); aux_e (d+1, E) [GG only, zeros for WLS].
    Output (ng*d, ntiles*T)."""
    W = T + 2 * H
    dtype = q_e.dtype
    kk = len(offsets)

    def kernel(q_h, c_h, a_h, g_o, q_s, c_s, a_s, g_s, sems):
        i = pl.program_id(0)
        s = i * T
        cps = [
            pltpu.make_async_copy(q_h.at[:, pl.ds(s, W)], q_s, sems.at[0]),
            pltpu.make_async_copy(c_h.at[:, pl.ds(s, W)], c_s, sems.at[1]),
            pltpu.make_async_copy(a_h.at[:, pl.ds(s, W)], a_s, sems.at[2]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        q = q_s[...]
        coef = c_s[...]
        out = [None] * (ng * d)
        for k, o in enumerate(offsets):
            qr = _roll(q, o)
            if mode == "WLS":
                dq = qr - q
                for dd in range(d):
                    crow = coef[k * d + dd]
                    for g in range(ng):
                        t = crow * dq[g]
                        idx = g * d + dd
                        out[idx] = t if out[idx] is None else out[idx] + t
            else:
                avg = 0.5 * (q + qr)
                for dd in range(d):
                    crow = coef[k * d + dd]
                    for g in range(ng):
                        t = avg[g] * crow
                        idx = g * d + dd
                        out[idx] = t if out[idx] is None else out[idx] + t
        if mode == "GG":
            aux = a_s[...]
            vol = aux[d]
            safe_vol = jnp.where(vol > 0.0, vol, 1.0)
            for dd in range(d):
                for g in range(ng):
                    idx = g * d + dd
                    out[idx] = (out[idx] - q[g] * aux[dd]) / safe_vol
        rows = [o[None] for o in out]
        for _ in range(_pad8(ng * d) - ng * d):
            rows.append(jnp.zeros_like(rows[0]))
        g_s[...] = jnp.concatenate(rows, axis=0)
        cg = pltpu.make_async_copy(g_s.at[:, pl.ds(H, T)],
                                   g_o.at[:, pl.ds(s, T)], sems.at[3])
        cg.start()
        cg.wait()

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    hbmspec = pl.BlockSpec(memory_space=pltpu.HBM)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True),
        grid=(ntiles,),
        in_specs=[anyspec] * 3,
        out_specs=hbmspec,
        out_shape=jax.ShapeDtypeStruct((_pad8(ng * d), ntiles * T),
                                       dtype),
        scratch_shapes=[
            pltpu.VMEM((q_e.shape[0], W), dtype),
            pltpu.VMEM((coef_e.shape[0], W), dtype),
            pltpu.VMEM((aux_e.shape[0], W), dtype),
            pltpu.VMEM((_pad8(ng * d), W), dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(q_e, coef_e, aux_e)


def _pad8(r: int) -> int:
    return r + ((-r) % 8 if r > 8 else 0)


def _grad_operands(mesh, q, mode):
    """Lane-major (q_t, coef_t, aux_t) for the tiled sweep."""
    n, ng = q.shape
    d = mesh.coords.shape[1]
    if mode == "WLS":
        coef = mesh.wls_coeff.astype(q.dtype)       # (K, nP, d)
        aux = jnp.zeros((1, n), q.dtype)
    else:
        coef = mesh.gg_snormal.astype(q.dtype)      # (K, nP, d)
        aux = jnp.concatenate(
            [mesh.bnd_accum_normal.T, mesh.volume[None]],
            axis=0).astype(q.dtype)
    k = coef.shape[0]
    return q.T, coef.transpose(0, 2, 1).reshape(k * d, n), aux


def _gradient_tiled_rows_sharded(mesh, q, mode: str):
    """shard_map form of the tiled gradient sweep (verdict r5 item 1b):
    each shard runs the extended-lanes kernel on its contiguous lane
    block; the halo columns become a ppermute neighbor-slab exchange
    (parallel/tiled_shard.py).  Owner-region arithmetic is IDENTICAL to
    the single-shard kernel, so 8-dev == 1-dev to roll-path precision."""
    from su2_tpu.parallel import tiled_shard as tsh
    from su2_tpu.pallas.stencil_solve import _interpret

    n, ng = q.shape
    d = mesh.coords.shape[1]
    nsh = mesh.n_shards
    assert n % nsh == 0, (n, nsh)
    loc = n // nsh
    # per-shard plan: same VMEM-driven T/H sizing, local tile count
    k = len(mesh.stencil_offsets)
    maxoff = max(abs(int(o)) for o in mesh.stencil_offsets)
    H = _round128(maxoff)
    rows = ng + k * d + ng * d + d + 1 + 4 * (ng + ng * d)
    W = min(_TILE_W_CAP, (_VMEM_LIMIT // (rows * 4)) // 128 * 128)
    T = W - 2 * H
    if T < max(8 * 128, H):
        return None
    ntiles = -(-loc // T)
    E = ntiles * T + 2 * H
    q_t, coef_t, aux_t = _grad_operands(mesh, q, mode)
    offsets = tuple(mesh.stencil_offsets)
    interpret = _interpret()

    def local(q_l, c_l, a_l):
        ext = lambda x: _pad_rows8(tsh.halo_extend(x, H, E))
        g_o = _grad_tiled_call(
            ext(q_l), ext(c_l), ext(a_l), offsets=offsets, ng=ng, d=d,
            mode=mode, T=T, H=H, ntiles=ntiles, interpret=interpret)
        return g_o[:, :loc]

    g = tsh.sharded_lane_call(nsh, local, _pad8(ng * d),
                              q_t, coef_t, aux_t)
    return g[:ng * d]


def gradient_tiled_rows(mesh, q, mode: str):
    """(nP, nG) -> (nG*d, nP) feature-major gradient rows (row g*d + dd
    holds d(q_g)/dx_dd), the tiled stencil GG/WLS sweep WITHOUT the
    node-major relayout.

    The kernel's natural output is lane-major; transposing it to the
    (nP, nG, d) logical form forces XLA into a T(8,128)->T(2,128)
    retiling copy (~1.4 ms/iter for the two sweeps at 565k).  Feature-
    major consumers (the fused edge kernels' f_all stack, the tiled SST
    assembly) take these rows as-is; node-major consumers convert just
    the rows they need (ops/gradients.rows_to_grad)."""
    n, ng = q.shape
    d = mesh.coords.shape[1]
    if mesh.n_shards > 1:
        return _gradient_tiled_rows_sharded(mesh, q, mode)
    plan = tile_plan(mesh, ng)
    assert plan is not None
    T, H, ntiles, E = plan
    npad = _round128(n)
    ext = lambda x: _pad_rows8(_extend_lanes(_pad_lanes(x, npad), H, E))
    q_t, coef_t, aux_t = _grad_operands(mesh, q, mode)
    from su2_tpu.pallas.stencil_solve import _interpret
    g_o = _grad_tiled_call(
        ext(q_t), ext(coef_t), ext(aux_t),
        offsets=tuple(mesh.stencil_offsets), ng=ng,
        d=d, mode=mode, T=T, H=H, ntiles=ntiles, interpret=_interpret())
    return g_o[:ng * d, :n]


def gradient_tiled(mesh, q, mode: str):
    """(nP, nG) -> (nP, nG, d): the tiled form of the stencil GG/WLS
    sweep.  Caller guarantees mesh.stencil_offsets (and gg_snormal /
    wls_coeff per mode)."""
    n, ng = q.shape
    d = mesh.coords.shape[1]
    rows = gradient_tiled_rows(mesh, q, mode)
    if rows is None:
        return None
    # transpose-then-minor-split (see ops/gradients.rows_to_grad):
    # avoids the while-loop relayout lowering at 2.26M
    return rows.T.reshape(n, ng, d)
