"""Fused Krylov building blocks for static-stencil meshes (one pallas pass).

On a structured-ordered mesh (geometry/stencil.py) the off-diagonal block
product is K lane-rotates + elementwise block math.  For small block sizes
the whole preconditioner application fits in VMEM, so the multicolor
symmetric block-Gauss-Seidel sweep (the TPU form of the reference's LU-SGS,
Common/src/matrix_structure.cpp:479) and the following matvec collapse into
a single kernel launch instead of ~10 color updates x ~6 XLA ops each —
the implicit SST solve is op-dispatch bound at 9k-140k cells.

Layout: everything feature-major.  Blocks ride as (v*v, npad) rows
[m_00, m_01, .., m_{v-1,v-1}]; states as (v, npad).  npad is the node count
rounded up to the 128-lane boundary with zeroed pad columns: rolled-in
garbage is always multiplied by a zero off-diagonal block (stencil_select
routes missing neighbors to the zero pad block), and pad cells keep z = 0
because their dinv rows are zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic scoped-VMEM ceiling requested for these kernels (v5e has 128 MB of
# VMEM; the default 16 MB scoped limit rejects full-field sweeps well before
# physical capacity).
_VMEM_LIMIT = 96 * 1024 * 1024


def _est_stack_bytes(k: int, v: int, npad: int, ncolor: int,
                     sel_itemsize: int, itemsize: int = 4) -> int:
    """Conservative scoped-VMEM stack estimate for the fused sweep.

    Calibrated against a measured Mosaic allocation (k=4, v=2,
    npad=141824, bf16 sel -> 27.05 MB): the working set beyond the
    resident sel blocks is dominated by per-color temporaries (rolled
    states, block products, masks), modeled as
    (v*v [dinv] + ncolor [masks] + 6v [r/z/acc/zn/y] + k*v [rolls]) rows
    with a 2x safety factor."""
    sel_rows = k * v * v
    f32_rows = 2 * (v * v + ncolor + 6 * v + k * v)
    return npad * (sel_rows * sel_itemsize + f32_rows * itemsize)


def _pad_lanes(x, npad):
    extra = npad - x.shape[-1]
    if extra == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (extra,), x.dtype)], axis=-1)


# f32 sel keeps the original tight resident-blocks budget: wide-block f32
# sweeps that miss it measured slower than the bf16-sel + f32-XLA-matvec
# combination (flat plate v=7), so exceeding it should fall through to the
# bf16 tier rather than run a VMEM-thrashing f32 kernel.
_F32_SEL_BUDGET = 6 * 1024 * 1024

# Node cap (padded lanes) for the one-launch FGMRES kernels: the m-times
# unrolled MGS body over full-field vectors blows up Mosaic compile time
# AND runtime past ~50k lanes (measured at 144k nodes, v=2: 27 min compile,
# 8.0 ms/solve vs 1.24 ms for the launch-per-sweep XLA loop; at <=36k the
# one-launch kernel wins by ~1.6x).  Above the cap the solver falls back to
# the per-launch sweep kernels inside the XLA Krylov loop.
_FGMRES_NPAD_CAP = 49152


def supported(mesh, v: int, dtype, ncolor: int | None = None) -> bool:
    if mesh.stencil_offsets is None or mesh.n_shards != 1:
        return False
    if (jnp.dtype(dtype) == jnp.float64
            and jax.devices()[0].platform != "cpu"):
        # Mosaic has no f64 lowering on TPU (the high-precision tier runs
        # the XLA-emulated f64 path); CPU tests run these kernels in
        # interpret mode where f64 is fine
        return False
    k = len(mesh.stencil_offsets)
    npad = -(-mesh.npoint // 128) * 128
    itemsize = jnp.dtype(dtype).itemsize
    if dtype != jnp.bfloat16:
        import os
        if (v <= 3 and npad <= _FGMRES_NPAD_CAP
                and not os.environ.get("SU2_TPU_NARROW_F32_OFF")):
            # narrow blocks (SST/SA/scalar systems) stay fast well past the
            # wide-block budget (measured at 36k nodes, v=2: the f32
            # one-launch path is +62% step throughput over the bf16 tier);
            # the npad cap keeps Mosaic compile time sane — see
            # _FGMRES_NPAD_CAP
            est = _est_stack_bytes(k, v, npad, ncolor if ncolor else k + 1,
                                   itemsize)
            return est <= _VMEM_LIMIT
        return k * v * v * npad * itemsize <= _F32_SEL_BUDGET
    est = _est_stack_bytes(k, v, npad, ncolor if ncolor else k + 1, itemsize)
    return est <= _VMEM_LIMIT


def _fgmres_cap(m: int) -> int:
    """npad cap for the m-times-unrolled one-launch FGMRES body.  Mosaic
    compile time and the kernel's scheduling quality degrade with the
    unroll size ~ m^2 * npad (the MGS dot count), so the measured m=5 cap
    scales down quadratically for larger Krylov budgets."""
    return _FGMRES_NPAD_CAP * 25 // max(m * m, 1)


def fgmres_supported(mesh, v: int, dtype, ncolor: int,
                     m: int = 5) -> bool:
    """Whether the one-launch FGMRES kernel's working set fits VMEM: the
    f32 sweep budget plus the resident Krylov basis ((m+1) v's + m z's +
    scratch vectors)."""
    if not supported(mesh, v, dtype, ncolor) or dtype == jnp.bfloat16:
        return False
    k = len(mesh.stencil_offsets)
    npad = -(-mesh.npoint // 128) * 128
    if npad > _fgmres_cap(m):
        return False
    est = _est_stack_bytes(k, v, npad, ncolor,
                           jnp.dtype(dtype).itemsize)
    est += npad * (2 * m + 6) * v * 4
    return est <= _VMEM_LIMIT


def _cparams():
    """Raise the Mosaic scoped-VMEM ceiling: full-field sweeps at 100k+
    nodes exceed the default 16 MB scoped limit long before the 128 MB of
    physical VMEM; supported() models the stack against _VMEM_LIMIT."""
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _roll(x, off):
    """x[..., p] -> x[..., p + off] (wrap; wrapped lanes hit zero blocks).
    pltpu.roll wants a non-negative shift, so wrap it mod the lane count.
    `int()` keeps the shift a host int (numpy int64 offsets would trace as
    an i64 operand, which Mosaic's dynamic_rotate rejects under x64)."""
    return pltpu.roll(x, jnp.int32(int(-off) % x.shape[-1]), axis=x.ndim - 1)


def _offdiag(sel, x, offsets, v):
    """sum_k M_k x(p + o_k): sel (K*v*v, npad), x (v, npad) -> (v, npad)."""
    out = None
    for kk, off in enumerate(offsets):
        xs = _roll(x, off)                          # (v, npad)
        blk = sel[kk * v * v:(kk + 1) * v * v]      # (v*v, npad)
        rows = [
            sum(blk[a * v + b] * xs[b] for b in range(v)) for a in range(v)
        ]
        y = jnp.stack(rows, axis=0)
        out = y if out is None else out + y
    return out


def _bapply(blocks, x, v):
    """Block-diagonal product: blocks (v*v, npad), x (v, npad)."""
    return jnp.stack(
        [sum(blocks[a * v + b] * x[b] for b in range(v)) for a in range(v)],
        axis=0)


def _sgs_body(sel, dinv, masks, r, offsets, v, ncolor):
    z = jnp.zeros_like(r)
    # symmetric sweep minus the duplicate pivot pass: the first backward
    # color would recompute the last forward update with identical
    # inputs (proper coloring: no same-color neighbors)
    order = list(range(ncolor)) + list(range(ncolor - 2, -1, -1))
    for c in order:
        acc = r - _offdiag(sel, z, offsets, v)
        zn = _bapply(dinv, acc, v)
        m = masks[c][None, :]
        z = jnp.where(m > 0.5, zn, z)
    return z


@functools.partial(jax.jit,
                   static_argnames=("offsets", "v", "ncolor", "interpret"))
def _sgs_matvec_call(sel_t, dinv_t, diag_t, masks_t, r_t, *, offsets, v,
                     ncolor, interpret):
    npad = r_t.shape[-1]
    dtype = r_t.dtype

    def kernel(sel_ref, dinv_ref, diag_ref, masks_ref, r_ref, z_ref, w_ref):
        sel = sel_ref[...]
        z = _sgs_body(sel, dinv_ref[...], masks_ref[...], r_ref[...],
                      offsets, v, ncolor)
        z_ref[...] = z
        w_ref[...] = _bapply(diag_ref[...], z, v) + _offdiag(
            sel, z, offsets, v)

    full = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim)
    z, w = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else _cparams(),
        in_specs=[full(sel_t), full(dinv_t), full(diag_t), full(masks_t),
                  full(r_t)],
        out_specs=[full(r_t), full(r_t)],
        out_shape=[jax.ShapeDtypeStruct((v, npad), dtype)] * 2,
    )(sel_t, dinv_t, diag_t, masks_t, r_t)
    return z, w


@functools.partial(jax.jit,
                   static_argnames=("offsets", "v", "ncolor", "interpret"))
def _sgs_matvec_mixed_call(selp_t, selm_t, dinv_t, diag_t, masks_t, r_t, *,
                           offsets, v, ncolor, interpret):
    """Mixed per-iteration fused (z, A z): bf16 sweep blocks + f32 matvec
    blocks in one launch.  Unlike the monolithic FGMRES kernel this has a
    1x body (compile stays sane at any npad) and no resident Krylov basis,
    so it serves the bf16 tier above _FGMRES_NPAD_CAP — replacing one
    _sgs_call launch + the XLA roll matvec per Krylov iteration."""
    npad = r_t.shape[-1]
    dtype = r_t.dtype

    def kernel(selp_ref, selm_ref, dinv_ref, diag_ref, masks_ref, r_ref,
               z_ref, w_ref):
        z = _sgs_body(selp_ref[...], dinv_ref[...], masks_ref[...],
                      r_ref[...], offsets, v, ncolor)
        z_ref[...] = z
        w_ref[...] = _bapply(diag_ref[...], z, v) + _offdiag(
            selm_ref[...], z, offsets, v)

    full = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim)
    z, w = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else _cparams(),
        in_specs=[full(selp_t), full(selm_t), full(dinv_t), full(diag_t),
                  full(masks_t), full(r_t)],
        out_specs=[full(r_t), full(r_t)],
        out_shape=[jax.ShapeDtypeStruct((v, npad), dtype)] * 2,
    )(selp_t, selm_t, dinv_t, diag_t, masks_t, r_t)
    return z, w


def sgs_matvec_mixed_supported(mesh, v: int, ncolor: int) -> bool:
    """VMEM gate for the per-iteration mixed kernel: bf16 sweep stack +
    resident f32 matvec blocks (no Krylov basis)."""
    if mesh.stencil_offsets is None or mesh.n_shards != 1:
        return False
    k = len(mesh.stencil_offsets)
    npad = -(-mesh.npoint // 128) * 128
    est = _est_stack_bytes(k, v, npad, ncolor, 2)
    est += k * v * v * npad * 4
    return est <= _VMEM_LIMIT


@functools.partial(jax.jit,
                   static_argnames=("offsets", "v", "ncolor", "interpret"))
def _sgs_call(sel_t, dinv_t, masks_t, r_t, *, offsets, v, ncolor, interpret):
    """Preconditioner-only sweep: sel may be bf16 (block products promote to
    the state dtype), no diagonal matvec output."""
    npad = r_t.shape[-1]
    dtype = r_t.dtype

    def kernel(sel_ref, dinv_ref, masks_ref, r_ref, z_ref):
        z_ref[...] = _sgs_body(sel_ref[...], dinv_ref[...], masks_ref[...],
                               r_ref[...], offsets, v, ncolor)

    full = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else _cparams(),
        in_specs=[full(sel_t), full(dinv_t), full(masks_t), full(r_t)],
        out_specs=full(r_t),
        out_shape=jax.ShapeDtypeStruct((v, npad), dtype),
    )(sel_t, dinv_t, masks_t, r_t)


@functools.partial(jax.jit, static_argnames=("offsets", "v", "interpret"))
def _matvec_call(sel_t, diag_t, x_t, *, offsets, v, interpret):
    npad = x_t.shape[-1]
    dtype = x_t.dtype

    def kernel(sel_ref, diag_ref, x_ref, y_ref):
        x = x_ref[...]
        y_ref[...] = _bapply(diag_ref[...], x, v) + _offdiag(
            sel_ref[...], x, offsets, v)

    full = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else _cparams(),
        in_specs=[full(sel_t), full(diag_t), full(x_t)],
        out_specs=full(x_t),
        out_shape=jax.ShapeDtypeStruct((v, npad), dtype),
    )(sel_t, diag_t, x_t)



def _fgmres_body(selp, selm, dinv, diag, masks, b, *, offsets, v, ncolor,
                 m, tol):
    """Shared FGMRES cycle body (values, not refs): right-preconditioned,
    multicolor-SGS sweep reading `selp` (may be bf16), matvec reading
    `selm` (full precision; selp is selm on the pure-f32 path).  Replicates
    krylov.fgmres arithmetic — pow2 scaling, modified Gram-Schmidt,
    Givens-rotation residual recurrence, back-substitution.  Returns
    (x, rel_residual, iters)."""
    dtype = b.dtype

    # ---- _pow2_scale: exact exponent-shift normalization ----
    absmax = jnp.max(jnp.abs(b))
    ex = jnp.floor(jnp.log2(jnp.maximum(absmax, 1e-300)))
    s = jnp.exp2(jnp.clip(ex, -120.0, 120.0)).astype(dtype)
    s = jnp.where(absmax > 0, s, jnp.ones_like(s))
    b = b / s

    def dot(a, c):
        return jnp.sum(a * c)

    def norm(a):
        return jnp.sqrt(dot(a, a))

    r = b                                     # x0 = 0
    beta = norm(r)
    norm0 = jnp.maximum(norm(b), 1e-300)
    one = jnp.ones_like(beta)
    zero = jnp.zeros_like(beta)

    vs = [r / jnp.maximum(beta, 1e-300)]
    zs = []
    cols = []
    cs, sn = [], []
    g = [beta]
    active = beta / norm0 >= tol
    iters = zero
    res_hist = beta
    for j in range(m):
        z = _sgs_body(selp, dinv, masks, vs[j], offsets, v, ncolor)
        w = _bapply(diag, z, v) + _offdiag(selm, z, offsets, v)
        zs.append(z)
        col = []
        for i in range(j + 1):
            hij = dot(vs[i], w)
            hij = jnp.where(active, hij, one * (i == j))
            col.append(hij)
            w = w - jnp.where(active, hij, 0.0) * vs[i]
        hj1 = norm(w)
        hj1 = jnp.where(active, hj1, 0.0)
        vs.append(jnp.where(active, w / jnp.maximum(hj1, 1e-300), vs[j]))
        iters = iters + active.astype(dtype)
        rc = list(col) + [hj1]
        for i in range(j):
            t = cs[i] * rc[i] + sn[i] * rc[i + 1]
            rc[i + 1] = -sn[i] * rc[i] + cs[i] * rc[i + 1]
            rc[i] = t
        denom = jnp.sqrt(rc[j] * rc[j] + rc[j + 1] * rc[j + 1])
        safe = jnp.maximum(denom, 1e-300)
        cj = jnp.where(denom == 0.0, one, rc[j] / safe)
        sj = jnp.where(denom == 0.0, zero, rc[j + 1] / safe)
        cs.append(cj)
        sn.append(sj)
        gj1 = -sj * g[j]
        g[j] = cj * g[j]
        g.append(gj1)
        cur = jnp.abs(gj1)
        res_hist = jnp.where(active, cur, res_hist)
        active = active & (cur / norm0 >= tol)
        cols.append(rc[:j] + [cj * rc[j] + sj * rc[j + 1]])

    # back-substitution on the Givens-rotated R (krylov.fgmres tail)
    y = [zero] * m
    for j in range(m - 1, -1, -1):
        acc = g[j]
        for i in range(j + 1, m):
            acc = acc - cols[i][j] * y[i]
        rjj = cols[j][j]
        y[j] = acc / jnp.where(rjj == 0.0, 1.0, rjj)
        y[j] = jnp.where(rjj == 0.0, zero, y[j])
    dx = zs[0] * y[0]
    for j in range(1, m):
        dx = dx + y[j] * zs[j]
    return dx * s, res_hist / norm0, iters


@functools.partial(jax.jit, static_argnames=("offsets", "v", "ncolor", "m",
                                              "tol", "interpret"))
def _fgmres_call(sel_t, dinv_t, diag_t, masks_t, b_t, *, offsets, v, ncolor,
                 m, tol, interpret):
    """ONE pallas launch for a whole FGMRES cycle (right-preconditioned,
    multicolor-SGS preconditioner, m Krylov vectors) — see _fgmres_body.
    The ~10 kernel launches + ~400 scalar XLA ops of the driver-side loop
    collapse into a single launch; all basis vectors stay VMEM-resident.

    Returns (x_t, stats) with stats (2, 128): row 0 = final relative
    residual, row 1 = iterations used."""
    npad = b_t.shape[-1]
    dtype = b_t.dtype

    def kernel(sel_ref, dinv_ref, diag_ref, masks_ref, b_ref, x_ref,
               stats_ref):
        sel = sel_ref[...]
        x, rel, iters = _fgmres_body(
            sel, sel, dinv_ref[...], diag_ref[...], masks_ref[...],
            b_ref[...], offsets=offsets, v=v, ncolor=ncolor, m=m, tol=tol)
        x_ref[...] = x
        stats_ref[0, :] = jnp.broadcast_to(rel, (128,))
        stats_ref[1, :] = jnp.broadcast_to(iters, (128,))

    full = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim)
    x_t, stats = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else _cparams(),
        in_specs=[full(sel_t), full(dinv_t), full(diag_t), full(masks_t),
                  full(b_t)],
        out_specs=[full(b_t), pl.BlockSpec((2, 128), lambda: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((v, npad), dtype),
                   jax.ShapeDtypeStruct((2, 128), dtype)],
    )(sel_t, dinv_t, diag_t, masks_t, b_t)
    return x_t, stats


def fgmres_mixed_supported(mesh, v: int, ncolor: int, m: int = 5) -> bool:
    """VMEM gate for the mixed-tier one-launch FGMRES: bf16 sweep blocks +
    f32 matvec blocks + the resident Krylov basis."""
    if mesh.stencil_offsets is None or mesh.n_shards != 1:
        return False
    k = len(mesh.stencil_offsets)
    npad = -(-mesh.npoint // 128) * 128
    if npad > _fgmres_cap(m):
        return False
    est = _est_stack_bytes(k, v, npad, ncolor, 2)      # bf16 sweep stack
    est += k * v * v * npad * 4                        # resident f32 sel
    est += npad * (2 * m + 6) * v * 4                  # Krylov basis
    return est <= _VMEM_LIMIT


@functools.partial(jax.jit, static_argnames=("offsets", "v", "ncolor", "m",
                                              "tol", "interpret"))
def _fgmres_mixed_call(selp_t, selm_t, dinv_t, diag_t, masks_t, b_t, *,
                       offsets, v, ncolor, m, tol, interpret):
    """Mixed-tier one-launch FGMRES: the SGS sweep reads bf16 off-diagonal
    blocks (quality-only preconditioner — exactly the shipped bf16 tier),
    the Krylov matvec reads the f32 blocks, all VMEM-resident — see
    _fgmres_body.  Replicates the XLA path (bf16 _sgs_call sweeps + f32
    matvec + krylov.fgmres) in one launch."""
    npad = b_t.shape[-1]
    dtype = b_t.dtype

    def kernel(selp_ref, selm_ref, dinv_ref, diag_ref, masks_ref, b_ref,
               x_ref, stats_ref):
        x, rel, iters = _fgmres_body(
            selp_ref[...], selm_ref[...], dinv_ref[...], diag_ref[...],
            masks_ref[...], b_ref[...], offsets=offsets, v=v,
            ncolor=ncolor, m=m, tol=tol)
        x_ref[...] = x
        stats_ref[0, :] = jnp.broadcast_to(rel, (128,))
        stats_ref[1, :] = jnp.broadcast_to(iters, (128,))

    full = lambda a: pl.BlockSpec(a.shape, lambda: (0,) * a.ndim)
    x_t, stats = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else _cparams(),
        in_specs=[full(selp_t), full(selm_t), full(dinv_t), full(diag_t),
                  full(masks_t), full(b_t)],
        out_specs=[full(b_t), pl.BlockSpec((2, 128), lambda: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((v, npad), dtype),
                   jax.ShapeDtypeStruct((2, 128), dtype)],
    )(selp_t, selm_t, dinv_t, diag_t, masks_t, b_t)
    return x_t, stats


def _interpret():
    return jax.devices()[0].platform != "tpu"


# ---------------------------------------------------------------------------
# Tiled / streaming tier (round-4): fields too large for the VMEM-resident
# kernels stream through in overlapping lane windows.  Each grid step DMAs
# a [i*T, i*T + T + 2H) window of every operand from HBM into VMEM scratch,
# runs the SAME _sgs_body / _offdiag arithmetic on the window, and writes
# back only the owner region [H, H+T).
#
# Exactness: one color pass reads neighbors within max|offset| lanes, so
# after p passes the window's outer p*maxoff lanes are stale.  With
# H >= (npass + 1) * maxoff (npass = 2*ncolor - 1 sweep passes + 1 matvec
# read) the owner region sees exactly the same operand values as the
# full-field kernel at every pass — results are bitwise identical.  Window
# edges that roll in zeros (instead of the full kernel's wrapped lanes)
# only feed lanes whose products multiply zero blocks, as in the
# full-field kernel.
# ---------------------------------------------------------------------------


def _round128(x: int) -> int:
    return -(-int(x) // 128) * 128


# Window-width cap for the tiled kernels: Mosaic compile time grows
# superlinearly with the per-instance window (measured on the 420k-lane
# v=2 mixed kernel: W=157k -> 1095 s, W=64k -> ~150 s; runtime at W=64k
# beat the XLA roll fallback 1.32 vs 2.22 ms/apply, bitwise identical).
_TILE_W_CAP = 65536


def tile_plan(mesh, v: int, ncolor: int, sel_itemsize: int,
              with_f32_matvec_sel: bool):
    """(T, H, ntiles, E) for the tiled sweep kernels, or None when the
    stencil form is unavailable or the halo would dominate the tile."""
    if mesh.stencil_offsets is None or mesh.n_shards != 1:
        return None
    k = len(mesh.stencil_offsets)
    maxoff = max(abs(int(o)) for o in mesh.stencil_offsets)
    npass = 2 * ncolor - 1
    H = _round128((npass + 1) * maxoff)
    # resident scratch bytes/lane + the _est_stack temporaries model
    bpl = k * v * v * sel_itemsize \
        + (k * v * v * 4 if with_f32_matvec_sel else 0) \
        + 2 * v * v * 4 + ncolor * 4 + 4 * v * 4 \
        + 2 * (v * v + ncolor + 6 * v + k * v) * 4
    # 12% headroom on the scoped-VMEM budget: the bpl temporaries model
    # under-predicted by ~6% on the 3D flow shapes (v=8, k=6 — Mosaic
    # scoped OOM at W sized to the full limit, round-5 3D profiling)
    W = min(_TILE_W_CAP, (_VMEM_LIMIT * 22 // 25 // bpl) // 128 * 128)
    T = W - 2 * H
    if T < max(8 * 128, H):        # halo overhead > 2x: not worth it
        return None
    npad = _round128(mesh.npoint)
    ntiles = -(-npad // T)
    E = ntiles * T + 2 * H
    return T, H, ntiles, E


def _extend_lanes(x_t, H: int, E: int):
    """[zeros(H) | x | zeros] lane padding to length E."""
    n = x_t.shape[-1]
    lo = jnp.zeros(x_t.shape[:-1] + (H,), x_t.dtype)
    hi = jnp.zeros(x_t.shape[:-1] + (E - H - n,), x_t.dtype)
    return jnp.concatenate([lo, x_t, hi], axis=-1)


def _pad_rows8(x):
    """Pad the ROW (sublane) dimension to a multiple of 8: Mosaic rejects
    windowed DMAs whose row extent spans sublane tiles unevenly ("Slice
    shape along dimension 0 must be aligned to tiling (8)").  Row padding
    rides at the END, after every indexed block, so kernel row indexing
    is unchanged; padded rows carry zeros (inputs) or garbage that the
    caller slices off (outputs)."""
    r = x.shape[0]
    pad = (-r) % 8
    if pad == 0 or r <= 8:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "offsets", "v", "ncolor", "T", "H", "ntiles", "interpret", "r_unext"))
def _tiled_sgs_matvec_call(sel_e, dinv_e, diag_e, masks_e, r_e, *, offsets,
                           v, ncolor, T, H, ntiles, interpret,
                           r_unext: bool = False):
    """Tiled fused (z, A z): one sel array serves sweep and matvec (f32
    path).  Inputs are lane-extended (see _extend_lanes); outputs are
    (v, ntiles*T) — caller slices [:, :npad].  r_unext: r rides at the
    padded output width, repositioned in-kernel (see the mixed call)."""
    W = T + 2 * H
    npad_t = ntiles * T
    dtype = r_e.dtype
    kk = len(offsets)

    def kernel(sel_h, dinv_h, diag_h, masks_h, r_h, z_o, w_o,
               sel_s, dinv_s, diag_s, masks_s, r_s, z_s, w_s, sems):
        i = pl.program_id(0)
        s = i * T
        cps = [
            pltpu.make_async_copy(sel_h.at[:, pl.ds(s, W)], sel_s,
                                  sems.at[0]),
            pltpu.make_async_copy(dinv_h.at[:, pl.ds(s, W)], dinv_s,
                                  sems.at[1]),
            pltpu.make_async_copy(diag_h.at[:, pl.ds(s, W)], diag_s,
                                  sems.at[2]),
            pltpu.make_async_copy(masks_h.at[:, pl.ds(s, W)], masks_s,
                                  sems.at[3]),
        ]
        if r_unext:
            # all terms are 128-multiples; the //128*128 is an identity
            # that makes the divisibility PROVABLE to Mosaic (needed when
            # XLA places r_h in VMEM — dynamic vmem slices must prove
            # 128-alignment, and it can't see through clip)
            sc = jnp.clip((s - H) // 128, 0, (npad_t - W) // 128) * 128
            cps.append(pltpu.make_async_copy(
                r_h.at[:, pl.ds(sc, W)], r_s, sems.at[4]))
        else:
            cps.append(pltpu.make_async_copy(
                r_h.at[:, pl.ds(s, W)], r_s, sems.at[4]))
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        r_w = r_s[...]
        if r_unext:
            delta = sc - (s - H)
            r_w = pltpu.roll(r_w, jnp.int32(delta % W), axis=1)
            gidx = jax.lax.broadcasted_iota(jnp.int32, (v, W), 1) \
                + (s - H)
            r_w = jnp.where((gidx >= 0) & (gidx < npad_t), r_w, 0.0)
        sel = sel_s[...]
        z = _sgs_body(sel, dinv_s[...], masks_s[...], r_w,
                      offsets, v, ncolor)
        z_s[...] = z
        w_s[...] = _bapply(diag_s[...], z, v) + _offdiag(sel, z, offsets, v)
        cz = pltpu.make_async_copy(z_s.at[:, pl.ds(H, T)],
                                   z_o.at[:, pl.ds(s, T)], sems.at[5])
        cw = pltpu.make_async_copy(w_s.at[:, pl.ds(H, T)],
                                   w_o.at[:, pl.ds(s, T)], sems.at[6])
        cz.start()
        cw.start()
        cz.wait()
        cw.wait()

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    hbmspec = pl.BlockSpec(memory_space=pltpu.HBM)
    z_o, w_o = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True),
        grid=(ntiles,),
        in_specs=[anyspec] * 5,
        out_specs=[hbmspec] * 2,
        out_shape=[jax.ShapeDtypeStruct((v, ntiles * T), dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((sel_e.shape[0], W), sel_e.dtype),
            pltpu.VMEM((dinv_e.shape[0], W), dtype),
            pltpu.VMEM((diag_e.shape[0], W), dtype),
            pltpu.VMEM((masks_e.shape[0], W), dtype),
            pltpu.VMEM((v, W), dtype),
            pltpu.VMEM((v, W), dtype),
            pltpu.VMEM((v, W), dtype),
            pltpu.SemaphoreType.DMA((7,)),
        ],
    )(sel_e, dinv_e, diag_e, masks_e, r_e)
    return z_o, w_o


@functools.partial(jax.jit, static_argnames=(
    "offsets", "v", "ncolor", "T", "H", "ntiles", "interpret", "r_unext"))
def _tiled_sgs_matvec_mixed_call(selp_e, selm_e, dinv_e, diag_e, masks_e,
                                 r_e, *, offsets, v, ncolor, T, H, ntiles,
                                 interpret, r_unext: bool = False):
    """Tiled mixed (z, A z): bf16 sweep blocks + f32 matvec blocks, the
    streaming form of _sgs_matvec_mixed_call.

    r_unext=True: r rides UNEXTENDED at the padded output width
    (v, ntiles*T) — the kernel DMAs a clamped window and repositions it
    with a dynamic lane roll + in-range mask, so per-Krylov-iteration
    callers skip the host-side halo concat (measured 1.3-1.5 ms per op
    at 2.26M lanes) and the whole Krylov loop runs at the output width."""
    W = T + 2 * H
    npad_t = ntiles * T
    dtype = r_e.dtype
    kk = len(offsets)

    def kernel(selp_h, selm_h, dinv_h, diag_h, masks_h, r_h, z_o, w_o,
               selp_s, selm_s, dinv_s, diag_s, masks_s, r_s, z_s, w_s,
               sems):
        i = pl.program_id(0)
        s = i * T
        cps = [
            pltpu.make_async_copy(selp_h.at[:, pl.ds(s, W)], selp_s,
                                  sems.at[0]),
            pltpu.make_async_copy(selm_h.at[:, pl.ds(s, W)], selm_s,
                                  sems.at[1]),
            pltpu.make_async_copy(dinv_h.at[:, pl.ds(s, W)], dinv_s,
                                  sems.at[2]),
            pltpu.make_async_copy(diag_h.at[:, pl.ds(s, W)], diag_s,
                                  sems.at[3]),
            pltpu.make_async_copy(masks_h.at[:, pl.ds(s, W)], masks_s,
                                  sems.at[4]),
        ]
        if r_unext:
            # clamped window from the unextended buffer; reposition by a
            # dynamic roll and zero the out-of-range halo lanes.  delta =
            # sc - (s - H) in [-(W - T), H]; roll is mod-W.  The //128*128
            # is an identity (all terms are 128-multiples) that makes the
            # slice alignment PROVABLE to Mosaic for VMEM-resident r_h.
            sc = jnp.clip((s - H) // 128, 0, (npad_t - W) // 128) * 128
            cps.append(pltpu.make_async_copy(
                r_h.at[:, pl.ds(sc, W)], r_s, sems.at[5]))
        else:
            cps.append(pltpu.make_async_copy(
                r_h.at[:, pl.ds(s, W)], r_s, sems.at[5]))
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        r_w = r_s[...]
        if r_unext:
            delta = sc - (s - H)
            r_w = pltpu.roll(r_w, jnp.int32(delta % W), axis=1)
            gidx = jax.lax.broadcasted_iota(jnp.int32, (v, W), 1) \
                + (s - H)
            r_w = jnp.where((gidx >= 0) & (gidx < npad_t), r_w, 0.0)
        z = _sgs_body(selp_s[...], dinv_s[...], masks_s[...], r_w,
                      offsets, v, ncolor)
        z_s[...] = z
        w_s[...] = _bapply(diag_s[...], z, v) + _offdiag(
            selm_s[...], z, offsets, v)
        cz = pltpu.make_async_copy(z_s.at[:, pl.ds(H, T)],
                                   z_o.at[:, pl.ds(s, T)], sems.at[6])
        cw = pltpu.make_async_copy(w_s.at[:, pl.ds(H, T)],
                                   w_o.at[:, pl.ds(s, T)], sems.at[7])
        cz.start()
        cw.start()
        cz.wait()
        cw.wait()

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    hbmspec = pl.BlockSpec(memory_space=pltpu.HBM)
    z_o, w_o = pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True),
        grid=(ntiles,),
        in_specs=[anyspec] * 6,
        out_specs=[hbmspec] * 2,
        out_shape=[jax.ShapeDtypeStruct((v, ntiles * T), dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((selp_e.shape[0], W), selp_e.dtype),
            pltpu.VMEM((selm_e.shape[0], W), selm_e.dtype),
            pltpu.VMEM((dinv_e.shape[0], W), dtype),
            pltpu.VMEM((diag_e.shape[0], W), dtype),
            pltpu.VMEM((masks_e.shape[0], W), dtype),
            pltpu.VMEM((v, W), dtype),
            pltpu.VMEM((v, W), dtype),
            pltpu.VMEM((v, W), dtype),
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )(selp_e, selm_e, dinv_e, diag_e, masks_e, r_e)
    return z_o, w_o


@functools.partial(jax.jit, static_argnames=(
    "offsets", "v", "ncolor", "T", "H", "ntiles", "interpret"))
def _tiled_sgs_call(sel_e, dinv_e, masks_e, r_e, *, offsets, v, ncolor, T,
                    H, ntiles, interpret):
    """Tiled preconditioner-only sweep (sel may be bf16)."""
    W = T + 2 * H
    dtype = r_e.dtype
    kk = len(offsets)

    def kernel(sel_h, dinv_h, masks_h, r_h, z_o,
               sel_s, dinv_s, masks_s, r_s, z_s, sems):
        i = pl.program_id(0)
        s = i * T
        cps = [
            pltpu.make_async_copy(sel_h.at[:, pl.ds(s, W)], sel_s,
                                  sems.at[0]),
            pltpu.make_async_copy(dinv_h.at[:, pl.ds(s, W)], dinv_s,
                                  sems.at[1]),
            pltpu.make_async_copy(masks_h.at[:, pl.ds(s, W)], masks_s,
                                  sems.at[2]),
            pltpu.make_async_copy(r_h.at[:, pl.ds(s, W)], r_s, sems.at[3]),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        z_s[...] = _sgs_body(sel_s[...], dinv_s[...], masks_s[...],
                             r_s[...], offsets, v, ncolor)
        cz = pltpu.make_async_copy(z_s.at[:, pl.ds(H, T)],
                                   z_o.at[:, pl.ds(s, T)], sems.at[4])
        cz.start()
        cz.wait()

    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    hbmspec = pl.BlockSpec(memory_space=pltpu.HBM)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True),
        grid=(ntiles,),
        in_specs=[anyspec] * 4,
        out_specs=hbmspec,
        out_shape=jax.ShapeDtypeStruct((v, ntiles * T), dtype),
        scratch_shapes=[
            pltpu.VMEM((sel_e.shape[0], W), sel_e.dtype),
            pltpu.VMEM((dinv_e.shape[0], W), dtype),
            pltpu.VMEM((masks_e.shape[0], W), dtype),
            pltpu.VMEM((v, W), dtype),
            pltpu.VMEM((v, W), dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )(sel_e, dinv_e, masks_e, r_e)


class TiledStencilOps:
    """Streaming counterpart of StencilSolveOps for fields above the
    VMEM-resident gates: per-application the operands are re-streamed in
    overlapping windows, so sel is read ~(1 + 2H/T)x per call instead of
    (2*ncolor-1)x as in the XLA roll fallback.

    mixed=True keeps bf16 sweep blocks + f32 matvec blocks (the
    linear-tolerance contract of the mixed tier); mixed=False uses the
    f32/f64 blocks for both."""

    def __init__(self, mesh, sel, dinv, diag, color_masks, plan,
                 mixed: bool, sel_is_t: bool = False):
        self.v = dinv.shape[-1]
        self.n = dinv.shape[0]
        self.offsets = tuple(mesh.stencil_offsets)
        self.npad = _round128(self.n)
        self.T, self.H, self.ntiles, self.E = plan
        self.ncolor = len(color_masks)
        self.mixed = mixed
        v, n, npad = self.v, self.n, self.npad
        ext = lambda x: _extend_lanes(_pad_lanes(x, npad), self.H, self.E)
        tt = lambda b: ext(b.transpose(1, 2, 0).reshape(v * v, n))
        sel_t = (sel if sel_is_t
                 else sel.transpose(0, 2, 3, 1).reshape(
                     len(self.offsets) * v * v, n))
        # _pad_rows8: Mosaic windowed DMAs need sublane-aligned rows
        self.selm_e = _pad_rows8(ext(sel_t))
        self.selp_e = (self.selm_e.astype(jnp.bfloat16) if mixed
                       else self.selm_e)
        self.dinv_e = _pad_rows8(tt(dinv))
        self.diag_e = _pad_rows8(tt(diag))
        self.masks_e = _pad_rows8(ext(jnp.stack([
            m.astype(dinv.dtype) for m in color_masks])))

    def _to_e(self, x):
        return _extend_lanes(_pad_lanes(x.T, self.npad), self.H, self.E)

    def _from_o(self, x_o):
        return x_o[:, :self.n].T

    def precond_matvec(self, r):
        kw = dict(offsets=self.offsets, v=self.v, ncolor=self.ncolor,
                  T=self.T, H=self.H, ntiles=self.ntiles,
                  interpret=_interpret(), r_unext=True)
        r_w = _pad_lanes(r.T, self.ntiles * self.T)
        if self.mixed:
            z_o, w_o = _tiled_sgs_matvec_mixed_call(
                self.selp_e, self.selm_e, self.dinv_e, self.diag_e,
                self.masks_e, r_w, **kw)
        else:
            z_o, w_o = _tiled_sgs_matvec_call(
                self.selm_e, self.dinv_e, self.diag_e, self.masks_e,
                r_w, **kw)
        return self._from_o(z_o), self._from_o(w_o)

    def precond(self, r):
        z_o = _tiled_sgs_call(
            self.selp_e, self.dinv_e, self.masks_e, self._to_e(r),
            offsets=self.offsets, v=self.v, ncolor=self.ncolor,
            T=self.T, H=self.H, ntiles=self.ntiles, interpret=_interpret())
        return self._from_o(z_o)


def tile_plan_sharded(mesh, v: int, ncolor: int, sel_itemsize: int,
                      with_f32_matvec_sel: bool):
    """Per-SHARD (T, H, ntiles, E, loc) for the shard_map'd tiled sweeps,
    or None.  Same VMEM-driven T/H sizing as tile_plan; tile count covers
    the local contiguous lane block.

    Default ON for multi-chip TPU runs (the resident one-launch tiers are
    single-shard by construction, so tiled is the multi-chip production
    solve tier); SU2_TPU_TILED_SOLVE=1 forces it anywhere (CPU interpret
    tests), =0 disables (XLA roll fallback under GSPMD)."""
    import os
    if mesh.stencil_offsets is None or mesh.n_shards <= 1:
        return None
    if mesh.npoint % mesh.n_shards != 0:
        return None
    env = os.environ.get("SU2_TPU_TILED_SOLVE", "")
    if env == "0":
        return None
    if env != "1" and jax.devices()[0].platform != "tpu":
        return None
    loc = mesh.npoint // mesh.n_shards
    k = len(mesh.stencil_offsets)
    maxoff = max(abs(int(o)) for o in mesh.stencil_offsets)
    npass = 2 * ncolor - 1
    H = _round128((npass + 1) * maxoff)
    bpl = k * v * v * sel_itemsize \
        + (k * v * v * 4 if with_f32_matvec_sel else 0) \
        + 2 * v * v * 4 + ncolor * 4 + 4 * v * 4 \
        + 2 * (v * v + ncolor + 6 * v + k * v) * 4
    # 12% headroom on the scoped-VMEM budget: the bpl temporaries model
    # under-predicted by ~6% on the 3D flow shapes (v=8, k=6 — Mosaic
    # scoped OOM at W sized to the full limit, round-5 3D profiling)
    W = min(_TILE_W_CAP, (_VMEM_LIMIT * 22 // 25 // bpl) // 128 * 128)
    T = W - 2 * H
    if T < max(8 * 128, H):
        return None
    ntiles = -(-loc // T)
    E = ntiles * T + 2 * H
    return T, H, ntiles, E, loc


class ShardedTiledStencilOps:
    """shard_map composition of the tiled sweep kernels (round-5 verdict
    item 1b): each shard runs the SAME extended-lanes kernel on its
    contiguous lane block, with the halo columns — carrying true neighbor
    values this time — exchanged as ppermute slabs
    (parallel/tiled_shard.halo_extend).  Owner-region sweep results are
    identical to the global tiled kernel because the sweep's dependency
    radius (2*ncolor-1 passes x maxoff) is covered by H, exactly the
    argument that pins the single-chip tiled tier bitwise to the
    full-field kernels."""

    def __init__(self, mesh, sel, dinv, diag, color_masks, plan,
                 mixed: bool, sel_is_t: bool = False):
        self.v = dinv.shape[-1]
        self.n = dinv.shape[0]
        self.nsh = mesh.n_shards
        self.offsets = tuple(mesh.stencil_offsets)
        self.T, self.H, self.ntiles, self.E, self.loc = plan
        self.ncolor = len(color_masks)
        self.mixed = mixed
        v, n = self.v, self.n
        tt = lambda b: b.transpose(1, 2, 0).reshape(v * v, n)
        sel_t = (sel if sel_is_t
                 else sel.transpose(0, 2, 3, 1).reshape(
                     len(self.offsets) * v * v, n))
        # UNextended lane-major operands (global, GSPMD-sharded); halo
        # extension happens per shard inside the shard_map call
        self.selm_t = sel_t
        self.selp_t = sel_t.astype(jnp.bfloat16) if mixed else sel_t
        self.dinv_t = tt(dinv)
        self.diag_t = tt(diag)
        self.masks_t = jnp.stack([m.astype(dinv.dtype)
                                  for m in color_masks])

    def _kw(self):
        return dict(offsets=self.offsets, v=self.v, ncolor=self.ncolor,
                    T=self.T, H=self.H, ntiles=self.ntiles,
                    interpret=_interpret(), r_unext=False)

    def precond_matvec(self, r):
        from su2_tpu.parallel import tiled_shard as tsh
        H, E, loc = self.H, self.E, self.loc

        if self.mixed:
            def local(selp_l, selm_l, dinv_l, diag_l, masks_l, r_l):
                ext = lambda x: _pad_rows8(tsh.halo_extend(x, H, E))
                z_o, w_o = _tiled_sgs_matvec_mixed_call(
                    ext(selp_l), ext(selm_l), ext(dinv_l), ext(diag_l),
                    ext(masks_l), ext(r_l), **self._kw())
                return z_o[:, :loc], w_o[:, :loc]
            z, w = tsh.sharded_lane_call(
                self.nsh, local, self.v, self.selp_t, self.selm_t,
                self.dinv_t, self.diag_t, self.masks_t, r.T)
        else:
            def local(selm_l, dinv_l, diag_l, masks_l, r_l):
                ext = lambda x: _pad_rows8(tsh.halo_extend(x, H, E))
                z_o, w_o = _tiled_sgs_matvec_call(
                    ext(selm_l), ext(dinv_l), ext(diag_l), ext(masks_l),
                    ext(r_l), **self._kw())
                return z_o[:, :loc], w_o[:, :loc]
            z, w = tsh.sharded_lane_call(
                self.nsh, local, self.v, self.selm_t, self.dinv_t,
                self.diag_t, self.masks_t, r.T)
        return z.T, w.T

    def precond(self, r):
        from su2_tpu.parallel import tiled_shard as tsh
        H, E, loc = self.H, self.E, self.loc
        kw = dict(offsets=self.offsets, v=self.v, ncolor=self.ncolor,
                  T=self.T, H=self.H, ntiles=self.ntiles,
                  interpret=_interpret())

        def local(selp_l, dinv_l, masks_l, r_l):
            ext = lambda x: _pad_rows8(tsh.halo_extend(x, H, E))
            z_o = _tiled_sgs_call(ext(selp_l), ext(dinv_l), ext(masks_l),
                                  ext(r_l), **kw)
            return z_o[:, :loc]

        z = tsh.sharded_lane_call(self.nsh, local, self.v, self.selp_t,
                                  self.dinv_t, self.masks_t, r.T)
        return z.T


class StencilSolveOps:
    """Per-solve fused operators: transpose/pad the block data once, then
    every application is a single kernel launch.

    sel: (K, nP, v, v) from blockcsr.gather_offdiag (stencil form);
    dinv, diag: (nP, v, v); color_masks: list of (nP,) bool.

    sel_dtype: storage dtype for the off-diagonal blocks inside the kernel.
    bf16 halves the VMEM/HBM footprint so block sizes that miss the f32
    budget still run the sweep as one launch; block products promote back
    to the state dtype.  bf16 sel is preconditioner-quality only — in that
    mode `precond_matvec`/`matvec` are withheld (None) and the caller must
    run the Krylov matvec at full precision.
    """

    def __init__(self, mesh, sel, dinv, diag, color_masks, sel_dtype=None,
                 sel_is_t=False, m: int = 5):
        if sel_is_t:
            # sel already in the lane layout (K*v*v, n) — e.g. straight from
            # the fused implicit edge kernel (StencilJacobianT): no relayout
            n, v = dinv.shape[0], dinv.shape[-1]
        else:
            k, n, v, _ = sel.shape
        self.v = v
        self.n = n
        self.offsets = tuple(mesh.stencil_offsets)
        npad = -(-n // 128) * 128
        self.npad = npad
        self.mixed = sel_dtype is not None and sel_dtype != sel.dtype
        tt = lambda b: _pad_lanes(
            b.transpose(1, 2, 0).reshape(v * v, n), npad)
        self.sel_t = _pad_lanes(
            sel if sel_is_t
            else sel.transpose(0, 2, 3, 1).reshape(
                len(self.offsets) * v * v, n), npad)
        self.sel_f32_t = None
        self.fgmres_mixed_ok = False
        if self.mixed:
            # keep the full-precision blocks too when a mixed kernel
            # (bf16 sweep + f32 matvec in one launch) fits VMEM: either the
            # whole-FGMRES kernel (small fields) or the per-iteration
            # (z, A z) kernel (any size)
            if sgs_matvec_mixed_supported(mesh, v, len(color_masks)):
                self.sel_f32_t = self.sel_t
                self.fgmres_mixed_ok = fgmres_mixed_supported(
                    mesh, v, len(color_masks), m)
            self.sel_t = self.sel_t.astype(sel_dtype)
        self.dinv_t = tt(dinv)
        self.diag_t = tt(diag) if (not self.mixed
                                   or self.sel_f32_t is not None) else None
        self.masks_t = _pad_lanes(
            jnp.stack([m.astype(dinv.dtype) for m in color_masks]), npad)
        self.ncolor = len(color_masks)

    def _to_t(self, x):
        return _pad_lanes(x.T, self.npad)

    def _from_t(self, x_t):
        return x_t[:, :self.n].T

    def precond_matvec(self, r):
        """(z, A z) with z = symmetric multicolor SGS sweep of r."""
        assert not self.mixed
        z_t, w_t = _sgs_matvec_call(
            self.sel_t, self.dinv_t, self.diag_t, self.masks_t,
            self._to_t(r), offsets=self.offsets, v=self.v,
            ncolor=self.ncolor, interpret=_interpret())
        return self._from_t(z_t), self._from_t(w_t)

    def precond_matvec_mixed(self, r):
        """(z, A z) per-iteration mixed kernel: bf16 sweep sel + f32
        matvec sel in one launch (see _sgs_matvec_mixed_call)."""
        assert self.mixed and self.sel_f32_t is not None
        z_t, w_t = _sgs_matvec_mixed_call(
            self.sel_t, self.sel_f32_t, self.dinv_t, self.diag_t,
            self.masks_t, self._to_t(r), offsets=self.offsets, v=self.v,
            ncolor=self.ncolor, interpret=_interpret())
        return self._from_t(z_t), self._from_t(w_t)

    def precond(self, r):
        z_t = _sgs_call(
            self.sel_t, self.dinv_t, self.masks_t, self._to_t(r),
            offsets=self.offsets, v=self.v, ncolor=self.ncolor,
            interpret=_interpret())
        return self._from_t(z_t)

    def matvec(self, x):
        assert not self.mixed
        y_t = _matvec_call(self.sel_t, self.diag_t, self._to_t(x),
                           offsets=self.offsets, v=self.v,
                           interpret=_interpret())
        return self._from_t(y_t)

    def fgmres_mixed(self, b, max_iter: int, tol: float):
        """Mixed-tier whole-FGMRES launch: bf16 sweep sel + f32 matvec sel
        (see _fgmres_mixed_call).  Requires fgmres_mixed_ok (checked at
        construction)."""
        assert self.mixed and self.fgmres_mixed_ok
        x_t, stats = _fgmres_mixed_call(
            self.sel_t, self.sel_f32_t, self.dinv_t, self.diag_t,
            self.masks_t, self._to_t(b), offsets=self.offsets, v=self.v,
            ncolor=self.ncolor, m=int(max_iter), tol=float(tol),
            interpret=_interpret())
        return self._from_t(x_t), stats[0, 0], stats[1, 0].astype(jnp.int32)

    def fgmres(self, b, max_iter: int, tol: float):
        """Whole FGMRES cycle as ONE kernel launch (see _fgmres_call).
        Same (x, rel, iters) contract as krylov.fgmres with x0=None."""
        assert not self.mixed
        x_t, stats = _fgmres_call(
            self.sel_t, self.dinv_t, self.diag_t, self.masks_t,
            self._to_t(b), offsets=self.offsets, v=self.v,
            ncolor=self.ncolor, m=int(max_iter), tol=float(tol),
            interpret=_interpret())
        return self._from_t(x_t), stats[0, 0], stats[1, 0].astype(jnp.int32)
