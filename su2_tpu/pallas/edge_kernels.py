"""Pallas-fused edge kernels.

The implicit assembly is HBM-bandwidth bound: built with plain XLA ops the
AUSM flux + Jacobian chain materializes dozens of (nE, nVar, nVar)
intermediates (measured ~15 GB accessed per step on the 9k-cell case).
Running the SAME jnp math inside one pallas_call keeps every intermediate
in VMEM: per edge tile only the inputs (2 x nPrim + 2 x nVar + d floats)
and outputs (nVar + 2 nVar^2) touch HBM — the speed-of-light traffic.

The kernel body literally calls ops/ausm.py::ausm_flux, so there is one
source of truth for the numerics; CPU/f64 paths keep using the XLA version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TILE = 128


def _pad_rows(x, npad):
    """Pad with copies of row 0 (valid data, results discarded)."""
    extra = npad - x.shape[0]
    if extra == 0:
        return x
    return jnp.concatenate([x, jnp.broadcast_to(x[:1], (extra,) + x.shape[1:])])


@functools.partial(jax.jit, static_argnums=(0, 4))
def ausm_flux_jac_pallas(lay, v_i, v_j, normal, m_infty, s_i, s_j):
    """Fused AUSM+-up flux + Jacobians (see ops/ausm.py for the math)."""
    from su2_tpu.ops import ausm

    ne = v_i.shape[0]
    nvar, nprim, nd = lay.nvar, lay.nprim, lay.ndim
    tile = min(_TILE, max(128, ne))
    npad = -(-ne // tile) * tile

    vi = _pad_rows(v_i, npad)
    vj = _pad_rows(v_j, npad)
    nm = _pad_rows(normal, npad)
    si = _pad_rows(s_i, npad)
    sj = _pad_rows(s_j, npad)

    def kernel(vi_ref, vj_ref, nm_ref, si_ref, sj_ref,
               f_ref, ji_ref, jj_ref):
        f, ji, jj = ausm.ausm_flux(
            lay, vi_ref[...], vj_ref[...], nm_ref[...], m_infty,
            si_ref[...], sj_ref[...])
        f_ref[...] = f
        ji_ref[...] = ji
        jj_ref[...] = jj

    grid = (npad // tile,)
    interpret = jax.devices()[0].platform != "tpu"
    bs = lambda w: pl.BlockSpec((tile, w), lambda i: (i, 0))
    bs3 = pl.BlockSpec((tile, nvar, nvar), lambda i: (i, 0, 0))
    f, ji, jj = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[bs(nprim), bs(nprim), bs(nd), bs(nvar), bs(nvar)],
        out_specs=[bs(nvar), bs3, bs3],
        out_shape=[
            jax.ShapeDtypeStruct((npad, nvar), v_i.dtype),
            jax.ShapeDtypeStruct((npad, nvar, nvar), v_i.dtype),
            jax.ShapeDtypeStruct((npad, nvar, nvar), v_i.dtype),
        ],
    )(vi, vj, nm, si, sj)
    return f[:ne], ji[:ne], jj[:ne]


_USE_PALLAS = False


def set_edge_kernel_mode(enabled: bool) -> None:
    """Toggle the fused TPU edge kernels (driver enables on TPU/f32)."""
    global _USE_PALLAS
    _USE_PALLAS = enabled


def use_pallas() -> bool:
    return _USE_PALLAS


@functools.partial(jax.jit, static_argnums=(0, 4))
def ausm_flux_jac_pallas_t(lay, v_i, v_j, normal, m_infty, s_i, s_j):
    """Lanes-as-edges fused AUSM kernel.

    Takes/returns the ordinary edge-major layouts; internally transposes to
    feature-major (features, edges) so the trailing edge axis maps to vector
    lanes (full 128-lane utilization — the (tile, 13, 13) variant above pads
    13 -> 128 and loses 10x).  Math: ops/ausm_t.py.
    """
    from su2_tpu.ops import ausm_t

    ne = v_i.shape[0]
    nvar, nprim, nd = lay.nvar, lay.nprim, lay.ndim
    tile = 1024 if ne >= 1024 else max(256, ne)
    npad = -(-ne // tile) * tile

    viT = _pad_rows(v_i, npad).T
    vjT = _pad_rows(v_j, npad).T
    nmT = _pad_rows(normal, npad).T
    siT = _pad_rows(s_i, npad).T
    sjT = _pad_rows(s_j, npad).T

    def kernel(vi_ref, vj_ref, nm_ref, si_ref, sj_ref,
               f_ref, ji_ref, jj_ref):
        f, ji, jj = ausm_t.ausm_flux_t(
            lay, vi_ref[...], vj_ref[...], nm_ref[...], m_infty,
            si_ref[...], sj_ref[...])
        f_ref[...] = f
        ji_ref[...] = ji
        jj_ref[...] = jj

    grid = (npad // tile,)
    interpret = jax.devices()[0].platform != "tpu"
    bs = lambda w: pl.BlockSpec((w, tile), lambda i: (0, i))
    bs3 = pl.BlockSpec((nvar, nvar, tile), lambda i: (0, 0, i))
    f, ji, jj = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[bs(nprim), bs(nprim), bs(nd), bs(nvar), bs(nvar)],
        out_specs=[bs(nvar), bs3, bs3],
        out_shape=[
            jax.ShapeDtypeStruct((nvar, npad), v_i.dtype),
            jax.ShapeDtypeStruct((nvar, nvar, npad), v_i.dtype),
            jax.ShapeDtypeStruct((nvar, nvar, npad), v_i.dtype),
        ],
    )(viT, vjT, nmT, siT, sjT)
    return (f.T[:ne], jnp.transpose(ji, (2, 0, 1))[:ne],
            jnp.transpose(jj, (2, 0, 1))[:ne])
