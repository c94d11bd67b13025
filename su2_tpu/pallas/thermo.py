"""Pallas TPU kernel: fused mixture-enthalpy spline evaluation.

The secant temperature solve evaluates h(T, Y) = sum_s Y_s h_s(T)/M_s every
iteration; h_s comes from per-species natural cubic splines.  The XLA
lowering of the table gathers is a chain of dynamic-slice ops that dominates
Cons2Prim on TPU.  This kernel keeps the stacked spline tables resident in
VMEM and turns the per-cell bin lookup into a one-hot matmul on the MXU:

    P = onehot(klo)            (TILE, nT)
    G = P @ B                  (TILE, 4S)  [y_prev | y_cur | y2_prev | y2_cur]

followed by the cubic combine and the Y-weighted mixture reduction on the
VPU — one kernel for the whole evaluation.

The pure-jnp fallback (same one-hot contraction) runs everywhere else, so
numerics are identical across backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from su2_tpu.chemistry.library import ChemLib


def _stacked_tables(lib: ChemLib):
    """B (nT, 4S): per-species [y_{k-1}, y_k, y2_{k-1}, y2_k] columns."""
    y = lib.h_y            # (S, nT)
    y2 = lib.h_y2
    y_prev = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
    y2_prev = jnp.concatenate([y2[:, :1], y2[:, :-1]], axis=1)
    return jnp.concatenate([y_prev, y, y2_prev, y2], axis=0).T  # (nT, 4S)


def _combine(lib, g, tc, klo, ys):
    """Cubic spline combine + mixture reduction. g: (N, 4S)."""
    s = lib.nspecies
    h = lib.dt
    xk = lib.t0 + klo.astype(g.dtype) * h
    a = ((xk - tc) / h)[:, None]
    b = ((tc - (xk - h)) / h)[:, None]
    yl, yc = g[:, :s], g[:, s:2 * s]
    y2l, y2c = g[:, 2 * s:3 * s], g[:, 3 * s:]
    h_mol = a * yl + b * yc + ((a ** 3 - a) * y2l + (b ** 3 - b) * y2c) \
        * (h * h) / 6.0
    return jnp.einsum("ns,ns->n", ys / lib.mm, h_mol)


def mixture_enthalpy_onehot(lib: ChemLib, t: jnp.ndarray,
                            ys: jnp.ndarray) -> jnp.ndarray:
    """jnp one-hot-matmul path (all backends)."""
    nt = lib.nt
    tc = jnp.clip(t, lib.t0, lib.t0 + (nt - 1) * lib.dt)
    klo = jnp.clip(((tc - lib.t0) / lib.dt).astype(jnp.int32) + 1, 1, nt - 1)
    b_tab = _stacked_tables(lib)
    onehot = jax.nn.one_hot(klo, nt, dtype=t.dtype)       # (N, nT)
    # HIGHEST: TPU f32 matmuls otherwise run in bf16 passes (0.2% error)
    g = jnp.dot(onehot, b_tab, precision=jax.lax.Precision.HIGHEST)
    return _combine(lib, g, tc, klo, ys)


def mixture_enthalpy_pallas(lib: ChemLib, t: jnp.ndarray, ys: jnp.ndarray,
                            tile: int = 512) -> jnp.ndarray:
    """Pallas TPU kernel path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = t.shape[0]
    s = lib.nspecies
    nt = lib.nt
    npad = (-n) % tile
    tpad = jnp.pad(t, (0, npad))
    ypad = jnp.pad(ys, ((0, npad), (0, 0)))
    b_tab = _stacked_tables(lib).astype(t.dtype)           # (nT, 4S)
    inv_mm = (1.0 / lib.mm).astype(t.dtype)
    ntiles = (n + npad) // tile

    t0 = float(lib.t0)
    dtg = float(lib.dt)

    def kernel(t_ref, y_ref, tab_ref, imm_ref, out_ref):
        tc = jnp.clip(t_ref[:, 0], t0, t0 + (nt - 1) * dtg)
        klo = jnp.clip(((tc - t0) / dtg).astype(jnp.int32) + 1, 1, nt - 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile, nt), 1)
        onehot = (cols == klo[:, None]).astype(tc.dtype)
        g = jnp.dot(onehot, tab_ref[:], preferred_element_type=tc.dtype,
                    precision=jax.lax.Precision.HIGHEST)
        xk = t0 + klo.astype(tc.dtype) * dtg
        a = ((xk - tc) / dtg)[:, None]
        b = ((tc - (xk - dtg)) / dtg)[:, None]
        yl, yc = g[:, :s], g[:, s:2 * s]
        y2l, y2c = g[:, 2 * s:3 * s], g[:, 3 * s:]
        h_mol = a * yl + b * yc \
            + ((a ** 3 - a) * y2l + (b ** 3 - b) * y2c) * (dtg * dtg) / 6.0
        out_ref[:, 0] = jnp.sum(y_ref[:] * imm_ref[:] * h_mol, axis=1)

    out = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, s), lambda i: (i, 0)),
            pl.BlockSpec((nt, 4 * s), lambda i: (0, 0)),
            pl.BlockSpec((1, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n + npad, 1), t.dtype),
    )(tpad[:, None], ypad, b_tab, inv_mm[None, :])
    return out[:n, 0]
