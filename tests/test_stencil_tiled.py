"""Tiled/streaming stencil kernels (round-4): the overlapping-window DMA
form of the multicolor-SGS sweep + matvec must reproduce the full-field
VMEM-resident kernels bitwise on the owner regions (pallas/stencil_solve.py
tiled tier).  Synthetic band systems; interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from su2_tpu.pallas import stencil_solve as stks


def _synthetic(n, v, offsets, ncolor, seed=0, dtype=jnp.float64):
    """Random band block system in lane layout with the real invariants:
    zero blocks for out-of-range neighbors, zero dinv on pad lanes,
    proper coloring masks (round-robin by lane index is proper for the
    offsets used here when ncolor > max gap ... we just need masks that
    partition the lanes; the kernels don't exploit properness for
    bitwise equality)."""
    rng = np.random.default_rng(seed)
    npad = -(-n // 128) * 128
    k = len(offsets)
    sel = rng.standard_normal((k, v, v, npad)) * 0.1
    for kk, o in enumerate(offsets):
        p = np.arange(npad)
        bad = (p + o < 0) | (p + o >= n) | (p >= n)
        sel[kk, :, :, bad] = 0.0
    sel_t = jnp.asarray(sel.reshape(k * v * v, npad), dtype)
    diag = rng.standard_normal((npad, v, v)) * 0.1 \
        + 3.0 * np.eye(v)[None, :, :]
    diag[n:] = 0.0
    dinv = np.zeros_like(diag)
    dinv[:n] = np.linalg.inv(diag[:n])
    diag_t = jnp.asarray(diag.transpose(1, 2, 0).reshape(v * v, npad),
                         dtype)
    dinv_t = jnp.asarray(dinv.transpose(1, 2, 0).reshape(v * v, npad),
                         dtype)
    colors = np.arange(npad) % ncolor
    masks = np.stack([(colors == c) & (np.arange(npad) < n)
                      for c in range(ncolor)])
    masks_t = jnp.asarray(masks.astype(np.float64), dtype)
    r = rng.standard_normal((v, npad))
    r[:, n:] = 0.0
    r_t = jnp.asarray(r, dtype)
    return sel_t, dinv_t, diag_t, masks_t, r_t


@pytest.mark.parametrize("v,offsets", [
    (2, (-9, -8, -7, -1, 1, 7, 8, 9)),
    (3, (-5, -1, 1, 5)),
])
def test_tiled_matches_full_field(v, offsets):
    n, ncolor = 1000, 4
    sel_t, dinv_t, diag_t, masks_t, r_t = _synthetic(n, v, offsets, ncolor)
    z_full, w_full = stks._sgs_matvec_call(
        sel_t, dinv_t, diag_t, masks_t, r_t, offsets=offsets, v=v,
        ncolor=ncolor, interpret=True)

    maxoff = max(abs(o) for o in offsets)
    npass = 2 * ncolor - 1
    H = stks._round128((npass + 1) * maxoff)
    T = 256
    npad = r_t.shape[-1]
    ntiles = -(-npad // T)
    E = ntiles * T + 2 * H
    ext = lambda x: stks._extend_lanes(x, H, E)
    kw = dict(offsets=offsets, v=v, ncolor=ncolor, T=T, H=H,
              ntiles=ntiles, interpret=True)

    z_t, w_t = stks._tiled_sgs_matvec_call(
        ext(sel_t), ext(dinv_t), ext(diag_t), ext(masks_t), ext(r_t), **kw)
    np.testing.assert_array_equal(np.asarray(z_t[:, :n]),
                                  np.asarray(z_full[:, :n]))
    np.testing.assert_array_equal(np.asarray(w_t[:, :n]),
                                  np.asarray(w_full[:, :n]))

    # sweep-only kernel
    z_only = stks._tiled_sgs_call(
        ext(sel_t), ext(dinv_t), ext(masks_t), ext(r_t),
        offsets=offsets, v=v, ncolor=ncolor, T=T, H=H, ntiles=ntiles,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(z_only[:, :n]),
                                  np.asarray(z_full[:, :n]))


def test_tiled_mixed_matches_full_mixed():
    v, offsets, n, ncolor = 2, (-9, -8, -7, -1, 1, 7, 8, 9), 1000, 4
    sel_t, dinv_t, diag_t, masks_t, r_t = _synthetic(
        n, v, offsets, ncolor, dtype=jnp.float32)
    selp_t = sel_t.astype(jnp.bfloat16)
    z_full, w_full = stks._sgs_matvec_mixed_call(
        selp_t, sel_t, dinv_t, diag_t, masks_t, r_t, offsets=offsets, v=v,
        ncolor=ncolor, interpret=True)

    maxoff = max(abs(o) for o in offsets)
    H = stks._round128((2 * ncolor) * maxoff)
    T = 256
    npad = r_t.shape[-1]
    ntiles = -(-npad // T)
    E = ntiles * T + 2 * H
    ext = lambda x: stks._extend_lanes(x, H, E)
    z_t, w_t = stks._tiled_sgs_matvec_mixed_call(
        ext(selp_t), ext(sel_t), ext(dinv_t), ext(diag_t), ext(masks_t),
        ext(r_t), offsets=offsets, v=v, ncolor=ncolor, T=T, H=H,
        ntiles=ntiles, interpret=True)
    np.testing.assert_array_equal(np.asarray(z_t[:, :n]),
                                  np.asarray(z_full[:, :n]))
    np.testing.assert_array_equal(np.asarray(w_t[:, :n]),
                                  np.asarray(w_full[:, :n]))


def test_tiled_mixed_unextended_r_matches_extended():
    """r_unext=True (clamped-window DMA + dynamic roll + range mask) must
    reproduce the extended-r path bitwise on the owner regions."""
    v, offsets, n, ncolor = 2, (-9, -8, -7, -1, 1, 7, 8, 9), 1000, 4
    sel_t, dinv_t, diag_t, masks_t, r_t = _synthetic(
        n, v, offsets, ncolor, dtype=jnp.float32)
    selp_t = sel_t.astype(jnp.bfloat16)
    maxoff = max(abs(o) for o in offsets)
    H = stks._round128((2 * ncolor) * maxoff)
    T = 256
    npad = r_t.shape[-1]
    ntiles = -(-npad // T)
    E = ntiles * T + 2 * H
    ext = lambda x: stks._extend_lanes(x, H, E)
    kw = dict(offsets=offsets, v=v, ncolor=ncolor, T=T, H=H,
              ntiles=ntiles, interpret=True)
    z_a, w_a = stks._tiled_sgs_matvec_mixed_call(
        ext(selp_t), ext(sel_t), ext(dinv_t), ext(diag_t), ext(masks_t),
        ext(r_t), **kw)
    r_w = stks._pad_lanes(r_t, ntiles * T)
    z_b, w_b = stks._tiled_sgs_matvec_mixed_call(
        ext(selp_t), ext(sel_t), ext(dinv_t), ext(diag_t), ext(masks_t),
        r_w, r_unext=True, **kw)
    np.testing.assert_array_equal(np.asarray(z_b[:, :n]),
                                  np.asarray(z_a[:, :n]))
    np.testing.assert_array_equal(np.asarray(w_b[:, :n]),
                                  np.asarray(w_a[:, :n]))
