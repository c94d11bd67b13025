"""Tiled gradient sweep (pallas/gradients_tiled.py, SU2_TPU_TILED_GRAD):
bitwise parity with the stencil roll path on real meshes."""

import numpy as np
import pytest

import jax.numpy as jnp

from su2_tpu.ops import gradients
from su2_tpu.pallas import gradients_tiled as gt


@pytest.fixture()
def quad_mesh_arrays():
    from su2_tpu.geometry.dual_grid import build_dual_grid
    from su2_tpu.geometry.mesh_data import mesh_arrays
    from tests.test_stencil import _quad_grid

    mesh = _quad_grid(23, 17)
    grid = build_dual_grid(mesh)
    ma = mesh_arrays(grid)
    assert ma.stencil_offsets is not None and ma.wls_coeff is not None
    return ma


@pytest.mark.parametrize("mode", ["WLS", "GG"])
def test_tiled_gradient_matches_roll_path(quad_mesh_arrays, mode,
                                          monkeypatch):
    ma = quad_mesh_arrays
    rng = np.random.default_rng(5)
    ng = 5
    q = jnp.asarray(rng.standard_normal((ma.npoint, ng)))

    ref = (gradients.weighted_least_squares(ma, q) if mode == "WLS"
           else gradients.green_gauss(ma, q))

    # force several tiles on this small mesh
    maxoff = max(abs(int(o)) for o in ma.stencil_offsets)
    H = gt._round128(maxoff)
    T = 128
    npad = gt._round128(ma.npoint)
    ntiles = -(-npad // T)
    monkeypatch.setattr(gt, "tile_plan",
                        lambda m, ng_: (T, H, ntiles, ntiles * T + 2 * H))
    out = gt.gradient_tiled(ma, q, mode)
    # ulp-level: interpret-mode pallas and XLA fuse multiplies/adds into
    # FMAs differently; the arithmetic ORDER is identical
    sc = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-13 * max(sc, 1.0))


def test_env_gate_routes_through_tiled(quad_mesh_arrays, monkeypatch):
    ma = quad_mesh_arrays
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((ma.npoint, 4)))
    ref = gradients.weighted_least_squares(ma, q)
    monkeypatch.setenv("SU2_TPU_TILED_GRAD", "1")
    out = gradients.weighted_least_squares(ma, q)
    sc = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-13 * max(sc, 1.0))
