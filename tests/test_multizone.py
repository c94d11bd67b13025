"""Multi-zone conjugate-heat coupling tests (CInterpolator/CTransfer at the
driver level — multizone.py)."""

import numpy as np
import pytest

from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.geometry.mesh_data import mesh_arrays
from su2_tpu.geometry.structured import channel_mesh
from su2_tpu.multizone import ConjugateHeatDriver, HeatZone


def _zone(lx, x0, ny, hot_tag, hot_val, interface_tag):
    raw = channel_mesh(17, ny, lx=lx, ly=0.4)
    raw.coords[:, 0] += x0
    grid = build_dual_grid(raw)
    mesh = mesh_arrays(grid)
    nodes = np.asarray(grid.bnd_nodes[hot_tag])
    return HeatZone(mesh=mesh, alpha=1.0,
                    dirichlet_nodes=nodes,
                    dirichlet_vals=np.full(len(nodes), hot_val),
                    interface_tag=interface_tag), grid


def test_conjugate_heat_matching_interface():
    """Two zones [0,1] + [1,2] with T(0)=0, T(2)=1 -> exact linear T=x/2."""
    za, ga = _zone(1.0, 0.0, 9, "inlet", 0.0, "outlet")
    zb, gb = _zone(1.0, 1.0, 9, "outlet", 1.0, "inlet")
    drv = ConjugateHeatDriver(za, zb)
    t_a, t_b, hist = drv.run(n_outer=80, relax=0.6)
    assert hist[-1] < 1e-10, hist[-5:]
    xa = np.asarray(za.mesh.coords)[:, 0]
    xb = np.asarray(zb.mesh.coords)[:, 0]
    np.testing.assert_allclose(np.asarray(t_a), xa / 2.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(t_b), xb / 2.0, atol=1e-8)


def test_conjugate_heat_nonmatching_interface():
    """Non-matching interface discretizations couple through the
    interpolator (nearest-neighbor donors)."""
    za, _ = _zone(1.0, 0.0, 9, "inlet", 0.0, "outlet")
    zb, _ = _zone(1.0, 1.0, 13, "outlet", 1.0, "inlet")
    drv = ConjugateHeatDriver(za, zb)
    t_a, t_b, hist = drv.run(n_outer=80, relax=0.5)
    assert np.isfinite(hist).all()
    xa = np.asarray(za.mesh.coords)[:, 0]
    xb = np.asarray(zb.mesh.coords)[:, 0]
    # linear profile approximately recovered despite NN interface transfer
    assert np.abs(np.asarray(t_a) - xa / 2.0).max() < 0.05
    assert np.abs(np.asarray(t_b) - xb / 2.0).max() < 0.05
