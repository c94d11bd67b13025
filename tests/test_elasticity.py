"""Linear-elasticity FEM tests (CFEASolver / elasticity mesh deformation)."""

import numpy as np
import pytest

from su2_tpu.geometry.structured import channel_mesh
from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.io.mesh import RawMesh
from su2_tpu.solvers import elasticity


def _bnd_mask(raw, grid):
    mask = np.zeros(raw.npoint, dtype=bool)
    for tag in grid.bnd_nodes:
        mask[np.asarray(grid.bnd_nodes[tag])] = True
    return mask


def test_rigid_translation_patch():
    """All boundaries translated by (dx, dy): interior must follow exactly."""
    raw = channel_mesh(9, 7, lx=1.0, ly=0.4)
    grid = build_dual_grid(raw)
    mask = _bnd_mask(raw, grid)
    disp = np.tile([0.01, -0.02], (raw.npoint, 1))
    out = np.asarray(elasticity.solve_elasticity(raw, mask, disp))
    np.testing.assert_allclose(out, disp, atol=1e-10)


def test_linear_displacement_patch():
    """P1/bilinear elements reproduce a linear displacement field exactly
    (the classic FEM patch test)."""
    raw = channel_mesh(7, 6, lx=1.0, ly=0.5)
    grid = build_dual_grid(raw)
    mask = _bnd_mask(raw, grid)
    c = raw.coords
    exact = np.stack([0.02 * c[:, 0] + 0.01 * c[:, 1],
                      -0.015 * c[:, 0] + 0.03 * c[:, 1]], axis=1)
    out = np.asarray(elasticity.solve_elasticity(raw, mask, exact,
                                                 n_iter=1200, tol=1e-14))
    np.testing.assert_allclose(out, exact, atol=1e-8)


def test_triangle_elements_patch():
    raw = channel_mesh(6, 5)
    tris = []
    for q in raw.elem_nodes:
        a, b, c_, d = (int(x) for x in q[:4])
        tris.append([a, b, c_])
        tris.append([a, c_, d])
    raw_t = RawMesh(ndim=2, coords=raw.coords,
                    elem_types=np.full(len(tris), 5, dtype=np.int32),
                    elem_nodes=np.asarray(tris), markers=raw.markers,
                    marker_types=raw.marker_types)
    grid = build_dual_grid(raw_t)
    mask = _bnd_mask(raw_t, grid)
    c = raw_t.coords
    exact = np.stack([0.05 * c[:, 1], 0.02 * c[:, 0]], axis=1)
    out = np.asarray(elasticity.solve_elasticity(raw_t, mask, exact,
                                                 n_iter=1200, tol=1e-14))
    np.testing.assert_allclose(out, exact, atol=1e-8)


def test_bump_deformation_positive_volumes():
    """Elasticity deformation of a wall bump keeps a valid mesh
    (CVolumetricMovement::SetVolume_Deformation capability)."""
    from su2_tpu import deform

    raw = channel_mesh(13, 9, lx=1.0, ly=0.4)
    grid = build_dual_grid(raw)
    nodes = np.asarray(grid.bnd_nodes["lower_wall"])
    disp = deform.surface_displacement(
        raw.coords, nodes,
        [{"kind": "HICKS_HENNE", "up": 1, "x_loc": 0.5, "value": 0.05}])
    mask = _bnd_mask(raw, grid)
    out = np.asarray(elasticity.solve_elasticity(
        raw, mask, disp, stiffness_type="INVERSE_VOLUME", n_iter=800))
    new_coords = raw.coords + out
    raw2 = channel_mesh(13, 9, lx=1.0, ly=0.4)
    raw2.coords[:] = new_coords
    g2 = build_dual_grid(raw2)
    assert g2.volume.min() > 0.0
    # prescribed boundary displacement honored
    np.testing.assert_allclose(out[nodes], disp[nodes], atol=1e-9)


def test_nonlinear_rigid_rotation():
    """A rigid boundary rotation must propagate stress-free: the interior
    follows the exact rotation (the linear solver cannot do this — it is
    the defining test of geometric nonlinearity)."""
    import numpy as np
    import jax.numpy as jnp
    from su2_tpu.geometry.structured import channel_mesh
    from su2_tpu.solvers.elasticity import solve_nonlinear_elasticity

    raw = channel_mesh(7, 7, lx=1.0, ly=1.0)
    n = raw.npoint
    bnd = np.zeros(n, dtype=bool)
    for nodes in raw.markers.values():
        bnd[np.unique(np.asarray(nodes))] = True
    th = np.deg2rad(25.0)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    disp = raw.coords @ rot.T - raw.coords
    u = solve_nonlinear_elasticity(raw, bnd, jnp.asarray(disp),
                                   e_mod=1.0, nu=0.3, n_incr=6)
    np.testing.assert_allclose(np.asarray(u), disp, atol=1e-7)


def test_nonlinear_small_strain_matches_linear():
    import numpy as np
    import jax.numpy as jnp
    from su2_tpu.geometry.structured import channel_mesh
    from su2_tpu.solvers.elasticity import (solve_elasticity,
                                            solve_nonlinear_elasticity)

    raw = channel_mesh(6, 5, lx=1.0, ly=0.5)
    n = raw.npoint
    bnd = np.zeros(n, dtype=bool)
    for nodes in raw.markers.values():
        bnd[np.unique(np.asarray(nodes))] = True
    amp = 1e-5
    disp = np.zeros((n, 2))
    disp[:, 1] = amp * raw.coords[:, 0] * (1.0 - raw.coords[:, 0])
    u_lin = solve_elasticity(raw, bnd, jnp.asarray(disp))
    u_nl = solve_nonlinear_elasticity(raw, bnd, jnp.asarray(disp),
                                      n_incr=1)
    np.testing.assert_allclose(np.asarray(u_nl), np.asarray(u_lin),
                               atol=amp * 2e-2)


def test_nonlinear_incompressible_rotation_and_volume():
    """Incompressible Neo-Hookean: rigid rotation is stress-free, and a
    sheared block keeps its element volumes (J ~ 1) much better than the
    compressible material."""
    import numpy as np
    import jax.numpy as jnp
    from su2_tpu.geometry.structured import channel_mesh
    from su2_tpu.solvers.elasticity import (solve_nonlinear_elasticity,
                                            _grad_tables)

    raw = channel_mesh(7, 7, lx=1.0, ly=1.0)
    n = raw.npoint
    bnd = np.zeros(n, dtype=bool)
    for nodes in raw.markers.values():
        bnd[np.unique(np.asarray(nodes))] = True
    th = np.deg2rad(20.0)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    disp = raw.coords @ rot.T - raw.coords
    u = solve_nonlinear_elasticity(raw, bnd, jnp.asarray(disp), nu=0.3,
                                   n_incr=5, material="NEO_HOOKEAN_INCOMP")
    np.testing.assert_allclose(np.asarray(u), disp, atol=1e-6)
