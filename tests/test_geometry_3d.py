"""3D median-dual geometry + solver tests (hex box and Kuhn tet split).

Mirrors the 2D invariants (CV closure, total volume, marker areas) and runs a
3D Euler freestream-preservation case end-to-end through Simulation.
"""

import os
import textwrap

import numpy as np
import pytest

from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.geometry.structured import box_mesh
from su2_tpu.io.mesh import ELEM_FACES, RawMesh


def _closure(g):
    acc = np.zeros((g.npoint, 3))
    np.add.at(acc, g.edges[:, 0], g.edge_normal)
    np.add.at(acc, g.edges[:, 1], -g.edge_normal)
    bnd = np.zeros((g.npoint, 3))
    for tag in g.bnd_nodes:
        np.add.at(bnd, g.bnd_nodes[tag], g.bnd_normal[tag])
    return np.abs(acc - bnd).max()


def test_box_hex_dual_grid():
    mesh = box_mesh(6, 5, 4, 2.0, 1.0, 0.5)
    g = build_dual_grid(mesh)
    assert g.ndim == 3
    assert _closure(g) < 1e-14
    assert abs(g.volume.sum() - 1.0) < 1e-12
    # outward marker areas (stored normals are inward -> negate)
    areas = {tag: (-g.bnd_normal[tag]).sum(axis=0) for tag in g.bnd_nodes}
    np.testing.assert_allclose(areas["inlet"], [-0.5, 0, 0], atol=1e-14)
    np.testing.assert_allclose(areas["outlet"], [0.5, 0, 0], atol=1e-14)
    np.testing.assert_allclose(areas["y_min"], [0, -1.0, 0], atol=1e-14)
    np.testing.assert_allclose(areas["z_max"], [0, 0, 2.0], atol=1e-14)


def _kuhn_tet_mesh(n=4):
    xs, ys, zs = np.meshgrid(*[np.linspace(0, 1, n)] * 3, indexing="ij")
    coords = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1)

    def nid(i, j, k):
        return (i * n + j) * n + k

    kuhn = [(0, 1, 3, 7), (0, 1, 7, 5), (0, 5, 7, 4),
            (0, 3, 2, 7), (0, 2, 6, 7), (0, 6, 4, 7)]
    tets = []
    for i in range(n - 1):
        for j in range(n - 1):
            for k in range(n - 1):
                c = [nid(i, j, k), nid(i + 1, j, k), nid(i, j + 1, k),
                     nid(i + 1, j + 1, k), nid(i, j, k + 1),
                     nid(i + 1, j, k + 1), nid(i, j + 1, k + 1),
                     nid(i + 1, j + 1, k + 1)]
                for t in kuhn:
                    tets.append([c[x] for x in t])
    tets = np.array(tets)
    p = coords[tets]
    vol6 = np.einsum("nd,nd->n", p[:, 3] - p[:, 0],
                     np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]))
    sw = vol6 < 0
    tets[sw] = tets[sw][:, [0, 2, 1, 3]]
    from collections import Counter
    cnt, facemap = Counter(), {}
    for row in tets:
        for f in ELEM_FACES[10]:
            tri = tuple(row[list(f)])
            key = tuple(sorted(tri))
            cnt[key] += 1
            facemap[key] = tri
    bnd = np.array([facemap[k] for k, c in cnt.items() if c == 1])
    return RawMesh(ndim=3, coords=coords,
                   elem_types=np.full(len(tets), 10, dtype=np.int32),
                   elem_nodes=tets, markers={"all": bnd},
                   marker_types={"all": np.full(len(bnd), 5, dtype=np.int32)})


def test_tet_dual_grid():
    g = build_dual_grid(_kuhn_tet_mesh(4))
    assert _closure(g) < 1e-14
    assert abs(g.volume.sum() - 1.0) < 1e-12
    # closed surface: total outward normal vanishes
    np.testing.assert_allclose(g.bnd_normal["all"].sum(axis=0), 0, atol=1e-13)


def test_wls_gradient_3d_exact_on_linear_field():
    import jax.numpy as jnp
    from su2_tpu.geometry.mesh_data import mesh_arrays
    from su2_tpu.ops import gradients

    g = build_dual_grid(box_mesh(6, 5, 4, 2.0, 1.0, 0.5))
    mesh = mesh_arrays(g, jnp.float64)
    c = g.coords
    q = jnp.asarray(np.stack(
        [2.0 * c[:, 0] - 3.0 * c[:, 1] + 0.5 * c[:, 2] + 1.0,
         c[:, 0] + 4.0 * c[:, 2]], axis=1))
    grad = np.asarray(gradients.weighted_least_squares(mesh, q))
    np.testing.assert_allclose(grad[:, 0, :],
                               np.tile([2.0, -3.0, 0.5], (g.npoint, 1)),
                               atol=1e-10)
    np.testing.assert_allclose(grad[:, 1, :],
                               np.tile([1.0, 0.0, 4.0], (g.npoint, 1)),
                               atol=1e-10)


CFG_3D_FREESTREAM = textwrap.dedent("""
    PHYSICAL_PROBLEM= EULER
    MACH_NUMBER= 0.5
    AOA= 0.0
    FREESTREAM_PRESSURE= 101325.0
    FREESTREAM_TEMPERATURE= 288.15
    MARKER_FAR= ( inlet, outlet, y_min, y_max, z_min, z_max )
    NUM_METHOD_GRAD= GREEN_GAUSS
    CFL_NUMBER= 5.0
    CONV_NUM_METHOD_FLOW= ROE
    TIME_DISCRE_FLOW= EULER_IMPLICIT
    LINEAR_SOLVER= FGMRES
    LINEAR_SOLVER_ITER= 5
    MESH_FILENAME= unused.su2
""")


def test_euler_3d_freestream_preserved(tmp_path):
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation

    cfg_path = tmp_path / "case.cfg"
    cfg_path.write_text(CFG_3D_FREESTREAM)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(Config(str(cfg_path)), raw_mesh=box_mesh(5, 4, 4))
        _, _, hist = sim.run(2, quiet=True)
    finally:
        os.chdir(cwd)
    assert hist[-1][sim.lay.RHO] < -12.0  # log10 RMS: machine-zero freestream
