import os

import numpy as np
import pytest

from su2_tpu.geometry import native
from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.io.mesh import read_su2_mesh


@pytest.mark.skipif(native.load() is None,
                    reason="native geometry library not built")
def test_native_matches_python(combustion_dir):
    mesh = read_su2_mesh(os.path.join(combustion_dir, "mesh_stretched.su2"))
    g_py = build_dual_grid(mesh, use_native=False)
    g_cc = build_dual_grid(mesh, use_native=True)
    np.testing.assert_array_equal(g_cc.edges, g_py.edges)
    np.testing.assert_allclose(g_cc.edge_normal, g_py.edge_normal,
                               rtol=1e-14, atol=1e-18)
    np.testing.assert_allclose(g_cc.volume, g_py.volume, rtol=1e-13)
    np.testing.assert_array_equal(g_cc.node_edges, g_py.node_edges)
    np.testing.assert_array_equal(g_cc.node_nbrs, g_py.node_nbrs)
    np.testing.assert_array_equal(g_cc.node_edge_sign, g_py.node_edge_sign)
    for tag in g_py.bnd_nodes:
        np.testing.assert_array_equal(g_cc.bnd_nodes[tag], g_py.bnd_nodes[tag])
        np.testing.assert_allclose(g_cc.bnd_normal[tag], g_py.bnd_normal[tag])
        np.testing.assert_array_equal(g_cc.bnd_nn[tag], g_py.bnd_nn[tag])
